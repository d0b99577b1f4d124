"""ReachableNodes (SCC condensation + batched BFS) vs transitive-closure oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.reachability import reachable_counts


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, b in rows], pa.int64()),
                "dst": pa.array([b for a, b in rows], pa.int64()),
            }
        )
    )


def _oracle(n, edges):
    reach = np.eye(n, dtype=bool)
    for a, b in edges:
        reach[a, b] = True
    for _ in range(n):
        new = reach | (reach @ reach)
        if (new == reach).all():
            break
        reach = new
    return reach.sum(axis=1)


class TestReachableNodes:
    def test_random_directed_with_cycles(self):
        rng = np.random.default_rng(7)
        n = 25
        edges = sorted(
            {(int(a), int(b)) for a, b in rng.integers(0, n, (60, 2)) if a != b}
        )
        exp = _oracle(n, edges)
        got = (
            reachable_counts(_ds(edges), n, batch_k=7)
            .to_pandas()
            .sort_values("v")
        )
        # vertices with no incident edges are absent from the label table;
        # those trivially reach only themselves
        for row in got.itertuples(index=False):
            assert row.reachable == exp[row.v], row

    def test_cycle_plus_tail(self):
        # 0→1→2→0 cycle, 2→3→4 tail: cycle members reach all 5, 3 reaches 2, 4 reaches 1
        edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
        got = dict(
            reachable_counts(_ds(edges), 5, batch_k=2)
            .to_pandas()[["v", "reachable"]]
            .itertuples(index=False, name=None)
        )
        assert got == {0: 5, 1: 5, 2: 5, 3: 2, 4: 1}

    def test_parallelism_invariant(self):
        rng = np.random.default_rng(11)
        n = 20
        edges = sorted(
            {(int(a), int(b)) for a, b in rng.integers(0, n, (45, 2)) if a != b}
        )
        a = (
            reachable_counts(_ds(edges), n, num_parts=2, batch_k=4)
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        b = (
            reachable_counts(_ds(edges), n, num_parts=5, batch_k=16)
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        assert a.equals(b)
