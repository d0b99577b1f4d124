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


def _paths_oracle(edges, s, t, cutoff):
    import collections

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    out = []

    def dfs(path):
        if len(path) - 1 > cutoff:
            return
        if path[-1] == t:
            out.append(tuple(path))
            return
        for nxt in adj[path[-1]]:
            if nxt not in path:
                dfs(path + [nxt])

    dfs([s])
    return {p for p in out if len(p) - 1 <= cutoff}


class TestAllSimplePaths:
    def test_matches_dfs_oracle(self):
        from networkit_ray.graph.reachability import all_simple_paths

        rng = np.random.default_rng(13)
        n = 12
        edges = sorted(
            {(int(a), int(b)) for a, b in rng.integers(0, n, (30, 2)) if a != b}
        )
        for s, t, cutoff in [(0, 5, 4), (1, 8, 5), (3, 5, 6)]:
            exp = _paths_oracle(edges, s, t, cutoff)
            got = all_simple_paths(_ds(edges), s, t, cutoff).to_pandas()
            # an all-empty result loses its columns in to_pandas (Ray quirk)
            got_set = {tuple(p) for p in got["path"]} if "path" in got else set()
            assert got_set == exp, (s, t, cutoff, len(got_set), len(exp))

    def test_diamond(self):
        from networkit_ray.graph.reachability import all_simple_paths

        edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
        got = all_simple_paths(_ds(edges), 0, 3, 3).to_pandas()
        assert {tuple(p) for p in got["path"]} == {(0, 1, 3), (0, 2, 3)}

    def test_cutoff_limits(self):
        from networkit_ray.graph.reachability import all_simple_paths

        edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
        got = all_simple_paths(_ds(edges), 0, 3, 1).to_pandas()
        assert {tuple(p) for p in got["path"]} == {(0, 3)}
