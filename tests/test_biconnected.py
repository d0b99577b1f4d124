"""Biconnected components vs a sequential Hopcroft–Tarjan replica."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.biconnected import biconnected_components
from networkit_ray.graph.build import symmetrize


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, b in rows], pa.int64()),
                "dst": pa.array([b for a, b in rows], pa.int64()),
            }
        )
    )


def _bcc_oracle(canon):
    """Iterative Hopcroft–Tarjan; returns set of frozensets of edges."""
    import collections

    adj = collections.defaultdict(list)
    for a, b in canon:
        adj[a].append(b)
        adj[b].append(a)
    visited = {}
    low = {}
    counter = [0]
    comps = []
    stack_edges = []

    for start in sorted(adj):
        if start in visited:
            continue
        # iterative DFS
        dfs_stack = [(start, None, iter(adj[start]))]
        visited[start] = counter[0]
        low[start] = counter[0]
        counter[0] += 1
        while dfs_stack:
            v, parent, it = dfs_stack[-1]
            advanced = False
            for w in it:
                if w == parent:
                    continue
                if w not in visited:
                    stack_edges.append((min(v, w), max(v, w)))
                    visited[w] = counter[0]
                    low[w] = counter[0]
                    counter[0] += 1
                    dfs_stack.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                elif visited[w] < visited[v]:
                    stack_edges.append((min(v, w), max(v, w)))
                    low[v] = min(low[v], visited[w])
            if advanced:
                continue
            dfs_stack.pop()
            if dfs_stack:
                u = dfs_stack[-1][0]
                low[u] = min(low[u], low[v])
                if low[v] >= visited[u]:
                    comp = set()
                    while stack_edges:
                        e = stack_edges.pop()
                        comp.add(e)
                        if e == (min(u, v), max(u, v)):
                            break
                    if comp:
                        comps.append(frozenset(comp))
    return set(comps)


def _got_partition(df):
    import collections

    groups = collections.defaultdict(set)
    for r in df.itertuples(index=False):
        groups[r.comp].add((min(r.src, r.dst), max(r.src, r.dst)))
    return set(frozenset(g) for g in groups.values())


class TestBiconnected:
    def test_textbook(self):
        # two triangles joined by a bridge at an articulation point
        canon = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
        sym = symmetrize(_ds(canon)).materialize()
        got = biconnected_components(sym, 6).to_pandas()
        assert _got_partition(got) == _bcc_oracle(canon)

    def test_random_graphs(self):
        for seed, n, m in [(2, 18, 30), (7, 30, 55), (11, 25, 80)]:
            rng = np.random.default_rng(seed)
            canon = sorted(
                {
                    (int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, n, (m, 2))
                    if a != b
                }
            )
            sym = symmetrize(_ds(canon)).materialize()
            got = biconnected_components(sym, n).to_pandas()
            assert len(got) == len(canon), (seed, len(got), len(canon))
            assert _got_partition(got) == _bcc_oracle(canon), seed

    def test_path_graph_each_edge_own_comp(self):
        canon = [(i, i + 1) for i in range(6)]
        sym = symmetrize(_ds(canon)).materialize()
        got = biconnected_components(sym, 7).to_pandas()
        assert _got_partition(got) == _bcc_oracle(canon)
        assert got["comp"].nunique() == 6

    def test_parallelism_invariant(self):
        rng = np.random.default_rng(3)
        canon = sorted(
            {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, 20, (45, 2)) if a != b}
        )
        sym = symmetrize(_ds(canon)).materialize()
        a = biconnected_components(sym, 20, num_parts=2).to_pandas()
        b = biconnected_components(sym, 20, num_parts=5).to_pandas()
        sa = a.sort_values(["src", "dst"]).reset_index(drop=True)
        sb = b.sort_values(["src", "dst"]).reset_index(drop=True)
        assert sa.equals(sb)


def test_driver_limit_guard(ray_session):
    import pytest

    e = rd.from_arrow(
        pa.table({"src": pa.array([0, 1]), "dst": pa.array([1, 0])})
    )
    with pytest.raises(ValueError, match="driver_limit"):
        biconnected_components(e, 2, driver_limit=1)
