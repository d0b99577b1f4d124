"""Clique operators vs brute-force oracles."""

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.cliques import clique_counts, maximal_cliques


def _random_canon(seed, n, m):
    rng = np.random.default_rng(seed)
    edges = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).materialize()
    return ds, edges


def _bk_all(n, edges):
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    out = []

    def bk(R, P, X):
        if not P and not X:
            out.append(frozenset(R))
            return
        pv = max(P | X, key=lambda u: len(adj[u] & P))
        for v in sorted(P - adj[pv]):
            bk(R | {v}, P & adj[v], X & adj[v])
            P = P - {v}
            X = X | {v}

    bk(set(), set(range(n)), set())
    return {c for c in out if len(c) >= 2}


class TestCliqueCounts:
    def test_counts_match_bruteforce(self):
        n = 35
        canon, edges = _random_canon(5, n, 260)
        es = set(edges)

        def is_clique(vs):
            return all(
                (min(a, b), max(a, b)) in es for a, b in itertools.combinations(vs, 2)
            )

        k3 = sum(1 for c in itertools.combinations(range(n), 3) if is_clique(c))
        k4 = sum(1 for c in itertools.combinations(range(n), 4) if is_clique(c))
        assert clique_counts(canon, n) == {"k3": k3, "k4": k4}

    def test_triangle_free(self):
        # path graph: no triangles, no 4-cliques
        edges = [(i, i + 1) for i in range(10)]
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        ).materialize()
        assert clique_counts(ds, 11) == {"k3": 0, "k4": 0}


class TestMaximalCliques:
    def test_matches_bruteforce(self):
        for seed, m in [(7, 220), (11, 90)]:
            n = 40
            canon, edges = _random_canon(seed, n, m)
            exp = _bk_all(n, edges)
            mc = maximal_cliques(canon, n).to_pandas()
            got = {frozenset(g["member"]) for _, g in mc.groupby("clique_id")}
            assert got == exp, (seed, len(got), len(exp))

    def test_parallelism_invariant_sizes(self):
        n = 40
        canon, edges = _random_canon(7, n, 220)
        exp = _bk_all(n, edges)
        mc = maximal_cliques(canon.repartition(7).materialize(), n).to_pandas()
        got = {frozenset(g["member"]) for _, g in mc.groupby("clique_id")}
        assert got == exp
