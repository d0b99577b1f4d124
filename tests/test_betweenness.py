"""Betweenness: exact-mode equality with a numpy Brandes reference."""

from collections import deque

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.betweenness import estimate_betweenness


def brandes_ref(edges, n):
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    bc = np.zeros(n)
    for s in range(n):
        S = []
        preds = [[] for _ in range(n)]
        sigma = np.zeros(n)
        sigma[s] = 1
        dist = np.full(n, -1)
        dist[s] = 0
        Q = deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = np.zeros(n)
        while S:
            w = S.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def ds_of(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in edges], pa.int64()),
                "dst": pa.array([x[1] for x in edges], pa.int64()),
            }
        )
    )


class TestBetweenness:
    def test_exact_matches_brandes(self):
        cases = [
            ([(0, 1), (1, 2), (2, 3)], 4),
            ([(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0)], 4),
        ]
        rng = np.random.default_rng(3)
        e = np.unique(rng.integers(0, 25, size=(100, 2)), axis=0)
        cases.append(([tuple(x) for x in e if x[0] != x[1]], 25))
        for e, n in cases:
            bc, _ = estimate_betweenness(ds_of(e), n, exact=True, num_parts=3)
            got = bc.to_pandas().sort_values("v")["betweenness"].to_numpy()
            np.testing.assert_allclose(got, brandes_ref(e, n), atol=1e-9)

    def test_sampled_deterministic_and_unbiasedish(self):
        rng = np.random.default_rng(3)
        e = np.unique(rng.integers(0, 25, size=(100, 2)), axis=0)
        e = [tuple(x) for x in e if x[0] != x[1]]
        a, _ = estimate_betweenness(ds_of(e), 25, n_samples=10, num_parts=2)
        b, _ = estimate_betweenness(ds_of(e), 25, n_samples=10, num_parts=5)
        ga = a.to_pandas().sort_values("v")["betweenness"].to_numpy()
        gb = b.to_pandas().sort_values("v")["betweenness"].to_numpy()
        np.testing.assert_allclose(ga, gb)  # partition-count invariant
        exp = brandes_ref(e, 25)
        assert np.corrcoef(ga, exp)[0, 1] > 0.6
