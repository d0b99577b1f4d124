"""Commute-time distance (block-CG Laplacian solve) vs numpy pinv oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from networkit_ray.graph.algebraic import commute_time_distance


def _sym_ds(edges, weights=None):
    src = [u for u, v in edges] + [v for u, v in edges]
    dst = [v for u, v in edges] + [u for u, v in edges]
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    if weights is not None:
        cols["w"] = pa.array(list(weights) + list(weights), pa.float64())
    return rd.from_arrow(pa.table(cols))


def _ctd_oracle(n, edges, weights, pairs):
    L = np.zeros((n, n))
    for (u, v), w in zip(edges, weights):
        L[u, u] += w
        L[v, v] += w
        L[u, v] -= w
        L[v, u] -= w
    vol = L.trace()
    Lp = np.linalg.pinv(L)
    out = []
    for s, t in pairs:
        b = np.zeros(n)
        b[s], b[t] = 1.0, -1.0
        x = Lp @ b
        out.append(np.sqrt(abs(x[s] - x[t]) * vol))
    return out


def test_ctd_path_graph(ray_session):
    # P4 path: effective resistance between ends = 3, vol = 6 → ctd = sqrt(18)
    edges = [(0, 1), (1, 2), (2, 3)]
    t, info = commute_time_distance(_sym_ds(edges), 4, [(0, 3), (0, 1)])
    got = t["ctd"].to_pylist()
    assert got[0] == pytest.approx(np.sqrt(3 * 6), abs=1e-8)
    assert got[1] == pytest.approx(np.sqrt(1 * 6), abs=1e-8)
    assert info["iterations"] <= 10


def test_ctd_weighted_random_matches_pinv(ray_session):
    rng = np.random.default_rng(3)
    n = 30
    eset = {}
    for _ in range(90):
        u, v = rng.integers(0, n, 2)
        if u != v:
            eset[(int(min(u, v)), int(max(u, v)))] = float(rng.integers(1, 5))
    # ensure connectivity with a spanning path
    for i in range(n - 1):
        eset.setdefault((i, i + 1), 1.0)
    edges = list(eset)
    weights = [eset[e] for e in edges]
    pairs = [(0, n - 1), (3, 17), (5, 5 + 1)]
    t, _ = commute_time_distance(
        _sym_ds(edges, weights), n, pairs, weighted=True, num_parts=4
    )
    exp = _ctd_oracle(n, edges, weights, pairs)
    np.testing.assert_allclose(t["ctd"].to_pylist(), exp, atol=1e-7)
