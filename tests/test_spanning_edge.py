"""Spanning edge centrality (JL-approx effective resistance) vs pinv oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from networkit_ray.graph.algebraic import spanning_edge_centrality


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in rows], pa.int64()),
                "dst": pa.array([v for u, v in rows], pa.int64()),
            }
        )
    )


def _eff_res_oracle(n, edges):
    L = np.zeros((n, n))
    for u, v in edges:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    Lp = np.linalg.pinv(L)
    return {
        (u, v): Lp[u, u] + Lp[v, v] - 2 * Lp[u, v] for u, v in edges
    }


def test_sec_tree_edges_are_one(ray_session):
    # every edge of a tree has effective resistance exactly 1; the JL
    # sketch's per-edge estimate concentrates around it
    n = 16
    edges = [(i, i + 1) for i in range(n - 1)]
    sym = _ds(edges + [(v, u) for u, v in edges])
    scored, info = spanning_edge_centrality(sym, _ds(edges), n, k=64, tol=1e-10)
    df = scored.to_pandas()
    assert len(df) == n - 1
    np.testing.assert_allclose(df["sec"], 1.0, rtol=0.45)
    assert abs(df["sec"].sum() - (n - 1)) / (n - 1) < 0.2  # Foster's theorem


def test_sec_matches_pinv_within_sketch_error(ray_session):
    rng = np.random.default_rng(5)
    n = 40
    eset = set((i, i + 1) for i in range(n - 1))
    for _ in range(80):
        u, v = rng.integers(0, n, 2)
        if u != v:
            eset.add((int(min(u, v)), int(max(u, v))))
    edges = sorted(eset)
    sym = _ds(edges + [(v, u) for u, v in edges])
    scored, info = spanning_edge_centrality(
        sym, _ds(edges), n, k=64, num_parts=4, tol=1e-10
    )
    df = scored.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exact = _eff_res_oracle(n, edges)
    exp = np.array([exact[(u, v)] for u, v in df[["src", "dst"]].to_numpy()])
    got = df["sec"].to_numpy()
    # JL sketch with k=64: per-edge stderr ≈ sqrt(2/k) ≈ 18%, and this
    # graph's effective resistances span a narrow range, so Pearson r is
    # inherently modest — the informative checks are per-edge relative
    # error and the Foster's-theorem sum (Σ R(e) = n−1 over any connected
    # graph's edge set would need ALL edges; here we compare to pinv).
    rel = np.abs(got - exp) / exp
    assert np.median(rel) < 0.25
    assert rel.max() < 1.0
    assert np.corrcoef(got, exp)[0, 1] > 0.6
    assert abs(got.sum() - exp.sum()) / exp.sum() < 0.15


def test_sec_deterministic_across_partitioning(ray_session):
    n = 20
    edges = [(i, (i + 1) % n) for i in range(n)] + [(0, 10), (5, 15)]
    edges = sorted(set((min(u, v), max(u, v)) for u, v in edges))
    sym = _ds(edges + [(v, u) for u, v in edges])
    a, _ = spanning_edge_centrality(sym, _ds(edges), n, k=32, num_parts=2)
    b, _ = spanning_edge_centrality(sym, _ds(edges), n, k=32, num_parts=7)
    da = a.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    db = b.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    np.testing.assert_allclose(da["sec"], db["sec"], atol=1e-8)


class TestElectricalCloseness:
    def _exact(self, n, edges):
        L = np.zeros((n, n))
        for u, v in edges:
            L[u, u] += 1
            L[v, v] += 1
            L[u, v] -= 1
            L[v, u] -= 1
        Lp = np.linalg.pinv(L)
        diag = np.diag(Lp)
        return diag, (n - 1) / (n * diag + np.trace(Lp))

    def test_matches_pinv_within_sketch_error(self, ray_session):
        from networkit_ray.graph.algebraic import electrical_closeness

        rng = np.random.default_rng(7)
        n = 40
        eset = set((i, i + 1) for i in range(n - 1))
        for _ in range(80):
            u, v = rng.integers(0, n, 2)
            if u != v:
                eset.add((int(min(u, v)), int(max(u, v))))
        edges = sorted(eset)
        sym = _ds(edges + [(v, u) for u, v in edges])
        out, info = electrical_closeness(sym, n, k=64, num_parts=4, tol=1e-12)
        df = out.to_pandas().sort_values("v").reset_index(drop=True)
        diag, clo = self._exact(n, edges)
        # JL sketch: ~sqrt(2/k) per-entry stderr on diag; closeness is
        # smoothed by the shared trace term
        np.testing.assert_allclose(df["diag"], diag, rtol=0.5)
        np.testing.assert_allclose(df["electrical_closeness"], clo, rtol=0.25)
        assert np.corrcoef(df["electrical_closeness"], clo)[0, 1] > 0.85
        assert info["residual"] < 1e-8

    def test_parallelism_invariant(self, ray_session):
        from networkit_ray.graph.algebraic import electrical_closeness

        edges = [(i, i + 1) for i in range(19)] + [(0, 10), (3, 17)]
        sym = _ds(edges + [(v, u) for u, v in edges])
        a, _ = electrical_closeness(sym, 20, k=32, num_parts=2)
        b, _ = electrical_closeness(
            sym.repartition(5).materialize(), 20, k=32, num_parts=5
        )
        pa_ = a.to_pandas().sort_values("v").reset_index(drop=True)
        pb = b.to_pandas().sort_values("v").reset_index(drop=True)
        np.testing.assert_allclose(pa_["electrical_closeness"], pb["electrical_closeness"], atol=1e-9)
