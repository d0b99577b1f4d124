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

    def test_explicit_pivots_validated(self):
        import pytest

        e = ds_of([(0, 1), (1, 2), (2, 3)])
        with pytest.raises(ValueError, match="non-empty"):
            estimate_betweenness(e, 4, pivots=np.array([], dtype=np.int64))
        with pytest.raises(ValueError, match=r"\[0, 4\)"):
            estimate_betweenness(e, 4, pivots=[0, 7])
        with pytest.raises(ValueError, match=r"\[0, 4\)"):
            estimate_betweenness(e, 4, pivots=[-1, 2])


def test_adaptive_betweenness_within_eps_of_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.betweenness import (
        adaptive_betweenness,
        estimate_betweenness,
    )

    rng = np.random.default_rng(137)
    n = 30
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (70, 2)) if a != b}
    )
    both = canon + [(b, a) for a, b in canon]
    sym = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()
    exact, _ = estimate_betweenness(sym, n, exact=True)
    ex = {r["v"]: r["betweenness"] for r in exact.take_all()}
    est, info = adaptive_betweenness(sym, n, eps=0.15, delta=0.1, batch=10, seed=3)
    got = {r["v"]: r["betweenness"] for r in est.take_all()}
    assert info["samples"] <= info["bound"]
    assert set(got) == set(ex)
    # normalized error within eps for this seeded run
    norm = n * (n - 1)  # scaled scores / (n * (n-1)) = normalized fraction
    for v in ex:
        assert abs(got[v] - ex[v]) / norm <= 0.15, (v, got[v], ex[v])


def test_adaptive_betweenness_early_stop_on_symmetric_graph(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.betweenness import adaptive_betweenness

    # ring: every vertex equivalent — batch estimates stabilize immediately
    n = 24
    both = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    sym = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()
    _, info = adaptive_betweenness(sym, n, eps=0.1, delta=0.1, batch=8, seed=3)
    assert info["samples"] < info["bound"]


class TestDynBetweenness:
    """centrality/DynApproxBetweenness.cpp analog: retained per-pivot SSSP
    state; an edge-insert batch recomputes only the affected pivots."""

    def _rand_graph(self, n=25, m=90, seed=5):
        rng = np.random.default_rng(seed)
        e = np.unique(rng.integers(0, n, size=(m, 2)), axis=0)
        return [tuple(x) for x in e if x[0] != x[1]], n

    def test_update_matches_full_recompute(self):
        from networkit_ray.graph.betweenness import (
            dyn_betweenness,
            dyn_betweenness_update,
            estimate_betweenness,
        )

        e, n = self._rand_graph()
        base, extra = e[:-6], e[-6:]
        ds0, state, _ = dyn_betweenness(ds_of(base), n, n_samples=10, num_parts=3)
        upd, state2, info = dyn_betweenness_update(state, ds_of(extra))
        full, _ = estimate_betweenness(
            ds_of(base + extra), n, n_samples=10, num_parts=3
        )
        got = upd.to_pandas().sort_values("v")["betweenness"].to_numpy()
        exp = full.to_pandas().sort_values("v")["betweenness"].to_numpy()
        np.testing.assert_allclose(got, exp, atol=1e-9)
        assert 0 <= info["affected_pivots"] <= info["total_pivots"]

    def test_chained_updates_match(self):
        from networkit_ray.graph.betweenness import (
            dyn_betweenness,
            dyn_betweenness_update,
            estimate_betweenness,
        )

        e, n = self._rand_graph(seed=11)
        base, b1, b2 = e[:-8], e[-8:-4], e[-4:]
        _, state, _ = dyn_betweenness(ds_of(base), n, n_samples=8, num_parts=2)
        _, state, _ = dyn_betweenness_update(state, ds_of(b1))
        upd, state, info = dyn_betweenness_update(state, ds_of(b2))
        full, _ = estimate_betweenness(ds_of(e), n, n_samples=8, num_parts=2)
        got = upd.to_pandas().sort_values("v")["betweenness"].to_numpy()
        exp = full.to_pandas().sort_values("v")["betweenness"].to_numpy()
        np.testing.assert_allclose(got, exp, atol=1e-9)

    def test_distant_insert_repairs_nothing(self):
        from networkit_ray.graph.betweenness import (
            dyn_betweenness,
            dyn_betweenness_update,
        )

        # two components: pivots sampled in [0, 30); inserting an edge
        # inside the unreachable far component touches no pivot DAG
        path = [(i, i + 1) for i in range(29)]
        far = [(40, 41), (41, 42)]
        _, state, _ = dyn_betweenness(
            ds_of(path + far), 45, n_samples=6, num_parts=2, seed=1
        )
        from networkit_ray.graph.betweenness import _pivot_ids

        pivots = _pivot_ids(45, 6, 1)
        if all(p < 40 for p in pivots):
            _, _, info = dyn_betweenness_update(state, ds_of([(42, 43)]))
            assert info["affected_pivots"] == 0


def test_adaptive_betweenness_hash_sampler(ray_session):
    """sampler='hash' (the SQL-replayable draw) stays within the same eps
    envelope as the PCG64 default and rejects unknown sampler names."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from networkit_ray.graph.betweenness import (
        adaptive_betweenness,
        estimate_betweenness,
    )

    rng = np.random.default_rng(613)
    n = 24
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (60, 2)) if a != b}
    )
    both = canon + [(b, a) for a, b in canon]
    sym = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()
    exact, _ = estimate_betweenness(sym, n, exact=True)
    ex = {r["v"]: r["betweenness"] for r in exact.take_all()}
    est, info = adaptive_betweenness(
        sym, n, eps=0.2, delta=0.1, batch=8, seed=3, sampler="hash"
    )
    got = {r["v"]: r["betweenness"] for r in est.take_all()}
    assert info["samples"] <= info["bound"]
    norm = n * (n - 1)
    for v in ex:
        assert abs(got[v] - ex[v]) / norm <= 0.2, (v, got[v], ex[v])
    # determinism: the hash draw is partition- and run-independent
    est2, info2 = adaptive_betweenness(
        sym, n, eps=0.2, delta=0.1, batch=8, seed=3, sampler="hash", num_parts=3
    )
    got2 = {r["v"]: r["betweenness"] for r in est2.take_all()}
    assert info2["samples"] == info["samples"]
    for v in got:
        assert abs(got[v] - got2[v]) <= 1e-9
    with pytest.raises(ValueError):
        adaptive_betweenness(sym, n, sampler="bogus")
