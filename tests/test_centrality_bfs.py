"""Katz / eigenvector / BFS kernels vs numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import ref_oracles as ref
from networkit_ray.graph.bfs import bfs_distances
from networkit_ray.graph.centrality import eigenvector, katz


def ds_of(arr):
    arr = np.asarray(arr, dtype=np.int64)
    return ray.data.from_arrow(pa.table({"src": arr[:, 0], "dst": arr[:, 1]}))


def rand_graph(n, m, seed):
    rng = np.random.default_rng(seed)
    e = np.unique(rng.integers(0, n, size=(m, 2)), axis=0)
    return e[e[:, 0] != e[:, 1]]


class TestKatz:
    def test_fixed_iters_vs_ref(self):
        e = rand_graph(60, 300, 2)
        scores, info = katz(ds_of(e), 60, alpha=0.05, tol=0.0, max_iterations=25, num_parts=3)
        got = scores.to_pandas().sort_values("v")["score"].to_numpy()
        expect = ref.katz_ref(e, 60, alpha=0.05, max_iterations=25)
        np.testing.assert_allclose(got, expect, atol=1e-12)

    def test_convergence(self):
        e = rand_graph(40, 200, 3)
        scores, info = katz(ds_of(e), 40, alpha=0.05, tol=1e-12)
        got = scores.to_pandas().sort_values("v")["score"].to_numpy()
        assert got.min() > 0
        assert np.linalg.norm(got) == pytest.approx(1.0, abs=1e-9)


class TestEigenvector:
    def test_vs_ref(self):
        e = rand_graph(50, 400, 4)
        sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
        scores, _ = eigenvector(ds_of(sym), 50, max_iterations=40, num_parts=3)
        got = scores.to_pandas().sort_values("v")["score"].to_numpy()
        expect = ref.eigenvector_ref(sym, 50, max_iterations=40)
        np.testing.assert_allclose(got, expect, atol=1e-10)


class TestBFS:
    def test_path_graph(self):
        e = np.array([[i, i + 1] for i in range(9)])
        d, info = bfs_distances(ds_of(e), 10, 0, num_parts=2)
        got = d.to_pandas().sort_values("v")["dist"].to_numpy()
        assert list(got) == list(range(10))
        assert info["iterations"] == 10  # 9 improving + 1 fixpoint check

    def test_random_vs_ref_with_unreachable(self):
        e = rand_graph(80, 160, 6)
        d, _ = bfs_distances(ds_of(e), 80, 3, num_parts=3)
        got = d.to_pandas().sort_values("v")["dist"].to_numpy()
        expect = ref.bfs_ref(e, 80, 3)
        assert np.array_equal(got, expect)
        assert (expect == -1).any()  # fixture really exercises unreachable


class TestCCCoarsening:
    def test_long_path_converges_fast(self):
        # path graph: diameter 1500 — plain hash-min needs ~1500 supersteps;
        # pointer jumping converges in O(log²)
        from networkit_ray.graph.components import connected_components

        N = 1500
        e = np.array([[i, i + 1] for i in range(N - 1)])
        sym = np.vstack([e, e[:, ::-1]])
        labels, info = connected_components(ds_of(sym), N, num_parts=3)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        assert (got == 0).all()
        assert info["iterations"] <= 30, info
        assert info.get("jumps", 0) >= 2

    def test_multi_component_with_coarsening(self):
        import ref_oracles as ref
        from networkit_ray.graph.components import connected_components

        # two long paths + isolated vertices
        a = np.array([[i, i + 1] for i in range(0, 399)])
        b = np.array([[i, i + 1] for i in range(500, 899)])
        e = np.vstack([a, b])
        sym = np.vstack([e, e[:, ::-1]])
        labels, info = connected_components(ds_of(sym), 1000, num_parts=2)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        expect = ref.components_ref(sym, 1000)
        assert np.array_equal(got, expect)


class TestCoreDecomposition:
    def test_vs_ref(self):
        import ref_oracles as ref
        from networkit_ray.graph.core import core_decomposition

        rng = np.random.default_rng(13)
        e = np.unique(rng.integers(0, 50, size=(260, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
        cores, info = core_decomposition(ds_of(sym), 50)
        got = cores.to_pandas().sort_values("v")
        assert len(got) == 50
        expect = ref.core_ref(sym, 50)
        assert np.array_equal(got["core"].to_numpy(), expect)
        assert info["max_core"] == expect.max()

    def test_clique_plus_tail(self):
        from networkit_ray.graph.core import core_decomposition

        # K5 (core 4) with a pendant path (core 1)
        k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        tail = [(4, 5), (5, 6), (6, 7)]
        e = np.array(k5 + tail)
        sym = np.vstack([e, e[:, ::-1]])
        cores, _ = core_decomposition(ds_of(sym), 8)
        got = cores.to_pandas().sort_values("v")["core"].to_numpy()
        assert list(got) == [4, 4, 4, 4, 4, 1, 1, 1]


class TestApproxCloseness:
    def test_full_sample_is_exact_harmonic(self):
        import ref_oracles as ref
        from networkit_ray.graph.closeness import approx_harmonic_closeness

        rng = np.random.default_rng(21)
        e = np.unique(rng.integers(0, 30, size=(120, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
        n = 30
        out, info = approx_harmonic_closeness(ds_of(sym), n, sample=n)
        got = out.to_pandas().sort_values("v")
        # exact harmonic via all-pairs BFS
        exact = np.zeros(n)
        for s in range(n):
            d = ref.bfs_ref(sym, n, s)
            pos = d > 0
            exact[pos] += 1.0 / d[pos]
        # estimator of sum over sources of 1/d(s,u); exact at s=n
        np.testing.assert_allclose(got["harmonic"].to_numpy(), exact, atol=1e-12)

    def test_sampled_estimates_bounded(self):
        from networkit_ray.graph.closeness import approx_harmonic_closeness

        e = np.array([[i, i + 1] for i in range(29)])
        sym = np.vstack([e, e[:, ::-1]])
        out, info = approx_harmonic_closeness(ds_of(sym), 30, sample=8)
        df = out.to_pandas()
        assert len(df) == 30
        assert len(info["pivots"]) == 8
        assert (df["closeness"] >= 0).all() and (df["closeness"] <= 1.0).all()


class TestSSSP:
    def test_weighted_golden(self):
        import pyarrow as pa
        import ray.data

        from networkit_ray.graph.bfs import sssp_distances

        # 0→1 (w5), 0→2 (w1), 2→1 (w1): shortest 0→1 is 2.0 via 2
        t = pa.table(
            {
                "src": pa.array([0, 0, 2], pa.int64()),
                "dst": pa.array([1, 2, 1], pa.int64()),
                "w": [5.0, 1.0, 1.0],
            }
        )
        d, info = sssp_distances(ray.data.from_arrow(t), 4, source=0)
        got = d.to_pandas().sort_values("v")["dist"].tolist()
        assert got == [0.0, 2.0, 1.0, -1.0]

    def test_vs_scipy_free_reference(self):
        import pyarrow as pa
        import ray.data

        from networkit_ray.graph.bfs import sssp_distances

        rng = np.random.default_rng(9)
        n = 30
        e = np.unique(rng.integers(0, n, size=(120, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        w = ((e[:, 0] + e[:, 1]) % 5 + 1).astype(np.float64)
        # Bellman-Ford reference
        INF = np.inf
        dist = np.full(n, INF)
        dist[0] = 0.0
        for _ in range(n):
            nd = dist.copy()
            np.minimum.at(nd, e[:, 1], dist[e[:, 0]] + w)
            if np.array_equal(
                np.nan_to_num(nd, posinf=-1), np.nan_to_num(dist, posinf=-1)
            ):
                break
            dist = nd
        exp = np.where(np.isfinite(dist), dist, -1.0)
        t = pa.table(
            {
                "src": pa.array(e[:, 0], pa.int64()),
                "dst": pa.array(e[:, 1], pa.int64()),
                "w": w,
            }
        )
        d, _ = sssp_distances(ray.data.from_arrow(t), n, source=0, num_parts=3)
        got = d.to_pandas().sort_values("v")["dist"].to_numpy()
        np.testing.assert_allclose(got, exp)


class TestExactHarmonicCloseness:
    def test_matches_allpairs_bfs(self):
        import ref_oracles as ref
        from networkit_ray.graph.closeness import exact_harmonic_closeness

        rng = np.random.default_rng(33)
        e = np.unique(rng.integers(0, 35, size=(130, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
        n = 35
        out = exact_harmonic_closeness(ds_of(sym).materialize(), n, batch_k=8)
        got = out.to_pandas().sort_values("v")
        exact = np.zeros(n)
        for s in range(n):
            d = ref.bfs_ref(sym, n, s)
            pos = d > 0
            exact[pos] += 1.0 / d[pos]
        np.testing.assert_allclose(got["harmonic"].to_numpy(), exact, atol=1e-12)

    def test_parallelism_invariant(self):
        from networkit_ray.graph.closeness import exact_harmonic_closeness

        e = np.array([(i, i + 1) for i in range(14)])
        sym = np.vstack([e, e[:, ::-1]])
        a = exact_harmonic_closeness(ds_of(sym).materialize(), 15, num_parts=2)
        b = exact_harmonic_closeness(
            ds_of(sym).materialize().repartition(5), 15, num_parts=5, batch_k=4
        )
        np.testing.assert_allclose(
            a.to_pandas().sort_values("v")["harmonic"].to_numpy(),
            b.to_pandas().sort_values("v")["harmonic"].to_numpy(),
            atol=1e-12,
        )


class TestIncrementalBFS:
    def test_equals_scratch_after_insertions(self):
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.graph.bfs import bfs_distances, incremental_bfs

        rng = np.random.default_rng(19)
        n = 30
        base = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (50, 2)) if a != b})
        extra = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (25, 2)) if a != b} - set(base))

        def ds(rows):
            return rd.from_arrow(
                pa.table(
                    {
                        "src": pa.array([a for a, b in rows], pa.int64()),
                        "dst": pa.array([b for a, b in rows], pa.int64()),
                    }
                )
            )

        prev, _ = bfs_distances(ds(base), n, 0)
        full = ds(base + extra).materialize()
        inc, info = incremental_bfs(full, n, 0, prev.materialize())
        scratch, _ = bfs_distances(full, n, 0)
        a = inc.to_pandas().sort_values("v")["dist"].to_numpy()
        b = scratch.to_pandas().sort_values("v")["dist"].to_numpy()
        np.testing.assert_array_equal(a, b)


class TestBidirectionalBFS:
    def test_matches_full_bfs(self):
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.graph.bfs import (
            bfs_distances,
            bidirectional_bfs_distance,
        )

        rng = np.random.default_rng(23)
        n = 25
        rows = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (45, 2)) if a != b})
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, b in rows], pa.int64()),
                    "dst": pa.array([b for a, b in rows], pa.int64()),
                }
            )
        ).materialize()
        full, _ = bfs_distances(ds, n, 0)
        dist = dict(
            full.to_pandas()[["v", "dist"]].itertuples(index=False, name=None)
        )
        for t in [1, 5, 12, 24]:
            got, info = bidirectional_bfs_distance(ds, n, 0, t)
            assert got == dist.get(t, -1), (t, got, dist.get(t, -1))

    def test_same_node_zero(self):
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.graph.bfs import bidirectional_bfs_distance

        ds = rd.from_arrow(
            pa.table({"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64())})
        )
        assert bidirectional_bfs_distance(ds, 2, 1, 1)[0] == 0


def test_volume_matches_replica(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.closeness import _pivots, volume

    rng = np.random.default_rng(47)
    n = 40
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (120, 2)) if a != b}
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
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(s):
        d = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if w not in d:
                        d[w] = d[u] + 1
                        nq.append(w)
            q = nq
        return d

    pivots = _pivots(n, 6, 42)
    rs = (1, 2, 3)
    want = {}
    for r in rs:
        want[r] = sum(
            sum(1 for dv in bfs(int(p)).values() if dv <= r) for p in pivots
        ) / len(pivots)
    t = volume(sym, n, rs=rs, sample=6, seed=42)
    got = dict(zip(t["r"].to_pylist(), t["volume"].to_pylist()))
    assert got == want


def test_apsp_and_neighborhood_function_match_replica(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.bfs import apsp_table, neighborhood_function

    rng = np.random.default_rng(53)
    n = 30
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
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(s):
        d = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if w not in d:
                        d[w] = d[u] + 1
                        nq.append(w)
            q = nq
        return d

    want = {}
    for s in range(n):
        for v, dv in bfs(s).items():
            want[(s, v)] = dv
    apsp = apsp_table(sym, n, batch_k=7).materialize()
    got = {(r["s"], r["v"]): r["d"] for r in apsp.take_all()}
    assert got == want

    nf = neighborhood_function(apsp)
    nfd = dict(zip(nf["h"].to_pylist(), nf["nf"].to_pylist()))
    maxd = max(want.values())
    for h in range(1, maxd + 1):
        assert nfd[h] == sum(1 for d in want.values() if 0 < d <= h)


def test_bidirectional_sssp_matches_dijkstra(ray_session):
    import heapq

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.bfs import bidirectional_sssp_distance

    rng = np.random.default_rng(101)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (160, 2)) if a != b})
    ws = [float((a + b) % 7 + 1) for a, b in edges]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array(ws, pa.float64()),
            }
        )
    ).materialize()

    adj = {}
    for (a, b), w in zip(edges, ws):
        adj.setdefault(a, []).append((b, w))

    def dijkstra(s, t):
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, np.inf):
                continue
            if u == t:
                return d
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist.get(v, np.inf):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        return -1.0

    for s, t in [(0, 17), (3, 29), (5, 5), (11, 2), (7, 38)]:
        got, _ = bidirectional_sssp_distance(ds, n, s, t)
        assert got == dijkstra(s, t), (s, t)
