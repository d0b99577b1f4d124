"""Distributed kernels vs. single-process numpy oracles (SURVEY.md §5 styles:
tiny golden graphs + cross-implementation equivalence + invariance across
partition counts)."""

import numpy as np
import pytest
import ray.data

import ref_oracles as ref
from networkit_ray.graph.components import connected_components
from networkit_ray.graph.pagerank import pagerank
from networkit_ray.graph.plp import plp
from networkit_ray.sources.derive import derived_edges


def edges_ds(arr):
    arr = np.asarray(arr, dtype=np.int64)
    import pyarrow as pa

    return ray.data.from_arrow(pa.table({"src": arr[:, 0], "dst": arr[:, 1]}))


def sym(arr):
    arr = np.asarray(arr, dtype=np.int64)
    both = np.vstack([arr, arr[:, ::-1]])
    return np.unique(both, axis=0)


# the 20-node / 5-component graph of ConnectedComponentsGTest.cpp:32-63
CC20 = [(0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19), (3, 5), (5, 6),
        (6, 7), (7, 9), (10, 11), (10, 18), (10, 12), (18, 17), (13, 14)]


class TestConnectedComponents:
    def test_cc20_golden(self):
        s = sym(CC20)
        labels, info = connected_components(edges_ds(s), 20, num_parts=3)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        expect = ref.components_ref(s, 20)
        assert np.array_equal(got, expect)
        assert len(np.unique(got)) == 5
        assert got[15] == 15  # isolated node stays a singleton

    def test_invariance_num_parts(self):
        rng = np.random.default_rng(7)
        e = np.unique(rng.integers(0, 60, size=(120, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        s = sym(e)
        expect = ref.components_ref(s, 60)
        for P in (2, 5):
            labels, _ = connected_components(edges_ds(s), 60, num_parts=P)
            got = labels.to_pandas().sort_values("v")["label"].to_numpy()
            assert np.array_equal(got, expect)

    def test_p128_build(self):
        """P far above the CPU count (and above the old hard cap of 64) —
        the range-partitioned build ships no vertex lookup tables, so large
        P must work; many partitions own few or zero vertices."""
        rng = np.random.default_rng(11)
        e = np.unique(rng.integers(0, 200, size=(600, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        s = sym(e)
        expect = ref.components_ref(s, 200)
        labels, _ = connected_components(edges_ds(s), 200, num_parts=128)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        assert np.array_equal(got, expect)


class TestPageRank:
    def test_line3_closed_form(self):
        # 0→1→2 directed path; node 2 dangling
        e = np.array([[0, 1], [1, 2]])
        scores, info = pagerank(edges_ds(e), 3, num_parts=2, tol=1e-12)
        got = scores.to_pandas().sort_values("v")["score"].to_numpy()
        expect, _ = ref.pagerank_ref(e, 3, tol=1e-12)
        np.testing.assert_allclose(got, expect, atol=1e-9)
        assert got.sum() == pytest.approx(1.0, abs=1e-12)

    def test_directed_vs_ref(self):
        rng = np.random.default_rng(42)
        e = np.unique(rng.integers(0, 80, size=(400, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        for normalized in (False, True):
            scores, info = pagerank(
                edges_ds(e), 80, num_parts=3, tol=1e-10, normalized=normalized
            )
            got = scores.to_pandas().sort_values("v")["score"].to_numpy()
            expect, it = ref.pagerank_ref(e, 80, tol=1e-10, normalized=normalized)
            np.testing.assert_allclose(got, expect, atol=1e-6)
            assert info["iterations"] == it

    def test_l2_norm_and_maxiter(self):
        e = np.array([[0, 1], [1, 2], [2, 0], [3, 0]])
        scores, info = pagerank(
            edges_ds(e), 4, num_parts=2, tol=0.0, norm="l2", max_iterations=5
        )
        got = scores.to_pandas().sort_values("v")["score"].to_numpy()
        expect, _ = ref.pagerank_ref(e, 4, tol=0.0, norm="l2", max_iterations=5)
        np.testing.assert_allclose(got, expect, atol=1e-12)
        assert info["iterations"] == 5

    def test_check_every_same_fixpoint(self, sf_tiny):
        # batched convergence checks may overshoot by <k supersteps but land
        # on the same fixpoint within tol
        edges, n = derived_edges(sf_tiny)
        a, ia = pagerank(edges, n, num_parts=2, tol=1e-9)
        b, ib = pagerank(edges, n, num_parts=2, tol=1e-9, check_every=7)
        pa_ = a.to_pandas().sort_values("v")["score"].to_numpy()
        pb = b.to_pandas().sort_values("v")["score"].to_numpy()
        np.testing.assert_allclose(pa_, pb, atol=1e-8)
        assert ib["iterations"] % 7 == 0
        assert ib["iterations"] >= ia["iterations"]
        assert ib["residual"] <= 1e-9

    def test_invariance_num_parts_derived(self, sf_tiny):
        edges, n = derived_edges(sf_tiny)
        a, _ = pagerank(edges, n, num_parts=2, tol=1e-9)
        b, _ = pagerank(edges, n, num_parts=7, tol=1e-9)
        pa_ = a.to_pandas().sort_values("v")["score"].to_numpy()
        pb = b.to_pandas().sort_values("v")["score"].to_numpy()
        np.testing.assert_allclose(pa_, pb, atol=1e-12)

    def test_float32_state_matches_float64(self, sf_tiny):
        # dtype="float32" ships f32 state/messages (halved exchange) with
        # f64 accumulators; final scores are f64 and match within 1e-6
        edges, n = derived_edges(sf_tiny)
        a, _ = pagerank(edges, n, num_parts=3, tol=1e-8)
        b, _ = pagerank(edges, n, num_parts=3, tol=1e-8, dtype="float32")
        pa_ = a.to_pandas().sort_values("v")["score"].to_numpy()
        pb = b.to_pandas().sort_values("v")["score"].to_numpy()
        assert pb.dtype == np.float64
        np.testing.assert_allclose(pa_, pb, atol=1e-6)


class TestPLP:
    def test_planted_partition(self):
        # two 10-cliques joined by nothing → PLP must find 2 communities
        # (property oracle style of CommunityGTest.cpp:52-107)
        cliques = []
        for base in (0, 10):
            for i in range(10):
                for j in range(i + 1, 10):
                    cliques.append((base + i, base + j))
        s = sym(cliques)
        labels, info = plp(edges_ds(s), 20, num_parts=3, update_threshold=0)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        expect, it = ref.plp_ref(s, 20)
        assert np.array_equal(got, expect)
        assert len(np.unique(got)) == 2

    def test_sync_equivalence_random(self):
        rng = np.random.default_rng(3)
        e = np.unique(rng.integers(0, 50, size=(300, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        s = sym(e)
        labels, info = plp(edges_ds(s), 50, num_parts=4, update_threshold=0,
                           max_iterations=30)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        expect, it = ref.plp_ref(s, 50, max_iterations=30)
        assert np.array_equal(got, expect)
        assert info["iterations"] == it


class TestIncrementalCC:
    def test_equals_scratch_after_insertions(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.graph.build import symmetrize
        from networkit_ray.graph.components import (
            connected_components,
            incremental_cc,
        )

        rng = np.random.default_rng(12)
        n, m = 60, 90
        canon = sorted(
            {
                (int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, n, (m, 2))
                if a != b
            }
        )
        base = [e for i, e in enumerate(canon) if i % 5 != 0]
        delta = [e for i, e in enumerate(canon) if i % 5 == 0]
        assert delta

        def ds(rows):
            return rd.from_arrow(
                pa.table(
                    {
                        "src": pa.array([a for a, b in rows], pa.int64()),
                        "dst": pa.array([b for a, b in rows], pa.int64()),
                    }
                )
            )

        prev, _ = connected_components(symmetrize(ds(base)).materialize(), n)
        full_sym = symmetrize(ds(canon)).materialize()
        inc, info = incremental_cc(full_sym, n, prev.materialize())
        scratch, _ = connected_components(full_sym, n)
        a = inc.to_pandas().sort_values("v").reset_index(drop=True)
        b = scratch.to_pandas().sort_values("v").reset_index(drop=True)
        assert a.equals(b)

    def test_chain_merge_fewer_supersteps(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.graph.build import symmetrize
        from networkit_ray.graph.components import (
            connected_components,
            incremental_cc,
        )

        # two long paths merged by ONE new edge: scratch pays the diameter
        # (or the jump rounds), warm-start converges in a couple of rounds
        n = 80
        half = [(i, i + 1) for i in range(39)]
        half += [(i, i + 1) for i in range(40, 79)]

        def ds(rows):
            return rd.from_arrow(
                pa.table(
                    {
                        "src": pa.array([a for a, b in rows], pa.int64()),
                        "dst": pa.array([b for a, b in rows], pa.int64()),
                    }
                )
            )

        prev, _ = connected_components(symmetrize(ds(half)).materialize(), n)
        full = symmetrize(ds(half + [(39, 40)])).materialize()
        # the warm start pays off THROUGH pointer jumping: the old labels
        # are ready-made shortcuts (label[label[u]] collapses the whole
        # absorbed chain the first jump after the merge edge fires)
        inc, info = incremental_cc(
            full, n, prev.materialize(), shortcut_after=1
        )
        scratch, scratch_info = connected_components(full, n, shortcut_after=1)
        assert inc.to_pandas().sort_values("v").reset_index(drop=True).equals(
            scratch.to_pandas().sort_values("v").reset_index(drop=True)
        )
        inc_rounds = info["iterations"] + info["jumps"]
        scr_rounds = scratch_info["iterations"] + scratch_info["jumps"]
        assert inc_rounds < scr_rounds, (info, scratch_info)


class TestWarmStartPageRank:
    def test_same_fixpoint_fewer_iterations(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.graph.pagerank import pagerank, warm_start_pagerank

        rng = np.random.default_rng(21)
        n, m = 80, 300
        e = np.unique(rng.integers(0, n, (m, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]

        def ds(arr):
            return rd.from_arrow(
                pa.table({"src": arr[:, 0], "dst": arr[:, 1]})
            ).materialize()

        base = e[: len(e) - 10]
        prev, _ = pagerank(ds(base), n, tol=1e-12)
        warm, winfo = warm_start_pagerank(
            ds(e), n, prev.materialize(), tol=1e-12
        )
        cold, cinfo = pagerank(ds(e), n, tol=1e-12)
        a = warm.to_pandas().sort_values("v")["score"].to_numpy()
        b = cold.to_pandas().sort_values("v")["score"].to_numpy()
        np.testing.assert_allclose(a, b, atol=1e-10)
        assert winfo["iterations"] < cinfo["iterations"], (winfo, cinfo)


class TestLPDegreeOrdered:
    def test_planted_cliques(self):
        from networkit_ray.graph.plp import lp_degree_ordered

        cliques = []
        for base in (0, 10):
            for i in range(10):
                for j in range(i + 1, 10):
                    cliques.append((base + i, base + j))
        s = sym(cliques)
        labels, info = lp_degree_ordered(
            edges_ds(s), 20, num_parts=3, update_threshold=0
        )
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        assert len(np.unique(got)) == 2
        assert len(np.unique(got[:10])) == 1 and len(np.unique(got[10:])) == 1

    def test_parallelism_invariant(self):
        from networkit_ray.graph.plp import lp_degree_ordered

        rng = np.random.default_rng(8)
        e = np.unique(rng.integers(0, 30, (120, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        s = sym([tuple(x) for x in e])
        a, _ = lp_degree_ordered(edges_ds(s), 30, num_parts=2, update_threshold=0)
        b, _ = lp_degree_ordered(edges_ds(s), 30, num_parts=7, update_threshold=0)
        pa_ = a.to_pandas().sort_values("v")["label"].to_numpy()
        pb = b.to_pandas().sort_values("v")["label"].to_numpy()
        assert np.array_equal(pa_, pb)


def test_warm_start_katz_same_fixpoint_fewer_iterations(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.centrality import katz, warm_start_katz

    rng = np.random.default_rng(83)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (150, 2)) if a != b})
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).materialize()
    raw, info0 = katz(ds, n, alpha=0.05, tol=1e-12, return_raw=True)
    raw = raw.materialize()

    # warm restart on the SAME graph: converges almost immediately
    warm, info1 = warm_start_katz(ds, n, raw, alpha=0.05, tol=1e-12)
    assert info1["iterations"] <= 3 < info0["iterations"]

    # and matches the scratch normalized result
    cold, _ = katz(ds, n, alpha=0.05, tol=1e-12)
    a = {r["v"]: r["score"] for r in warm.take_all()}
    b = {r["v"]: r["score"] for r in cold.take_all()}
    assert set(a) == set(b)
    for v in b:
        assert abs(a[v] - b[v]) < 1e-8

    # perturbed graph: warm start still lands on the scratch fixpoint
    edges2 = [e for e in edges if (e[0] + e[1]) % 5] + [(0, n - 1)]
    ds2 = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges2], pa.int64()),
                "dst": pa.array([e[1] for e in edges2], pa.int64()),
            }
        )
    ).materialize()
    warm2, _ = warm_start_katz(ds2, n, raw, alpha=0.05, tol=1e-12)
    cold2, _ = katz(ds2, n, alpha=0.05, tol=1e-12)
    a2 = {r["v"]: r["score"] for r in warm2.take_all()}
    b2 = {r["v"]: r["score"] for r in cold2.take_all()}
    for v in b2:
        assert abs(a2[v] - b2[v]) < 1e-7


class TestPLPDeltaSupersteps:
    """The delta-superstep path (pinned count histograms + boundary-only
    ±1 messages, graph/plp.py) must stay bit-identical to a full
    recompute on every sweep — it is the default for unweighted graphs."""

    def _graph(self):
        rng = np.random.default_rng(17)
        blocks = rng.integers(0, 8, 400)
        es = []
        u = rng.integers(0, 400, 3000)
        v = rng.integers(0, 400, 3000)
        keep = (blocks[u] == blocks[v]) | (rng.random(3000) < 0.05)
        e = np.stack([u[keep], v[keep]], 1)
        e = np.unique(e, axis=0)
        return sym(e[e[:, 0] != e[:, 1]]), 400

    def test_delta_equals_generic_full_path(self):
        import pyarrow as pa
        import ray.data as rd

        s, n = self._graph()
        # delta path (unweighted default)
        lab, info = plp(edges_ds(s), n, num_parts=5, update_threshold=0,
                        max_iterations=35)
        a = lab.to_pandas().sort_values("v")["label"].to_numpy()
        # generic full path (weighted kernel, unit weights) recomputes the
        # complete histogram every sweep — no delta machinery
        w = rd.from_arrow(pa.table({
            "src": pa.array(s[:, 0].astype(np.int64)),
            "dst": pa.array(s[:, 1].astype(np.int64)),
            "w": pa.array(np.ones(len(s))),
        }))
        lab2, info2 = plp(w, n, weighted=True, num_parts=3,
                          update_threshold=0, max_iterations=35)
        b = lab2.to_pandas().sort_values("v")["label"].to_numpy()
        assert np.array_equal(a, b)
        assert info["iterations"] == info2["iterations"]

    def test_churn_fallback_still_exact(self):
        # tiny threshold forces the 30%-churn fallback to flip between
        # full and delta sweeps; result must match the reference oracle
        s, n = self._graph()
        lab, _ = plp(edges_ds(s), n, num_parts=4, update_threshold=0,
                     max_iterations=12)
        got = lab.to_pandas().sort_values("v")["label"].to_numpy()
        expect, _ = ref.plp_ref(s, n, max_iterations=12)
        assert np.array_equal(got, expect)

    def test_reduce_delta_fuzz_vs_bruteforce(self):
        """Unit-level: _plp_reduce_delta's histogram merge + touched-dst
        argmax vs a dict brute force, 100 random (histogram, delta-batch)
        instances.  The reduce only re-argmaxes dsts whose COMBINED delta
        is nonzero — exact under the invariant labels == argmax(pinned
        histogram), which the harness emulates in its expectation."""
        import ray

        from networkit_ray.graph.plp import _plp_reduce_delta

        rng = np.random.default_rng(0)
        for _ in range(100):
            n = int(rng.integers(3, 30))
            keys = np.unique(
                rng.integers(0, n * n, int(rng.integers(0, 40))).astype(np.int64)
            )
            cnts = rng.integers(1, 5, len(keys)).astype(np.int64)
            labels = rng.integers(0, n, n).astype(np.uint64)
            true = dict(zip(keys.tolist(), cnts.tolist()))
            partials = []
            for _p in range(int(rng.integers(1, 4))):
                dk, dc = [], []
                for _d in range(int(rng.integers(0, 10))):
                    pos_keys = [k for k, v in true.items() if v > 0]
                    if pos_keys and rng.random() < 0.5:
                        k = int(rng.choice(pos_keys))
                        c = -int(rng.integers(1, true[k] + 1))
                    else:
                        k = int(rng.integers(0, n * n))
                        c = int(rng.integers(1, 4))
                    dk.append(k)
                    dc.append(c)
                    true[k] = true.get(k, 0) + c
                if dk:
                    u, inv = np.unique(np.array(dk, np.int64), return_inverse=True)
                    s = np.zeros(len(u), np.int64)
                    np.add.at(s, inv, np.array(dc, np.int64))
                    nz = s != 0
                    partials.append((u[nz], s[nz].astype(np.int32)))
                else:
                    partials.append(
                        (np.empty(0, np.int64), np.empty(0, np.int32))
                    )
            new, chg, hk, hc = ray.get(
                list(_plp_reduce_delta.remote(labels, n, keys, cnts, *partials))
            )
            exp = {k: v for k, v in true.items() if v > 0}
            assert dict(zip(hk.tolist(), hc.tolist())) == exp
            allk: dict = {}
            for k_, c_ in partials:
                for k, c in zip(k_.tolist(), c_.tolist()):
                    allk[k] = allk.get(k, 0) + c
            touched = {k // n for k, v in allk.items() if v != 0}
            expect_lab = labels.copy()
            for d in touched:
                seg = {k % n: v for k, v in exp.items() if k // n == d}
                if seg:
                    mx = max(seg.values())
                    expect_lab[d] = min(
                        l for l, v in seg.items() if v == mx
                    )
            assert np.array_equal(new, expect_lab)
