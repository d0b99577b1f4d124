"""Triangles / LCC / modularity / assortativity vs numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import ref_oracles as ref
from networkit_ray.graph.quality import (
    assortativity,
    modularity,
    num_subsets,
    partition_intersection,
    subset_sizes,
)
from networkit_ray.graph.triangles import (
    local_clustering_coefficient,
    triangle_count,
    triangles_per_vertex,
)


def ds_of(arr, cols=("src", "dst")):
    arr = np.asarray(arr, dtype=np.int64)
    return ray.data.from_arrow(pa.table({c: arr[:, i] for i, c in enumerate(cols)}))


def canon(arr):
    arr = np.asarray(arr, dtype=np.int64)
    lo = np.minimum(arr[:, 0], arr[:, 1])
    hi = np.maximum(arr[:, 0], arr[:, 1])
    return np.unique(np.column_stack([lo, hi]), axis=0)


K4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]  # 4 triangles


class TestTriangles:
    def test_k4(self):
        c = canon(K4)
        assert triangle_count(ds_of(c), 4) == 4
        tri = triangles_per_vertex(ds_of(c), 4).to_pandas().sort_values("v")
        assert list(tri["tri"]) == [3, 3, 3, 3]
        lcc = local_clustering_coefficient(ds_of(c), 4).to_pandas().sort_values("v")
        np.testing.assert_allclose(lcc["lcc"], 1.0)

    def test_random_vs_ref(self):
        rng = np.random.default_rng(11)
        e = rng.integers(0, 40, size=(200, 2))
        e = e[e[:, 0] != e[:, 1]]
        c = canon(e)
        expect = ref.triangles_ref(c, 40)
        got = triangles_per_vertex(ds_of(c), 40).to_pandas()
        full = np.zeros(40, dtype=np.int64)
        full[got["v"].to_numpy()] = got["tri"].to_numpy()
        assert np.array_equal(full, expect)
        assert triangle_count(ds_of(c), 40) == expect.sum() // 3

        lcc_expect = ref.lcc_ref(c, 40)
        lcc = local_clustering_coefficient(ds_of(c), 40).to_pandas()
        full_lcc = np.zeros(40)
        full_lcc[lcc["v"].to_numpy()] = lcc["lcc"].to_numpy()
        np.testing.assert_allclose(full_lcc, lcc_expect, atol=1e-12)

    def test_path_has_no_triangles(self):
        c = canon([(0, 1), (1, 2), (2, 3)])
        assert triangle_count(ds_of(c), 4) == 0


class TestQuality:
    def test_modularity_two_cliques(self):
        # two triangles joined by one edge; perfect 2-community split
        edges = canon([(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
        labels = ds_of(
            [(v, 0 if v < 3 else 1) for v in range(6)], cols=("v", "label")
        )
        q = modularity(ds_of(edges), labels, 6)
        # m=7, intra=6, vols: c0 = 2+2+3=7, c1 = 7 → Q = 6/7 - 2*(7/14)^2
        assert q == pytest.approx(6 / 7 - 0.5, abs=1e-12)

    def test_assortativity_matches_numpy(self):
        rng = np.random.default_rng(5)
        e = rng.integers(0, 30, size=(120, 2))
        e = e[e[:, 0] != e[:, 1]]
        c = canon(e)
        sym = np.vstack([c, c[:, ::-1]])
        deg = np.bincount(sym[:, 0], minlength=30)
        x, y = deg[sym[:, 0]], deg[sym[:, 1]]
        expect = np.corrcoef(x, y)[0, 1]
        got = assortativity(ds_of(sym), 30)
        assert got == pytest.approx(expect, abs=1e-9)

    def test_partition_ops(self):
        l1 = ds_of([(0, 10), (1, 10), (2, 20), (3, 20)], cols=("v", "label"))
        l2 = ds_of([(0, 7), (1, 8), (2, 7), (3, 8)], cols=("v", "label"))
        sizes = subset_sizes(l1).to_pandas().sort_values("label")
        assert list(sizes["size"]) == [2, 2]
        assert num_subsets(l1) == 2
        inter = partition_intersection(l1, l2, 4).to_pandas().sort_values("v")
        # cells ascending: (10,7)→0, (10,8)→1, (20,7)→2, (20,8)→3
        assert list(inter["label"]) == [0, 1, 2, 3]


class TestLinkPrediction:
    def test_indices_vs_bruteforce(self):
        import itertools

        import ray.data

        from networkit_ray.graph.build import canonicalize, symmetrize
        from networkit_ray.graph.linkpred import link_prediction_scores

        rng = np.random.default_rng(5)
        n = 25
        edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (60, 2)) if a != b})
        ds = ds_of(edges)
        sym = symmetrize(ds).materialize()
        canon = canonicalize(ds).materialize()
        got = link_prediction_scores(sym, canon).to_pandas()
        gm = {(u, v): r for (u, v), r in zip(zip(got["u"], got["v"]), got.to_dict("records"))}

        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        for u, v in itertools.combinations(range(n), 2):
            cn_set = adj[u] & adj[v]
            if not cn_set or v in adj[u]:
                assert (u, v) not in gm
                continue
            r = gm[(u, v)]
            assert r["cn"] == len(cn_set)
            assert abs(r["jaccard"] - len(cn_set) / len(adj[u] | adj[v])) < 1e-7
            aa = sum(1.0 / np.log(len(adj[m])) for m in cn_set)
            assert abs(r["adamic_adar"] - aa) < 1e-6
            assert r["pref_attach"] == len(adj[u]) * len(adj[v])


class TestStablePartitionNodes:
    def test_vs_bruteforce(self):
        import ray.data

        from networkit_ray.graph.build import symmetrize
        from networkit_ray.graph.quality import stable_partition_nodes

        rng = np.random.default_rng(9)
        n = 30
        edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (70, 2)) if a != b})
        sym = symmetrize(ds_of(edges)).materialize()
        lab = np.arange(n) % 4
        labels = ray.data.from_arrow(
            pa.table({"v": pa.array(np.arange(n, dtype=np.int64)), "label": pa.array(lab.astype(np.int64))})
        )
        got = stable_partition_nodes(sym, labels, n).to_pandas().set_index("v")["stable"]

        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        for v in range(n):
            if not adj[v]:
                assert got[v]  # isolated => stable
                continue
            from collections import Counter

            lw = Counter(lab[u] for u in adj[v])
            own = lw.get(lab[v], 0)
            want = own > 0 and all(
                w < own for l2, w in lw.items() if l2 != lab[v]
            )
            assert bool(got[v]) == want, v


class TestEdgeTriangleScores:
    def test_vs_bruteforce(self):
        from networkit_ray.graph.build import canonicalize
        from networkit_ray.graph.triangles import (
            edge_triangle_scores,
            sparsify_global_threshold,
        )

        rng = np.random.default_rng(4)
        n = 20
        edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (70, 2)) if a != b})
        canon = canonicalize(ds_of(edges)).materialize()
        scored = edge_triangle_scores(canon, n)
        got = {
            (r["src"], r["dst"]): r["tri"] for r in scored.to_pandas().to_dict("records")
        }
        ce = {(min(a, b), max(a, b)) for a, b in edges}
        adj = {v: set() for v in range(n)}
        for a, b in ce:
            adj[a].add(b)
            adj[b].add(a)
        for a, b in ce:
            assert got[(a, b)] == len(adj[a] & adj[b]), (a, b)
        kept = sparsify_global_threshold(scored, 1).to_pandas()
        assert all(t >= 1 for t in kept["tri"])
        assert len(kept) == sum(1 for e, t in got.items() if t >= 1)


def test_jaccard_distance_matches_replica(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.triangles import jaccard_distances

    rng = np.random.default_rng(23)
    n = 40
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (160, 2)) if a != b}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in canon], pa.int64()),
                "dst": pa.array([v for u, v in canon], pa.int64()),
            }
        )
    )
    got = {
        (r["src"], r["dst"]): r["jaccard_distance"]
        for r in jaccard_distances(ds, n).take_all()
    }
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    for a, b in canon:
        tri = len(adj[a] & adj[b])
        want = 1.0 - tri / (len(adj[a]) + len(adj[b]) - tri)
        assert abs(got[(a, b)] - want) < 1e-12, (a, b)
    assert len(got) == len(canon)


def test_adamic_adar_distance_matches_replica(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.triangles import adamic_adar_distances

    rng = np.random.default_rng(29)
    n = 40
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (200, 2)) if a != b}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in canon], pa.int64()),
                "dst": pa.array([v for u, v in canon], pa.int64()),
            }
        )
    )
    got = {
        (r["src"], r["dst"]): r["aa_distance"]
        for r in adamic_adar_distances(ds, n).take_all()
    }
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    assert len(got) == len(canon)
    for a, b in canon:
        s = sum(1.0 / np.log(len(adj[w])) for w in adj[a] & adj[b])
        want = 1.0 / s if s > 0 else -1.0
        assert abs(got[(a, b)] - want) < 1e-12, (a, b)


def test_quadrangle_edge_scores_match_replica(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.triangles import quadrangle_edge_scores

    rng = np.random.default_rng(67)
    n = 30
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (120, 2)) if a != b}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in canon], pa.int64()),
                "dst": pa.array([v for u, v in canon], pa.int64()),
            }
        )
    )
    got = {
        (r["src"], r["dst"]): r["quad"]
        for r in quadrangle_edge_scores(ds, n).take_all()
    }
    adj = collections.defaultdict(set)
    eset = set(canon)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    assert len(got) == len(canon)
    for u, v in canon:
        # brute force: 4-cycles u-v-w-x-u
        q = sum(
            1
            for w in adj[v]
            if w != u
            for x in adj[w]
            if x != v and x != u and x in adj[u]
        )
        assert got[(u, v)] == q, (u, v, got[(u, v)], q)


def test_geometric_mean_scores_match_replica(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.triangles import (
        edge_triangle_scores,
        geometric_mean_scores,
    )

    rng = np.random.default_rng(71)
    n = 30
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (120, 2)) if a != b}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in canon], pa.int64()),
                "dst": pa.array([v for u, v in canon], pa.int64()),
            }
        )
    )
    scored = edge_triangle_scores(ds, n).materialize()
    tri = {(r["src"], r["dst"]): r["tri"] for r in scored.take_all()}
    got = {
        (r["src"], r["dst"]): r["gm_score"]
        for r in geometric_mean_scores(scored, "tri").take_all()
    }
    nodesum = collections.Counter()
    for (u, v), t in tri.items():
        nodesum[u] += t
        nodesum[v] += t
    for (u, v), t in tri.items():
        want = t / np.sqrt(nodesum[u] * nodesum[v]) if t > 0 else 0.0
        assert abs(got[(u, v)] - want) < 1e-12, (u, v)
