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
