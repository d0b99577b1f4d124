"""Weighted-graph BSP path: weighted PageRank and weighted PLP vs refs."""

import numpy as np
import pyarrow as pa
import ray.data

import ref_oracles as ref
from networkit_ray.graph.pagerank import pagerank
from networkit_ray.graph.plp import plp


def weighted_ds(arr, w):
    arr = np.asarray(arr, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table({"src": arr[:, 0], "dst": arr[:, 1], "w": np.asarray(w, np.float64)})
    )


def test_weighted_pagerank_vs_ref():
    rng = np.random.default_rng(9)
    e = np.unique(rng.integers(0, 70, size=(400, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    w = rng.uniform(0.5, 5.0, len(e))
    scores, _ = pagerank(
        weighted_ds(e, w), 70, weighted=True, num_parts=3, tol=0.0, max_iterations=30
    )
    got = scores.to_pandas().sort_values("v")["score"].to_numpy()
    expect = ref.pagerank_weighted_ref(e, w, 70, max_iterations=30)
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_weighted_plp_vs_ref():
    rng = np.random.default_rng(10)
    e = np.unique(rng.integers(0, 40, size=(200, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
    # weight symmetric: depends on unordered pair
    w = ((sym[:, 0] + sym[:, 1]) % 5 + 1).astype(np.float64)
    labels, _ = plp(
        weighted_ds(sym, w), 40, weighted=True, num_parts=3,
        update_threshold=0, max_iterations=20,
    )
    got = labels.to_pandas().sort_values("v")["label"].to_numpy()
    expect, _ = ref.plp_ref(sym, 40, w=w, max_iterations=20)
    assert np.array_equal(got, expect)
