"""Seeded sampling ops + wedge-sampling approximate clustering coefficient."""

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.build import symmetrize
from networkit_ray.graph.sampling import (
    approx_global_clustering,
    random_edge,
    sample_edges,
    sample_nodes,
)


def ds_of(e):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )


class TestSampling:
    def test_sample_edges_deterministic_fraction(self):
        rng = np.random.default_rng(1)
        e = np.unique(rng.integers(0, 200, size=(2000, 2)), axis=0)
        e = [tuple(x) for x in e if x[0] != x[1]]
        ds = ds_of(e)
        a = sample_edges(ds, 0.3, seed=1).to_pandas().sort_values(["src", "dst"])
        b = sample_edges(ds.repartition(7), 0.3, seed=1).to_pandas().sort_values(["src", "dst"])
        assert np.array_equal(a.to_numpy(), b.to_numpy())
        frac = len(a) / len(e)
        assert 0.25 < frac < 0.35

    def test_sample_nodes_and_random_edge(self):
        s = sample_nodes(100, 10, seed=3)
        assert len(s) == 10 and len(np.unique(s)) == 10
        assert np.array_equal(s, sample_nodes(100, 10, seed=3))
        e = [(0, 1), (1, 2), (2, 3), (3, 4)]
        r1 = random_edge(ds_of(e), seed=5).to_pandas()
        r2 = random_edge(ds_of(e).repartition(3), seed=5).to_pandas()
        assert r1.values.tolist() == r2.values.tolist()
        assert len(r1) == 1


class TestApproxCC:
    def test_clique_and_star(self):
        clique = [(i, j) for i in range(10) for j in range(i + 1, 10)]
        sym = symmetrize(ds_of(clique)).materialize()
        gcc, _ = approx_global_clustering(sym, 10, n_samples=300)
        assert gcc == 1.0
        star = [(0, i) for i in range(1, 10)]
        sym2 = symmetrize(ds_of(star)).materialize()
        gcc2, _ = approx_global_clustering(sym2, 10, n_samples=300)
        assert gcc2 == 0.0

    def test_close_to_exact_and_invariant(self):
        rng = np.random.default_rng(1)
        e = np.unique(rng.integers(0, 60, size=(400, 2)), axis=0)
        e = [tuple(x) for x in e if x[0] != x[1]]
        A = np.zeros((60, 60), bool)
        for s, d in e:
            A[s, d] = True
            A[d, s] = True
        deg = A.sum(1)
        wedges = (deg * (deg - 1) / 2).sum()
        tri = np.trace(np.linalg.matrix_power(A.astype(np.int64), 3)) / 6
        exact = 3 * tri / wedges
        sym = symmetrize(ds_of(e)).materialize()
        gcc, _ = approx_global_clustering(sym, 60, n_samples=4000, seed=7)
        assert abs(gcc - exact) < 0.03
        # partition-invariant sample set
        a, _ = approx_global_clustering(sym.repartition(3).materialize(), 60, n_samples=500, seed=7)
        b, _ = approx_global_clustering(sym.repartition(11).materialize(), 60, n_samples=500, seed=7)
        assert a == b
