"""Strongly/weakly connected components vs a dense-closure reference."""

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.scc import (
    strongly_connected_components,
    weakly_connected_components,
)


def scc_ref(edges, n):
    R = np.eye(n, dtype=bool)
    for s, d in edges:
        R[s, d] = True
    for k in range(n):
        R |= np.outer(R[:, k], R[k, :])
    lab = np.empty(n, np.int64)
    for v in range(n):
        lab[v] = np.flatnonzero(R[v] & R[:, v]).min()
    return lab


def ds_of(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in edges], pa.int64()),
                "dst": pa.array([x[1] for x in edges], pa.int64()),
            }
        )
    )


class TestSCC:
    CASES = [
        ([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], 5),  # cycle + tail
        ([(0, 1), (1, 0), (2, 3), (3, 2), (1, 2)], 4),  # two linked 2-cycles
        ([(i, i + 1) for i in range(9)], 10),  # ascending path: 1 round
        ([(i + 1, i) for i in range(9)], 10),  # descending path: worst case
        # (minFW, minBW) pair-collision counterexample: a naive forward/
        # backward min-label pairing would wrongly merge vertices 3 and 4
        ([(5, 3), (5, 4), (3, 0), (4, 0), (0, 1), (1, 0)], 6),
    ]

    def test_golden_cases(self):
        for e, n in self.CASES:
            labels, _ = strongly_connected_components(ds_of(e), n, num_parts=3)
            got = labels.to_pandas().sort_values("v")["label"].to_numpy()
            assert np.array_equal(got, scc_ref(e, n)), (e, n)

    def test_random_and_parallelism_invariance(self):
        rng = np.random.default_rng(5)
        e = np.unique(rng.integers(0, 40, size=(160, 2)), axis=0)
        e = [tuple(x) for x in e if x[0] != x[1]]
        exp = scc_ref(e, 40)
        for P in (2, 5):
            labels, _ = strongly_connected_components(ds_of(e), 40, num_parts=P)
            got = labels.to_pandas().sort_values("v")["label"].to_numpy()
            assert np.array_equal(got, exp)

    def test_wcc_ignores_direction(self):
        labels, _ = weakly_connected_components(ds_of([(0, 1), (2, 3)]), 5)
        got = labels.to_pandas().sort_values("v")["label"].tolist()
        assert got == [0, 0, 2, 2, 4]
