"""ANF effective-diameter approximation: accuracy + determinism."""

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.build import symmetrize
from networkit_ray.graph.diameter import effective_diameter


def ds_of(e):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )


def exact_effective(e, n, ratio=0.9):
    A = np.eye(n, dtype=bool)
    for s, d in e:
        A[s, d] = True
        A[d, s] = True
    R = np.eye(n, dtype=bool)
    curve = [n]
    while True:
        R2 = R | (R @ A)
        if (R2 == R).all():
            break
        R = R2
        curve.append(int(R.sum()))
    target = ratio * curve[-1]
    for t, c in enumerate(curve):
        if c >= target:
            if t == 0 or curve[t] == curve[t - 1]:
                return float(t)
            return (t - 1) + (target - curve[t - 1]) / (curve[t] - curve[t - 1])
    return float(len(curve) - 1)


class TestEffectiveDiameter:
    def test_path_accuracy(self):
        e = [(i, i + 1) for i in range(9)]
        sym = symmetrize(ds_of(e)).materialize()
        eff, info = effective_diameter(sym, 10, ratio=0.9)
        assert info["iterations"] <= 11
        assert abs(eff - exact_effective(e, 10)) < 0.5

    def test_clique_low(self):
        e = [(i, j) for i in range(20) for j in range(i + 1, 20)]
        sym = symmetrize(ds_of(e)).materialize()
        eff, info = effective_diameter(sym, 20)
        assert eff < 1.5 and info["iterations"] <= 3

    def test_partition_invariance(self):
        e = [(i, i + 1) for i in range(9)]
        sym = symmetrize(ds_of(e)).materialize()
        a, _ = effective_diameter(sym, 10, num_parts=2)
        b, _ = effective_diameter(sym, 10, num_parts=7)
        # identical up to float-sum association across partition groupings
        assert abs(a - b) < 1e-9
