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


class TestHopHistogramSampled:
    def test_matches_numpy_bfs(self):
        """Exact sampled hop histogram == per-pivot BFS levels (numpy)."""
        rng = np.random.default_rng(3)
        n = 40
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (120, 2)) if a != b})
        sym = symmetrize(ds_of(e)).materialize()
        from networkit_ray.graph.closeness import _pivots
        from networkit_ray.graph.diameter import hop_histogram_sampled

        got = hop_histogram_sampled(sym, n, sample=5, seed=42).to_pandas()

        A = np.zeros((n, n), dtype=bool)
        for s, d in e:
            A[s, d] = A[d, s] = True
        hist = {}
        for p in _pivots(n, 5, 42):
            dist = np.full(n, -1)
            dist[p] = 0
            frontier = np.zeros(n, bool)
            frontier[p] = True
            lvl = 0
            while frontier.any():
                lvl += 1
                nxt = (A[frontier].any(axis=0)) & (dist < 0)
                dist[nxt] = lvl
                frontier = nxt
            for d_ in dist[dist >= 1]:
                hist[int(d_)] = hist.get(int(d_), 0) + 1
        want = dict(sorted(hist.items()))
        assert dict(zip(got["d"], got["n_pairs"])) == want

    def test_partition_invariance(self):
        e = [(i, i + 1) for i in range(15)]
        sym = symmetrize(ds_of(e)).materialize()
        from networkit_ray.graph.diameter import hop_histogram_sampled

        a = hop_histogram_sampled(sym, 16, sample=4, num_parts=2).to_pandas()
        b = hop_histogram_sampled(sym, 16, sample=4, num_parts=7).to_pandas()
        assert a.equals(b)


def _np_diameter(e, n):
    A = np.zeros((n, n), dtype=bool)
    for s, d in e:
        A[s, d] = True
        A[d, s] = True
    best = 0
    for src in range(n):
        dist = np.full(n, -1)
        dist[src] = 0
        frontier = np.zeros(n, dtype=bool)
        frontier[src] = True
        lvl = 0
        while frontier.any():
            lvl += 1
            nxt = (A[frontier].any(axis=0)) & (dist < 0)
            dist[nxt] = lvl
            frontier = nxt
        best = max(best, int(dist.max()))
    return best


class TestExactDiameter:
    def _ring_chords(self, seed, n, chords):
        rng = np.random.default_rng(seed)
        e = [(i, (i + 1) % n) for i in range(n)]
        e += [
            (int(a), int(b))
            for a, b in rng.integers(0, n, (chords, 2))
            if a != b
        ]
        return list(dict.fromkeys((min(a, b), max(a, b)) for a, b in e))

    def test_matches_bruteforce(self):
        from networkit_ray.graph.diameter import exact_diameter

        for seed, n, chords in [(1, 24, 3), (5, 40, 6), (7, 60, 2)]:
            canon = self._ring_chords(seed, n, chords)
            sym = symmetrize(ds_of(canon)).materialize()
            res = exact_diameter(sym, n)
            assert res["diameter"] == _np_diameter(canon, n), (seed, res)
            # iFUB must beat all-pairs: inspected sources < n
            assert res["bfs_count"] < n

    def test_path_graph(self):
        from networkit_ray.graph.diameter import exact_diameter

        e = [(i, i + 1) for i in range(19)]
        sym = symmetrize(ds_of(e)).materialize()
        assert exact_diameter(sym, 20)["diameter"] == 19

    def test_partition_invariance(self):
        from networkit_ray.graph.diameter import exact_diameter

        canon = self._ring_chords(3, 40, 5)
        sym = symmetrize(ds_of(canon)).materialize()
        a = exact_diameter(sym, 40, num_parts=2)
        b = exact_diameter(sym.repartition(7).materialize(), 40, num_parts=5)
        assert a["diameter"] == b["diameter"]
