"""GlobalCurveball invariants: degree sequence, simplicity, determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.curveball import global_curveball, seeded_rank


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, b in rows], pa.int64()),
                "dst": pa.array([b for a, b in rows], pa.int64()),
            }
        )
    )


def _random_canon(seed, n, m):
    rng = np.random.default_rng(seed)
    return sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )


def _degrees(pairs, n):
    d = np.zeros(n, np.int64)
    for a, b in pairs:
        d[a] += 1
        d[b] += 1
    return d


class TestSeededRank:
    def test_bijection_various_n(self):
        for n in [1, 2, 7, 16, 33, 100]:
            for seed in [0, 5, 99]:
                r = seeded_rank(np.arange(n), n, seed)
                assert sorted(r.tolist()) == list(range(n)), (n, seed)

    def test_seed_changes_permutation(self):
        n = 64
        a = seeded_rank(np.arange(n), n, 1)
        b = seeded_rank(np.arange(n), n, 2)
        assert not np.array_equal(a, b)


class TestGlobalCurveball:
    def test_invariants_random_graph(self):
        for seed, n, m in [(3, 24, 70), (8, 40, 150)]:
            canon = _random_canon(seed, n, m)
            out = global_curveball(
                _ds(canon).materialize(), n, rounds=6, seed=5
            ).to_pandas()
            pairs = [(r.src, r.dst) for r in out.itertuples(index=False)]
            # same edge count, canonical, simple
            assert len(pairs) == len(canon)
            assert len(set(pairs)) == len(pairs)
            assert all(a < b for a, b in pairs)
            # exact degree sequence preservation
            np.testing.assert_array_equal(
                _degrees(pairs, n), _degrees(canon, n)
            )

    def test_actually_randomizes(self):
        canon = _random_canon(4, 30, 100)
        out = global_curveball(
            _ds(canon).materialize(), 30, rounds=6, seed=9
        ).to_pandas()
        pairs = {(r.src, r.dst) for r in out.itertuples(index=False)}
        assert pairs != set(canon)

    def test_deterministic_across_partitioning(self):
        canon = _random_canon(6, 25, 80)
        a = global_curveball(_ds(canon).materialize(), 25, rounds=3, seed=2).to_pandas()
        b = global_curveball(
            _ds(canon).repartition(7).materialize(), 25, rounds=3, seed=2
        ).to_pandas()
        sa = a.sort_values(["src", "dst"]).reset_index(drop=True)
        sb = b.sort_values(["src", "dst"]).reset_index(drop=True)
        assert sa.equals(sb)

    def test_seed_variation(self):
        canon = _random_canon(6, 25, 80)
        ds = _ds(canon).materialize()
        a = global_curveball(ds, 25, rounds=4, seed=1).to_pandas()
        b = global_curveball(ds, 25, rounds=4, seed=2).to_pandas()
        pa_ = {(r.src, r.dst) for r in a.itertuples(index=False)}
        pb = {(r.src, r.dst) for r in b.itertuples(index=False)}
        assert pa_ != pb
