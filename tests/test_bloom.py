"""Bloom filter: no false negatives, bounded false positives, determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.common.bloom import bloom_probe, build_bloom


def _keys_ds(keys):
    return rd.from_arrow(pa.table({"k": pa.array(np.asarray(keys, np.int64))}))


class TestBloom:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(5)
        members = np.unique(rng.integers(0, 1 << 40, 5000))
        ds = _keys_ds(members).repartition(7).materialize()
        ref = build_bloom(ds, "k", m_bits=1 << 18, num_hashes=4)
        probed = bloom_probe(ds, "k", ref, m_bits=1 << 18, num_hashes=4).to_pandas()
        assert probed["maybe_member"].all()

    def test_false_positive_rate_bounded(self):
        rng = np.random.default_rng(6)
        members = np.unique(rng.integers(0, 1 << 40, 5000))
        others = np.unique(rng.integers(1 << 41, 1 << 42, 20000))
        ref = build_bloom(_keys_ds(members).materialize(), "k", m_bits=1 << 18, num_hashes=4)
        probed = bloom_probe(
            _keys_ds(others).materialize(), "k", ref, m_bits=1 << 18, num_hashes=4
        ).to_pandas()
        fp = probed["maybe_member"].mean()
        # n=5000, m=2^18, k=4 -> theoretical fp ~ (1-e^{-kn/m})^k ~ 3.3e-5
        assert fp < 0.005, fp

    def test_deterministic_across_partitioning(self):
        rng = np.random.default_rng(7)
        members = np.unique(rng.integers(0, 1 << 30, 2000))
        import ray

        a = ray.get(build_bloom(_keys_ds(members).materialize(), "k", m_bits=1 << 16))
        b = ray.get(
            build_bloom(
                _keys_ds(members).repartition(9).materialize(), "k", m_bits=1 << 16
            )
        )
        np.testing.assert_array_equal(a, b)

    def test_seed_changes_filter(self):
        import ray

        members = np.arange(1000)
        ds = _keys_ds(members).materialize()
        a = ray.get(build_bloom(ds, "k", m_bits=1 << 16, seed=1))
        b = ray.get(build_bloom(ds, "k", m_bits=1 << 16, seed=2))
        assert not np.array_equal(a, b)
