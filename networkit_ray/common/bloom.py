"""Distributed Bloom filter over a Dataset key column.

Reference: auxiliary/BloomFilter.cpp — k salted hash functions over one
bit array (the reference keeps k arrays; a single array with k probes is
the textbook-equivalent layout), insert sets all k positions, membership
requires all k set.  Salts are seed-derived (the reference draws them
from the global PRNG; counter-hash here, so the filter is deterministic
and parallelism-invariant).

Engine shape: each input block builds a LOCAL bit array (vectorized
splitmix probes + np.bitwise_or reductions), then a binary tree of OR
tasks merges them — no driver-side pass over keys, one small (m/8-byte)
object per merge.  The finished filter is a plasma ref read zero-copy by
every downstream ``map_batches`` probe — the broadcast-small-side
pattern for 100 TB-scale pre-filters (e.g. "skip docs already ingested"
without a shuffle join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = np.asarray(x).astype(np.uint64) + _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def _salts(num_hashes: int, seed: int) -> np.ndarray:
    return _splitmix64(
        np.arange(num_hashes, dtype=np.uint64)
        + np.uint64(seed) * np.uint64(0x100000001B3)
    )


def _positions(keys: np.ndarray, salts: np.ndarray, m_bits: int) -> np.ndarray:
    """(len(keys), k) bit positions."""
    with np.errstate(over="ignore"):
        return (
            _splitmix64(keys[:, None] ^ salts[None, :]) % np.uint64(m_bits)
        ).astype(np.int64)


@ray.remote
def _local_bits(t: pa.Table, column: str, m_bits: int, salts: np.ndarray) -> np.ndarray:
    bits = np.zeros(m_bits // 64 + 1, dtype=np.uint64)
    if len(t) and column in t.column_names:
        keys = t[column].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = _positions(keys, salts, m_bits).ravel()
        np.bitwise_or.at(
            bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
        )
    return bits


@ray.remote
def _or_merge(*arrays: np.ndarray) -> np.ndarray:
    out = arrays[0].copy()
    for a in arrays[1:]:
        out |= a
    return out


def build_bloom(
    ds: ray.data.Dataset,
    column: str,
    *,
    m_bits: int = 1 << 22,
    num_hashes: int = 4,
    seed: int = 42,
):
    """Build the filter; returns an ObjectRef to the packed uint64 bit array."""
    salts = _salts(num_hashes, seed)
    parts = [
        _local_bits.remote(r, column, m_bits, salts)
        for r in ds.to_arrow_refs()
    ]
    # binary OR-merge tree (fan-in 8)
    while len(parts) > 1:
        parts = [
            _or_merge.remote(*parts[i : i + 8]) for i in range(0, len(parts), 8)
        ]
    return parts[0]


def bloom_probe(
    ds: ray.data.Dataset,
    column: str,
    bits_ref,
    *,
    m_bits: int = 1 << 22,
    num_hashes: int = 4,
    seed: int = 42,
    out_col: str = "maybe_member",
) -> ray.data.Dataset:
    """Annotate each row with the membership test (no false negatives)."""
    salts = _salts(num_hashes, seed)

    def probe(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)  # zero-copy plasma read per worker
        keys = t[column].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = _positions(keys, salts, m_bits)
        hit = (
            (bits[pos // 64] >> (pos % 64).astype(np.uint64))
            & np.uint64(1)
        ).astype(bool).all(axis=1)
        return t.append_column(out_col, pa.array(hit))

    return ds.map_batches(probe, batch_format="pyarrow")
