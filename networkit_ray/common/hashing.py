"""Stable hashing / partitioning / rounding primitives.

The reference keys vertices by dense uint32 ids assigned serially at read
time (networkit/cpp/io/EdgeListReader.cpp:30-35 builds an in-memory
string->id map).  A serial id map is inherently sequential, so at web scale
we derive ids by *stable hashing* instead: ``hash64(normalized_url)``.
Everything that partitions data (CSR blocks, vertex state, message routing)
goes through :func:`vpart` so all stages agree on placement.
"""

from __future__ import annotations

import hashlib

import numpy as np

_GOLD = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / phi — Fibonacci multiplicative hash


def hash64(s: str | bytes) -> int:
    """Stable 64-bit id for a string key (url, document text, ...).

    blake2b is deterministic across processes/machines (unlike Python's
    ``hash``), which makes ids reproducible across runs, cluster sizes and
    resume-from-checkpoint.
    """
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def hash64_array(strings) -> np.ndarray:
    """Vectorized-ish hash64 over an iterable of strings → uint64 ndarray.

    String hashing is inherently per-item; this runs once per *extraction*
    batch (not in the numeric hot path) inside map_batches workers.
    """
    out = np.empty(len(strings), dtype=np.uint64)
    h = hashlib.blake2b
    for i, s in enumerate(strings):
        if isinstance(s, str):
            s = s.encode("utf-8", "surrogatepass")
        out[i] = int.from_bytes(h(s, digest_size=8).digest(), "little")
    return out


def vpart(v: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id for vertex ids (uint64-safe multiplicative hash).

    Used consistently for: CSR block placement (by src), vertex-state
    placement, and message routing (by dst).  Dense ids and hash-derived ids
    both spread uniformly.
    """
    h = np.asarray(v).astype(np.uint64, copy=False) * _GOLD
    return ((h >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int64)


def round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """Round-half-away-from-zero, matching DuckDB's ROUND semantics.

    numpy rounds half-to-even; oracle comparison requires identical rounding
    on both sides for float-valued query outputs.
    """
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
