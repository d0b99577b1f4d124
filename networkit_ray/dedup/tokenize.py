"""Vectorized batch tokenization + 64-bit hashing shared by the dedup family.

The round-1 implementations hashed one token / one shingle at a time with
``hashlib.blake2b`` inside a Python loop — at 100 TB that loop IS the bill.
This module replaces it with whole-batch kernels:

- tokenization: ``pc.utf8_lower`` + ``pc.split_pattern_regex`` (Arrow C++),
  one call per batch — same token semantics as the old ``[A-Za-z0-9_]+``
  regex (split on the complement);
- token hashing: ``pd.util.hash_array`` (vectorized siphash with a fixed
  key — deterministic across processes and machines, independent of
  PYTHONHASHSEED);
- k-gram shingles: a numpy mix/fold over k shifted views of the token-hash
  array — no string concatenation, no per-gram digest.

All functions return flat arrays plus per-document offsets so downstream
kernels (minhash reduceat, simhash bit accumulation) stay vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_EMPTY_DOC = np.uint64(0x632BE59BD9B4E019)  # sentinel shingle for empty docs


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constant set), vectorized."""
    x = (x + _GOLD).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


def token_hashes(
    texts: pa.Array | pa.ChunkedArray, hasher: str = "siphash"
) -> tuple[np.ndarray, np.ndarray]:
    """(hashes: uint64[T], counts: int64[n_docs]) for lowercase word tokens.

    Token semantics match ``re.findall(r"[A-Za-z0-9_]+", text.lower())``.

    ``hasher``: ``"siphash"`` (default) is the vectorized
    ``pd.util.hash_array`` fast path; ``"md5"`` hashes each DISTINCT token
    with md5 and takes the first 8 digest bytes little-endian — exactly
    DuckDB's ``md5_number_upper``, so every hash-derived quantity
    (simhash lanes, minhash signatures, LSH buckets) gains an exact SQL
    twin.  The md5 path loops over the vocabulary (distinct tokens), not
    the token stream, so its cost is bounded by vocabulary size.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), pattern="[^a-z0-9_]+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    counts = np.diff(offsets)
    # splitting leaves "" tokens at doc edges / between runs of separators
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # null texts (shouldn't occur, but be safe): treat as empty docs
    if toks.null_count:
        counts = np.where(
            toks.is_null().to_numpy(zero_copy_only=False), 0, counts
        )
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)[keep]
    kept = flat.filter(pa.array(keep))
    if len(kept) == 0:
        return np.empty(0, np.uint64), np.zeros(n, np.int64)
    if hasher == "md5":
        import hashlib

        arr = kept.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(arr, return_inverse=True)
        hu = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                for s in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        h = hu[inv]
    elif hasher == "siphash":
        h = pd.util.hash_array(kept.to_numpy(zero_copy_only=False)).astype(np.uint64)
    else:
        raise ValueError(f"unknown hasher {hasher!r} (want 'siphash' or 'md5')")
    return h, np.bincount(doc_idx, minlength=n).astype(np.int64)


def shingle_hashes_batch(
    texts: pa.Array | pa.ChunkedArray, k: int = 3, hasher: str = "siphash"
) -> tuple[np.ndarray, np.ndarray]:
    """(shingles: uint64[S], starts: int64[n_docs]) — k-gram shingle hashes.

    Every document contributes ≥1 shingle: documents with < k tokens fold
    all their tokens into a single hash (empty docs get a fixed sentinel),
    so ``np.minimum.reduceat(starts)`` segments are never empty.
    Shingles are NOT deduplicated — duplicates cannot change a min-hash.
    """
    th, counts = token_hashes(texts, hasher)
    n = len(counts)
    starts_tok = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    n_sh = np.maximum(counts - (k - 1), 1)
    out = np.empty(int(n_sh.sum()), dtype=np.uint64)
    out_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]]).astype(np.int64)

    full = counts >= k
    if full.any():
        # rolling fold over k shifted views of the token-hash array; a
        # shingle is valid iff all k tokens belong to the same document
        acc = th.copy()
        for j in range(1, k):
            acc = (acc * _GOLD) ^ np.roll(th, -j)
        acc = _splitmix(acc)
        # gather per-doc valid windows
        doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), counts)
        tok_pos = np.arange(len(th), dtype=np.int64) - starts_tok[doc_of_tok]
        valid = tok_pos < (counts[doc_of_tok] - (k - 1))
        sh_doc = doc_of_tok[valid]
        np.copyto(out, 0)
        idx = out_starts[sh_doc] + (tok_pos[valid])
        out[idx] = acc[valid]

    if (~full).any():
        # short docs: xor-fold whatever tokens exist (sentinel if none)
        doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), counts)
        folded = np.full(n, _EMPTY_DOC, dtype=np.uint64)
        if len(th):
            # xor is associative/commutative → bincount-style segmented xor
            short_mask_tok = counts[doc_of_tok] < k
            if short_mask_tok.any():
                sel_doc = doc_of_tok[short_mask_tok]
                sel_h = th[short_mask_tok]
                acc2 = np.zeros(n, dtype=np.uint64)
                np.bitwise_xor.at(acc2, sel_doc, sel_h)
                has_tok = np.zeros(n, dtype=bool)
                has_tok[sel_doc] = True
                folded[has_tok] = _splitmix(acc2[has_tok])
        short = ~full
        out[out_starts[short]] = folded[short]

    return out, out_starts


def shingle_sets(
    texts: pa.Array | pa.ChunkedArray, k: int = 3, hasher: str = "siphash"
) -> list[np.ndarray]:
    """Per-document sorted-unique shingle arrays (for exact Jaccard verify)."""
    sh, starts = shingle_hashes_batch(texts, k, hasher)
    bounds = np.append(starts, len(sh))
    return [
        np.unique(sh[bounds[i] : bounds[i + 1]]) for i in range(len(starts))
    ]


def pairwise_jaccard(
    texts: pa.Array | pa.ChunkedArray, k: int = 3, hasher: str = "siphash"
) -> np.ndarray:
    """Exact shingle-set Jaccard for n (a, b) pairs, fully vectorized.

    ``texts`` holds 2n documents; doc i pairs with doc n+i.  One segmented
    lexsort dedups shingles within every document, a second counts values
    shared by both sides of each pair — no per-pair Python loop (the
    MinHash verify stage's hot path).  Empty-vs-empty pairs score 1.0,
    matching ``jaccard``'s union==0 convention.
    """
    sh, starts = shingle_hashes_batch(texts, k, hasher)
    m = len(starts)
    n = m // 2
    lens = np.diff(np.append(starts, len(sh)))
    doc = np.repeat(np.arange(m, dtype=np.int64), lens)
    order = np.lexsort((sh, doc))
    sv, dv = sh[order], doc[order]
    keep = np.empty(len(sv), dtype=bool)
    if len(sv):
        keep[0] = True
        keep[1:] = (sv[1:] != sv[:-1]) | (dv[1:] != dv[:-1])
    sv, dv = sv[keep], dv[keep]
    set_sizes = np.bincount(dv, minlength=m)
    pair = dv % n
    order2 = np.lexsort((sv, pair))
    sv2, pv = sv[order2], pair[order2]
    dup = np.zeros(len(sv2), dtype=bool)
    if len(sv2) > 1:
        dup[1:] = (sv2[1:] == sv2[:-1]) & (pv[1:] == pv[:-1])
    inter = np.bincount(pv[dup], minlength=n)[:n] if len(sv2) else np.zeros(n, np.int64)
    union = set_sizes[:n] + set_sizes[n:] - inter
    out = np.ones(n, dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out
