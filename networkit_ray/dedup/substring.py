"""Exact duplicated-substring dedup (ExactSubstr-style, token windows).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022) removes exact duplicated substrings of ≥ N tokens across the whole
corpus, keeping one canonical copy.  Their single-box implementation
builds a corpus suffix array; this operator re-expresses the semantics
Ray-Data-first over sliding token windows:

- a document's windows are its consecutive ``min_len``-token runs at
  every position (stride 1) — token boundaries are single spaces,
  exactly ``text.split(' ')`` (empty tokens from repeated spaces
  included, matching the segment-dedup convention and the SQL twin's
  ``string_split``);
- a window LOSES iff the same token sequence occurs at a smaller
  (doc_id, pos) anywhere in the corpus — global deterministic
  first-wins, one hash exchange;
- token-level masking: a token is KEPT iff no window covers it (a doc
  shorter than ``min_len`` tokens is untouched) or at least one covering
  window survived.  Interior tokens of a duplicated region lose every
  covering window and are removed; boundary tokens shared with
  non-duplicated context are kept — the canonical occurrence (the
  first) keeps all of its windows, hence all of its tokens.

Scale shape (mirrors dedup/lines.py — no window text ever crosses a
shuffle):

1. explode: per-doc token hashes (one vectorized pass over the Arrow
   string buffer), Rabin–Karp rolling 64-bit window fingerprints under
   TWO independent keys (prefix[p+L] − prefix[p]·K^L in wrapping uint64
   — base cancels, so one global prefix array serves every doc), and
   ``packed = doc_id·2²⁰ + pos``: 24 bytes per window on the wire.
2. first-wins: ONE ``exchange_unique`` on (h1, h2) with a native
   min(packed) map-side combiner.
3. reassembly: co-partition winners and documents by doc_id; per doc,
   the win mask → sliding-any coverage via one cumulative sum → kept
   tokens selected from the zero-copy token array and joined per doc in
   Arrow.

Limits (checked): ``pos < 2²⁰`` (≈1M tokens per document) and
``doc_id < 2⁴³`` — same packed-key envelope as segment_dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from networkit_ray.common.exchange import (
    _default_parts,
    exchange_unique,
    partition_refs,
)
from networkit_ray.dedup.lines import (
    _MAX_DOC_ID,
    _MAX_SEG_NO,
    _SEG_NO_BITS,
    _segment_table,
)

_RK_MULT = np.uint64(0x9E3779B97F4A7C17)  # odd → invertible mod 2^64
_TKEY1 = "nkrsubstr-tkey01"
_TKEY2 = "nkrsubstr-tkey02"

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string())])


def _token_hashes(texts: pa.Array, hash_key: str) -> tuple[np.ndarray, np.ndarray]:
    """(per-token uint64 hashes, tokens-per-doc counts) for a batch."""
    rep_idx, _, toks = _segment_table(texts, "words", 1)
    n_docs = len(texts) if not isinstance(texts, pa.ChunkedArray) else texts.length()
    counts = np.bincount(rep_idx, minlength=n_docs)
    arr = toks.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(arr, hash_key=hash_key, categorize=False).astype(
        np.uint64
    )
    return h, counts


def _window_hashes(h: np.ndarray, counts: np.ndarray, L: int):
    """Position-invariant fingerprints of every valid L-token window.

    Fully vectorized telescoping form of Rabin–Karp in wrapping uint64:
    with S[n] = Σ_{t<n} h[t]·K^{−1−t} (one cumsum over inverse powers),

        wh(p) = (S[p+L] − S[p]) · K^p = Σ_{i<L} h[p+i]·K^{−1−i},

    a function of the window CONTENT alone — equal windows hash equal
    across positions and documents.  The difference of two distinct
    windows is a nonzero odd-coefficient linear form of independent
    uniform token hashes, so pairwise collisions are ~2⁻⁶⁴ per key.
    One global prefix serves every doc (only in-doc positions with
    p + L ≤ doc end are emitted).  Returns (wh, doc_idx, pos).
    """
    T = len(h)
    invK = np.uint64(pow(int(_RK_MULT), -1, 1 << 64))
    invp = np.cumprod(np.full(T, invK, np.uint64))  # invK^{1..T}, wraps
    S = np.zeros(T + 1, np.uint64)
    np.cumsum(h * invp, out=S[1:])
    Kpow = np.ones(T + 1, np.uint64)
    if T:
        np.cumprod(np.full(T, _RK_MULT, np.uint64), out=Kpow[1:])
    starts = np.cumsum(counts) - counts
    k_d = np.maximum(counts - L + 1, 0)
    W = int(k_d.sum())
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), k_d)
    first_w = np.cumsum(k_d) - k_d
    pos = np.arange(W, dtype=np.int64) - np.repeat(first_w, k_d)
    p_glob = np.repeat(starts, k_d) + pos
    wh = (S[p_glob + L] - S[p_glob]) * Kpow[p_glob]
    return wh, doc_idx, pos


def _explode_windows(L: int):
    def explode(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc_ids) and int(doc_ids.max()) >= _MAX_DOC_ID:
            raise ValueError(
                "substring_dedup: doc_id overflows the packed key; "
                "renumber documents densely"
            )
        if not len(doc_ids):
            return pa.table(
                {"h1": pa.array([], pa.uint64()),
                 "h2": pa.array([], pa.uint64()),
                 "packed": pa.array([], pa.int64())}
            )
        h1, counts = _token_hashes(t["text"], _TKEY1)
        h2, _ = _token_hashes(t["text"], _TKEY2)
        if int(counts.max()) >= _MAX_SEG_NO:
            raise ValueError(
                "substring_dedup: a document exceeds 2^20 tokens; "
                "split it upstream"
            )
        w1, doc_idx, pos = _window_hashes(h1, counts, L)
        w2, _, _ = _window_hashes(h2, counts, L)
        packed = (doc_ids[doc_idx] << _SEG_NO_BITS) + pos
        return pa.table(
            {"h1": pa.array(w1, pa.uint64()),
             "h2": pa.array(w2, pa.uint64()),
             "packed": pa.array(packed, pa.int64())}
        )

    return explode


@ray.remote
def _mask_part(L: int, n_w: int, *tables) -> pa.Table:
    """Per doc-partition: win mask → sliding-any coverage → kept tokens
    re-derived from the zero-copy token array and joined in Arrow."""
    import pyarrow.compute as pc

    wt = [t for t in tables[:n_w] if t is not None and t.num_rows]
    dt = [t for t in tables[n_w:] if t is not None and t.num_rows]
    if not dt:
        return _OUT_SCHEMA.empty_table()
    d = pa.concat_tables(dt, promote_options="default")
    d_ids = d["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(d_ids)
    d_ids = d_ids[order]
    texts = d["text"].take(pa.array(order))
    rep_idx, _, toks = _segment_table(texts, "words", 1)
    counts = np.bincount(rep_idx, minlength=len(d_ids))
    tok_base = np.cumsum(counts) - counts
    k_d = np.maximum(counts - L + 1, 0)  # windows per doc
    win_base = np.cumsum(k_d) - k_d
    W = int(k_d.sum())
    win = np.zeros(W, np.int64)
    if wt:
        w = pa.concat_tables(wt, promote_options="default")
        wdoc = w["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wpos = w["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.searchsorted(d_ids, wdoc)
        win[win_base[rows] + wpos] = 1
    # kept[t] = (no window covers t) or any(win[p] for p in the covering
    # range [max(0, t-L+1), min(t, T-L)]); sliding-any via one cumsum
    cs = np.zeros(W + 1, np.int64)
    np.cumsum(win, out=cs[1:])
    T_total = int(counts.sum())
    doc_of_tok = np.repeat(np.arange(len(d_ids), dtype=np.int64), counts)
    tpos = np.arange(T_total, dtype=np.int64) - np.repeat(tok_base, counts)
    T_d = counts[doc_of_tok]
    covered = T_d >= L
    lo = np.maximum(tpos - L + 1, 0)
    hi = np.minimum(tpos, T_d - L)
    base = win_base[doc_of_tok]
    kept = ~covered
    c_idx = np.flatnonzero(covered)
    if len(c_idx):
        a = base[c_idx] + lo[c_idx]
        b = base[c_idx] + hi[c_idx] + 1
        kept[c_idx] = (cs[b] - cs[a]) > 0
    sel = np.flatnonzero(kept)
    if not len(sel):
        return _OUT_SCHEMA.empty_table()
    # per-doc kept-token counts → docs with ≥1 kept token survive
    kc = np.bincount(doc_of_tok[sel], minlength=len(d_ids))
    alive = np.flatnonzero(kc > 0)
    chosen = toks.take(pa.array(sel))
    offs = np.r_[0, np.cumsum(kc[alive])].astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), chosen)
    clean = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
    return pa.table(
        {"doc_id": pa.array(d_ids[alive], pa.int64()),
         "clean_text": clean.cast(pa.string())}
    )


def substring_dedup(
    docs: ray.data.Dataset,
    *,
    min_len: int = 8,
) -> ray.data.Dataset:
    """(doc_id, clean_text): duplicated ≥``min_len``-token substrings
    removed corpus-wide, first occurrence kept (ExactSubstr semantics
    re-expressed as sliding-window first-wins + token masking — see the
    module docstring for the exact rule)."""
    if min_len < 2:
        raise ValueError("min_len must be ≥ 2")
    hashed = docs.map_batches(_explode_windows(min_len), batch_format="pyarrow")
    schema = pa.schema(
        [("h1", pa.uint64()), ("h2", pa.uint64()), ("packed", pa.int64())]
    )
    first = exchange_unique(
        hashed, ["h1", "h2"], agg=[("packed", "min")], schema=schema
    )

    def unpack(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(packed >> _SEG_NO_BITS, pa.int64()),
             "pos": pa.array(packed & (_MAX_SEG_NO - 1), pa.int64())}
        )

    winners = first.map_batches(unpack, batch_format="pyarrow")
    P = _default_parts()
    wsl = partition_refs(winners, ["doc_id"], P)
    dsl = partition_refs(docs, ["doc_id"], P)
    out = [
        _mask_part.remote(
            min_len, len(wsl), *[s[p] for s in wsl], *[s[p] for s in dsl]
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)
