"""Corpus-level exact segment deduplication (CCNet-style line dedup).

CCNet (Wenzek et al., 2020) removes duplicated *lines* across the whole
corpus before LM training; every repeated line keeps only its first
occurrence and documents are reassembled from their surviving lines.
This operator is that algorithm with a pluggable segmenter:

- ``mode="lines"``: split on newline — the CCNet semantics for real
  crawled pages;
- ``mode="words"``: consecutive ``seg_len``-word windows — the same
  global-first-wins rule for corpora without line structure (the
  synthetic ``documents`` table is a single-line word stream).

First-wins is defined GLOBALLY and deterministically: the surviving
copy of a segment is the one with the smallest (doc_id, seg_no).

Scale shape (100 TB corpus) — NO segment text ever crosses a shuffle:

1. ``map_batches`` explodes each document into segment rows but emits
   only ``(h1, h2, packed)`` where (h1, h2) is a 128-bit incremental
   hash of the segment bytes (two independent 64-bit keys, see
   ``_hash2``; collision odds are ~n²/2¹²⁹ — irrelevant at 10¹² docs)
   and ``packed`` is
   ``doc_id·2²⁰ + seg_no``.  Bytes per segment on the wire: 24, fixed,
   regardless of segment length.
2. First-wins is ONE hash exchange (``exchange_unique``) with a native
   Arrow ``min(packed)`` aggregate — the map side pre-combines per
   task, so a boilerplate segment repeated millions of times shrinks
   to one row per map task before the all-to-all.  No per-group Python
   callback anywhere.
3. Reassembly co-partitions the unpacked winners ``(doc_id, seg_no)``
   and the original documents by ``doc_id`` hash (raw-task exchange)
   and re-derives the surviving segment STRINGS locally by re-splitting
   each surviving document once — cheaper than shipping segment text
   through a second shuffle, and the split is deterministic so the
   reconstructed text is byte-identical to stage 1's view.

Limits (documented, checked): ``seg_no < 2²⁰`` (a million segments per
document ≈ a 100 MB page) and ``doc_id < 2⁴³`` (8.8×10¹² documents);
violating either raises with a sharding hint instead of corrupting the
packed key.
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

_SEG_NO_BITS = 20
_MAX_SEG_NO = 1 << _SEG_NO_BITS
_MAX_DOC_ID = 1 << (63 - _SEG_NO_BITS)
# pandas siphash keys must be exactly 16 characters; two independent keys
# give a 128-bit combined fingerprint.  (The hash is engine-internal:
# first-wins groups by (h1, h2), never by text, and the oracle twin
# groups by the segment STRING.)
_HKEY1 = "nkrsegdedup-key1"
_HKEY2 = "nkrsegdedup-key2"

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string())])


def _segments(text: str, mode: str, seg_len: int) -> list[str]:
    if mode == "lines":
        return text.split("\n")
    toks = text.split(" ")
    return [" ".join(toks[i : i + seg_len]) for i in range(0, len(toks), seg_len)]


def explode_segments(
    docs: ray.data.Dataset,
    *,
    mode: str = "words",
    seg_len: int = 8,
) -> ray.data.Dataset:
    """documents(doc_id, text) → (doc_id, seg_no, seg) rows."""
    if mode not in ("words", "lines"):
        raise ValueError(mode)

    def explode(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "seg_no": pa.array([], pa.int64()),
                 "seg": pa.array([], pa.string())}
            )
        rep_idx, seg_no, segs = _segment_table(t["text"], mode, seg_len)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(doc[rep_idx]),
             "seg_no": pa.array(seg_no),
             "seg": segs.cast(pa.string())}
        )

    return docs.map_batches(explode, batch_format="pyarrow")


def _segment_table(
    texts: pa.Array, mode: str, seg_len: int
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Vectorized segmenter: (rep_idx, seg_no, segments) for a batch.

    A ``seg_len``-token window of ``text.split(sep)`` IS the substring
    between every ``seg_len``-th separator byte, so segmentation never
    touches Python strings: find separator byte positions in the Arrow
    data buffer with numpy, keep every L-th as a window boundary
    (L = ``seg_len`` for words mode, 1 for lines mode), delete the
    boundary bytes (one masked copy) and rebuild a large_string array
    from the computed offsets — the concatenation of a doc's segments is
    its text minus the boundary separators.  Exactly matches the Python
    ``_segments`` loop, including empty tokens from repeated separators
    and the single empty segment of an empty text.
    """
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if arr.null_count:
        arr = pa.compute.fill_null(arr, "")
    arr = arr.cast(pa.large_string())
    n = len(arr)
    off = np.frombuffer(arr.buffers()[1], np.int64, count=n + 1, offset=arr.offset * 8)
    base = off[0]
    buf = np.frombuffer(arr.buffers()[2], np.uint8)[base : off[-1]]
    off = off - base
    sep = np.uint8(10 if mode == "lines" else 32)
    L = 1 if mode == "lines" else seg_len
    sp = np.flatnonzero(buf == sep)
    if len(sp):
        # per-BOUNDARY arithmetic (#spaces/L elements), never per-space:
        # doc d's spaces are sp[c[d]:c[d+1]]; its boundaries are every
        # L-th of those, i.e. sp[c[d] + L·i + (L-1)] for i < k_d
        c = np.searchsorted(sp, off)  # n+1 probes into the space list
        k_d = (c[1:] - c[:-1]) // L
        K = int(k_d.sum())
        fk = np.cumsum(k_d) - k_d
        bidx = (
            np.repeat(c[:-1] + (L - 1), k_d)
            + L * (np.arange(K, dtype=np.int64) - np.repeat(fk, k_d))
        )
        B = sp[bidx]
    else:
        B = np.empty(0, np.int64)
        k_d = np.zeros(n, np.int64)
    c_d = k_d + 1  # segments per doc
    S = int(c_d.sum())
    ends = np.empty(S, np.int64)
    starts = np.empty(S, np.int64)
    cum = np.cumsum(c_d)
    last = cum - 1
    first = cum - c_d
    not_last = np.ones(S, bool)
    not_last[last] = False
    ends[not_last] = B  # B is (doc, position)-ordered = non-last segs in order
    ends[last] = off[1:]
    not_first = np.ones(S, bool)
    not_first[first] = False
    starts[not_first] = B + 1
    starts[first] = off[:-1]
    lens = ends - starts
    new_off = np.empty(S + 1, np.int64)
    new_off[0] = 0
    np.cumsum(lens, out=new_off[1:])
    new_buf = np.delete(buf, B) if len(B) else buf
    segs = pa.Array.from_buffers(
        pa.large_string(), S,
        [None, pa.py_buffer(np.ascontiguousarray(new_off)),
         pa.py_buffer(np.ascontiguousarray(new_buf))],
    )
    rep_idx = np.repeat(np.arange(n, dtype=np.int64), c_d)
    seg_no = np.arange(S, dtype=np.int64) - np.repeat(first, c_d)
    return rep_idx, seg_no, segs


def _hash2(segs: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit fingerprints of a string array (pandas'
    C-level vectorized SipHash with two 16-char keys → a 128-bit
    combined key; deterministic across workers, no extra deps — the one
    Python-object materialization left in this stage)."""
    arr = segs.to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(arr, hash_key=_HKEY1, categorize=False).astype(np.uint64)
    h2 = pd.util.hash_array(arr, hash_key=_HKEY2, categorize=False).astype(np.uint64)
    return h1, h2


def _explode_hashed(mode: str, seg_len: int):
    """Batch fn: (doc_id, text) → (h1: uint64, h2: uint64, packed: int64)."""

    def explode(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc_ids) and int(doc_ids.max()) >= _MAX_DOC_ID:
            raise ValueError(
                f"segment_dedup: doc_id >= 2^{63 - _SEG_NO_BITS} overflows the "
                "packed (doc_id, seg_no) key; renumber documents densely"
            )
        if not len(doc_ids):
            return pa.table(
                {"h1": pa.array([], pa.uint64()),
                 "h2": pa.array([], pa.uint64()),
                 "packed": pa.array([], pa.int64())}
            )
        rep_idx, seg_no, segs = _segment_table(t["text"], mode, seg_len)
        if len(seg_no) and int(seg_no.max()) >= _MAX_SEG_NO:
            bad = rep_idx[int(np.argmax(seg_no))]
            raise ValueError(
                f"segment_dedup: document {doc_ids[bad]} has > 2^{_SEG_NO_BITS} "
                "segments; split it upstream"
            )
        h1, h2 = _hash2(segs)
        packed = (doc_ids[rep_idx] << _SEG_NO_BITS) + seg_no
        return pa.table(
            {"h1": pa.array(h1, pa.uint64()),
             "h2": pa.array(h2, pa.uint64()),
             "packed": pa.array(packed, pa.int64())}
        )

    return explode


@ray.remote
def _reassemble_part(
    mode: str, seg_len: int, joiner: str, n_w: int, *tables
) -> pa.Table:
    wt = [t for t in tables[:n_w] if t is not None and t.num_rows]
    dt = [t for t in tables[n_w:] if t is not None and t.num_rows]
    if not wt or not dt:
        return _OUT_SCHEMA.empty_table()
    import pyarrow.compute as pc

    w = pa.concat_tables(wt, promote_options="default")
    d = pa.concat_tables(dt, promote_options="default")
    doc = w["doc_id"].to_numpy(zero_copy_only=False)
    seg = w["seg_no"].to_numpy(zero_copy_only=False)
    order = np.lexsort((seg, doc))
    doc, seg = doc[order], seg[order]
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    win_counts = np.diff(np.r_[starts, len(doc)])
    uniq_docs = doc[starts]
    # gather the surviving docs' rows in uniq_docs order, re-split them
    # with the vectorized segmenter (same pass the explode side ran —
    # byte-identical segments), then select each winner's segment and
    # join per doc, all in Arrow
    d_ids = d["doc_id"].to_numpy(zero_copy_only=False)
    ordd = np.argsort(d_ids)
    rows = ordd[np.searchsorted(d_ids[ordd], uniq_docs)]
    texts = d["text"].take(pa.array(rows))
    rep_idx, _, segs = _segment_table(texts, mode, seg_len)
    c_d = np.bincount(rep_idx, minlength=len(uniq_docs))
    seg_base = np.cumsum(c_d) - c_d
    sel = seg_base[np.repeat(np.arange(len(uniq_docs)), win_counts)] + seg
    chosen = segs.take(pa.array(sel))
    offs = np.r_[0, np.cumsum(win_counts)].astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), chosen)
    clean = pc.binary_join(lists, pa.scalar(joiner, pa.large_string()))
    return pa.table(
        {"doc_id": pa.array(uniq_docs.astype(np.int64), pa.int64()),
         "clean_text": clean.cast(pa.string())}
    )


def segment_dedup(
    docs: ray.data.Dataset,
    *,
    mode: str = "words",
    seg_len: int = 8,
) -> ray.data.Dataset:
    """(doc_id, clean_text): global first-wins segment dedup + reassembly.

    Documents whose every segment loses are dropped (they contribute no
    rows), matching the SQL twin's GROUP BY over surviving segments.
    """
    if mode not in ("words", "lines"):
        raise ValueError(mode)
    joiner = "\n" if mode == "lines" else " "
    hashed = docs.map_batches(
        _explode_hashed(mode, seg_len), batch_format="pyarrow"
    )
    # ONE shuffle: per-(128-bit segment hash) min packed key — map-side
    # combiner collapses hot segments before the exchange.
    seg_schema = pa.schema(
        [("h1", pa.uint64()), ("h2", pa.uint64()), ("packed", pa.int64())]
    )
    first = exchange_unique(
        hashed, ["h1", "h2"], agg=[("packed", "min")], schema=seg_schema
    )

    def unpack(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(packed >> _SEG_NO_BITS, pa.int64()),
             "seg_no": pa.array(packed & (_MAX_SEG_NO - 1), pa.int64())}
        )

    winners = first.map_batches(unpack, batch_format="pyarrow")
    # Second shuffle: co-partition winners and source docs by doc_id and
    # re-derive surviving segment strings locally (one deterministic
    # re-split per surviving document; no segment text on the wire).
    P = _default_parts()
    wsl = partition_refs(winners, ["doc_id"], P)
    dsl = partition_refs(docs, ["doc_id"], P)
    out = [
        _reassemble_part.remote(
            mode, seg_len, joiner, len(wsl),
            *[s[p] for s in wsl], *[s[p] for s in dsl],
        )
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)
