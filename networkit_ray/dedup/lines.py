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
   only ``(h1, h2, packed)`` where (h1, h2) is a 128-bit SipHash of the
   segment bytes (two independent 64-bit keys; collision odds are
   ~n²/2¹²⁹ — irrelevant at 10¹² docs) and ``packed`` is
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
# give a 128-bit combined fingerprint.
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

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_no, out_seg = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            segs = _segments(text, mode, seg_len)
            out_doc.extend([doc_id] * len(segs))
            out_no.extend(range(len(segs)))
            out_seg.extend(segs)
        return pd.DataFrame(
            {"doc_id": pd.array(out_doc, dtype="int64"),
             "seg_no": pd.array(out_no, dtype="int64"),
             "seg": out_seg}
        )

    return docs.map_batches(explode, batch_format="pandas")


def _explode_hashed(mode: str, seg_len: int):
    """Batch fn: (doc_id, text) → (h1: uint64, h2: uint64, packed: int64)."""

    def explode(t: pa.Table) -> pa.Table:
        out_packed: list[np.ndarray] = []
        segs_all: list[str] = []
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(doc_ids) and int(doc_ids.max()) >= _MAX_DOC_ID:
            raise ValueError(
                f"segment_dedup: doc_id >= 2^{63 - _SEG_NO_BITS} overflows the "
                "packed (doc_id, seg_no) key; renumber documents densely"
            )
        for doc_id, text in zip(doc_ids, t["text"].to_pylist()):
            segs = _segments(text, mode, seg_len)
            if len(segs) > _MAX_SEG_NO:
                raise ValueError(
                    f"segment_dedup: document {doc_id} has {len(segs)} segments "
                    f"(> 2^{_SEG_NO_BITS}); split it upstream"
                )
            base = int(doc_id) << _SEG_NO_BITS
            out_packed.append(np.arange(base, base + len(segs), dtype=np.int64))
            segs_all.extend(segs)
        if not segs_all:
            return pa.table(
                {"h1": pa.array([], pa.uint64()),
                 "h2": pa.array([], pa.uint64()),
                 "packed": pa.array([], pa.int64())}
            )
        arr = np.asarray(segs_all, dtype=object)
        h1 = pd.util.hash_array(arr, hash_key=_HKEY1, categorize=False)
        h2 = pd.util.hash_array(arr, hash_key=_HKEY2, categorize=False)
        return pa.table(
            {"h1": pa.array(h1, pa.uint64()),
             "h2": pa.array(h2, pa.uint64()),
             "packed": pa.array(np.concatenate(out_packed), pa.int64())}
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
    w = pa.concat_tables(wt, promote_options="default")
    d = pa.concat_tables(dt, promote_options="default")
    doc = w["doc_id"].to_numpy(zero_copy_only=False)
    seg = w["seg_no"].to_numpy(zero_copy_only=False)
    order = np.lexsort((seg, doc))
    doc, seg = doc[order], seg[order]
    bounds = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1], True])
    texts = dict(zip(d["doc_id"].to_numpy(zero_copy_only=False), d["text"].to_pylist()))
    out_doc: list[int] = []
    out_text: list[str] = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        did = int(doc[lo])
        segs = _segments(texts[did], mode, seg_len)
        out_doc.append(did)
        out_text.append(joiner.join(segs[j] for j in seg[lo:hi]))
    return pa.table(
        {"doc_id": pa.array(out_doc, pa.int64()),
         "clean_text": pa.array(out_text, pa.string())}
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
