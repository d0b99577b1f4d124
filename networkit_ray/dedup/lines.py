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

Scale shape (100 TB corpus): stage 1 explodes documents into
(doc_id, seg_no, seg) rows inside ``map_batches``; stage 2 is ONE
all-to-all ``groupby(seg)`` — the canonical dedup shuffle — whose
map side already emits at most one candidate per (segment, input
block); stage 3 regroups the winners by doc_id (second shuffle,
pre-partitionable by doc_id at the source).  Segments, not documents,
cross the wire, so hot segments (boilerplate) shrink to one row per
group at the combiner.  For byte-identical-only matching no hashing is
involved; to trade exactness for volume, hash segments to 128 bits in
stage 1 and verify inside the group.
"""

from __future__ import annotations

import pandas as pd
import ray.data


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
            if mode == "lines":
                segs = text.split("\n")
            else:
                toks = text.split(" ")
                segs = [
                    " ".join(toks[i : i + seg_len])
                    for i in range(0, len(toks), seg_len)
                ]
            out_doc.extend([doc_id] * len(segs))
            out_no.extend(range(len(segs)))
            out_seg.extend(segs)
        return pd.DataFrame(
            {"doc_id": pd.array(out_doc, dtype="int64"),
             "seg_no": pd.array(out_no, dtype="int64"),
             "seg": out_seg}
        )

    return docs.map_batches(explode, batch_format="pandas")


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
    segs = explode_segments(docs, mode=mode, seg_len=seg_len)
    joiner = "\n" if mode == "lines" else " "

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        i = g.sort_values(["doc_id", "seg_no"]).index[0]
        return g.loc[[i], ["doc_id", "seg_no", "seg"]]

    winners = segs.groupby("seg").map_groups(first_wins, batch_format="pandas")

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seg_no")
        return pd.DataFrame(
            {"doc_id": [g["doc_id"].iloc[0]],
             "clean_text": [joiner.join(g["seg"].tolist())]}
        )

    return winners.groupby("doc_id").map_groups(reassemble, batch_format="pandas")
