"""Exact n-gram Jaccard near-duplicate detection (no sketching).

The brief's fourth dedup family: pairwise Jaccard over k-token shingle
sets, computed EXACTLY via a distributed inverted index — no MinHash
recall loss, fully SQL-expressible (the DuckDB twin builds string
trigrams; this side hashes them 64-bit, identical set semantics modulo
hash collisions).

Shape (reference has no near-dedup; semantics follow the MinHash verify
step in dedup/minhash.py so thresholds are interchangeable):

    docs → map_batches: per-doc DISTINCT shingle hashes (vectorized,
           tokenize.shingle_hashes_batch) → (doc_id, sh) rows
         → groupby(sh): every bucket emits its a<b pairs
         → groupby(a, b).count(): |A ∩ B| (a pair appears once per
           shared shingle — the classic index-join intersection count)
         → exchange_join sizes on both sides → J = i/(|A|+|B|-i) filter.

Scale notes: the only skew risk is a degenerate shingle shared by huge
numbers of documents (boilerplate); ``max_df`` drops shingles above a
document-frequency cap — a *documented approximation* (it can only
lower J), disabled by default so the operator stays exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from networkit_ray.common.exchange import exchange_join
from networkit_ray.common.schema import enforce_schema
from networkit_ray.dedup.tokenize import shingle_hashes_batch


def shingle_rows(docs: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """(doc_id, sh) — one row per DISTINCT shingle per document."""

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh, starts = shingle_hashes_batch(t["text"].combine_chunks(), k)
        if len(sh) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.int64())}
            )
        counts = np.diff(np.append(starts, len(sh)))
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        # vectorized per-doc distinct: lexsort by (doc, shingle), keep firsts
        order = np.lexsort((sh, doc_of))
        d_s, s_s = doc_of[order], sh[order]
        keep = np.ones(len(s_s), dtype=bool)
        keep[1:] = (d_s[1:] != d_s[:-1]) | (s_s[1:] != s_s[:-1])
        return pa.table(
            {
                "doc_id": pa.array(ids[d_s[keep]]),
                # int64 view keeps downstream groupby/join schemas uniform
                "sh": pa.array(s_s[keep].view(np.int64)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def jaccard_near_dups(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    k: int = 3,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """(a, b, jaccard) for every pair with exact k-gram Jaccard ≥ threshold."""
    rows = shingle_rows(docs, k).materialize()
    sizes = rows.groupby("doc_id").aggregate(Count(alias_name="n_sh"))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if max_df is not None and len(ids) > max_df:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        iu, ju = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    inter = rows.groupby("sh").map_groups(pairs, batch_format="pandas")
    inter = enforce_schema(inter, pa.schema([("a", pa.int64()), ("b", pa.int64())]))
    inter = inter.groupby(["a", "b"]).aggregate(Count(alias_name="i"))

    with_a = exchange_join(
        inter,
        sizes.map_batches(
            lambda t: t.rename_columns(["a", "na"]), batch_format="pyarrow"
        ),
        left_on=["a"],
    )
    with_b = exchange_join(
        with_a,
        sizes.map_batches(
            lambda t: t.rename_columns(["b", "nb"]), batch_format="pyarrow"
        ),
        left_on=["b"],
    )

    def score(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = i / (na + nb - i)
        keep = jac >= threshold
        return pa.table(
            {
                "a": t["a"].filter(pa.array(keep)),
                "b": t["b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return with_b.map_batches(score, batch_format="pyarrow")


def contamination_check(
    train: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    *,
    k: int = 3,
    min_hits: int = 1,
) -> ray.data.Dataset:
    """(doc_id, hits) — train documents sharing ≥ ``min_hits`` distinct
    k-gram shingles with ANY benchmark document.

    Training-data decontamination (no reference analog): flag training
    documents that leak benchmark content before a training run.  The
    benchmark side is usually tiny — its distinct shingles behave like a
    broadcast filter; the train side streams through one hash join.

    Scale shape: shingle both sides (the same 64-bit hashes as the exact
    Jaccard dedup, so the DuckDB twin agrees exactly), distinct benchmark
    shingles, one semi-ish join + per-doc count.
    """
    tr = shingle_rows(train, k)
    bm = (
        shingle_rows(benchmark, k)
        .groupby("sh")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["sh"])
    )
    hit = exchange_join(tr, bm, left_on=["sh"])
    counts = hit.groupby("doc_id").aggregate(Count(alias_name="hits"))
    return counts.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t["hits"], pa.scalar(min_hits, pa.int64()))
        ),
        batch_format="pyarrow",
    )
