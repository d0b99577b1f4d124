"""Exact deduplication: hash-partition + per-group first (min doc_id).

The canonical web-corpus exact-dedup stage: one shuffle keyed on the content
hash; the per-batch partial min is the combiner, so the exchange carries at
most one row per distinct document per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min


def exact_dedup_keepers(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(text_md5, doc_id) — the kept (minimum) doc_id per distinct text."""

    def key(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
        tt = pa.table({"text_md5": pa.array(md5s, pa.string()), "doc_id": t["doc_id"]})
        # per-batch combiner: min doc_id per hash
        g = tt.group_by(["text_md5"]).aggregate([("doc_id", "min")])
        return pa.table({"text_md5": g["text_md5"], "doc_id": g["doc_id_min"]})

    partial = docs.map_batches(key, batch_format="pyarrow")
    return partial.groupby("text_md5").aggregate(Min("doc_id", alias_name="doc_id"))


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Filter to the kept rows (semi-join against the keeper set on doc_id)."""
    from networkit_ray.common.exchange import exchange_join

    keepers = exact_dedup_keepers(docs).select_columns(["doc_id"])
    return exchange_join(docs, keepers, left_on=["doc_id"], join_type="left semi")


def duplicate_stats(docs: ray.data.Dataset) -> dict:
    """{total, distinct, duplicates} over the text column."""
    total = docs.count()
    distinct = exact_dedup_keepers(docs).count()
    return {"total": total, "distinct": distinct, "duplicates": total - distinct}
