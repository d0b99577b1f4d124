"""Resumable partitioned Parquet sink: one bucket directory per key range.

The pipeline-output counterpart of state/checkpoint.py (which covers
iterative kernel state): rows are hash-bucketed by key, each bucket is
written by an independent task as ``bucket=NNNN/part.parquet`` followed
by an atomic ``_DONE`` marker, and a re-run SKIPS every bucket whose
marker exists — a failed 100 TB job resumes by rewriting only the
missing buckets, and no reader ever sees a half-written bucket (readers
list buckets via the markers).  Never one giant file.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


@ray.remote
def _write_bucket(out_dir: str, bucket: int, *tables) -> int:
    bdir = os.path.join(out_dir, f"bucket={bucket:05d}")
    done = os.path.join(bdir, "_DONE")
    if os.path.exists(done):
        return -1  # resume: bucket already complete (explicit skip flag)
    os.makedirs(bdir, exist_ok=True)
    live = [t for t in tables if t is not None and len(t)]
    t = (
        pa.concat_tables(live, promote_options="default")
        if live
        else None
    )
    n = 0
    if t is not None:
        pq.write_table(t, os.path.join(bdir, "part.parquet"))
        n = len(t)
    tmp = done + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"rows": n}, f)
    os.replace(tmp, done)  # marker last, atomic
    return n


def write_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    key_cols: list[str],
    *,
    num_buckets: int = 16,
) -> dict:
    """Write ``ds`` hash-bucketed by ``key_cols``; skip completed buckets.

    Returns {"rows_written": int, "buckets_skipped": int}.  Same key hash
    as the engine's exchanges, so co-located consumers can rely on the
    bucketing.
    """
    from networkit_ray.common.exchange import partition_refs

    os.makedirs(out_dir, exist_ok=True)
    slices = partition_refs(ds, key_cols, num_buckets)
    results = ray.get(
        [
            _write_bucket.remote(out_dir, b, *[s[b] for s in slices])
            for b in range(num_buckets)
        ]
    )
    # -1 is the writer's explicit "already complete, skipped" flag — no
    # filesystem inference (a skipped nonempty bucket and a freshly-written
    # empty bucket are otherwise indistinguishable)
    skipped = sum(1 for r in results if r == -1)
    return {
        "rows_written": int(sum(r for r in results if r > 0)),
        "buckets_skipped": skipped,
    }


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back only COMPLETE buckets (those with a _DONE marker)."""
    paths = []
    for name in sorted(os.listdir(out_dir)):
        bdir = os.path.join(out_dir, name)
        if not name.startswith("bucket="):
            continue
        if not os.path.exists(os.path.join(bdir, "_DONE")):
            continue  # incomplete bucket from a crashed run — invisible
        p = os.path.join(bdir, "part.parquet")
        if os.path.exists(p):
            paths.append(p)
    if not paths:
        return ray.data.from_arrow(pa.table({}))
    ds = ray.data.read_parquet(paths)
    # read_parquet hive-parses the bucket=NNNN directory into a column;
    # the bucketing is a sink detail, not part of the table
    if "bucket" in (ds.schema().names or []):
        ds = ds.drop_columns(["bucket"])
    return ds
