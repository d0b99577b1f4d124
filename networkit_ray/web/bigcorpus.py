"""Deterministic GB-scale corpus expansion — load-bearing MB/s benchmarks.

The sf testdata corpora are ~1.5 MB of text: at that size every corpus
stage's wall time is fixed overhead (task launch, metadata, driver RPCs)
and MB/s numbers say nothing about 100-TB streaming throughput.  This
module deterministically expands ``documents.parquet`` to a target size
so `bench.py`'s corpus legs measure actual streaming rates:

- copy r of base doc d gets doc_id = r·N + d (dense 0..R·N-1, preserving
  ``N % 50 == 0`` so the htmlgen relative-link invariant keeps holding);
- its text is the base text tiled TILE times as newline-joined paragraphs
  plus one per-copy splitmix64 salt paragraph — tiled paragraphs are
  massive cross-copy duplicates (realistic CCNet-style boilerplate for
  segment dedup), salt paragraphs are globally unique (every doc
  survives dedup with a distinct remainder);
- generation is a Ray pipeline: one task per replica, the 5000-row base
  table broadcast once via ``ray.put`` (never re-shipped per task),
  pyarrow ``binary_repeat`` + ``binary_join_element_wise`` per batch (no
  per-doc Python string building), streamed straight to partitioned
  parquet.

Everything is pure integer arithmetic on (doc_id) — same corpus at any
parallelism, no external data (north-rule synthesis requirement).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from networkit_ray.sources.synth import _splitmix64


def expand_documents(
    sf_dir: str,
    out_dir: str,
    *,
    target_mb: int = 1024,
    tile: int = 20,
) -> dict:
    """Write a ≥``target_mb`` documents table to ``out_dir/documents.parquet``.

    Returns {"n_docs", "replicas", "text_mb"} (text_mb = exact expanded
    text payload, the denominator for corpus MB/s).
    """
    base = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    n_base = base.num_rows
    base_text_bytes = int(pc.sum(pc.binary_length(base["text"])).as_py())
    # per-replica text bytes: every base doc tiled + "\n" joins + salt par.
    salt_bytes = 22  # "uniq " + 16 hex + "\n"
    per_replica = base_text_bytes * tile + n_base * (tile + salt_bytes)
    replicas = max(1, -(-int(target_mb * 1e6) // per_replica))
    base_ref = ray.put(base)

    def make(batch: pa.Table) -> pa.Table:
        b = ray.get(base_ref)
        out = []
        for r in batch["id"].to_pylist():
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            new_ids = np.int64(r) * n_base + ids
            salts = _splitmix64(new_ids.astype(np.uint64))
            salt_col = pa.array([f"uniq {s:016x}" for s in salts], pa.string())
            nl = pa.array(["\n"] * n_base, pa.string())
            tiled = pc.binary_repeat(
                pc.binary_join_element_wise(b["text"].combine_chunks(), nl, ""), tile
            )
            text = pc.binary_join_element_wise(tiled, salt_col, "")
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(new_ids),
                        "text": text,
                        "lang": b["lang"],
                        "source": b["source"],
                        "n_chars": pc.binary_length(text).cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    path = os.path.join(out_dir, "documents.parquet")
    os.makedirs(path, exist_ok=True)
    (
        ray.data.range(replicas)
        .repartition(replicas)
        .map_batches(make, batch_format="pyarrow")
        .write_parquet(path)
    )
    text_mb = replicas * per_replica / 1e6
    return {"n_docs": replicas * n_base, "replicas": replicas, "text_mb": round(text_mb, 1)}
