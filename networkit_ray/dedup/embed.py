"""Embedding-cosine near-duplicate detection over the ``embeddings`` table.

Scale path: random-hyperplane LSH (seeded, 16 planes → 16-bit bucket key),
``groupby(bucket)`` → within-bucket pairwise cosine → pairs ≥ threshold.
Hyperplanes are broadcast once via closure capture (small side), never
re-shipped per row.  Exact-verification happens inside the bucket group so
no full N×N materialization ever exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from networkit_ray.graph.triangles import enforce_schema


def _planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def lsh_buckets(
    emb: ray.data.Dataset, dim: int, *, num_planes: int = 16, seed: int = 42
) -> ray.data.Dataset:
    """(vec_id, bucket) — sign pattern of seeded hyperplane projections."""
    planes = _planes(dim, num_planes, seed)

    def f(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        signs = (m @ planes.T) > 0
        key = (signs * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"], "bucket": pa.array(key)})

    return emb.map_batches(f, batch_format="pyarrow")


def embedding_near_dups(
    emb: ray.data.Dataset,
    dim: int,
    *,
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 42,
    max_bucket: int = 2000,
) -> ray.data.Dataset:
    """(a, b, cos) pairs with cosine ≥ threshold found within LSH buckets."""
    planes = _planes(dim, num_planes, seed)

    def with_bucket(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        mn = m / norm
        signs = (mn @ planes.T) > 0
        key = (signs * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "bucket": pa.array(key),
                "nvec": pa.array(list(mn), pa.list_(pa.float64())),
            }
        )

    rows = emb.map_batches(with_bucket, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").head(max_bucket)
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64), "cos": np.empty(0, np.float64)}
            )
        m = np.stack([np.asarray(v) for v in g["nvec"]])
        sim = m @ m.T
        iu, ju = np.triu_indices(len(ids), 1)
        cos = sim[iu, ju]
        keep = cos >= threshold
        return pd.DataFrame({"a": ids[iu][keep], "b": ids[ju][keep], "cos": cos[keep]})

    cand = rows.groupby("bucket").map_groups(pairs, batch_format="pandas")
    cand = enforce_schema(
        cand, pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())])
    )
    if cand.count() == 0:
        return cand
    from ray.data.aggregate import Max

    return (
        cand.groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos"))
    )
