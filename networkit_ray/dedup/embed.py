"""Embedding-cosine near-duplicate detection over the ``embeddings`` table.

Scale path: multi-band random-hyperplane LSH.  A single AND-bucket of 16
planes has ~8% recall at cosine 0.9 (two vectors 26° apart must agree on
all 16 sign bits), so — exactly like MinHash banding — we use B independent
OR'd bands of P planes each: a pair is a candidate if it co-buckets in ANY
band.  Recall at angle θ is 1-(1-(1-θ/π)^P)^B; with the default B=8, P=8
that is ≈0.97 at cosine 0.9 and ≈0.999 at cosine 0.95.

``groupby(band, key)`` → within-bucket pairwise cosine → pairs ≥ threshold,
deduped across bands with ``groupby(a, b).max``.  Hyperplanes are broadcast
once via closure capture (small side), never re-shipped per row; exact
verification happens inside the bucket group so no full N×N ever exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from networkit_ray.common.schema import enforce_schema


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
    num_bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 42,
    max_bucket: int = 2000,
) -> ray.data.Dataset:
    """(a, b, cos) pairs with cosine ≥ threshold, multi-band LSH blocking."""
    # one (num_bands*planes_per_band, dim) matrix, sliced per band — a single
    # matmul per batch produces every band's sign bits
    planes = _planes(dim, num_bands * planes_per_band, seed)
    weights = 1 << np.arange(planes_per_band)

    def with_bucket(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        mn = m / norm
        signs = (mn @ planes.T) > 0  # (n, B*P)
        keys = (
            signs.reshape(len(mn), num_bands, planes_per_band) * weights
        ).sum(axis=2).astype(np.int64)  # (n, B)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        nvec = pa.array(list(mn), pa.list_(pa.float64()))
        # one row per (doc, band), band-major so the repeated nvec column
        # lines up; the normalized vector rides along so the within-bucket
        # verify never joins back to the embedding table
        return pa.table(
            {
                "vec_id": pa.array(np.tile(ids, num_bands)),
                "band": pa.array(np.repeat(np.arange(num_bands, dtype=np.int64), n)),
                "key": pa.array(np.ascontiguousarray(keys.T).reshape(-1)),
                "nvec": pa.concat_arrays([nvec] * num_bands)
                if num_bands > 1
                else nvec,
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

    cand = rows.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")
    cand = enforce_schema(
        cand, pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())])
    )
    # enforce_schema materialized `cand`, so count() here is free
    if cand.count() == 0:
        return cand
    from ray.data.aggregate import Max

    return (
        cand.groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos"))
    )
