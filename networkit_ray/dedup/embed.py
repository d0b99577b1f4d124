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


def _planes_hash(dim: int, num_planes: int, seed: int) -> np.ndarray:
    """SQL-replayable gaussian planes: splitmix64 counter → Box-Muller.

    Entry (plane, pos) at flat index i draws u1 from splitmix64(base + 2i)
    (shifted into (0, 1]) and u2 from splitmix64(base + 2i + 1) (in [0, 1)),
    z = sqrt(-2 ln u1) · cos(2π u2).  Same distribution as ``_planes``;
    the counter construction makes the matrix a pure function of
    (dim, num_planes, seed) that DuckDB can replay term by term."""
    from networkit_ray.dedup.tokenize import _splitmix

    base = np.uint64((seed * 0x100000001B3) % (1 << 64))
    idx = np.arange(num_planes * dim, dtype=np.uint64)
    h1 = _splitmix(base + np.uint64(2) * idx)
    h2 = _splitmix(base + np.uint64(2) * idx + np.uint64(1))
    u1 = (h1.astype(np.float64) + 1.0) * 2.0**-64
    u2 = h2.astype(np.float64) * 2.0**-64
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return z.reshape(num_planes, dim)


def make_planes(dim: int, num_planes: int, seed: int, plane_gen: str = "pcg") -> np.ndarray:
    """Hyperplane factory: ``"pcg"`` = PCG64 standard normals (default),
    ``"hash"`` = the splitmix64 + Box-Muller counter draw (_planes_hash),
    which an exact SQL oracle can reproduce."""
    if plane_gen == "pcg":
        return _planes(dim, num_planes, seed)
    if plane_gen == "hash":
        return _planes_hash(dim, num_planes, seed)
    raise ValueError(f"unknown plane_gen {plane_gen!r} (want 'pcg' or 'hash')")


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def lsh_buckets(
    emb: ray.data.Dataset, dim: int, *, num_planes: int = 16, seed: int = 42,
    plane_gen: str = "pcg",
) -> ray.data.Dataset:
    """(vec_id, bucket) — sign pattern of seeded hyperplane projections."""
    planes = make_planes(dim, num_planes, seed, plane_gen)

    def f(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        signs = (m @ planes.T) > 0
        key = (signs * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"], "bucket": pa.array(key)})

    return emb.map_batches(f, batch_format="pyarrow")


def lsh_params_for(threshold: float) -> tuple[int, int]:
    """(num_bands, planes_per_band) giving ≥ ~0.99 recall at ``threshold``.

    Recall at angle θ = 1-(1-(1-θ/π)^P)^B.  High thresholds afford deep
    bands (few, selective); low thresholds need shallow bands OR'd wider —
    e.g. cosine 0.4 (θ≈66°) with the 0.9-tuned 8×8 banding has ~2% recall,
    but 32 bands × 4 planes reaches ~0.996.
    """
    theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    p = 1.0 - theta / np.pi
    for planes in (12, 10, 8, 6, 4, 3, 2):
        for bands in (4, 8, 16, 32, 64):
            if 1.0 - (1.0 - p**planes) ** bands >= 0.99:
                return bands, planes
    return 64, 2


def embedding_near_dups(
    emb: ray.data.Dataset,
    dim: int,
    *,
    threshold: float = 0.95,
    num_bands: int | None = None,
    planes_per_band: int | None = None,
    seed: int = 42,
    max_bucket: int = 2000,
    plane_gen: str = "pcg",
) -> ray.data.Dataset:
    """(a, b, cos) pairs with cosine ≥ threshold, multi-band LSH blocking.

    Band shape defaults to ``lsh_params_for(threshold)`` so recall stays
    ≥ ~0.99 whatever the caller's threshold (round-1 shipped one 16-plane
    band — ~8% recall at 0.9; round-2's fixed 8×8 was still ~2% at 0.4).
    """
    if num_bands is None or planes_per_band is None:
        num_bands, planes_per_band = lsh_params_for(threshold)
    # one (num_bands*planes_per_band, dim) matrix, sliced per band — a single
    # matmul per batch produces every band's sign bits
    planes = make_planes(dim, num_bands * planes_per_band, seed, plane_gen)
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
    # pin the candidate table (small): count() below plus the groupby
    # would otherwise execute the LSH pipeline twice
    cand = cand.materialize()
    if cand.count() == 0:
        return cand
    from ray.data.aggregate import Max

    return (
        cand.groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos"))
    )


@ray.remote
def _block_pairs(threshold: float, ti: pa.Table, tj: pa.Table | None) -> pa.Table:
    """All (a, b, cos) with cos ≥ threshold between two embedding blocks.

    ``tj is None`` means the diagonal case (block against itself, upper
    triangle only); otherwise every cross pair, orientated so a < b.
    """
    idi = ti["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mi = _emb_matrix(ti)
    mi /= np.maximum(np.linalg.norm(mi, axis=1, keepdims=True), 1e-30)
    if tj is None:
        sim = mi @ mi.T
        iu, ju = np.triu_indices(len(idi), 1)
        cos = sim[iu, ju]
        keep = cos >= threshold
        a, b, cos = idi[iu][keep], idi[ju][keep], cos[keep]
    else:
        idj = tj["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mj = _emb_matrix(tj)
        mj /= np.maximum(np.linalg.norm(mj, axis=1, keepdims=True), 1e-30)
        sim = mi @ mj.T
        ii, jj = np.nonzero(sim >= threshold)
        a, b, cos = idi[ii], idj[jj], sim[ii, jj]
        a, b = np.minimum(a, b), np.maximum(a, b)
    order = np.lexsort((b, a))
    return pa.table(
        {
            "a": pa.array(a[order]),
            "b": pa.array(b[order]),
            "cos": pa.array(cos[order].astype(np.float64)),
        }
    )


def embedding_near_dups_exact(
    emb: ray.data.Dataset, *, threshold: float = 0.4
) -> ray.data.Dataset:
    """Exact all-pairs cosine near-dups — the brute-force baseline.

    Block-pair decomposition: K object-store blocks → K(K+1)/2 matmul
    tasks, each touching exactly two blocks.  No O(N) broadcast, no N×N
    materialization (only the ≥-threshold survivors leave a task).  This
    is the oracle-checkable ground truth the LSH variant trades recall
    against; at 100 TB the LSH path is the default and this one is for
    bounded slices (its total work is inherently O(N²/K² · K²) = O(N²)).
    """
    refs = emb.select_columns(["vec_id", "embedding"]).materialize().to_arrow_refs()
    out = []
    for i in range(len(refs)):
        out.append(_block_pairs.remote(threshold, refs[i], None))
        for j in range(i + 1, len(refs)):
            out.append(_block_pairs.remote(threshold, refs[i], refs[j]))
    return ray.data.from_arrow_refs(out)
