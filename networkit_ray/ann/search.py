"""Similarity search over an embedding column (list<float>).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put`` → fetched per task), each batch computes a
  vectorized (Q × B) matmul and emits its per-batch top-k candidates (the
  combiner), and a final per-query ``groupby.map_groups`` keeps the global
  top-k.  Nothing ever materializes the full N×Q score matrix.
- :func:`lsh_topk` — the scale path: probe only vectors whose
  random-hyperplane bucket is within ``probe_bits`` bit-flips of the query's
  bucket, then exact-rank the probed subset.  Approximate; recall measured
  against brute force in tests.

Deterministic tie-break everywhere: (score desc, vec_id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from networkit_ray.common.hashing import round_half_away
from networkit_ray.graph.triangles import enforce_schema

_OUT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int64()),
        ("vec_id", pa.int64()),
        ("score", pa.float64()),
    ]
)


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def query_matrix(emb: ray.data.Dataset, query_ids: list[int]) -> np.ndarray:
    """Fetch + L2-normalize the query vectors (small driver-side result)."""
    qset = set(int(q) for q in query_ids)

    def pick(t: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(t["vec_id"], value_set=pa.array(sorted(qset)))
        return t.filter(mask)

    rows = emb.map_batches(pick, batch_format="pyarrow").to_pandas()
    rows = rows.set_index("vec_id").loc[sorted(qset)]
    m = np.stack([np.asarray(v, dtype=np.float64) for v in rows["embedding"]])
    return _normalize(m)


class _TopKScorer:
    """Actor-pool stage: fetches the broadcast query matrix once per actor."""

    def __init__(self, q_ref, query_ids: list[int], k: int):
        self.q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(t))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        scores = self.q @ m.T  # (Q, B)
        k = min(self.k, scores.shape[1])
        # per-batch partial top-k per query (combiner)
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            sel = idx[qi]
            out_q.append(np.full(k, self.query_ids[qi]))
            out_v.append(ids[sel])
            out_s.append(scores[qi, sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def _final_topk(k: int):
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["score"] = round_half_away(g["score"].to_numpy(), 6)
        return g[["query_id", "rank", "vec_id", "score"]]

    return f


def brute_force_topk(
    emb: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 5,
    concurrency=(1, 4),
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Exact cosine top-k: (query_id, rank, vec_id, score[6dp])."""
    q = query_matrix(emb, query_ids)
    q_ref = ray.put(q)
    partial = emb.map_batches(
        _TopKScorer,
        fn_constructor_kwargs={"q_ref": q_ref, "query_ids": list(query_ids), "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    out = partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")
    return enforce_schema(out, _OUT_SCHEMA)


def train_ivf_centroids(
    emb: ray.data.Dataset,
    *,
    n_centroids: int = 16,
    lloyd_iters: int = 3,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Seeded distributed k-means for the IVF coarse quantizer.

    Init = deterministic hash-sampled vectors; each Lloyd round is one
    ``map_batches`` pass emitting per-centroid partial sums (the combiner)
    + a tiny driver-side division — centroids (k × dim floats) are always
    broadcast, never shuffled.  Empty centroids keep their position.
    """
    first = emb.take(1)[0]
    dim = len(first["embedding"])

    # deterministic init: the n_centroids vectors with smallest hash(vec_id)
    def seedpick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)) >> np.uint64(32)
        order = np.argsort(h, kind="stable")[:n_centroids]
        return t.take(pa.array(np.sort(order)))

    cands = emb.map_batches(seedpick, batch_format="pyarrow").to_pandas()
    ids = cands["vec_id"].to_numpy().astype(np.uint64)
    h = (ids * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)) >> np.uint64(32)
    order = np.argsort(h, kind="stable")[:n_centroids]
    cents = _normalize(
        np.stack([np.asarray(v, np.float64) for v in cands["embedding"].to_numpy()[order]])
    )

    for _ in range(lloyd_iters):
        # centroids are k×dim floats — tiny, captured by value in the task
        # spec (an implicit broadcast, no per-batch ray.get)
        def partial(t: pa.Table, c=cents) -> pa.Table:
            m = _normalize(_emb_matrix(t))
            assign = np.argmax(m @ c.T, axis=1)
            k, d = c.shape
            sums = np.zeros((k, d), np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k).astype(np.float64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(k, dtype=np.int64)),
                    "sum": pa.array(list(sums), pa.list_(pa.float64())),
                    "count": pa.array(counts),
                }
            )

        parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((n_centroids, dim), np.float64)
        counts = np.zeros(n_centroids, np.float64)
        for cid, sm, ct in zip(parts["cid"], parts["sum"], parts["count"]):
            sums[cid] += np.asarray(sm)
            counts[cid] += ct
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = _normalize(sums[nz] / counts[nz, None])
    return cents


def ivf_topk(
    emb: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 3,
    seed: int = 42,
) -> ray.data.Dataset:
    """Approximate cosine top-k via an IVF coarse quantizer (the other
    standard scale path next to :func:`lsh_topk`).

    Vectors are assigned to their nearest of ``n_centroids`` seeded-kmeans
    centroids; each query exactly ranks only the vectors in its ``nprobe``
    closest cells.  Centroids and the probe sets are broadcast (small);
    the scan is one filtered pass over the corpus.
    """
    cents = train_ivf_centroids(
        emb, n_centroids=n_centroids, lloyd_iters=lloyd_iters, seed=seed
    )
    q = query_matrix(emb, query_ids)
    qc = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_arr = np.unique(qc)
    q_ref = ray.put(q)

    class Scorer(_TopKScorer):
        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(t))
            assign = np.argmax(m @ cents.T, axis=1)
            mask = np.isin(assign, probe_arr)
            if not mask.any():
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            return super().__call__(t.filter(pa.array(mask)))

    partial = emb.map_batches(
        Scorer,
        fn_constructor_kwargs={"q_ref": q_ref, "query_ids": list(query_ids), "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    out = partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")
    return enforce_schema(out, _OUT_SCHEMA)


def lsh_topk(
    emb: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 5,
    num_planes: int = 8,
    probe_bits: int = 2,
    seed: int = 42,
    plane_gen: str = "pcg",
) -> ray.data.Dataset:
    """Approximate cosine top-k via hyperplane-bucket probing.

    Each vector lands in one of 2^num_planes buckets; a query probes its own
    bucket plus every bucket within ``probe_bits`` bit flips, then ranks the
    probed subset exactly.  The probe set is broadcast via closure; the scan
    is one filtered pass over the corpus (column-pruned at the read when the
    source is parquet).
    """
    from networkit_ray.dedup.embed import make_planes

    q = query_matrix(emb, query_ids)
    planes = make_planes(q.shape[1], num_planes, seed, plane_gen)
    qsig = ((q @ planes.T) > 0).astype(np.int64)
    qkeys = (qsig * (1 << np.arange(num_planes))).sum(axis=1)

    probe: set[int] = set()
    from itertools import combinations

    for key in qkeys:
        probe.add(int(key))
        for r in range(1, probe_bits + 1):
            for bits in combinations(range(num_planes), r):
                flipped = int(key)
                for b in bits:
                    flipped ^= 1 << b
                probe.add(flipped)
    probe_arr = np.array(sorted(probe), dtype=np.int64)

    q_ref = ray.put(q)

    class Scorer(_TopKScorer):
        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(t))
            keys = (((m @ planes.T) > 0) * (1 << np.arange(num_planes))).sum(axis=1)
            mask = np.isin(keys, probe_arr)
            if not mask.any():
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            return super().__call__(t.filter(pa.array(mask)))

    partial = emb.map_batches(
        Scorer,
        fn_constructor_kwargs={"q_ref": q_ref, "query_ids": list(query_ids), "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    out = partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")
    return enforce_schema(out, _OUT_SCHEMA)


def kmeans_assign(
    emb: ray.data.Dataset,
    *,
    n_centroids: int = 16,
    lloyd_iters: int = 3,
    seed: int = 42,
) -> ray.data.Dataset:
    """(vec_id, cluster) — spherical k-means assignment as a first-class op.

    Training is :func:`train_ivf_centroids` (hash-seeded init, one
    combiner pass per Lloyd round, centroids always broadcast); the final
    assignment is one more broadcast ``map_batches`` pass.  Deterministic
    and parallelism-invariant, so downstream pipelines (IVF cells,
    cluster-local dedup, stratified sampling) can rely on stable ids.
    """
    cents = train_ivf_centroids(
        emb, n_centroids=n_centroids, lloyd_iters=lloyd_iters, seed=seed
    )

    def assign(t: pa.Table, c=cents) -> pa.Table:
        m = _normalize(_emb_matrix(t))
        cid = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"], "cluster": pa.array(cid)})

    return emb.map_batches(assign, batch_format="pyarrow")
