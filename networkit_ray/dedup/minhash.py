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

All hashing is whole-batch vectorized (see dedup/tokenize.py): Arrow C++
tokenization, siphash token hashes, numpy shingle folds, and a chunked
``np.minimum.reduceat`` for the H×S affine-permutation minimum — no Python
loop touches a token or shingle.  Results are seeded and independent of
partitioning and parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


from networkit_ray.dedup.tokenize import (
    _GOLD,
    _splitmix,
    shingle_hashes_batch,
    pairwise_jaccard,
    shingle_sets,
)


def _perm_params(
    num_hashes: int, seed: int, perm_gen: str = "pcg"
) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) affine-permutation params.  ``"pcg"`` (default) draws from
    PCG64; ``"hash"`` derives them from a splitmix64 counter (a forced odd)
    so a SQL oracle can re-derive every permutation."""
    if perm_gen == "hash":
        base = np.uint64((seed * 0x100000001B3) % (1 << 64))
        idx = np.arange(num_hashes, dtype=np.uint64)
        a = _splitmix(base + np.uint64(2) * idx) | np.uint64(1)
        b = _splitmix(base + np.uint64(2) * idx + np.uint64(1))
        return a, b
    if perm_gen != "pcg":
        raise ValueError(f"unknown perm_gen {perm_gen!r} (want 'pcg' or 'hash')")
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures_batch(
    texts: pa.Array | pa.ChunkedArray, a: np.ndarray, b: np.ndarray,
    hasher: str = "siphash",
) -> np.ndarray:
    """(n_docs, H) uint64 signatures, vectorized over the whole batch.

    The H×S value matrix is computed in chunks of 8 hash functions to bound
    peak memory at 8 × total_shingles × 8 bytes regardless of batch size.
    """
    sh, starts = shingle_hashes_batch(texts, hasher=hasher)
    H, n, S = len(a), len(starts), len(sh)
    sig = np.empty((H, n), dtype=np.uint64)
    for h0 in range(0, H, 8):
        ah, bh = a[h0 : h0 + 8], b[h0 : h0 + 8]
        vals = ah[:, None] * sh[None, :] + bh[:, None]
        # one flat reduceat over all (hash, doc) segments beats a 2D
        # axis-reduceat by ~1.5× (fewer per-segment dispatches)
        st = (starts[None, :] + (np.arange(len(ah)) * S)[:, None]).ravel()
        sig[h0 : h0 + 8] = np.minimum.reduceat(vals.ravel(), st).reshape(len(ah), n)
    return np.ascontiguousarray(sig.T)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Single-document signature (test/debug convenience)."""
    return minhash_signatures_batch(pa.array([text]), a, b)[0]


def band_rows(
    docs: ray.data.Dataset,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    hasher: str = "siphash",
    perm_gen: str = "pcg",
) -> ray.data.Dataset:
    """(doc_id, band, band_hash) LSH rows, bands of r = num_hashes//bands."""
    r = num_hashes // bands
    a, b = _perm_params(num_hashes, seed, perm_gen)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = minhash_signatures_batch(t["text"], a, b, hasher)  # (n, H)
        n = len(ids)
        s3 = sig.reshape(n, bands, r)
        bh = s3[:, :, 0].copy()
        for j in range(1, r):
            bh = (bh * _GOLD) ^ s3[:, :, j]
        bh = np.ascontiguousarray(_splitmix(bh)).view(np.int64)  # (n, bands)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_hash": pa.array(bh.reshape(-1)),
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
    hasher: str = "siphash",
    perm_gen: str = "pcg",
) -> ray.data.Dataset:
    """Distinct (a, b) a<b candidate pairs from LSH buckets.

    Buckets larger than ``max_bucket`` are truncated to their smallest
    ``max_bucket`` doc_ids (a web-scale guard against degenerate content,
    e.g. empty pages all colliding); the cap is logged via the n_trunc column
    of bucket_stats rather than silently dropped.
    """
    rows = band_rows(docs, num_hashes=num_hashes, bands=bands, seed=seed,
                     hasher=hasher, perm_gen=perm_gen)

    # hash-exchange on the bucket key, then ONE vectorized all-buckets pair
    # expansion per partition — the former groupby().map_groups ran a Python
    # callback per bucket (~#docs × bands tiny groups), which dominated the
    # whole pipeline; this is the same one-shuffle plan with O(1) Python calls
    from networkit_ray.common.exchange import partition_refs

    P = max(2, min(64, int(ray.cluster_resources().get("CPU", 8))))
    slices = partition_refs(rows, ["band", "band_hash"], P)
    pair_refs = [
        _bucket_pairs.remote(max_bucket, *[s[p] for s in slices]) for p in range(P)
    ]
    keep = [
        r
        for r, ok in zip(pair_refs, ray.get([_nonnull.remote(t) for t in pair_refs]))
        if ok
    ]
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    if not keep:
        return ray.data.from_arrow(pair_schema.empty_table())
    cand = ray.data.from_arrow_refs(keep)
    # cross-band duplicates live in different partitions: global distinct
    # (task-based exchange; Dataset groupby pays ~2s fixed sort-shuffle cost)
    from networkit_ray.common.exchange import exchange_unique

    return exchange_unique(cand, ["a", "b"], schema=pair_schema)


@ray.remote
def _nonnull(t) -> bool:
    return t is not None


@ray.remote
def _bucket_pairs(max_bucket: int, *tables) -> pa.Table | None:
    """All (a < b) pairs within each (band, band_hash) bucket, vectorized
    across every bucket in the partition; buckets are truncated to their
    ``max_bucket`` smallest doc_ids (same guard as before)."""
    tabs = [t for t in tables if t is not None and len(t)]
    if not tabs:
        return None
    t = pa.concat_tables(tabs)
    band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.lexsort((ids, bh, band))
    band, bh, ids = band[o], bh[o], ids[o]
    new_seg = np.empty(len(ids), dtype=bool)
    new_seg[0] = True
    new_seg[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    seg_id = np.cumsum(new_seg) - 1
    k = np.arange(len(ids)) - np.flatnonzero(new_seg)[seg_id]
    keep = k < max_bucket
    ids, k = ids[keep], k[keep]
    if not len(ids):
        return None
    seg_new = np.empty(len(ids), dtype=bool)
    seg_new[0] = True
    seg_new[1:] = k[1:] <= k[:-1]  # within-segment index resets ⇔ new bucket
    seg_start_row = np.flatnonzero(seg_new)[np.cumsum(seg_new) - 1]
    T = int(k.sum())
    if T == 0:
        return None
    # row j (within-bucket index k[j]) pairs with the k[j] earlier rows of
    # its bucket: b side repeats row j k[j] times, a side walks the bucket
    b_rows = np.repeat(np.arange(len(ids), dtype=np.int64), k)
    cum = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(k, out=cum[1:])
    a_rows = seg_start_row[b_rows] + (np.arange(T, dtype=np.int64) - cum[b_rows])
    a, b = ids[a_rows], ids[b_rows]
    # partition-local distinct shrinks the global (a, b) dedup shuffle
    o2 = np.lexsort((b, a))
    a, b = a[o2], b[o2]
    first = np.empty(T, dtype=bool)
    first[0] = True
    first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return pa.table({"a": a[first], "b": b[first]})


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sets = shingle_sets(pa.array([text_a, text_b]), k)
    sa, sb = sets[0], sets[1]
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def near_dup_pairs(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    hasher: str = "siphash",
    perm_gen: str = "pcg",
) -> ray.data.Dataset:
    """Verified near-duplicate pairs (a, b, jaccard ≥ threshold)."""
    # materialize: the emptiness check would otherwise re-execute the whole
    # LSH pipeline when the verify joins consume `cand` again
    cand = candidate_pairs(
        docs, num_hashes=num_hashes, bands=bands, seed=seed,
        hasher=hasher, perm_gen=perm_gen,
    ).materialize()
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
        both = pa.concat_arrays(
            [t["text_a"].combine_chunks(), t["text"].combine_chunks()]
        )
        # fully vectorized per-pair exact Jaccard (two segmented lexsorts,
        # no per-pair Python loop)
        ja = pairwise_jaccard(both, hasher=hasher)
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
    ).materialize()
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
