"""Skip-gram-with-negative-sampling (SGNS) node embeddings over walks.

Reference: embedding/Node2Vec.cpp + embedding/LearnEmbedding.cpp (biased
walks feeding word2vec).  The walk kernel lives in graph/walks.py; this
module is the TRAINING half, re-expressed as synchronous distributed
minibatch SGD:

- skip-gram pairs: for every walk, (center, context) within ``window``;
- negatives: ``neg`` seeded splitmix64 draws per pair (unigram-uniform —
  the degree^0.75 table is a straightforward extension);
- each epoch broadcasts the parameter matrices once (``ray.put``), maps
  gradient PARTIALS over pair batches (vectorized numpy gather/scatter),
  sums them per partition on the driver, and applies one dense update —
  synchronous Hogwild-free SGD, deterministic up to float summation
  order.

Scale notes: parameters are n×d floats broadcast per epoch — fine to
~10⁸ entries; beyond that shard rows across actors by vertex-hash (the
gradient exchange then follows the same P×P pattern as the BSP engine).
Pairs stream; only d-dimensional gradient matrices cross the wire.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.sources.synth import _splitmix64


def skipgram_pairs(
    walks: ray.data.Dataset, window: int = 2, *, num_parts: int = 16
) -> ray.data.Dataset:
    """(center, context) pairs from a (walker, step, v) long-format walk
    table (the random_walks/node2vec_walks output shape).  Walk rows are
    hash-partitioned by walker first so a walk is paired whole even when
    its rows span input blocks."""
    from networkit_ray.common.exchange import _nonnull, partition_refs

    def pairs(*tables) -> pa.Table | None:
        live = [t for t in tables if t is not None and len(t)]
        if not live:
            return None
        t = pa.concat_tables(live)
        w = t["walker"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["step"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((p, w))
        w, p, v = w[order], p[order], v[order]
        cs, xs = [], []
        for off in range(1, window + 1):
            same = (w[off:] == w[:-off]) & (p[off:] == p[:-off] + off)
            cs.append(v[:-off][same])
            xs.append(v[off:][same])
            cs.append(v[off:][same])
            xs.append(v[:-off][same])
        c = np.concatenate(cs)
        # "idx" pins each pair's batch-local position at CONSTRUCTION time
        # (partition task = batch), so negative draws are invariant to any
        # later re-blocking of the materialized pair table
        return pa.table(
            {
                "center": pa.array(c),
                "context": pa.array(np.concatenate(xs)),
                "idx": pa.array(np.arange(len(c), dtype=np.int64)),
            }
        )

    task = ray.remote(pairs)
    slices = partition_refs(walks, ["walker"], num_parts)
    out = [task.remote(*[s[p] for s in slices]) for p in range(len(slices[0]))]
    keep = [
        r for r, ok in zip(out, ray.get([_nonnull.remote(o) for o in out])) if ok
    ]
    if not keep:
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("center", pa.int64()),
                    ("context", pa.int64()),
                    ("idx", pa.int64()),
                ]
            ).empty_table()
        )
    return ray.data.from_arrow_refs(keep)


@ray.remote
def _grad_partial(
    t: pa.Table,
    w_in_ref,
    w_out_ref,
    num_nodes: int,
    neg: int,
    seed_base: int,
    lattice: bool = False,
):
    """Dense (n, d) gradient partials for one pair batch (SGNS loss).

    ``lattice=True`` quantizes the sigmoid score and each pair's gradient
    contribution to the 2⁻²⁴ lattice (floor(x·2²⁴ + 0.5)/2²⁴): lattice
    values sum EXACTLY in float64, so partials become independent of pair
    order and re-blocking — the replayable-draw option pattern that backs
    the SQL oracle.  The default full-precision path is untouched."""
    w_in, w_out = w_in_ref, w_out_ref
    c = t["center"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = t["context"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = w_in.shape[1]
    g_in = np.zeros_like(w_in)
    g_out = np.zeros_like(w_out)
    Q = 16777216.0  # 2^24

    def sgd_pair(ctr, tgt, label):
        vi = w_in[ctr]  # (m, d)
        vo = w_out[tgt]
        score = 1.0 / (1.0 + np.exp(-np.einsum("ij,ij->i", vi, vo)))
        if lattice:
            score = np.floor(score * Q + 0.5) / Q
        coef = (label - score)[:, None]
        if lattice:
            np.add.at(g_in, ctr, np.floor(coef * vo * Q + 0.5) / Q)
            np.add.at(g_out, tgt, np.floor(coef * vi * Q + 0.5) / Q)
        else:
            np.add.at(g_in, ctr, coef * vo)
            np.add.at(g_out, tgt, coef * vi)

    sgd_pair(c, x, 1.0)
    base = np.uint64(seed_base) * np.uint64(0x100000001B3)
    if "idx" in t.column_names:
        idx = t["idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        idx = np.arange(len(c), dtype=np.uint64)
    for k in range(neg):
        negs = (
            _splitmix64(idx * np.uint64(neg) + np.uint64(k) + base)
            % np.uint64(num_nodes)
        ).astype(np.int64)
        sgd_pair(c, negs, 0.0)
    return g_in, g_out


def sgns_embeddings(
    walks: ray.data.Dataset,
    num_nodes: int,
    *,
    dim: int = 16,
    window: int = 2,
    neg: int = 3,
    epochs: int = 5,
    lr: float = 0.05,
    seed: int = 42,
    lattice: bool = False,
) -> ray.data.Dataset:
    """(v, e0..e{dim-1}) trained SGNS input embeddings.

    Flat float columns (not a list column) so the result joins/round-trips
    through parquet and the driver hash like every other table.

    ``lattice=True``: gradient contributions quantize to the 2⁻²⁴ lattice
    (see _grad_partial) and each epoch applies ONE exactly-summed update
    (the lattice partials add without rounding, so the result is
    independent of batch count/order) — the replayable mode the
    `sgns_embeddings` SQL oracle targets; accuracy tests cover both modes.
    """
    # array (not scalar) uint64 arithmetic — numpy scalars promote on overflow
    rng_base = (np.array([seed], np.uint64) * np.uint64(0x9E3779B97F4A7C15))[0]
    init = (
        _splitmix64(
            np.arange(num_nodes * dim * 2, dtype=np.uint64) + rng_base
        ).astype(np.float64)
        / 2.0**64
        - 0.5
    ) / dim
    w_in = init[: num_nodes * dim].reshape(num_nodes, dim).copy()
    w_out = init[num_nodes * dim :].reshape(num_nodes, dim).copy()

    pair_refs = skipgram_pairs(walks, window).materialize().to_arrow_refs()
    for ep in range(epochs):
        in_ref = ray.put(w_in)
        out_ref = ray.put(w_out)
        partials = ray.get(
            [
                _grad_partial.remote(
                    r, in_ref, out_ref, num_nodes, neg, seed + 1000 * ep, lattice
                )
                for r in pair_refs
            ]
        )
        if lattice:
            g_in = sum(g for g, _ in partials)  # exact: lattice multiples
            g_out = sum(g for _, g in partials)
            w_in += lr * g_in
            w_out += lr * g_out
        else:
            for g_in, g_out in partials:
                w_in += lr * g_in
                w_out += lr * g_out

    cols = {"v": pa.array(np.arange(num_nodes, dtype=np.int64))}
    for j in range(dim):
        cols[f"e{j}"] = pa.array(w_in[:, j])
    return ray.data.from_arrow(pa.table(cols))
