"""Co-citation and bibliographic-coupling pair scores on a link graph.

Small & Kessler's classic link-analysis similarity measures — the pairwise
companions to the reference's common-neighbor link predictor
(linkprediction/CommonNeighborsIndex.cpp:1), specialized to the two
directed projections a web graph cares about:

    cocitation(i, j) = |{u : u→i and u→j}|   (pages cited together)
    coupling(u, v)   = |{w : u→w and v→w}|   (pages citing the same things)

Coupling is exactly co-citation on the transposed graph, so one kernel
serves both.

Scale shape: partition the edge table by ``src`` (one task exchange), sort
each partition's (src, dst) runs, and emit each source's C(d, 2) dst pairs
with a stride-k vectorized sweep (k = 1..d_max — no Python loop over rows;
d_max is the per-source out-degree cap).  Per-partition pair counts are
pre-aggregated (combiner) before one (a, b) exchange sums them globally.
High-degree hubs explode quadratically, so sources with out-degree >
``max_degree`` are dropped — the standard guard (cf. the MinHash bucket
cap); at web scale the cap also bounds the stride sweep's memory to
O(E_part) per stride.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.common.exchange import exchange_unique, partition_refs


@ray.remote
def _pair_counts(max_degree: int, *tables) -> pa.Table:
    """All (a, b) a<b dst pairs per src in this partition, pre-counted."""
    ts = [t for t in tables if t is not None and len(t)]
    if not ts:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "n_common": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(ts)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    # group bounds per src run
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    ends = np.r_[starts[1:], len(src)]
    sizes = ends - starts
    keep = sizes <= max_degree
    # group id per edge, then per-edge "position within group"
    gid = np.repeat(np.arange(len(starts)), sizes)
    pos = np.arange(len(src)) - starts[gid]
    gsize = sizes[gid]
    gkeep = keep[gid]
    d_max = int(sizes[keep].max()) if keep.any() else 0
    pas_, pbs = [], []
    for k in range(1, d_max):
        m = gkeep & (pos + k < gsize)
        if not m.any():
            break
        i = np.flatnonzero(m)
        pas_.append(dst[i])
        pbs.append(dst[i + k])
    if pas_:
        a = np.concatenate(pas_)
        b = np.concatenate(pbs)
    else:
        a = b = np.empty(0, np.int64)
    pairs = pa.table(
        {
            "a": pa.array(a),
            "b": pa.array(b),
            "n_common": pa.array(np.ones(len(a), np.int64)),
        }
    )
    g = pairs.group_by(["a", "b"]).aggregate([("n_common", "sum")])
    return g.rename_columns(["a", "b", "n_common"])


_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("n_common", pa.int64())]
)


def cocitation_scores(
    edges: ray.data.Dataset,
    *,
    max_degree: int = 256,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(a, b, n_common) with a < b over all co-cited page pairs.

    ``edges`` must be a deduplicated directed link table; pairs are ordered
    by dst id so every unordered pair appears exactly once.
    """
    from networkit_ray.common.exchange import _default_parts

    P = num_parts or _default_parts(None)
    parts = partition_refs(edges, ["src"], P)
    refs = [
        _pair_counts.remote(max_degree, *[g[p] for g in parts])
        for p in range(P)
    ]
    pairs = ray.data.from_arrow_refs(refs)
    return exchange_unique(
        pairs,
        ["a", "b"],
        agg=[("n_common", "sum")],
        schema=_PAIR_SCHEMA,
        num_parts=P,
    )


def coupling_scores(
    edges: ray.data.Dataset,
    *,
    max_degree: int = 256,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(a, b, n_common) bibliographic coupling = co-citation on the
    transpose (pairs of sources sharing an out-link target)."""
    from networkit_ray.graph.build import transpose

    return cocitation_scores(
        transpose(edges), max_degree=max_degree, num_parts=num_parts
    )


def top_pairs(
    scores: ray.data.Dataset, k: int = 20
) -> ray.data.Dataset:
    """Deterministic top-k: score desc, then (a, b) asc — ties at the
    boundary resolve identically to the SQL twin's ORDER BY."""
    return scores.sort(
        ["n_common", "a", "b"], descending=[True, False, False]
    ).limit(k)
