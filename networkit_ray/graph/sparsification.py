"""Rank-based sparsification scores: LocalDegree and Simmelian overlap.

Reference: sparsification/LocalDegreeScore.cpp and
sparsification/SimmelianOverlapScore.cpp (both feed
GlobalThresholdFilter like the triangle/Jaccard scores in
graph/triangles.py).  Normative semantics (mirrored by the DuckDB
twins):

LocalDegree — from each endpoint u with the neighbors of u ranked by
(deg(nbr) DESC, nbr ASC), the side score of edge (u,v) is 1.0 at rank 1
else ``1 − ln(rank)/ln(deg(u))``; the edge score is the max over both
sides.  Keeping scores ≥ 1−α retains each vertex's top deg^α neighbors
— the local (per-node, degree-proportional) filter the score family is
named for.

Simmelian overlap (parametric, maxRank) — per-edge strength = triangle
count; each vertex's top-maxRank neighbors by (strength DESC, nbr ASC)
form its strong set; overlap(u,v) = |strong(u) ∩ strong(v)|.

Scale shape: one degree/strength build, one hash exchange per endpoint
ranking (per-partition numpy lexsort + grouped rank — no per-row
Python), bounded top-maxRank fan-out for the overlap join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max

from networkit_ray.common.exchange import _nonnull, exchange_join, partition_refs


def _grouped_rank(keys: np.ndarray) -> np.ndarray:
    """1-based rank within consecutive equal-key runs (keys pre-sorted)."""
    n = len(keys)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    sizes = np.diff(np.r_[starts, n])
    return np.arange(n) - np.repeat(starts, sizes) + 1


@ray.remote
def _ld_rank_part(*tables) -> pa.Table | None:
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    degv = t["degv"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dst, -degv, src))
    s, d = src[order], dst[order]
    rank = _grouped_rank(s)
    # deg(u) = size of u's run (sym table is deduplicated, both directions)
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    degu = np.repeat(np.diff(np.r_[starts, len(s)]), np.diff(np.r_[starts, len(s)]))
    with np.errstate(divide="ignore", invalid="ignore"):
        side = np.where(rank == 1, 1.0, 1.0 - np.log(rank) / np.log(degu))
    return pa.table(
        {
            "src": pa.array(np.minimum(s, d)),
            "dst": pa.array(np.maximum(s, d)),
            "score": pa.array(side),
        }
    )


def local_degree_scores(
    sym: ray.data.Dataset, num_nodes: int, *, num_parts: int | None = None
) -> ray.data.Dataset:
    """(src, dst, ld_score) over canonical edges."""
    deg = (
        sym.groupby("dst")
        .aggregate(Count(alias_name="degv"))
        .map_batches(
            lambda t: pa.table(
                {"v": t["dst"].combine_chunks().cast(pa.int64()), "degv": t["degv"]}
            ),
            batch_format="pyarrow",
        )
    )
    j = exchange_join(sym, deg, left_on=["dst"], right_on=["v"])
    slices = partition_refs(j, ["src"], num_parts or 16)
    parts = [
        _ld_rank_part.remote(*[s[p] for s in slices])
        for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    sided = ray.data.from_arrow_refs(keep)
    return (
        sided.groupby(["src", "dst"])
        .aggregate(Max("score", alias_name="ld_score"))
    )


@ray.remote
def _so_topk_part(max_rank: int, *tables) -> pa.Table | None:
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    tri = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((nbr, -tri, v))
    v, nbr = v[order], nbr[order]
    rank = _grouped_rank(v)
    keep = rank <= max_rank
    return pa.table({"v": pa.array(v[keep]), "nbr": pa.array(nbr[keep])})


def simmelian_overlap_scores(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    max_rank: int = 10,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(src, dst, overlap) over canonical edges."""
    from networkit_ray.graph.triangles import edge_triangle_scores

    tri = edge_triangle_scores(canon, num_nodes).materialize()

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "v": pa.array(np.concatenate([s, d])),
                "nbr": pa.array(np.concatenate([d, s])),
                "tri": pa.array(np.concatenate([w, w])),
            }
        )

    bi = tri.map_batches(both, batch_format="pyarrow")
    slices = partition_refs(bi, ["v"], num_parts or 16)
    parts = [
        _so_topk_part.remote(max_rank, *[s[p] for s in slices])
        for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    topk = ray.data.from_arrow_refs(keep).materialize()

    e = canon.select_columns(["src", "dst"])
    j1 = exchange_join(e, topk, left_on=["src"], right_on=["v"])
    j2 = exchange_join(
        j1, topk, left_on=["dst", "nbr"], right_on=["v", "nbr"], join_type="left semi"
    )
    ov = j2.groupby(["src", "dst"]).aggregate(Count(alias_name="overlap"))
    filled = exchange_join(e, ov, left_on=["src", "dst"], join_type="left outer")

    def fill(t: pa.Table) -> pa.Table:
        if "overlap" not in t.column_names:
            z = np.zeros(len(t), np.int64)
        else:
            z = np.nan_to_num(
                t["overlap"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
            ).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "overlap": pa.array(z)})

    return filled.map_batches(fill, batch_format="pyarrow")


@ray.remote
def _ls_rank_part(*tables) -> pa.Table | None:
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    jac = t["jaccard"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nbr, -jac, v))
    v, nbr = v[order], nbr[order]
    rank = _grouped_rank(v)
    starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
    sizes = np.diff(np.r_[starts, len(v)])
    degv = np.repeat(sizes, sizes)
    with np.errstate(divide="ignore", invalid="ignore"):
        side = np.where(rank == 1, 1.0, 1.0 - np.log(rank) / np.log(degv))
    return pa.table(
        {
            "src": pa.array(np.minimum(v, nbr)),
            "dst": pa.array(np.maximum(v, nbr)),
            "score": pa.array(side),
        }
    )


def local_similarity_scores(
    canon: ray.data.Dataset, num_nodes: int, *, num_parts: int | None = None
) -> ray.data.Dataset:
    """(src, dst, ls_score) — LocalSimilarity sparsification scores.

    Reference: sparsification/LocalSimilarityScore.cpp — the LocalDegree
    rank construction (1 at rank 1, else 1 − ln(rank)/ln(deg(u)), max
    over both sides) applied with neighbors ranked by JACCARD similarity
    (ties → smaller id) instead of degree: keeps each vertex's most
    similar neighbors under a global threshold.
    """
    from networkit_ray.graph.triangles import jaccard_edge_scores

    jac = jaccard_edge_scores(canon, num_nodes)

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": pa.array(np.concatenate([s, d])),
                "nbr": pa.array(np.concatenate([d, s])),
                "jaccard": pa.array(np.concatenate([j, j])),
            }
        )

    bi = jac.map_batches(both, batch_format="pyarrow")
    slices = partition_refs(bi, ["v"], num_parts or 16)
    parts = [
        _ls_rank_part.remote(*[s[p] for s in slices])
        for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    return (
        ray.data.from_arrow_refs(keep)
        .groupby(["src", "dst"])
        .aggregate(Max("score", alias_name="ls_score"))
    )
