"""Cover (overlapping-community) quality measures.

A cover is a (v, c) membership table — one row per membership, so a node
in three communities contributes three rows (the Dataset analog of the
reference's ``Cover`` multi-set).

References:
- :func:`cover_f1_similarity` — community/CoverF1Similarity.cpp: per
  cluster i of C, the best F1 against any reference cluster s, where
  F1 = 2·|i∩s| / (|i| + |s|) (the precision/recall harmonic mean
  simplifies to that).  Zero-overlap clusters score 0.
- :func:`cover_hub_dominance` — community/CoverHubDominance.cpp: per
  cluster c, max over members u of |neighbors of u inside c| divided by
  (|c|−1); singleton clusters score 1.

Scale shape: everything is hash joins + groupbys over membership and
edge tables — no per-row Python, no driver materialization; overlap
cells are bounded by Σ memberships², per-node, not global.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max

from networkit_ray.common.exchange import exchange_join


def cover_f1_similarity(
    cover: ray.data.Dataset, reference: ray.data.Dataset
) -> ray.data.Dataset:
    """(c, f1) — best-match F1 of each cover cluster vs the reference cover."""
    ref = reference.map_batches(
        lambda t: pa.table({"v": t["v"], "s": t["c"]}), batch_format="pyarrow"
    )
    cells = (
        exchange_join(cover, ref, left_on=["v"])
        .groupby(["c", "s"])
        .aggregate(Count(alias_name="ol"))
    )
    csize = cover.groupby("c").aggregate(Count(alias_name="a")).materialize()
    rsize = (
        ref.groupby("s").aggregate(Count(alias_name="b")).materialize()
    )
    j = exchange_join(cells, csize, left_on=["c"])
    j = exchange_join(j, rsize, left_on=["s"])

    def f1(t: pa.Table) -> pa.Table:
        ol = t["ol"].to_numpy(zero_copy_only=False).astype(np.float64)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"c": t["c"], "f1": pa.array(2.0 * ol / (a + b))})

    best = j.map_batches(f1, batch_format="pyarrow").groupby("c").aggregate(
        Max("f1", alias_name="f1")
    )
    # clusters with no overlap at all (reference doesn't cover their nodes)
    filled = exchange_join(
        csize.select_columns(["c"]), best, left_on=["c"], join_type="left outer"
    )

    def fill(t: pa.Table) -> pa.Table:
        if "f1" not in t.column_names:
            f = np.zeros(len(t))
        else:
            f = np.nan_to_num(
                t["f1"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
            )
        return pa.table({"c": t["c"], "f1": pa.array(f)})

    return filled.map_batches(fill, batch_format="pyarrow")


def cover_hub_dominance(
    canon: ray.data.Dataset, cover: ray.data.Dataset
) -> ray.data.Dataset:
    """(c, dominance) — max member internal degree over (|c|−1) per cluster."""
    bi = canon.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        t["dst"].combine_chunks().cast(pa.int64()),
                        t["src"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    cu = cover.map_batches(
        lambda t: pa.table({"u": t["v"], "c": t["c"]}), batch_format="pyarrow"
    )
    adj = exchange_join(bi, cu, left_on=["u"])
    internal = exchange_join(
        adj, cu, left_on=["nbr", "c"], right_on=["u", "c"], join_type="left semi"
    )
    per_member = internal.groupby(["c", "u"]).aggregate(Count(alias_name="ideg"))
    maxdeg = per_member.groupby("c").aggregate(Max("ideg", alias_name="maxdeg"))
    sizes = cover.groupby("c").aggregate(Count(alias_name="size")).materialize()
    j = exchange_join(sizes, maxdeg, left_on=["c"], join_type="left outer")

    def dom(t: pa.Table) -> pa.Table:
        size = t["size"].to_numpy(zero_copy_only=False).astype(np.float64)
        md = (
            t["maxdeg"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "maxdeg" in t.column_names
            else np.zeros(len(size))
        )
        md = np.where(np.isnan(md), 0.0, md)
        d = np.where(size > 1, md / np.maximum(size - 1.0, 1.0), 1.0)
        return pa.table({"c": t["c"], "dominance": pa.array(d)})

    return j.map_batches(dom, batch_format="pyarrow")


def _h(w: np.ndarray, n: float) -> np.ndarray:
    w = np.asarray(w, np.float64)
    return np.where(w > 0, -w * np.log2(np.where(w > 0, w, 1.0) / n), 0.0)


def overlapping_nmi_distance(
    cover1: ray.data.Dataset,
    cover2: ray.data.Dataset,
    num_nodes: int,
    *,
    normalization: str = "max",
) -> float:
    """LFK/McDaid overlapping-NMI dissimilarity of two covers.

    Reference: community/OverlappingNMIDistance.cpp (default MAX
    normalization).  MI = ½(H(X) − H(X|Y) + H(Y) − H(Y|X)) over per-node
    cluster indicator variables; H(X_i|Y) = min_j H*(X_i|Y_j) with the
    unadjusted-entropy fallback when h(a)+h(d) < h(b)+h(c); distance =
    1 − MI/max(H(X), H(Y)).

    Distributed part: the three size tables (two groupbys + one join
    groupby) — cluster-count-sized, pulled to the driver like
    :func:`~networkit_ray.graph.quality.nmi`'s confusion matrix; the
    entropy algebra is O(#cells) numpy.
    """
    ref = cover2.map_batches(
        lambda t: pa.table({"v": t["v"], "s": t["c"]}), batch_format="pyarrow"
    )
    cells = (
        exchange_join(cover1, ref, left_on=["v"])
        .groupby(["c", "s"])
        .aggregate(Count(alias_name="ol"))
        .to_pandas()
    )
    sx = cover1.groupby("c").aggregate(Count(alias_name="sz")).to_pandas()
    sy = ref.groupby("s").aggregate(Count(alias_name="sz")).to_pandas()
    n = float(num_nodes)
    sizes_x = dict(zip(sx["c"], sx["sz"].astype(float)))
    sizes_y = dict(zip(sy["s"], sy["sz"].astype(float)))
    if not sizes_x and not sizes_y:
        return 0.0
    if (not sizes_x) != (not sizes_y):
        return 1.0

    def ent(size):
        return float(_h(np.array([size]), n)[0] + _h(np.array([n - size]), n)[0])

    def adjusted(szx, szy, ol):
        a = n + ol - szx - szy
        b = szy - ol
        c = szx - ol
        d = ol
        ha, hb, hc, hd = (float(_h(np.array([x]), n)[0]) for x in (a, b, c, d))
        if ha + hd >= hb + hc:
            return (ha + hb + hc + hd) - ent(szy)
        return ent(szx)

    cond_x = {i: ent(s) for i, s in sizes_x.items()}
    cond_y = {j: ent(s) for j, s in sizes_y.items()}
    for i, j, ol in zip(cells["c"], cells["s"], cells["ol"].astype(float)):
        cond_x[i] = min(cond_x[i], adjusted(sizes_x[i], sizes_y[j], ol))
        cond_y[j] = min(cond_y[j], adjusted(sizes_y[j], sizes_x[i], ol))
    hx = sum(ent(s) for s in sizes_x.values())
    hy = sum(ent(s) for s in sizes_y.values())
    mi = 0.5 * (hx - sum(cond_x.values()) + hy - sum(cond_y.values()))
    if hx == 0.0 and hy == 0.0:
        nmi = 1.0
    else:
        denom = {
            "max": max(hx, hy),
            "min": min(hx, hy),
            "geometric_mean": (hx * hy) ** 0.5,
            "arithmetic_mean": 0.5 * (hx + hy),
            "joint_entropy": hx + hy - mi,
        }[normalization]
        nmi = mi / denom if denom > 0 else 0.0
    nmi = min(max(nmi, 0.0), 1.0)
    return 1.0 - nmi
