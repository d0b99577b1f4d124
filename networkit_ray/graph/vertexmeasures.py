"""Per-vertex neighborhood measures (one-shuffle join+aggregate pipelines).

- :func:`sfigality` — centrality/Sfigality.cpp:18-29: s(u) = |{v in N(u) :
  deg(u) < deg(v)}| / deg(u).  The reference divides unconditionally (NaN for
  isolated nodes); we define 0.0 for deg(u)=0, documented normative for the
  SQL twin.
- :func:`laplacian_centrality` — centrality/LaplacianCentrality.cpp:17-45:
  energy drop when u is removed.  Unweighted (ew=1): LC(u) = d_u^2 + d_u +
  2*sum_{v in N(u)} d_v; normalized divides by the total Laplacian energy
  sum_u d_u^2 + 2m.
- :func:`local_partition_coverage` — centrality/LocalPartitionCoverage.cpp:
  13-28: fraction of u's (weighted) incident edges whose other endpoint
  shares u's partition label; 0 for isolated nodes.

Scale shape: each measure is a degree/label table (one groupby), two hash
exchange-joins onto the symmetric edge table, a per-batch partial combiner,
and one final `groupby(v)` — no iteration, no driver-side vertex pulls
(the all-vertices frame is a lazy `ray.data.range`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Sum

from networkit_ray.common.exchange import exchange_join


def _all_vertices(num_nodes: int) -> ray.data.Dataset:
    return ray.data.range(num_nodes).map_batches(
        lambda t: pa.table({"v": t["id"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow",
    )


def sym_degrees(sym: ray.data.Dataset) -> ray.data.Dataset:
    """(v, deg) from a symmetric edge table: count of out-rows per src."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": t["src"].combine_chunks().cast(pa.int64())})
            .group_by(["v"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"v": g["v"], "_pc": pc.cast(g["count_all"], pa.int64())})

    return (
        sym.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("_pc", alias_name="deg"))
    )


def _edges_with_endpoint_attrs(
    sym: ray.data.Dataset, attr: ray.data.Dataset, col: str
) -> ray.data.Dataset:
    """(src, dst, <col>_u, <col>_v): attr (v, col) joined to both endpoints."""
    e1 = exchange_join(sym, attr, left_on=["src"], right_on=["v"])
    e1 = e1.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], f"{col}_u": t[col]}
        ),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, attr, left_on=["dst"], right_on=["v"])
    return e2.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                f"{col}_u": t[f"{col}_u"],
                f"{col}_v": t[col],
            }
        ),
        batch_format="pyarrow",
    )


def _per_src_sum(flagged: ray.data.Dataset, expr_col: str) -> ray.data.Dataset:
    """Partial per-batch group-by-src sum of ``expr_col`` then a final groupby."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "v": t["src"].combine_chunks().cast(pa.int64()),
                    "x": t[expr_col].combine_chunks().cast(pa.int64()),
                }
            )
            .group_by(["v"])
            .aggregate([("x", "sum")])
        )
        return pa.table({"v": g["v"], "_px": pc.cast(g["x_sum"], pa.int64())})

    return (
        flagged.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("_px", alias_name="s"))
    )


def _num_or_zero(t: pa.Table, name: str) -> np.ndarray:
    """Float column with nulls→0; zeros when the column is absent (an empty
    right-side join partition returns the left table unchanged)."""
    if name in t.column_names:
        return np.nan_to_num(
            t[name].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
        )
    return np.zeros(len(t), dtype=np.float64)


def _with_all_vertices(
    stats: ray.data.Dataset, num_nodes: int, cols: dict[str, float]
) -> ray.data.Dataset:
    """Left-join stats onto the full 0..n-1 vertex frame, filling ``cols``."""
    joined = exchange_join(
        _all_vertices(num_nodes), stats, left_on=["v"], right_on=["v"],
        join_type="left outer",
    )

    def fill(t: pa.Table) -> pa.Table:
        out = {"v": t["v"].combine_chunks().cast(pa.int64())}
        for c, default in cols.items():
            arr = t[c].combine_chunks() if c in t.column_names else None
            if arr is None:
                out[c] = pa.array(
                    np.full(len(t), default, dtype=np.float64), pa.float64()
                )
            else:
                out[c] = pc.cast(pc.coalesce(arr, pa.scalar(default)), pa.float64())
        return pa.table(out)

    return joined.map_batches(fill, batch_format="pyarrow")


def sfigality(sym: ray.data.Dataset, num_nodes: int) -> ray.data.Dataset:
    """(v, sfigality) for every vertex 0..n-1; 0.0 for isolated vertices."""
    deg = sym_degrees(sym).materialize()
    e = _edges_with_endpoint_attrs(sym, deg, "deg")
    flagged = e.map_batches(
        lambda t: t.append_column(
            "hi", pc.cast(pc.less(t["deg_u"], t["deg_v"]), pa.int64())
        ),
        batch_format="pyarrow",
    )
    cnt = _per_src_sum(flagged, "hi")
    both = exchange_join(deg, cnt, left_on=["v"], right_on=["v"], join_type="left outer")

    def score(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = _num_or_zero(t, "s")
        return pa.table(
            {
                "v": t["v"].combine_chunks().cast(pa.int64()),
                "sfigality": pa.array(np.where(d > 0, s / np.maximum(d, 1), 0.0)),
            }
        )

    stats = both.map_batches(score, batch_format="pyarrow")
    return _with_all_vertices(stats, num_nodes, {"sfigality": 0.0})


def laplacian_centrality(
    sym: ray.data.Dataset, num_nodes: int, *, normalized: bool = False
) -> ray.data.Dataset:
    """(v, lc) for every vertex; unweighted LC(u) = d_u^2 + d_u + 2*sum d_v."""
    deg = sym_degrees(sym).materialize()
    e = exchange_join(sym, deg, left_on=["dst"], right_on=["v"])
    flagged = e.map_batches(
        lambda t: pa.table({"src": t["src"], "x": t["deg"]}),
        batch_format="pyarrow",
    )
    nbr_deg = _per_src_sum(flagged, "x")
    both = exchange_join(deg, nbr_deg, left_on=["v"], right_on=["v"], join_type="left outer")

    if normalized:
        def energy(t: pa.Table) -> pa.Table:
            d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({"e": pa.array([float(np.sum(d * d + d))])})

        total = deg.map_batches(energy, batch_format="pyarrow").sum("e")
    else:
        total = 1.0

    def score(t: pa.Table, tot=total) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = _num_or_zero(t, "s")
        lc = (d * d + d + 2.0 * s) / tot
        return pa.table(
            {
                "v": t["v"].combine_chunks().cast(pa.int64()),
                "lc": pa.array(lc),
            }
        )

    stats = both.map_batches(score, batch_format="pyarrow")
    return _with_all_vertices(stats, num_nodes, {"lc": 0.0})


def permanence(
    sym: ray.data.Dataset,
    canon: ray.data.Dataset,
    labels: ray.data.Dataset,
    num_nodes: int,
) -> ray.data.Dataset:
    """(v, permanence) — centrality/PermanenceCentrality.cpp:113-160:

    perm(u) = (I(u) / E_max(u)) / deg(u) − (1 − c_in(u)) with
      I(u)     = # neighbors sharing u's community C,
      E_max(u) = max over OTHER communities of u's neighbor count there
                 (1 when u has no external neighbors),
      c_in(u)  = 2·tri_C(u) / (I(u)·(I(u)−1)) for I(u) ≥ 2 else 0, where
                 tri_C(u) = triangles through u inside C — exactly the
                 per-corner triangle count of the C-induced subgraph, so we
                 reuse :func:`triangles.triangles_per_vertex` on the
                 intra-community canonical edge table.
    deg(u) = 0 has no reference value (division by zero); engine convention
    (normative for the SQL twin): permanence(isolated) = −1.0.
    """
    from networkit_ray.graph.triangles import triangles_per_vertex

    deg = sym_degrees(sym).materialize()
    e = _edges_with_endpoint_attrs(sym, labels, "label")

    # (v, lv) neighbor-community strengths with the is-own-community mark
    def to_strength(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "v": t["src"].combine_chunks().cast(pa.int64()),
                    "lv": t["label_v"].combine_chunks().cast(pa.int64()),
                    "same": pc.cast(
                        pc.equal(t["label_u"], t["label_v"]), pa.int64()
                    ),
                }
            )
            .group_by(["v", "lv", "same"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "v": g["v"],
                "lv": g["lv"],
                "same": g["same"],
                "_pc": pc.cast(g["count_all"], pa.int64()),
            }
        )

    strength = (
        e.map_batches(to_strength, batch_format="pyarrow")
        .groupby(["v", "lv", "same"])
        .aggregate(Sum("_pc", alias_name="cnt"))
    )

    def split(t: pa.Table) -> pa.Table:
        same = t["same"].to_numpy(zero_copy_only=False).astype(bool)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "v": t["v"].combine_chunks().cast(pa.int64()),
                "i_part": pa.array(np.where(same, cnt, 0)),
                "emax_part": pa.array(np.where(~same, cnt, 0)),
            }
        )

    ie = (
        strength.map_batches(split, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("i_part", alias_name="i"), Max("emax_part", alias_name="emax"))
    )

    # intra-community canonical edges -> per-corner triangle counts
    ec = _edges_with_endpoint_attrs(canon, labels, "label")
    intra = ec.map_batches(
        lambda t: t.filter(pc.equal(t["label_u"], t["label_v"])).select(
            ["src", "dst"]
        ),
        batch_format="pyarrow",
    ).materialize()
    tri = triangles_per_vertex(intra, num_nodes)

    j1 = exchange_join(deg, ie, left_on=["v"], right_on=["v"], join_type="left outer")
    j2 = exchange_join(j1, tri, left_on=["v"], right_on=["v"], join_type="left outer")

    def score(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        i = _num_or_zero(t, "i")
        emax = np.maximum(_num_or_zero(t, "emax"), 1.0)
        trc = _num_or_zero(t, "tri")
        c_in = np.where(i >= 2, 2.0 * trc / np.maximum(i * (i - 1.0), 1.0), 0.0)
        perm = np.where(d > 0, i / emax / np.maximum(d, 1.0) - (1.0 - c_in), -1.0)
        return pa.table(
            {
                "v": t["v"].combine_chunks().cast(pa.int64()),
                "permanence": pa.array(perm),
            }
        )

    stats = j2.map_batches(score, batch_format="pyarrow")
    return _with_all_vertices(stats, num_nodes, {"permanence": -1.0})


def local_partition_coverage(
    sym: ray.data.Dataset, labels: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(v, lpc): fraction of u's incident edges inside u's own partition."""
    deg = sym_degrees(sym).materialize()
    e = _edges_with_endpoint_attrs(sym, labels, "label")
    flagged = e.map_batches(
        lambda t: t.append_column(
            "same", pc.cast(pc.equal(t["label_u"], t["label_v"]), pa.int64())
        ),
        batch_format="pyarrow",
    )
    cnt = _per_src_sum(flagged, "same")
    both = exchange_join(deg, cnt, left_on=["v"], right_on=["v"], join_type="left outer")

    def score(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = _num_or_zero(t, "s")
        return pa.table(
            {
                "v": t["v"].combine_chunks().cast(pa.int64()),
                "lpc": pa.array(np.where(d > 0, s / np.maximum(d, 1), 0.0)),
            }
        )

    stats = both.map_batches(score, batch_format="pyarrow")
    return _with_all_vertices(stats, num_nodes, {"lpc": 0.0})
