"""Per-vertex triangle counting and local clustering coefficient.

Distributed re-expression of the reference's LocalClusteringCoefficient
"turbo" kernel (networkit/cpp/centrality/LocalClusteringCoefficient.cpp:12-94)
and TriangleEdgeScore (edgescores/TriangleEdgeScore.cpp:20-122):

- canonicalize undirected edges to (lo, hi), no self-loops;
- orient each edge from lower to higher rank where rank = (degree, id) —
  exactly the reference's ``isOutEdge`` rule (LocalClusteringCoefficient.cpp:21-23).
  Degree-ordering bounds every oriented out-degree by O(√m), which is the
  skew control for web-graph hubs (a deg-200k hub fans out only to
  higher-rank vertices);
- wedges: for each vertex u, all rank-ordered pairs (a, b) of oriented
  out-neighbors — generated per-group via ``groupby(u).map_groups``;
- closure: hash-join wedges against the oriented edge set on (a, b) — each
  triangle is found exactly once, at its lowest-rank corner;
- per-vertex counts: every triangle credits its three corners →
  ``groupby(v).count``;
- score: c(u) = 2·tri(u) / (deg(u)·(deg(u)−1)), 0 when deg<2
  (LocalClusteringCoefficient.cpp:50-52,82-83); maximum() = 1.

Shuffle keys (documented partitioning assumptions): orientation joins on the
edge endpoints, wedge grouping on the low-rank corner, closure join on
(a, b).  All steps are Dataset-native (no BSP needed — non-iterative).

Rank encoding: rank = deg·n + id packed into int64 — valid while
deg·n + id < 2^63, i.e. up to ~3e9 vertices; beyond that switch to a struct
sort key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from networkit_ray.common.schema import enforce_schema
from networkit_ray.graph.build import canonicalize, dedup_edges


def undirected_degrees(canon: ray.data.Dataset) -> ray.data.Dataset:
    """(v, deg) from a canonical (lo<hi) edge table: count both endpoints."""

    def endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t["src"].combine_chunks().cast(pa.int64()), t["dst"].combine_chunks().cast(pa.int64())]
        )
        tt = pa.table({"v": v})
        g = tt.group_by(["v"]).aggregate([([], "count_all")])
        return pa.table({"v": g["v"], "_pc": pa.compute.cast(g["count_all"], pa.int64())})

    partial = canon.map_batches(endpoints, batch_format="pyarrow")
    return partial.groupby("v").aggregate(Sum("_pc", alias_name="deg"))


def _join_parts(n_rows_hint: int) -> int:
    return max(2, min(64, n_rows_hint // 500_000 + 2))


def oriented_edges(
    canon: ray.data.Dataset, deg: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """Orient canonical edges low-rank → high-rank; columns (a, b, rb).

    rb = packed rank of b, kept so wedge generation can order neighbors
    without a third join.
    """
    n = num_nodes
    nparts = _join_parts(num_nodes)
    e1 = canon.join(deg, join_type="inner", num_partitions=nparts, on=("src",), right_on=("v",))
    e1 = e1.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "rs": pa.compute.add(
                    pa.compute.multiply(pa.compute.cast(t["deg"], pa.int64()), n),
                    pa.compute.cast(t["src"], pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    e2 = e1.join(deg, join_type="inner", num_partitions=nparts, on=("dst",), right_on=("v",))

    def orient(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        rs = t["rs"].to_numpy(zero_copy_only=False)
        rd = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64) * n + dst
        fwd = rs < rd
        a = np.where(fwd, src, dst)
        b = np.where(fwd, dst, src)
        rb = np.where(fwd, rd, rs)
        return pa.table({"a": pa.array(a), "b": pa.array(b), "rb": pa.array(rb)})

    return e2.map_batches(orient, batch_format="pyarrow")


def _wedges_group(g: pd.DataFrame) -> pd.DataFrame:
    """All rank-ordered out-neighbor pairs of one corner vertex.

    Output columns are named (x, y, corner) — distinct from the group key
    ``a`` so map_groups key reattachment can't create duplicate columns.
    """
    g = g.sort_values("rb")
    nb = g["b"].to_numpy()
    k = len(nb)
    if k < 2:
        return pd.DataFrame(
            {"x": np.empty(0, np.int64), "y": np.empty(0, np.int64),
             "corner": np.empty(0, np.int64)}
        )
    iu, ju = np.triu_indices(k, 1)
    return pd.DataFrame(
        {"x": nb[iu], "y": nb[ju], "corner": np.full(len(iu), g["a"].iloc[0])}
    )


def triangle_corners(oriented: ray.data.Dataset) -> ray.data.Dataset:
    """Triangle rows (corner, x, y): one row per triangle, found at its
    lowest-rank corner; closure via hash join on (a, b).

    ``oriented`` is materialized: it feeds both the wedge branch and the
    closure probe side, and forking an unmaterialized join lineage both
    recomputes the two degree joins and trips Ray 2.49's hash-shuffle join
    planner (schema resolution on the forked branch).  It is O(m) — the same
    footprint the BSP engine pins for the iterative kernels.
    """
    oriented = oriented.materialize()
    wedge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64()), ("corner", pa.int64())])
    wedges = oriented.groupby("a").map_groups(_wedges_group, batch_format="pandas")
    wedges = enforce_schema(wedges, wedge_schema)
    if wedges.count() == 0:
        # Ray 2.49 hash-join raises on an empty left input; short-circuit
        return ray.data.from_arrow(wedge_schema.empty_table())
    edge_keys = oriented.select_columns(["a", "b"])
    nparts = 8
    closed = wedges.join(
        edge_keys,
        join_type="inner",
        num_partitions=nparts,
        on=("x", "y"),
        right_on=("a", "b"),
    )
    return closed


def triangles_per_vertex(
    canon: ray.data.Dataset, num_nodes: int, deg: ray.data.Dataset | None = None
) -> ray.data.Dataset:
    """(v, tri) — per-vertex triangle participation counts (vertices with ≥1)."""
    if deg is None:
        deg = undirected_degrees(canon).materialize()
    tri_rows = triangle_corners(oriented_edges(canon, deg, num_nodes))

    def corners(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [
                t["x"].combine_chunks().cast(pa.int64()),
                t["y"].combine_chunks().cast(pa.int64()),
                t["corner"].combine_chunks().cast(pa.int64()),
            ]
        )
        tt = pa.table({"v": v})
        g = tt.group_by(["v"]).aggregate([([], "count_all")])
        return pa.table({"v": g["v"], "_pc": pa.compute.cast(g["count_all"], pa.int64())})

    partial = tri_rows.map_batches(corners, batch_format="pyarrow")
    return partial.groupby("v").aggregate(Sum("_pc", alias_name="tri"))


def triangle_count(canon: ray.data.Dataset, num_nodes: int) -> int:
    """Global triangle count."""
    deg = undirected_degrees(canon).materialize()
    return triangle_corners(oriented_edges(canon, deg, num_nodes)).count()


def local_clustering_coefficient(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(v, deg, tri, lcc) for every vertex with deg ≥ 1.

    c(u) = 2·tri(u)/(deg(u)(deg(u)-1)), 0 if deg < 2.
    """
    deg = undirected_degrees(canon).materialize()
    tri = triangles_per_vertex(canon, num_nodes, deg).materialize()
    if tri.count() == 0:  # triangle-free: avoid empty-side join (Ray 2.49 bug)
        return deg.map_batches(
            lambda t: pa.table(
                {
                    "v": t["v"],
                    "deg": t["deg"],
                    "tri": pa.array(np.zeros(t.num_rows, np.int64)),
                    "lcc": pa.array(np.zeros(t.num_rows, np.float64)),
                }
            ),
            batch_format="pyarrow",
        )
    nparts = _join_parts(num_nodes)
    joined = deg.join(tri, join_type="left_outer", num_partitions=nparts, on=("v",))

    def score(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        tr = t["tri"].to_numpy(zero_copy_only=False)
        tr = np.where(np.isnan(tr.astype(np.float64)), 0.0, tr).astype(np.float64)
        lcc = np.zeros(len(d))
        mask = d >= 2
        lcc[mask] = 2.0 * tr[mask] / (d[mask] * (d[mask] - 1.0))
        return pa.table(
            {
                "v": t["v"],
                "deg": t["deg"],
                "tri": pa.array(tr.astype(np.int64)),
                "lcc": pa.array(lcc),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")
