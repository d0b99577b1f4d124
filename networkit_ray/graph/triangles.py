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
  out-neighbors — generated per hash partition of the corner vertex;
- closure: hash-join wedges against the oriented edge set on (a, b) — each
  triangle is found exactly once, at its lowest-rank corner;
- per-vertex counts: every triangle credits its three corners;
- score: c(u) = 2·tri(u) / (deg(u)·(deg(u)−1)), 0 when deg<2
  (LocalClusteringCoefficient.cpp:50-52,82-83); maximum() = 1.

All wide steps run on the raw-task hash exchange (common/exchange.py):
Ray 2.49's Dataset.join / per-key map_groups pay seconds of fixed actor
overhead per call, pathological for this 4-join pipeline.  Shuffle keys
(documented partitioning assumptions): orientation joins on each endpoint,
wedge grouping on the low-rank corner, closure join on (a, b).

Rank encoding: rank = deg·n + id packed into int64 — valid while
deg·n + id < 2^63, i.e. up to ~3e9 vertices; beyond that switch to a struct
sort key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from networkit_ray.common.exchange import exchange_join, partition_refs
from networkit_ray.common.schema import enforce_schema


def undirected_degrees(canon: ray.data.Dataset) -> ray.data.Dataset:
    """(v, deg) from a canonical (lo<hi) edge table: count both endpoints."""

    def endpoints(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [t["src"].combine_chunks().cast(pa.int64()), t["dst"].combine_chunks().cast(pa.int64())]
        )
        tt = pa.table({"v": v})
        g = tt.group_by(["v"]).aggregate([([], "count_all")])
        return pa.table({"v": g["v"], "_pc": pa.compute.cast(g["count_all"], pa.int64())})

    from networkit_ray.common.exchange import exchange_unique

    partial = canon.map_batches(endpoints, batch_format="pyarrow")
    # task-based exchange: the Dataset groupby's sort shuffle costs seconds
    # of fixed overhead per call at this pipeline's 4-shuffle depth
    out = exchange_unique(
        partial,
        ["v"],
        agg=[("_pc", "sum")],
        schema=pa.schema([("v", pa.int64()), ("_pc", pa.int64())]),
    )
    return out.map_batches(
        lambda t: pa.table({"v": t["v"], "deg": t["_pc"]}), batch_format="pyarrow"
    )


def oriented_edges(
    canon: ray.data.Dataset, deg: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """Orient canonical edges low-rank → high-rank; columns (a, b, rb).

    rb = packed rank of b, kept so wedge generation can order neighbors
    without a third join.  Two hash-exchange joins against the degree table.
    """
    n = num_nodes
    e1 = exchange_join(canon, deg, left_on=["src"], right_on=["v"])
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
    e2 = exchange_join(e1, deg, left_on=["dst"], right_on=["v"])

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


@ray.remote
def _wedges_part(*tables):
    """Wedges for one hash partition of corner vertices.

    Input slices hold ALL oriented out-edges of each corner assigned here;
    neighbors are rank-sorted and all ordered pairs emitted.  The per-group
    pair expansion loops over corners with numpy bodies — fine up to ~10^5
    corners per partition; the oriented out-degree is O(√m) so no corner
    explodes.
    """
    ts = [t for t in tables if t is not None]
    if not ts:
        return None
    t = pa.concat_tables(ts)
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    rb = t["rb"].to_numpy(zero_copy_only=False)
    order = np.lexsort((rb, a))
    a, b = a[order], b[order]
    change = np.empty(len(a), dtype=bool)
    change[0] = True
    change[1:] = a[1:] != a[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(a))
    xs, ys, cs = [], [], []
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2:
            continue
        nb = b[s:e]
        iu, ju = np.triu_indices(k, 1)
        xs.append(nb[iu])
        ys.append(nb[ju])
        cs.append(np.full(len(iu), a[s]))
    if not xs:
        return None
    return pa.table(
        {
            "x": pa.array(np.concatenate(xs).astype(np.int64)),
            "y": pa.array(np.concatenate(ys).astype(np.int64)),
            "corner": pa.array(np.concatenate(cs).astype(np.int64)),
        }
    )


def triangle_corners(oriented: ray.data.Dataset) -> ray.data.Dataset:
    """Triangle rows (x, y, corner): one row per triangle, found at its
    lowest-rank corner; closure via the (a, b) hash-exchange join.

    ``oriented`` is materialized: it feeds both the wedge branch and the
    closure probe side (and re-deriving would redo the two degree joins).
    """
    oriented = oriented.materialize()
    P = max(2, min(64, int(ray.cluster_resources().get("CPU", 8))))
    slices = partition_refs(oriented, ["a"], P)
    wedge_refs = [_wedges_part.remote(*[s[p] for s in slices]) for p in range(P)]
    keep = [r for r, ok in zip(wedge_refs, ray.get([_nonnull.remote(w) for w in wedge_refs])) if ok]
    wedge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64()), ("corner", pa.int64())])
    if not keep:
        return ray.data.from_arrow(wedge_schema.empty_table())
    wedges = ray.data.from_arrow_refs(keep)
    edge_keys = oriented.select_columns(["a", "b"])
    return exchange_join(
        wedges, edge_keys, left_on=["x", "y"], right_on=["a", "b"], join_type="left semi"
    )


@ray.remote
def _nonnull(t) -> bool:
    return t is not None


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

    from networkit_ray.common.exchange import exchange_unique

    partial = tri_rows.map_batches(corners, batch_format="pyarrow")
    out = exchange_unique(
        partial,
        ["v"],
        agg=[("_pc", "sum")],
        schema=pa.schema([("v", pa.int64()), ("_pc", pa.int64())]),
    )
    return out.map_batches(
        lambda t: pa.table({"v": t["v"], "tri": t["_pc"]}), batch_format="pyarrow"
    )


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
    joined = exchange_join(
        deg, tri, left_on=["v"], join_type="left outer"
    )

    def score(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        if "tri" in t.column_names:
            tr = t["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
            tr = np.where(np.isnan(tr), 0.0, tr)
        else:  # left-outer against an empty triangle set
            tr = np.zeros(len(d))
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


def edge_triangle_scores(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, tri) — per-edge triangle participation counts.

    Reference: edgescores/TriangleEdgeScore.cpp (the embeddedness score
    feeding sparsification/GlobalThresholdFilter.cpp:85).  Each triangle
    row (x, y, corner) contributes to its three canonical edges; edges in
    no triangle get tri = 0 via a left outer join from the edge table."""
    deg = undirected_degrees(canon)
    corners = triangle_corners(oriented_edges(canon, deg, num_nodes))

    def explode(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["corner"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.concatenate([np.minimum(x, y), np.minimum(c, x), np.minimum(c, y)])
        b = np.concatenate([np.maximum(x, y), np.maximum(c, x), np.maximum(c, y)])
        return pa.table({"src": pa.array(a), "dst": pa.array(b)})

    per_edge = (
        corners.map_batches(explode, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="tri"))
    )
    j = exchange_join(
        canon.select_columns(["src", "dst"]),
        per_edge,
        left_on=["src", "dst"],
        join_type="left outer",
    )

    def fill(t: pa.Table) -> pa.Table:
        if "tri" not in t.column_names:
            return pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "tri": pa.array(np.zeros(len(t), np.int64)),
                }
            )
        tri = t["tri"].to_numpy(zero_copy_only=False)
        tri = np.nan_to_num(tri.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "tri": pa.array(tri)})

    return j.map_batches(fill, batch_format="pyarrow")


def sparsify_global_threshold(
    scored_edges: ray.data.Dataset, threshold: float, *, score_col: str = "tri"
) -> ray.data.Dataset:
    """Keep edges with score ≥ threshold (sparsification/
    GlobalThresholdFilter.cpp:85 semantics, above=true)."""
    import pyarrow.compute as _pc

    return scored_edges.map_batches(
        lambda t: t.filter(_pc.greater_equal(t[score_col], threshold)),
        batch_format="pyarrow",
    )


def jaccard_edge_scores(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, jaccard) neighborhood-overlap score per edge.

    Reference: edgescores/TriangleEdgeScore + the Jaccard similarity
    attributizer (sparsification/LocalSimilarityScore family):
    J(u,v) = |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)\\{u,v}| — the intersection is the
    edge's triangle count, the union is deg(u)+deg(v)−2−tri (endpoints
    excluded; u,v are adjacent so each contributes the other)."""
    deg = undirected_degrees(canon)
    scored = edge_triangle_scores(canon, num_nodes)
    j1 = exchange_join(
        scored,
        deg.map_batches(
            lambda t: pa.table({"src": t["v"], "du": t["deg"]}),
            batch_format="pyarrow",
        ),
        left_on=["src"],
    )
    j2 = exchange_join(
        j1,
        deg.map_batches(
            lambda t: pa.table({"dst": t["v"], "dv": t["deg"]}),
            batch_format="pyarrow",
        ),
        left_on=["dst"],
    )

    def score(t: pa.Table) -> pa.Table:
        tri = t["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        du = t["du"].to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["dv"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = du + dv - 2.0 - tri
        jac = np.where(union > 0, tri / np.where(union > 0, union, 1.0), 1.0)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "jaccard": pa.array(jac)}
        )

    return j2.map_batches(score, batch_format="pyarrow")


def k_truss(
    canon: ray.data.Dataset,
    num_nodes: int,
    k: int,
    *,
    max_rounds: int = 24,
) -> tuple[ray.data.Dataset, dict]:
    """(src, dst) edges of the k-truss: the maximal subgraph where every
    edge participates in ≥ k−2 triangles WITHIN the subgraph.

    Reference family: the truss/support peeling next to
    centrality/CoreDecomposition.cpp (edge analog of the k-core).  Each
    round recomputes per-edge support on the surviving edge set (the
    existing distributed orientation-wedge-close pass) and drops weak
    edges; a fixpoint is reached in ≤ a few dozen rounds (support only
    falls, so rounds after stabilization are no-ops — the property that
    lets the DuckDB twin replay a fixed unroll)."""
    cur = canon.select_columns(["src", "dst"]).materialize()
    rounds = 0
    for _ in range(max_rounds):
        n_before = cur.count()
        if n_before == 0:
            break
        scored = edge_triangle_scores(cur, num_nodes)
        nxt = sparsify_global_threshold(scored, k - 2).select_columns(
            ["src", "dst"]
        ).materialize()
        rounds += 1
        if nxt.count() == n_before:
            cur = nxt
            break
        cur = nxt
    return cur, {"rounds": rounds}


def jaccard_distances(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, jaccard_distance) per edge — distance/JaccardDistance.cpp:
    1 − tri/(deg(u)+deg(v)−tri).  NOTE this is the cpp file's convention
    (endpoints NOT excluded from the union), different from
    :func:`jaccard_edge_scores`' sparsification convention."""
    deg = undirected_degrees(canon)
    scored = edge_triangle_scores(canon, num_nodes)
    j1 = exchange_join(
        scored,
        deg.map_batches(
            lambda t: pa.table({"src": t["v"], "du": t["deg"]}),
            batch_format="pyarrow",
        ),
        left_on=["src"],
    )
    j2 = exchange_join(
        j1,
        deg.map_batches(
            lambda t: pa.table({"dst": t["v"], "dv": t["deg"]}),
            batch_format="pyarrow",
        ),
        left_on=["dst"],
    )

    def score(t: pa.Table) -> pa.Table:
        tri = t["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        du = t["du"].to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["dv"].to_numpy(zero_copy_only=False).astype(np.float64)
        jd = 1.0 - tri / (du + dv - tri)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "jaccard_distance": pa.array(jd)}
        )

    return j2.map_batches(score, batch_format="pyarrow")


def adamic_adar_distances(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, aa_distance) per edge — distance/AdamicAdarDistance.cpp:
    1 / Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg(w)).  An edge with no common neighbor
    has an infinite distance; it is reported as the sentinel −1 (SQL-
    twinned the same way) so the column stays finite and hashable.

    Scale shape: one triangle enumeration, one degree join on the
    triangle corners, exploded per-edge contributions, one groupby —
    no per-row Python.
    """
    deg = undirected_degrees(canon).materialize()
    corners = triangle_corners(oriented_edges(canon, deg, num_nodes))

    def explode(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["corner"].to_numpy(zero_copy_only=False).astype(np.int64)
        # each triangle contributes to each of its edges 1/ln(deg(opposite))
        e_lo = np.concatenate([np.minimum(x, y), np.minimum(x, c), np.minimum(y, c)])
        e_hi = np.concatenate([np.maximum(x, y), np.maximum(x, c), np.maximum(y, c)])
        opp = np.concatenate([c, y, x])
        return pa.table(
            {"src": pa.array(e_lo), "dst": pa.array(e_hi), "w": pa.array(opp)}
        )

    contrib = corners.map_batches(explode, batch_format="pyarrow")
    jd = exchange_join(
        contrib,
        deg.map_batches(
            lambda t: pa.table({"w": t["v"], "degw": t["deg"]}),
            batch_format="pyarrow",
        ),
        left_on=["w"],
    )

    def inv_log(t: pa.Table) -> pa.Table:
        d = t["degw"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "s": pa.array(1.0 / np.log(d))}
        )

    sums = (
        jd.map_batches(inv_log, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("s", alias_name="aa_sum"))
    )
    filled = exchange_join(
        canon.select_columns(["src", "dst"]),
        sums,
        left_on=["src", "dst"],
        join_type="left outer",
    )

    def final(t: pa.Table) -> pa.Table:
        s = (
            t["aa_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "aa_sum" in t.column_names
            else np.zeros(len(t))
        )
        s = np.where(np.isnan(s), 0.0, s)
        aa = np.where(s > 0, 1.0 / np.where(s > 0, s, 1.0), -1.0)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "aa_distance": pa.array(aa)}
        )

    return filled.map_batches(final, batch_format="pyarrow")


def quadrangle_edge_scores(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, quad) — per-edge quadrangle (4-cycle) counts.

    Reference: edgescores/ChibaNishizekiQuadrangleEdgeScore.cpp.  Identity
    used for the distributed form: for edge (u,v),
    ``quad = Σ_{w ∈ N(v)\\{u}} (cn(u,w) − 1)`` — w ∈ N(v) always shares
    the common neighbor v with u, which is exactly the disallowed x = v,
    hence the −1; the remaining common neighbors x close a 4-cycle
    u−v−w−x−u.  cn comes from one wedge pass (adjacent pairs INCLUDED,
    unlike link prediction's anti-join).

    Scale shape: one wedge groupby + one path-2 join + one aggregate —
    Σdeg² rows, the same budget as triangle counting's wedge pass.
    """
    from networkit_ray.graph.linkpred import _wedge_pairs

    sym = canon.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        t["dst"].combine_chunks().cast(pa.int64()),
                        t["src"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    cn = (
        _wedge_pairs(sym, None)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="cn"))
        .materialize()
    )
    # directed path-2 rows: (u, v, w) with w ∈ N(v), w ≠ u
    e2 = exchange_join(
        sym.map_batches(
            lambda t: pa.table({"u": t["src"], "v": t["dst"]}),
            batch_format="pyarrow",
        ),
        sym.map_batches(
            lambda t: pa.table({"v": t["src"], "w": t["dst"]}),
            batch_format="pyarrow",
        ),
        left_on=["v"],
    )
    def keyize(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.not_equal(t["u"], t["w"]))
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("a", pa.array(np.minimum(u, w))).append_column(
            "b", pa.array(np.maximum(u, w))
        )

    e2 = e2.map_batches(keyize, batch_format="pyarrow")
    j = exchange_join(e2, cn, left_on=["a", "b"])

    def contrib(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.minimum(u, v)),
                "dst": pa.array(np.maximum(u, v)),
                "q": pa.array(c - 1),
            }
        )

    sums = (
        j.map_batches(contrib, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("q", alias_name="quad"))
    )
    filled = exchange_join(
        canon.select_columns(["src", "dst"]),
        sums,
        left_on=["src", "dst"],
        join_type="left outer",
    )

    def final(t: pa.Table) -> pa.Table:
        q = (
            t["quad"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "quad" in t.column_names
            else np.zeros(len(t))
        )
        # each 4-cycle is found once per edge ORIENTATION (the path-2 rows
        # run over both directions), so the per-edge sum is exactly 2×quad
        q = (np.where(np.isnan(q), 0.0, q) / 2).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "quad": pa.array(q)})

    return filled.map_batches(final, batch_format="pyarrow")


def geometric_mean_scores(
    scored: ray.data.Dataset, score_col: str
) -> ray.data.Dataset:
    """(src, dst, gm_score) — attribute normalized by the geometric mean of
    its endpoint sums (edgescores/GeometricMeanScore.cpp):
    ``a_e / √(Σ_u a · Σ_v a)``; edges with a_e = 0 score 0."""
    both = scored.map_batches(
        lambda t: pa.table(
            {
                "v": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "a": pa.concat_arrays(
                    [
                        t[score_col].combine_chunks().cast(pa.float64()),
                        t[score_col].combine_chunks().cast(pa.float64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    sums = both.groupby("v").aggregate(Sum("a", alias_name="s")).materialize()
    j = exchange_join(scored, sums, left_on=["src"], right_on=["v"])
    j = j.map_batches(
        lambda t: t.rename_columns(["su" if c == "s" else c for c in t.column_names]),
        batch_format="pyarrow",
    )
    j = exchange_join(j, sums, left_on=["dst"], right_on=["v"])

    def gm(t: pa.Table) -> pa.Table:
        a = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        su = t["su"].to_numpy(zero_copy_only=False).astype(np.float64)
        sv = t["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.where(a > 0, a / np.sqrt(np.maximum(su * sv, 1e-300)), 0.0)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "gm_score": pa.array(out)}
        )

    return j.map_batches(gm, batch_format="pyarrow")
