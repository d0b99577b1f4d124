"""Edge-table construction ops (Ray-Data-native).

Covers the reference's graph-mutation / projection surface (SURVEY.md §2.2,
§2.7) as immutable Dataset→Dataset transforms:

- ``removeSelfLoops``  (Graph.hpp:1438)        → :func:`drop_self_loops`
- ``removeMultiEdges`` (Graph.hpp:1433) + the readers' duplicate-edge drop
  (io/EdgeListReader.cpp:119-123)              → :func:`dedup_edges`
- ``GraphTools::toUndirected`` (GraphTools.hpp:325) → :func:`symmetrize` /
  :func:`canonicalize`
- ``GraphTools::transpose`` (GraphTools.hpp:352)   → :func:`transpose`
- ``Graph::degree`` family (Graph.hpp:1280-1340; centrality/DegreeCentrality.cpp)
  → :func:`degree_table`
- ``GraphTools::subgraphFromNodes`` (GraphTools.hpp:205) → :func:`subgraph`
- ``GraphTools::getContinuousNodeIds`` / ``getCompactedGraph``
  (GraphTools.hpp:377-410)                     → :func:`compact_ids`
- ``GraphTools::size/density/volume/maxDegree`` (GraphTools.hpp:21-146)
  → :func:`graph_stats` / :func:`max_degree`

All transforms are lazy, zero-copy Arrow batch functions; the only wide ops
are the dedup/degree groupby shuffles, preceded by per-batch partial
dedup/aggregation to cut exchange volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum


def dedup_edges(
    edges: ray.data.Dataset, *, agg: list[tuple] | None = None
) -> ray.data.Dataset:
    """Exact (src, dst) dedup via the raw-task hash exchange.

    Per-block partial unique (combiner) → split by key hash with
    ``num_returns=P`` (each reduce task fetches only its slice) → one
    vectorized Arrow ``group_by`` per partition.  A per-key Ray
    ``groupby(src, dst).aggregate`` creates one group per edge (tens of
    millions of 1-row groups — measured ~50× slower), and the Dataset-level
    bucketed ``groupby.map_groups`` still paid the full hash-shuffle cost;
    the raw exchange is the same pattern the BSP build uses.

    ``agg`` carries non-key columns through the dedup with an associative
    pyarrow aggregate per column (e.g. ``[("w", "sum")]`` merges parallel
    edges by summing weights, the reference's ``removeMultiEdges`` +
    ``increaseWeight`` semantics).  Extra columns without an agg fail loudly
    rather than being dropped.
    """
    from networkit_ray.common.exchange import exchange_unique

    return exchange_unique(edges, ["src", "dst"], agg=agg)


def drop_self_loops(edges: ray.data.Dataset) -> ray.data.Dataset:
    return edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])), batch_format="pyarrow"
    )


def transpose(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Reverse every edge (GraphTools::transpose)."""

    def swap(t: pa.Table) -> pa.Table:
        cols = {"src": t["dst"], "dst": t["src"]}
        for name in t.column_names:
            if name not in ("src", "dst"):
                cols[name] = t[name]
        return pa.table(cols)

    return edges.map_batches(swap, batch_format="pyarrow")


def symmetrize(
    edges: ray.data.Dataset, *, deduped: bool = True, agg: list[tuple] | None = None
) -> ray.data.Dataset:
    """Both directions present once — undirected adjacency in edge-table form."""
    both = edges.union(transpose(edges))
    return dedup_edges(both, agg=agg) if deduped else both


def canonicalize(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Each undirected edge once, as (lo, hi)."""

    def lohi(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return pa.table({"src": lo, "dst": hi})

    return dedup_edges(edges.map_batches(lohi, batch_format="pyarrow"))


def to_unweighted(edges: ray.data.Dataset) -> ray.data.Dataset:
    """GraphTools::toUnweighted (GraphTools.hpp:300): drop the weight column."""
    return edges.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    )


def to_weighted(edges: ray.data.Dataset, default: float = 1.0) -> ray.data.Dataset:
    """GraphTools::toWeighted (GraphTools.hpp:310): attach unit weights."""

    def f(t: pa.Table) -> pa.Table:
        if "w" in t.column_names:
            return t
        return t.append_column(
            "w", pa.array(np.full(t.num_rows, default, np.float64))
        )

    return edges.map_batches(f, batch_format="pyarrow")


def graph_union(
    a: ray.data.Dataset, b: ray.data.Dataset, *, agg: list[tuple] | None = None
) -> ray.data.Dataset:
    """GraphTools::merge / append analog: union of two edge tables with
    duplicate edges collapsed (weights combined per ``agg``, e.g.
    ``[("w", "sum")]``)."""
    return dedup_edges(a.union(b), agg=agg)


def degree_table(
    edges: ray.data.Dataset, *, key: str = "src", out_name: str = "deg"
) -> ray.data.Dataset:
    """Per-vertex degree: (v, deg). Pre-aggregated per batch, then groupby.

    On a directed table keyed "src" this is out-degree; keyed "dst" in-degree;
    on a symmetrized table it is the undirected degree.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key]).aggregate([([], "count_all")])
        return pa.table(
            {"v": g[key], "_pc": pc.cast(g["count_all"], pa.int64())}
        )

    partials = edges.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("v").aggregate(Sum("_pc", alias_name=out_name))
    return out


def weighted_degree_table(edges: ray.data.Dataset, w_col: str = "w") -> ray.data.Dataset:
    """(v, wdeg) — Graph::weightedDegree (Graph.hpp:1340)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([(w_col, "sum")])
        return pa.table({"v": g["src"], "_ps": g[f"{w_col}_sum"]})

    partials = edges.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("v").aggregate(Sum("_ps", alias_name="wdeg"))


def max_degree(edges: ray.data.Dataset, *, key: str = "src") -> int:
    """GraphTools::maxDegree — degree table → global max (small aggregate)."""
    deg = degree_table(edges, key=key)
    return int(deg.max("deg"))


def graph_stats(edges: ray.data.Dataset, num_nodes: int, *, directed: bool) -> dict:
    """n, m, density, volume (GraphTools.hpp:129-146).

    ``edges`` must be the directed table, or the canonical (lo,hi) table for
    undirected graphs.  volume = Σ deg = m for directed, 2m undirected.
    """
    m = edges.count()
    denom = num_nodes * (num_nodes - 1)
    density = (m / denom) if directed else (2.0 * m / denom)
    volume = m if directed else 2 * m
    return {
        "n": num_nodes,
        "m": m,
        "density": density,
        "volume": volume,
    }


def subgraph(edges: ray.data.Dataset, node_pred) -> ray.data.Dataset:
    """Induced subgraph via a vectorized predicate over vertex-id arrays.

    For an explicit (small) node set, pass
    ``lambda v: np.isin(v, broadcast_ids)`` — the set rides into every task
    via closure capture (ray serializes it once per task spec, i.e. a
    broadcast, not a shuffle join).  Large node sets should be semi-joined
    instead (see triangles.py for the join pattern).
    """

    def f(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = np.asarray(node_pred(src)) & np.asarray(node_pred(dst))
        return t.filter(pa.array(keep))

    return edges.map_batches(f, batch_format="pyarrow")


def zip_with_index(sorted_ds: ray.data.Dataset, index_name: str = "idx") -> ray.data.Dataset:
    """Attach a global dense 0-based index to an already-sorted dataset.

    Scalable dense-rank: materialize the sorted dataset, read per-block row
    counts (driver holds one int per block), then index each block with its
    offset in parallel.  Used by :func:`compact_ids`.
    """
    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_len(t: pa.Table) -> int:
        return t.num_rows

    lens = ray.get([block_len.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)

    @ray.remote
    def index_block(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(
            index_name, pa.array(np.arange(off, off + t.num_rows, dtype=np.int64))
        )

    out_refs = [index_block.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def compact_ids(
    edges: ray.data.Dataset, *, num_parts: int | None = None
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """GraphTools::getContinuousNodeIds + getCompactedGraph.

    Returns (mapping, remapped_edges): mapping (v, idx) assigns dense ids in
    ascending order of the original ids; remapped_edges uses the dense ids.
    The remap is a hash join of the edge table against the mapping on each
    endpoint (two shuffles) — never a driver-side dict at scale.
    """
    src_ids = edges.select_columns(["src"]).map_batches(
        lambda t: pa.table({"v": t["src"].combine_chunks().unique()}),
        batch_format="pyarrow",
    )
    dst_ids = edges.select_columns(["dst"]).map_batches(
        lambda t: pa.table({"v": t["dst"].combine_chunks().unique()}),
        batch_format="pyarrow",
    )
    from networkit_ray.common.exchange import exchange_join, exchange_unique

    ids = exchange_unique(src_ids.union(dst_ids), ["v"], num_parts=num_parts).sort("v")
    mapping = zip_with_index(ids, "idx").materialize()

    e1 = exchange_join(edges, mapping, left_on=["src"], right_on=["v"], num_parts=num_parts)
    e1 = e1.map_batches(
        lambda t: pa.table({"src_new": t["idx"], "dst": t["dst"]}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, mapping, left_on=["dst"], right_on=["v"], num_parts=num_parts)
    remapped = e2.map_batches(
        lambda t: pa.table({"src": t["src_new"], "dst": t["idx"]}),
        batch_format="pyarrow",
    )
    return mapping, remapped
