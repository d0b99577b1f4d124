"""Graph difference: the edit list transforming G1 into G2.

Reference: dynamics/GraphDifference.cpp:20-160 — emits GraphEvents
(EDGE_REMOVAL for edges of G1 missing in G2, EDGE_ADDITION for edges of
G2 missing in G1, EDGE_WEIGHT_UPDATE when an edge exists in both with a
different weight, NODE_REMOVAL / NODE_ADDITION for the vertex-set
difference).  The reference replays events in the order: edge removals,
node events, edge additions; here the edit list is an unordered table —
consumers sort by ``kind`` to recover that replay order.

Engine shape: tag each side with a bit, one union + one (src, dst)
groupby shuffle for the edge events and one endpoint groupby for the
node events — no driver-side materialization, duplicate-edge safe
(Min/Max of the side bit instead of Sum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min


def _tag(side: int, weighted: bool):
    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {
            "src": t["src"],
            "dst": t["dst"],
            "side": pa.array(np.full(n, side, np.int64)),
        }
        if weighted:
            w = (
                t["w"].cast(pa.float64())
                if "w" in t.column_names
                else pa.array(np.ones(n, np.float64))
            )
            cols["w1"] = w if side == 1 else pa.array([None] * n, pa.float64())
            cols["w2"] = w if side == 2 else pa.array([None] * n, pa.float64())
        return pa.table(cols)

    return fn


def graph_difference(
    e1: ray.data.Dataset,
    e2: ray.data.Dataset,
    *,
    weighted: bool = False,
) -> ray.data.Dataset:
    """(kind, u, v) edit table; ``v = -1`` marks node events.

    kinds: ``edge_removal`` (in G1 only), ``edge_addition`` (in G2 only),
    ``weight_update`` (both, w differs — weighted tables only),
    ``node_removal`` / ``node_addition`` (endpoint-set difference).
    """
    t1 = e1.map_batches(_tag(1, weighted), batch_format="pyarrow")
    t2 = e2.map_batches(_tag(2, weighted), batch_format="pyarrow")
    u = t1.union(t2)

    aggs = [Min("side", alias_name="lo"), Max("side", alias_name="hi")]
    if weighted:
        aggs += [Max("w1", alias_name="w1"), Max("w2", alias_name="w2")]
    presence = u.groupby(["src", "dst"]).aggregate(*aggs)

    def edge_events(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        only1 = hi == 1
        only2 = lo == 2
        kind = np.full(len(t), "", dtype=object)
        kind[only1] = "edge_removal"
        kind[only2] = "edge_addition"
        keep = only1 | only2
        if weighted:
            w1 = t["w1"].to_numpy(zero_copy_only=False)
            w2 = t["w2"].to_numpy(zero_copy_only=False)
            upd = (lo == 1) & (hi == 2) & (w1 != w2)
            kind[upd] = "weight_update"
            keep = keep | upd
        return pa.table(
            {
                "kind": pa.array(kind[keep].astype(str)),
                "u": pa.array(src[keep]),
                "v": pa.array(dst[keep]),
            }
        )

    edges_out = presence.map_batches(edge_events, batch_format="pyarrow")

    def endpoints(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "nv": pa.array(np.concatenate([src, dst])),
                "side": pa.array(np.concatenate([side, side])),
            }
        )

    nodes = (
        u.map_batches(endpoints, batch_format="pyarrow")
        .groupby("nv")
        .aggregate(Min("side", alias_name="lo"), Max("side", alias_name="hi"))
    )

    def node_events(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        nv = t["nv"].to_numpy(zero_copy_only=False).astype(np.int64)
        only1 = hi == 1
        only2 = lo == 2
        kind = np.full(len(t), "", dtype=object)
        kind[only1] = "node_removal"
        kind[only2] = "node_addition"
        keep = only1 | only2
        return pa.table(
            {
                "kind": pa.array(kind[keep].astype(str)),
                "u": pa.array(nv[keep]),
                "v": pa.array(np.full(int(keep.sum()), -1, np.int64)),
            }
        )

    nodes_out = nodes.map_batches(node_events, batch_format="pyarrow")
    return edges_out.union(nodes_out)


def apply_events(
    edges: ray.data.Dataset, events: ray.data.Dataset
) -> ray.data.Dataset:
    """Apply a ``graph_difference``-shaped edit table to an edge table.

    Reference: dynamics/GraphUpdater.cpp:16-55 replays a GraphEvent stream
    onto a graph; here edge_addition/edge_removal rows are applied in one
    union + (src, dst) groupby pass (node events carry no edge payload, so
    they are no-ops on an edge-table representation — isolated-vertex
    bookkeeping lives with the caller's ``num_nodes``).  Round-trip law:
    ``apply_events(g1, graph_difference(g1, g2)) == g2``.
    """

    def edge_edits(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        keep = (kind == "edge_addition") | (kind == "edge_removal")
        sign = np.where(kind[keep] == "edge_addition", 1, -1).astype(np.int64)
        return pa.table(
            {
                "src": pc.take(t["u"], pa.array(np.flatnonzero(keep))),
                "dst": pc.take(t["v"], pa.array(np.flatnonzero(keep))),
                "delta": pa.array(sign),
            }
        )

    base = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "delta": pa.array(np.zeros(len(t), np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    edits = events.map_batches(edge_edits, batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    merged = (
        base.union(edits)
        .groupby(["src", "dst"])
        .aggregate(Sum("delta", alias_name="d"), Count(alias_name="c"))
    )

    def resolve(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        d = t["d"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        # base rows carry delta 0, removals -1, additions +1; a valid
        # stream (graph_difference output) has at most one edit per edge
        # and never adds an existing / removes a missing edge, so:
        #   c==1, d==0  base only            -> present
        #   c==1, d==1  addition of new edge -> present
        #   c==2, d==-1 base + removal       -> absent
        present = ((c == 1) & (d >= 0)) | ((c == 2) & (d == 1))
        return pa.table(
            {
                "src": pc.take(t["src"], pa.array(np.flatnonzero(present))),
                "dst": pc.take(t["dst"], pa.array(np.flatnonzero(present))),
            }
        )

    return merged.map_batches(resolve, batch_format="pyarrow")
