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
