"""Deterministic spanning forest via distributed Borůvka rounds.

Reference family: components/RandomSpanningForest.cpp (random walk based,
sequential) and graph/SpanningForest.cpp — here re-expressed as the
classic parallel Borůvka: every component picks its minimum candidate
edge (ordered by packed (lo, hi) key — deterministic, parallelism
invariant), picked edges join the forest, components contract via the
hash-min CC kernel on the forest built so far, repeat until no edge
crosses components.  O(log n) rounds; each round is two label joins +
one per-component min + one CC call on state-sized (≤ n−1 edge) data.

Scale note: the contraction here re-runs CC on the forest (simple,
reuses the proven kernel); the cluster-scale refinement is to run
hash-min only on the CONTRACTED pseudo-forest of picked edges and
compose label maps — noted, not needed at current scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from networkit_ray.common.exchange import exchange_join, exchange_unique


def spanning_forest(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """(src, dst) edges of a deterministic minimum-key spanning forest.

    ``canon``: canonical (lo<hi, distinct) edge table.  |result| =
    num_nodes − #components; result is a subset of ``canon`` and spans
    every component (tested properties)."""
    from networkit_ray.graph.build import symmetrize
    from networkit_ray.graph.components import connected_components

    n = num_nodes
    canon = canon.select_columns(["src", "dst"]).materialize()
    forest: ray.data.Dataset | None = None

    for _ in range(max_rounds):
        if forest is None:
            labels = ray.data.from_arrow(
                pa.table(
                    {
                        "v": pa.array(np.arange(n, dtype=np.int64)),
                        "label": pa.array(np.arange(n, dtype=np.int64)),
                    }
                )
            )
        else:
            labels, _info = connected_components(
                symmetrize(forest).materialize(), n
            )
        e1 = exchange_join(
            canon,
            labels.map_batches(
                lambda t: pa.table({"v": t["v"], "ls": t["label"]}),
                batch_format="pyarrow",
            ),
            left_on=["src"],
            right_on=["v"],
        )
        el = exchange_join(
            e1,
            labels.map_batches(
                lambda t: pa.table({"v": t["v"], "ld": t["label"]}),
                batch_format="pyarrow",
            ),
            left_on=["dst"],
            right_on=["v"],
        )

        def cross(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            ls = t["ls"].to_numpy(zero_copy_only=False).astype(np.int64)
            ld = t["ld"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ls != ld
            key = src[keep] * n + dst[keep]
            return pa.table(
                {
                    "c": pa.array(np.concatenate([ls[keep], ld[keep]])),
                    "key": pa.array(np.concatenate([key, key])),
                }
            )

        cand = el.map_batches(cross, batch_format="pyarrow").materialize()
        if cand.count() == 0:
            break
        picked = cand.groupby("c").aggregate(Min("key", alias_name="key"))
        new_edges = exchange_unique(picked.select_columns(["key"]), ["key"])

        def unpack(t: pa.Table) -> pa.Table:
            key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"src": pa.array(key // n), "dst": pa.array(key % n)}
            )

        new_edges = new_edges.map_batches(unpack, batch_format="pyarrow")
        forest = (
            new_edges
            if forest is None
            else exchange_unique(forest.union(new_edges), ["src", "dst"])
        ).materialize()
    if forest is None:
        return ray.data.from_arrow(
            pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()
        )
    return forest
