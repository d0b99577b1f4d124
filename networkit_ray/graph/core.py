"""k-core decomposition by distributed iterative peeling.

Reference: centrality/CoreDecomposition.cpp:185-270 — sequential bucket
peeling over a shared-memory adjacency.  The distributed re-expression peels
by rounds instead of one vertex at a time:

    k = 1; remaining = V
    repeat until remaining is empty:
        repeat:  (cascade within level k)
            deg = degrees of the induced subgraph on remaining
            R = remaining vertices with deg < k
            if R empty: break
            core[R] = k - 1; remaining -= R; drop edges touching R
        k += 1

Every vertex removed while peeling at level k has core number k-1; the
result is schedule-independent (identical to the sequential algorithm).
All steps are Dataset ops: degree aggregation + semi/anti joins on the
raw-task exchange; the edge set physically shrinks as peeling proceeds, so
later rounds get cheaper.  Round count is the graph's degeneracy-peeling
depth (small for web-like graphs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from networkit_ray.common.exchange import exchange_join
from networkit_ray.graph.build import degree_table


def core_decomposition(
    sym_edges: ray.data.Dataset, num_nodes: int, *, max_k: int = 10**6
) -> tuple[ray.data.Dataset, dict]:
    """Symmetrized edge table → (v, core) for all vertices 0..num_nodes-1.

    Isolated vertices get core 0.
    """
    cur = sym_edges.materialize()
    remaining = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(num_nodes, dtype=np.int64))})
    ).materialize()
    out_parts: list[ray.data.Dataset] = []
    k = 1
    rounds = 0
    n_remaining = num_nodes
    while n_remaining > 0 and k <= max_k:
        while True:
            rounds += 1
            if cur.count() == 0:
                # no edges left: every remaining vertex has degree 0 < k
                removed = remaining
                out_parts.append(
                    removed.map_batches(
                        lambda t, kk=k: pa.table(
                            {"v": t["v"], "core": pa.array(np.full(t.num_rows, kk - 1, np.int64))}
                        ),
                        batch_format="pyarrow",
                    ).materialize()
                )
                n_remaining = 0
                break
            deg = degree_table(cur, key="src")  # symmetric table → undirected degree
            dj = exchange_join(remaining, deg, left_on=["v"], join_type="left outer")

            def split(t: pa.Table, kk=k) -> pa.Table:
                d = (
                    t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
                    if "deg" in t.column_names
                    else np.zeros(t.num_rows)
                )
                d = np.where(np.isnan(d), 0.0, d)
                return pa.table(
                    {"v": t["v"], "low": pa.array(d < kk)}
                )

            flags = dj.map_batches(split, batch_format="pyarrow").materialize()
            removed = flags.map_batches(
                lambda t: t.filter(t["low"]).select(["v"]), batch_format="pyarrow"
            ).materialize()
            n_removed = removed.count()
            if n_removed == 0:
                break
            out_parts.append(
                removed.map_batches(
                    lambda t, kk=k: pa.table(
                        {"v": t["v"], "core": pa.array(np.full(t.num_rows, kk - 1, np.int64))}
                    ),
                    batch_format="pyarrow",
                ).materialize()
            )
            remaining = flags.map_batches(
                lambda t: t.filter(pc.invert(t["low"])).select(["v"]),
                batch_format="pyarrow",
            ).materialize()
            n_remaining -= n_removed
            if n_remaining == 0:
                break
            # induced subgraph: keep edges whose BOTH endpoints remain
            cur = exchange_join(cur, remaining, left_on=["src"], right_on=["v"], join_type="left semi")
            cur = exchange_join(cur, remaining, left_on=["dst"], right_on=["v"], join_type="left semi").materialize()
        k += 1

    result = out_parts[0]
    for part in out_parts[1:]:
        result = result.union(part)
    return result, {"max_core": k - 2, "rounds": rounds}
