"""Luby maximal independent set — deterministic distributed rounds.

Reference: independentset/Independent set (Luby's algorithm).  Each round
every ACTIVE vertex draws a priority; a vertex wins (joins the MIS) iff
its priority is strictly smaller than every active neighbor's; winners
and their neighbors deactivate.  Expected O(log n) rounds.

Determinism contract (walks.py style, so the DuckDB twin can replay it):
    prio(v, round) = ((v+1)·GOLD + (round+1)·MIX) mod 2^64
Multiplicative-congruential: bijective in v for a fixed round, so
priorities within a round are all distinct — no tie-breaking needed.

Everything is a state-sized Dataset op: one prio map, one min-aggregate
over edges from active vertices, one semi-join to deactivate.  The edge
table is re-filtered against the active set each round (shrinks fast).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from networkit_ray.common.exchange import exchange_join

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def _prio(v: np.ndarray, rnd: int) -> np.ndarray:
    return (v.astype(np.uint64) + np.uint64(1)) * _GOLD + np.uint64(rnd + 1) * _MIX


def luby_mis(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    max_rounds: int = 64,
) -> tuple[ray.data.Dataset, dict]:
    """(v,) members of a deterministic maximal independent set + info."""
    active = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(num_nodes, dtype=np.int64))})
    ).materialize()
    edges = sym.select_columns(["src", "dst"]).materialize()
    mis_parts: list[ray.data.Dataset] = []
    rounds = 0
    for rnd in range(max_rounds):
        if active.count() == 0:
            break
        rounds += 1
        # edges with BOTH endpoints active (two semi-joins, shrinking)
        e1 = exchange_join(edges, active, left_on=["src"], right_on=["v"], join_type="left semi")
        ea = exchange_join(e1, active, left_on=["dst"], right_on=["v"], join_type="left semi")

        def with_prio(t: pa.Table, rnd=rnd) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "dst": t["dst"],
                    # int64 view: uint64 order is preserved under the view
                    # IFF we compare as unsigned — shift to signed order by
                    # xor with the sign bit so Min() works on int64
                    "p": pa.array(
                        (_prio(src, rnd) ^ np.uint64(1 << 63)).view(np.int64)
                    ),
                }
            )

        nbr_min = (
            ea.map_batches(with_prio, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Min("p", alias_name="nbr_min"))
        )
        j = exchange_join(
            active,
            nbr_min.map_batches(
                lambda t: pa.table({"v": t["dst"], "nbr_min": t["nbr_min"]}),
                batch_format="pyarrow",
            ),
            left_on=["v"],
            join_type="left outer",
        )

        def pick(t: pa.Table, rnd=rnd) -> pa.Table:
            import pyarrow.compute as pc

            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            own = (_prio(v, rnd) ^ np.uint64(1 << 63)).view(np.int64)
            if "nbr_min" in t.column_names:
                # fill nulls in int64 (a float round-trip would corrupt
                # full-range priorities — int64 > 2^53 is not float-exact)
                nm = (
                    pc.fill_null(t["nbr_min"], np.iinfo(np.int64).max)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                win = own < nm
            else:
                win = np.ones(len(v), dtype=bool)
            return pa.table({"v": pa.array(v[win])})

        winners = j.map_batches(pick, batch_format="pyarrow").materialize()
        mis_parts.append(winners)
        # deactivate winners ∪ neighbors(winners)
        nbrs = exchange_join(
            ea, winners, left_on=["src"], right_on=["v"], join_type="left semi"
        ).map_batches(lambda t: pa.table({"v": t["dst"]}), batch_format="pyarrow")
        removed = winners.union(nbrs)
        active = exchange_join(
            active, removed, left_on=["v"], join_type="left anti"
        ).materialize()
        edges = ea.materialize()
    out = mis_parts[0] if mis_parts else ray.data.from_arrow(
        pa.schema([("v", pa.int64())]).empty_table()
    )
    for p in mis_parts[1:]:
        out = out.union(p)
    return out, {"rounds": rounds}
