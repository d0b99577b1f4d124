"""SEIR epidemic simulation — deterministic synchronous supersteps.

Reference: simulation/EpidemicSimulationSEIR.cpp:18-100 — states
S(usceptible)=0, E(xposed)=1, I(nfectious)=2, R(emoved)=3 with timestamps;
per step every I node contacts its neighbors (an S contact becomes E with
probability transP), E becomes I after eTime steps, I becomes R after iTime
steps; a census of state counts is recorded each step.

The reference sweeps nodes in parallel with in-place mutation (racy contact
order).  We define the deterministic synchronous schedule (normative for the
SQL twin): all transitions at step t read the state at the START of step t —
  newE  = S nodes with >= 1 successful contact coin from a start-of-step I
          neighbor, coin(u->v, t) = ((u*n + v + 1)*GOLD + (t+1)*MIX) mod 2^64
          <= floor(transP * 2^64)  (mis.py determinism pattern),
  E->I  when t - ts >= eTime,  I->R when t - ts >= iTime
and the census for step t is taken AFTER the step's transitions.

Scale shape per step: one semi-join of edges against the I frontier
(frontier-sized messages), one distinct, one vertex-state join — no
driver-side vertex pulls; the census is a 4-row aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

from networkit_ray.common.exchange import exchange_join, exchange_unique

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def seir(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    t_max: int = 8,
    trans_p: float = 0.3,
    e_time: int = 2,
    i_time: int = 3,
    zero: int = 0,
) -> ray.data.Dataset:
    """Census table (t, s, e, i, r) for t = 0..t_max-1."""
    n = np.uint64(num_nodes)
    thresh = np.uint64(int(trans_p * 2.0**64)) if trans_p < 1.0 else np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    edges = sym.select_columns(["src", "dst"]).materialize()

    def init(t: pa.Table) -> pa.Table:
        v = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = np.where(v == zero, 2, 0).astype(np.int64)
        return pa.table(
            {
                "v": pa.array(v),
                "st": pa.array(st),
                "ts": pa.array(np.zeros(len(v), dtype=np.int64)),
            }
        )

    state = ray.data.range(num_nodes).map_batches(
        init, batch_format="pyarrow"
    ).materialize()

    census_rows = []
    for t in range(t_max):
        iset = state.map_batches(
            lambda b: b.filter(pc.equal(b["st"], 2)).select(["v"]),
            batch_format="pyarrow",
        )
        live = exchange_join(
            edges, iset, left_on=["src"], right_on=["v"], join_type="left semi"
        )

        def coins(b: pa.Table, _t=t) -> pa.Table:
            src = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
            # scalar term via Python-int wrap: same mod-2^64 value, but no
            # numpy scalar-overflow RuntimeWarning (array ops wrap silently)
            tmix = np.uint64(((_t + 1) * int(_MIX)) & 0xFFFFFFFFFFFFFFFF)
            h = (src * n + dst + np.uint64(1)) * _GOLD + tmix
            ok = h <= thresh
            d = dst[ok].astype(np.int64)
            return pa.table(
                {
                    "c": pa.array(d),
                    "hit": pa.array(np.ones(len(d), dtype=np.int64)),
                }
            )

        contacted = exchange_unique(
            live.map_batches(coins, batch_format="pyarrow"),
            ["c"],
            agg=[("hit", "min")],
            schema=pa.schema([("c", pa.int64()), ("hit", pa.int64())]),
        )
        joined = exchange_join(
            state, contacted, left_on=["v"], right_on=["c"], join_type="left outer"
        )

        def step(b: pa.Table, _t=t) -> pa.Table:
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            st = b["st"].to_numpy(zero_copy_only=False).astype(np.int64)
            ts = b["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
            # left outer join marker: matched rows carry a non-null payload
            # (an empty right partition returns the left table unchanged)
            if "hit" in b.column_names:
                hit = pc.is_valid(b["hit"]).to_numpy(zero_copy_only=False)
            else:
                hit = np.zeros(len(b), dtype=bool)
            new_st = st.copy()
            new_ts = ts.copy()
            to_e = (st == 0) & hit
            to_i = (st == 1) & (_t - ts >= e_time)
            to_r = (st == 2) & (_t - ts >= i_time)
            new_st[to_e], new_ts[to_e] = 1, _t
            new_st[to_i], new_ts[to_i] = 2, _t
            new_st[to_r], new_ts[to_r] = 3, _t
            return pa.table(
                {"v": pa.array(v), "st": pa.array(new_st), "ts": pa.array(new_ts)}
            )

        state = joined.map_batches(step, batch_format="pyarrow").materialize()
        cen = {
            int(r["st"]): int(r["c"])
            for r in state.groupby("st").aggregate(Count(alias_name="c")).take_all()
        }
        census_rows.append(
            {
                "t": t,
                "s": cen.get(0, 0),
                "e": cen.get(1, 0),
                "i": cen.get(2, 0),
                "r": cen.get(3, 0),
            }
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "t": pa.array([r["t"] for r in census_rows], pa.int64()),
                "s": pa.array([r["s"] for r in census_rows], pa.int64()),
                "e": pa.array([r["e"] for r in census_rows], pa.int64()),
                "i": pa.array([r["i"] for r in census_rows], pa.int64()),
                "r": pa.array([r["r"] for r in census_rows], pa.int64()),
            }
        )
    )
