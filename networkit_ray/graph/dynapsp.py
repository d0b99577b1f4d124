"""Dynamic APSP + dynamic top-harmonic-closeness repair.

Reference: distance/DynAPSP.cpp (per-event distance repair after edge
insertions) and centrality/DynTopHarmonicCloseness.cpp (top-k harmonic
ranking maintained over the repaired distances).

Insert-event semantics (unweighted, matches the reference's hop metric):
after inserting edge {u,w}, every improved or newly reachable ordered
pair (s,t) routes through the new edge, so the repaired table is the
min-merge of the current table with the two candidate products

    d'(s,t) = min( d(s,t), d(s,u) + 1 + d(w,t), d(s,w) + 1 + d(u,t) ).

Engine shape: the two distance COLUMNS d(·,u), d(·,w) are n-row slices
(broadcast once per event via ``ray.put``); candidate pairs are
generated DISTRIBUTED by mapping over the finite-source slice and
cross-expanding against the broadcast target column inside
``map_batches``; the merge is one ``groupby(s,v).min(d)`` per event.
The n²-sized APSP table itself never visits the driver.  Events are
processed sequentially (the reference's event-stream contract); a batch
of k inserts costs k shuffles of the pair table.

Deletions are not supported (DynAPSP.cpp is insert/weight-decrease
only in the same way — a deletion invalidates paths and needs a
recompute of affected sources).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min, Sum

_INF64 = np.iinfo(np.int64).max // 4  # safe to add 1 + another distance


def _column_to(apsp: ray.data.Dataset, target: int, num_nodes: int) -> np.ndarray:
    """d(s, target) for every s, as a dense n array (INF where absent).

    One n-row filter of the pair table — undirected symmetry means this
    is also d(target, s)."""
    import pyarrow.compute as pc

    col = apsp.map_batches(
        lambda t, _tg=target: t.filter(pc.equal(t["v"], pa.scalar(_tg))),
        batch_format="pyarrow",
    ).to_pandas()
    out = np.full(num_nodes, _INF64, np.int64)
    if len(col):
        out[col["s"].to_numpy().astype(np.int64)] = (
            col["d"].to_numpy().astype(np.int64)
        )
    return out


def dyn_apsp_update(
    apsp: ray.data.Dataset,
    inserts,
    num_nodes: int,
) -> ray.data.Dataset:
    """Repair a sparse (s, v, d) APSP table after undirected edge inserts.

    ``inserts``: iterable of (u, w) pairs, processed as sequential events.
    Returns the repaired table (reachable pairs only, self rows kept).
    """
    apsp = apsp.materialize()
    for u, w in inserts:
        u, w = int(u), int(w)
        du = _column_to(apsp, u, num_nodes)  # d(s, u) == d(u, s)
        dw = _column_to(apsp, w, num_nodes)
        du_ref, dw_ref = ray.put(du), ray.put(dw)

        fs = np.flatnonzero(du < _INF64)  # sources that reach u
        src_ds = ray.data.from_arrow(
            pa.table({"s": pa.array(fs), "ds": pa.array(du[fs])})
        )

        def expand(t: pa.Table, *, _dw=dw_ref) -> pa.Table:
            dwv = ray.get(_dw) if isinstance(_dw, ray.ObjectRef) else _dw
            ft = np.flatnonzero(dwv < _INF64)  # targets reached from w
            s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
            ds = t["ds"].to_numpy(zero_copy_only=False).astype(np.int64)
            ss = np.repeat(s, len(ft))
            tt = np.tile(ft, len(s))
            dd = np.repeat(ds, len(ft)) + 1 + np.tile(dwv[ft], len(s))
            # both orientations: the symmetric term d(s,w)+1+d(u,t) is
            # exactly the transpose of this product
            return pa.table(
                {
                    "s": pa.array(np.concatenate([ss, tt])),
                    "v": pa.array(np.concatenate([tt, ss])),
                    "d": pa.array(np.concatenate([dd, dd])),
                }
            )

        cand = src_ds.map_batches(expand, batch_format="pyarrow", batch_size=256)
        apsp = (
            apsp.union(cand)
            .groupby(["s", "v"])
            .aggregate(Min("d", alias_name="d"))
            .materialize()
        )
    return apsp


def top_harmonic_from_apsp(apsp: ray.data.Dataset, k: int):
    """Top-k harmonic closeness from a (s, v, d) pair table.

    h(s) = Σ_{v≠s reachable} 1/d(s,v), rounded to 9 decimals BEFORE
    ranking (float summation order varies with block layout; rounding
    makes the ordering deterministic and SQL-twin-exact), ties broken by
    vertex id ascending.  Returns a k-row pandas DataFrame
    (rank, v, harmonic) — k-sized, driver-safe."""
    from networkit_ray.common.hashing import round_half_away

    def contrib(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = d > 0
        return pa.table(
            {
                "s": t["s"].filter(pa.array(keep)),
                "h": pa.array(1.0 / d[keep]),
            }
        )

    def rounded(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": t["s"],
                "harmonic": pa.array(
                    round_half_away(
                        t["harmonic"].to_numpy(zero_copy_only=False), 9
                    )
                ),
            }
        )

    h = (
        apsp.map_batches(contrib, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum("h", alias_name="harmonic"))
        .map_batches(rounded, batch_format="pyarrow")
        .sort(["harmonic", "s"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    import pandas as pd

    return pd.DataFrame(
        {
            "rank": np.arange(1, len(h) + 1, dtype=np.int64),
            "v": h["s"].to_numpy().astype(np.int64),
            "harmonic": h["harmonic"].to_numpy(),
        }
    )
