"""Dynamic APSP + dynamic top-harmonic-closeness repair.

Reference: distance/DynAPSP.cpp (per-event distance repair after edge
insertions) and centrality/DynTopHarmonicCloseness.cpp (top-k harmonic
ranking maintained over the repaired distances).

Insert-event semantics (unweighted, matches the reference's hop metric):
after inserting edge {u,w}, every improved or newly reachable ordered
pair (s,t) routes through the new edge, so the repaired table is the
min-merge of the current table with the two candidate products

    d'(s,t) = min( d(s,t), d(s,u) + 1 + d(w,t), d(s,w) + 1 + d(u,t) ).

Engine shape: the pair table is pinned in the object store as P
partitions hashed by target ``v`` (each kept SORTED by the packed
(s, v) key), so

- reading a distance column d(·,x) touches ONE partition (the one
  owning v = x), not the whole n²-row table;
- candidate pairs for an insert are generated per target partition
  straight from the two broadcast columns (no Dataset shuffle);
- the min-merge is a sorted delta merge per partition (searchsorted +
  insert, exactly the PLP delta-histogram pattern) — O(part + |cand|),
  no per-event sort of the full table, no groupby exchange.

The n²-sized table never visits the driver; the two distance columns
are n-sized (vertex-state-sized, same budget as every BSP kernel).
Events are processed sequentially by default (the reference's
event-stream contract, dynamics/GraphUpdater.cpp:65).  ``batch=True``
repairs a whole event batch with joint candidate rounds iterated to a
fixpoint: round r discovers every pair whose new shortest path uses
≤ 2^r − 1 inserted edges, so the fixpoint equals the sequential result
for ANY insert batch (commuting or not) in ≤ ⌈log2(k+1)⌉ + 1 rounds —
one merge per round instead of one per event.

Deletions are not supported (DynAPSP.cpp is insert/weight-decrease
only in the same way — a deletion invalidates paths and needs a
recompute of affected sources).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

_INF64 = np.iinfo(np.int64).max // 4  # safe to add 1 + another distance


@ray.remote
def _scatter_by_v(num_parts: int, t: pa.Table) -> tuple:
    """One-pass scatter of an input block: slice q holds rows with
    v % P == q (``num_returns=P`` — each assembler fetches only its
    slice; the table is read once, not once per partition)."""
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    part = v % num_parts
    order = np.argsort(part, kind="stable")
    cut = np.searchsorted(part[order], np.arange(num_parts + 1))
    s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    vv = v[order]
    d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    return tuple(
        (s[cut[q] : cut[q + 1]], vv[cut[q] : cut[q + 1]], d[cut[q] : cut[q + 1]])
        for q in range(num_parts)
    )


@ray.remote
def _assemble_part(num_nodes: int, *slices) -> pa.Table:
    """Concat one partition's scatter slices, sorted by the packed
    (s, v) key (the order the delta merges maintain)."""
    s = np.concatenate([x[0] for x in slices]) if slices else np.empty(0, np.int64)
    v = np.concatenate([x[1] for x in slices]) if slices else np.empty(0, np.int64)
    d = np.concatenate([x[2] for x in slices]) if slices else np.empty(0, np.int64)
    o = np.argsort(s * num_nodes + v)
    return pa.table(
        {"s": pa.array(s[o]), "v": pa.array(v[o]), "d": pa.array(d[o])}
    )


@ray.remote
def _col_from_part(part_table: pa.Table, target: int, num_nodes: int) -> np.ndarray:
    """d(s, target) for every s as a dense n array (INF where absent) —
    reads only the partition owning v = target (undirected symmetry
    makes this also d(target, s))."""
    import pyarrow.compute as pc

    col = part_table.filter(pc.equal(part_table["v"], pa.scalar(target)))
    out = np.full(num_nodes, _INF64, np.int64)
    if col.num_rows:
        out[col["s"].to_numpy(zero_copy_only=False).astype(np.int64)] = col[
            "d"
        ].to_numpy(zero_copy_only=False).astype(np.int64)
    return out


def _cand_arrays(q, P, cols):
    """Candidate (s, v, d) rows landing in target partition q for the
    insert list ``cols`` = [(du, dw), ...] (both orientations)."""
    ss, vv, dd = [], [], []
    for du, dw in ((a, b) for a, b in cols):
        for dsrc, ddst in ((du, dw), (dw, du)):
            fs = np.flatnonzero(dsrc < _INF64)
            ft = np.flatnonzero(ddst < _INF64)
            ft_q = ft[ft % P == q]
            if not len(fs) or not len(ft_q):
                continue
            ss.append(np.repeat(fs, len(ft_q)))
            vv.append(np.tile(ft_q, len(fs)))
            dd.append(
                np.repeat(dsrc[fs], len(ft_q)) + 1 + np.tile(ddst[ft_q], len(fs))
            )
    if not ss:
        e = np.empty(0, np.int64)
        return e, e, e
    return np.concatenate(ss), np.concatenate(vv), np.concatenate(dd)


@ray.remote(num_returns=2)
def _merge_part(
    part_table: pa.Table, num_nodes: int, q: int, P: int, *col_refs
) -> tuple[pa.Table, int]:
    """Sorted delta min-merge of an insert batch's candidates into one
    pinned partition; returns (merged table, #rows improved or added)."""
    cols = [(col_refs[i], col_refs[i + 1]) for i in range(0, len(col_refs), 2)]
    cs, cv, cd = _cand_arrays(q, P, cols)
    if not len(cs):
        return part_table, 0
    ck = cs * num_nodes + cv
    o = np.argsort(ck)
    ck, cd = ck[o], cd[o]
    first = np.r_[True, ck[1:] != ck[:-1]]
    starts = np.flatnonzero(first)
    ck = ck[starts]
    cd = np.minimum.reduceat(cd, starts)
    s_old = part_table["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    v_old = part_table["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    d_old = part_table["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    k_old = s_old * num_nodes + v_old
    pos = np.searchsorted(k_old, ck)
    exists = np.zeros(len(ck), bool)
    rng = pos < len(k_old)
    exists[rng] = k_old[pos[rng]] == ck[rng]
    d_new = d_old.copy()
    better = np.zeros(len(ck), bool)
    better[exists] = cd[exists] < d_new[pos[exists]]
    upd = exists & better
    d_new[pos[upd]] = cd[upd]
    miss = ~exists
    changed = int(upd.sum() + miss.sum())
    if miss.any():
        k_all = np.insert(k_old, pos[miss], ck[miss])
        d_all = np.insert(d_new, pos[miss], cd[miss])
    else:
        k_all, d_all = k_old, d_new
    return (
        pa.table(
            {
                "s": pa.array(k_all // num_nodes),
                "v": pa.array(k_all % num_nodes),
                "d": pa.array(d_all),
            }
        ),
        changed,
    )


def dyn_apsp_update(
    apsp: ray.data.Dataset,
    inserts,
    num_nodes: int,
    *,
    batch: bool = False,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Repair a sparse (s, v, d) APSP table after undirected edge inserts.

    ``inserts``: iterable of (u, w) pairs.  Sequential mode (default)
    replays them one event at a time — the reference's event-stream
    contract.  ``batch=True`` repairs the whole batch with joint
    candidate rounds iterated to a fixpoint — exactly the sequential
    result (see module docstring) in ≈log2(k) merges instead of k.
    Returns the repaired table (reachable pairs only, self rows kept).
    """
    from networkit_ray.common.exchange import _default_parts

    if num_nodes > 3_037_000_499:  # n² must fit the packed int64 key
        raise ValueError(
            "dyn_apsp_update: num_nodes overflows the packed (s, v) int64 "
            "key (n^2 >= 2^63); an APSP pair table at that scale is "
            "infeasible anyway"
        )
    inserts = [(int(u), int(w)) for u, w in inserts]
    P = num_parts or _default_parts()
    refs = apsp.to_arrow_refs()
    scattered = [
        _scatter_by_v.options(num_returns=P).remote(P, r) for r in refs
    ]
    parts = [
        _assemble_part.remote(num_nodes, *[sc[q] for sc in scattered])
        for q in range(P)
    ]

    def columns_for(events):
        out = []
        for u, w in events:
            out.append(_col_from_part.remote(parts[u % P], u, num_nodes))
            out.append(_col_from_part.remote(parts[w % P], w, num_nodes))
        return out

    if not batch:
        for ev in inserts:
            col_refs = columns_for([ev])
            merged = [
                _merge_part.remote(parts[q], num_nodes, q, P, *col_refs)
                for q in range(P)
            ]
            parts = [m[0] for m in merged]
    else:
        while inserts:
            col_refs = columns_for(inserts)
            merged = [
                _merge_part.remote(parts[q], num_nodes, q, P, *col_refs)
                for q in range(P)
            ]
            parts = [m[0] for m in merged]
            if sum(ray.get([m[1] for m in merged])) == 0:
                break
    return ray.data.from_arrow_refs(parts)


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
