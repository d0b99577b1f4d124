"""PLM / Louvain modularity communities — distributed local moving + coarsening.

Reference: networkit/cpp/community/PLM.cpp:83-196 (tryMove / coarsen /
prolong; the fork's headline MPLM/OPLM variants share the same phase
structure) and coarsening/ParallelPartitionCoarsening.cpp:22-100.

Phase structure, re-expressed for the BSP engine + Datasets:

1. LOCAL MOVING (BSP supersteps on the pinned weighted CSR):
   - the per-(vertex, neighbor-community) weight histogram w(u→C) is the
     SAME map/combine kernel PLP uses (graph/plp.py:_plp_map is reused
     verbatim — hub skew absorbed in per-source-partition combiners);
   - community volumes vol(C) live with C's owner partition (C % P) as a
     dense array indexed C // P; each round the reduce side PULLS the
     volumes of its candidate communities (two small task waves, like the
     CC pointer-jumping pull) and pushes back ±degw volume deltas for the
     applied moves;
   - modularity gain (PLM.cpp:112-125, γ=1 unless set):
         ΔQ(u: A→B) = (w(u→B) − w(u→A\\{u}))/m
                      − γ·degw(u)·(vol(B) − (vol(A) − degw(u)))/(2m²)
     best B per u, ties → smallest community id;
   - the reference moves asynchronously (benign races); a naive synchronous
     schedule oscillates (adjacent vertices swap forever), so moves are
     PARITY-GATED: at round t only vertices with (v + t) even may move —
     deterministic, partition-count-invariant, and the standard
     2-coloring fix for synchronous Louvain.

2. COARSENING (Dataset ops): edges → (label[src], label[dst], w) via two
   hash-exchange joins, summed with the weighted dedup exchange; community
   ids compacted to a dense universe (build.compact_ids); the coarse
   self-loop (C,C) carries 2·in(C) so the coarse weighted degree equals the
   community volume exactly.  Self-loop rows are held OUT of the coarse BSP
   block (the gain formula needs w(u→A\\{u})) and added back into degw.

3. PROLONGATION: each level's coarse labels are translated back to
   original-vertex representative ids via the compaction mapping, then
   joined onto the finer labels — label chains never touch the driver.

Determinism: synchronous schedule + min-id tie-breaks + parity gating +
sorted compaction ⇒ bit-identical labels across partition and CPU counts
(tested), unlike the reference's race-dependent output (its own tests
assert modularity properties, not exact labels — CommunityGTest.cpp:52-107).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph
from networkit_ray.graph.plp import _plp_map


@ray.remote
def _lv_init_labels(vids: np.ndarray) -> np.ndarray:
    return vids.copy()


@ray.remote
def _lv_degw(block: dict, selfw: np.ndarray | None) -> np.ndarray:
    """Weighted degree per owned vertex: non-self row sums + self-loop weight."""
    w = block["w"]
    if w is None:
        deg = block["out_deg"].astype(np.float64)
    else:
        deg = np.zeros(len(block["out_deg"]), np.float64)
        np.add.at(deg, block["src_local"], w)
    if selfw is not None:
        deg = deg + selfw
    return deg


@ray.remote
def _lv_init_vol(degw: np.ndarray) -> np.ndarray:
    # community C starts as singleton {C}; vol array indexed by C // P
    return degw.copy()


def _group_sum_dc(d, c, w):
    """Group (d, c) rows summing w; returns (d, c, w) sorted by (d, c).
    Packed single-key introsort when the key fits int64 (same trick as
    the PLP map, ~10× a two-key lexsort); lexsort fallback otherwise."""
    cl = c.astype(np.int64)
    cmax = int(cl.max())
    if (cmax + 1) * (int(d.max()) + 1) < 2**62:
        o = np.argsort(d * (cmax + 1) + cl)
    else:
        o = np.lexsort((cl, d))
    d, c, w = d[o], c[o], w[o]
    newg = np.empty(len(d), dtype=bool)
    newg[0] = True
    newg[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    starts = np.flatnonzero(newg)
    return d[starts], c[starts], np.add.reduceat(w, starts)


def _argmax_heads_per_d(d, gain):
    """Per d-segment (rows sorted by (d, c)) the index of the first row
    attaining the segment max gain — i.e. max-gain with min-c tie-break —
    via reduceat + first-hit scan (O(n), replaces a 3-key lexsort)."""
    seg_change = d[1:] != d[:-1]
    seg_starts = np.flatnonzero(np.concatenate(([True], seg_change)))
    segmax = np.maximum.reduceat(gain, seg_starts)
    seg_id = np.zeros(len(d), np.int64)
    seg_id[1:] = np.cumsum(seg_change)
    hit = np.flatnonzero(gain == segmax[seg_id])
    seg_of_hit = seg_id[hit]
    first = np.empty(len(hit), dtype=bool)
    first[0] = True
    first[1:] = seg_of_hit[1:] != seg_of_hit[:-1]
    return hit[first]


@ray.remote
def _lv_gather(num_nodes: int, num_parts: int, labels: np.ndarray, *partials) -> tuple:
    """Combine histogram partials; returns P owner-grouped unique-community
    request slices + one candidate dict (num_returns = P + 1)."""
    n_v = len(labels)
    ds = [p[0] for p in partials if len(p[0])]
    d = np.concatenate(ds) if ds else np.empty(0, np.int64)
    c = (
        np.concatenate([p[1] for p in partials if len(p[0])])
        if ds
        else np.empty(0, np.uint64)
    )
    w = (
        np.concatenate([p[2] for p in partials if len(p[0])])
        if ds
        else np.empty(0, np.float64)
    )
    # ensure every vertex's OWN community is a candidate row (w += 0)
    d = np.concatenate([d, np.arange(n_v, dtype=np.int64)])
    c = np.concatenate([c, labels])
    w = np.concatenate([w, np.zeros(n_v, np.float64)])
    if len(d):
        d, c, w = _group_sum_dc(d, c, w)

    uniq, inv = np.unique(c, return_inverse=True)
    owner, loc = bsp.vplace(uniq, num_nodes, num_parts)
    order = np.argsort(owner, kind="stable")
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    cut = np.searchsorted(owner[order], np.arange(num_parts + 1))
    loc_g = loc[order]
    cand = {"d": d, "c": c, "w": w, "inv": pos[inv.astype(np.int64)]}
    # ship pre-resolved LOCAL indices so responders do a plain gather
    return tuple(loc_g[cut[q] : cut[q + 1]] for q in range(num_parts)) + (cand,)


@ray.remote
def _lv_volresp(vol: np.ndarray, *reqs) -> tuple:
    return tuple(vol[r] for r in reqs)


@ray.remote
def _lv_apply(
    cand: dict,
    labels: np.ndarray,
    degw: np.ndarray,
    vids: np.ndarray,
    num_nodes: int,
    num_parts: int,
    parity: int,
    m: float,
    gamma: float,
    *vol_slices,
) -> tuple:
    """Pick best move per vertex, apply parity-gated moves; returns
    (new_labels, n_moves, q_own_partial, per-owner (community, ±degw)
    volume deltas) with num_returns = 3 + P.

    ``q_own_partial`` = Σ_u w(u→A_u\\{u}) over this partition's PRE-move
    labels — the coverage half of the modularity monitor."""
    d, c, w, inv = cand["d"], cand["c"], cand["w"], cand["inv"]
    vol_u = (
        np.concatenate(vol_slices) if vol_slices else np.empty(0, np.float64)
    )
    vol_c = vol_u[inv]
    A = labels[d]
    degw_d = degw[d]
    is_own = c == A
    # w(u→A\{u}) per row's vertex: scatter the own-community weight
    w_own = np.zeros(len(labels), np.float64)
    w_own[d[is_own]] = w[is_own]
    vol_A = np.zeros(len(labels), np.float64)
    vol_A[d[is_own]] = vol_c[is_own]
    gain = (w - w_own[d]) / m - gamma * degw_d * (
        vol_c - (vol_A[d] - degw_d)
    ) / (2.0 * m * m)
    gain[is_own] = 0.0
    # best per vertex: max gain, ties → smallest community id (rows sorted
    # by (d, c) since _group_sum_dc)
    best_c = labels.copy()
    best_g = np.zeros(len(labels), np.float64)
    if len(d):
        heads = _argmax_heads_per_d(d, gain)
        best_c[d[heads]] = c[heads]
        best_g[d[heads]] = gain[heads]

    move = (best_g > 1e-12) & (best_c != labels)
    # parity gate on a multiplicative-hash bit of the ORIGINAL vertex id:
    # partition-count-invariant (depends only on v) and pseudorandom w.r.t.
    # the adjacency — an effective 2-coloring that suppresses synchronous
    # swap oscillation; alternates each round so both halves get to move
    color = (
        (vids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(63)
    ).astype(np.int64)
    move &= color == parity
    n_moves = int(move.sum())
    new_labels = labels.copy()
    new_labels[move] = best_c[move]

    # volume deltas: -degw to old community, +degw to new
    mc_old, mc_new = labels[move], best_c[move]
    mw = degw[move]
    dc = np.concatenate([mc_old, mc_new])
    dv = np.concatenate([-mw, mw])
    owner, dloc = bsp.vplace(dc, num_nodes, num_parts)
    order = np.argsort(owner, kind="stable")
    cut = np.searchsorted(owner[order], np.arange(num_parts + 1))
    dloc, dv = dloc[order], dv[order]
    deltas = tuple(
        (dloc[cut[q] : cut[q + 1]], dv[cut[q] : cut[q + 1]])
        for q in range(num_parts)
    )
    return (new_labels, n_moves, float(w_own.sum())) + deltas


@ray.remote
def _lv_vol2(vol: np.ndarray) -> float:
    return float(vol @ vol)


@ray.remote
def _lv_volupdate(vol: np.ndarray, *delta_slices) -> np.ndarray:
    new = vol.copy()
    for keys, vals in delta_slices:
        if len(keys):
            np.add.at(new, keys, vals)
    return new


def _local_move_refs(
    g: PGraph,
    m: float,
    selfw_refs: list | None,
    *,
    gamma: float = 1.0,
    max_rounds: int = 32,
    patience: int = 3,
) -> tuple[list, int, float, float]:
    """Parity-gated synchronous local moving with a modularity monitor.

    Synchronous moves against stale volumes do NOT guarantee a global
    modularity increase, so on weak community structure the move count
    never reaches zero (vertices churn between near-equal communities
    indefinitely).  Convergence is therefore driven by the objective: each
    round the (pre-move) modularity Q̂ = Σw_own/(2m) − γ·Σvol²/(4m²) is
    computed from per-partition partials; the BEST-Q̂ label snapshot is
    kept, and the loop stops once Q̂ has not improved for ``patience``
    rounds (or at move-free fixpoint / max_rounds).  Deterministic, and
    the returned labels are always the best partition seen.
    """
    P = g.num_parts
    degw = [
        _lv_degw.remote(g.block_refs[p], selfw_refs[p] if selfw_refs else None)
        for p in range(P)
    ]
    labels = [_lv_init_labels.remote(g.vid_refs[p]) for p in range(P)]
    vol = [_lv_init_vol.remote(degw[p]) for p in range(P)]
    units = g.map_units()
    total_moves = 0
    idle_parity = 0
    best_q = -np.inf
    q_init = None
    best_labels = labels
    stale = 0
    for rnd in range(max_rounds):
        map_out = [
            _plp_map.options(num_returns=P).remote(g.block_refs[p], labels[p], c)
            for p, c in units
        ]
        gather = [
            _lv_gather.options(num_returns=P + 1).remote(
                g.num_nodes, P, labels[q], *[mo[q] for mo in map_out]
            )
            for q in range(P)
        ]
        resp = [
            _lv_volresp.options(num_returns=P).remote(
                vol[q], *[gather[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        applied = [
            _lv_apply.options(num_returns=P + 3).remote(
                gather[p][P],
                labels[p],
                degw[p],
                g.vid_refs[p],
                g.num_nodes,
                P,
                rnd & 1,
                m,
                gamma,
                *[resp[q][p] for q in range(P)],
            )
            for p in range(P)
        ]
        vol2 = [_lv_vol2.remote(vol[q]) for q in range(P)]
        new_labels = [applied[p][0] for p in range(P)]
        new_vol = [
            _lv_volupdate.remote(
                vol[q], *[applied[p][3 + q] for p in range(P)]
            )
            for q in range(P)
        ]
        # ONE driver sync per round: moves + coverage partials + vol² together
        stats = ray.get(
            [applied[p][1] for p in range(P)]
            + [applied[p][2] for p in range(P)]
            + vol2
        )
        moves = sum(stats[:P])
        q_own = sum(stats[P : 2 * P])
        sum_vol2 = sum(stats[2 * P :])
        # Q̂ of the PRE-move labels (aligned with this round's vol)
        q_hat = q_own / (2.0 * m) - gamma * sum_vol2 / (4.0 * m * m)
        if q_init is None:
            q_init = q_hat
        if q_hat > best_q + 1e-12:
            best_q = q_hat
            best_labels = labels
            stale = 0
        else:
            stale += 1
        labels, vol = new_labels, new_vol
        total_moves += moves
        if moves == 0:
            idle_parity += 1
            if idle_parity >= 2:  # both parities move-free → fixpoint
                best_labels = labels
                break
        else:
            idle_parity = 0
        if stale >= patience:
            break
    return best_labels, total_moves, float(q_init or 0.0), float(best_q)


def _edge_arrays(edge_tables):
    et = pa.concat_tables(
        [t for t in edge_tables if t.num_rows and "src" in t.column_names],
        promote_options="default",
    )
    return (
        et["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        et["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        et["w"].to_numpy(zero_copy_only=False).astype(np.float64),
    )


def _labels_dataset(g: PGraph, label_refs: list) -> ray.data.Dataset:
    import pyarrow.compute as pc

    return bsp.state_to_dataset(g, label_refs, "label").map_batches(
        lambda t: pa.table(
            {"v": t["v"], "label": pc.cast(t["label"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _lv_parts(n: int) -> int:
    """Exchange width for level-sized tables: wide exchanges on tiny coarse
    graphs are pure fixed overhead (measured ~3s per coarsen at P=32 on a
    22-row table)."""
    return max(2, min(32, n // 50_000 + 2))


def _as_map(ds: ray.data.Dataset, key: str, val: str) -> ray.data.Dataset:
    """Rename (key, val) columns to the (u, orig) map convention."""
    return ds.map_batches(
        lambda t: pa.table({"u": t[key], "orig": t[val]}),
        batch_format="pyarrow",
    )


def _translate(
    ds: ray.data.Dataset, col: str, map_ds: ray.data.Dataset, num_parts: int | None = None
) -> ray.data.Dataset:
    """Replace ``ds[col]`` through the (u → orig) map; unmapped values keep
    their current id (left outer join, state-sized)."""
    import pyarrow.compute as pc

    from networkit_ray.common.exchange import exchange_join

    # internal column names can collide with ds's (e.g. translating a map
    # through another map) — rename to reserved temporaries first
    mp = map_ds.map_batches(
        lambda t: pa.table({"__tk": t["u"], "__tv": t["orig"]}),
        batch_format="pyarrow",
    )
    j = exchange_join(
        ds, mp, left_on=[col], right_on=["__tk"], join_type="left outer",
        num_parts=num_parts,
    )

    def fix(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.column_names:
            if name == "__tv":
                continue
            if name == col and "__tv" in t.column_names:
                cols[name] = pc.if_else(
                    pc.is_valid(t["__tv"]),
                    pc.cast(t["__tv"], t[col].type),
                    t[col],
                )
            else:
                cols[name] = t[name]
        return pa.table(cols)

    return j.map_batches(fix, batch_format="pyarrow")


def _local_move_core(
    n: int, m: float, gamma: float, max_rounds: int, patience: int,
    src: np.ndarray, dst: np.ndarray, w: np.ndarray,
):
    """Single-task local moving for state-sized levels — the EXACT same
    parity-gated synchronous schedule, gain formula, tie-breaks and
    best-Q̂ monitor as the distributed path, in plain numpy.  On
    unweighted inputs every quantity is integer-valued, so the two paths
    are bit-identical (tested); the BSP path exists for levels too big
    for one worker (first levels of a web-scale graph).

    Returns (labels, total_moves, q_init, q_best)."""
    selfmask = src == dst
    selfw = np.zeros(n, np.float64)
    np.add.at(selfw, src[selfmask], w[selfmask])
    src, dst, w = src[~selfmask], dst[~selfmask], w[~selfmask]
    degw = selfw.copy()
    np.add.at(degw, src, w)

    labels = np.arange(n, dtype=np.int64)
    vol = degw.copy()
    color = (
        (np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        >> np.uint64(63)
    ).astype(np.int64)
    total_moves = 0
    idle_parity = 0
    best_q = -np.inf
    q_init = None
    best_labels = labels
    stale = 0
    for rnd in range(max_rounds):
        # histogram w(u→C): neighbor-community weights + own-row w+=0
        d = np.concatenate([dst, np.arange(n, dtype=np.int64)])
        c = np.concatenate([labels[src], labels])
        ww = np.concatenate([w, np.zeros(n, np.float64)])
        d, c, ww = _group_sum_dc(d, c, ww)

        A = labels[d]
        degw_d = degw[d]
        is_own = c == A
        w_own = np.zeros(n, np.float64)
        w_own[d[is_own]] = ww[is_own]
        vol_A = np.zeros(n, np.float64)
        vol_A[d[is_own]] = vol[c[is_own]]
        gain = (ww - w_own[d]) / m - gamma * degw_d * (
            vol[c] - (vol_A[d] - degw_d)
        ) / (2.0 * m * m)
        gain[is_own] = 0.0
        heads = _argmax_heads_per_d(d, gain)
        best_c = labels.copy()
        best_c[d[heads]] = c[heads]
        best_g = np.zeros(n, np.float64)
        best_g[d[heads]] = gain[heads]
        move = (best_g > 1e-12) & (best_c != labels) & (color == (rnd & 1))
        n_moves = int(move.sum())

        q_hat = float(w_own.sum()) / (2.0 * m) - gamma * float(vol @ vol) / (
            4.0 * m * m
        )
        if q_init is None:
            q_init = q_hat
        if q_hat > best_q + 1e-12:
            best_q = q_hat
            best_labels = labels
            stale = 0
        else:
            stale += 1

        new_labels = labels.copy()
        new_labels[move] = best_c[move]
        np.add.at(vol, labels[move], -degw[move])
        np.add.at(vol, best_c[move], degw[move])
        labels = new_labels
        total_moves += n_moves
        if n_moves == 0:
            idle_parity += 1
            if idle_parity >= 2:
                best_labels = labels
                break
        else:
            idle_parity = 0
        if stale >= patience:
            break
    return best_labels, total_moves, float(q_init or 0.0), float(best_q)


def _edge_arrays(edge_tables):
    et = pa.concat_tables(
        [t for t in edge_tables if t.num_rows and "src" in t.column_names],
        promote_options="default",
    )
    return (
        et["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        et["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        et["w"].to_numpy(zero_copy_only=False).astype(np.float64),
    )


@ray.remote(num_returns=3)
def _coarsen_one(n_label: int, *tables):
    """Single-task coarsening for SMALL levels (same output contract as
    the distributed path: dense ids ascend with sorted original labels,
    weights summed).  Coarse levels shrink geometrically, so beyond the
    first level or two the whole table is state-sized — a wide exchange
    there is pure fixed overhead (measured 1.2-2.6s per level on 22-400
    row tables vs ~0.05s here)."""
    label_tables, edge_tables = tables[:n_label], tables[n_label:]
    lt = pa.concat_tables(
        [t for t in label_tables if t.num_rows], promote_options="default"
    )
    lv = lt["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    ll = lt["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = np.empty(int(lv.max()) + 1 if len(lv) else 0, np.int64)
    lab[lv] = ll
    esrc, edst, ew = _edge_arrays(edge_tables)
    si, di, wn, uniq = _coarsen_core(lab, esrc, edst, ew)
    coarse = pa.table(
        {"src": pa.array(si), "dst": pa.array(di), "w": pa.array(wn)}
    )
    mapping = pa.table(
        {
            "v": pa.array(uniq),
            "idx": pa.array(np.arange(len(uniq), dtype=np.int64)),
        }
    )
    return coarse, mapping, len(uniq)


def _coarsen_core(lab, esrc, edst, ew):
    """Numpy body shared by _coarsen_one and _louvain_tail: relabel by
    ``lab``, dense-renumber by ascending distinct labels (compact_ids
    convention), sum parallel edges.  Returns (src, dst, w, uniq)."""
    src = lab[esrc]
    dst = lab[edst]
    w = ew
    uniq = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(uniq, src)
    di = np.searchsorted(uniq, dst)
    order = np.lexsort((di, si))
    si, di, w = si[order], di[order], w[order]
    newg = np.empty(len(si), dtype=bool)
    if len(si):
        newg[0] = True
        newg[1:] = (si[1:] != si[:-1]) | (di[1:] != di[:-1])
    starts = np.flatnonzero(newg)
    return (
        si[starts],
        di[starts],
        np.add.reduceat(w, starts) if len(starts) else w,
        uniq,
    )


@ray.remote
def _louvain_tail(
    n0: int, gamma: float, max_rounds: int, min_gain: float,
    levels_left: int, start_level: int, *edge_tables,
):
    """ALL remaining state-sized levels in ONE task: the same
    _local_move_core schedule and _coarsen_core renumbering the
    distributed path uses, chained without per-level Dataset round trips
    (5 small levels cost ~25 streaming-executor spins — seconds of pure
    fixed overhead on state-sized tables; measured 3.2 s → 0.3 s on the
    sf0.1 battery).  Labels are bit-identical to the level-at-a-time
    path: composition in entry-id space commutes with the outer loop's
    per-level orig-space translation, and unmapped (isolated-rep) ids
    keep their value exactly like _translate's left-outer join.

    Returns (fine, levels): ``fine`` maps every entry-level vertex to
    its final entry-level representative id."""
    src, dst, w = _edge_arrays(edge_tables)
    n = n0
    repr_ = None  # current dense id → entry id (None = identity)
    fine = None  # entry id → entry rep id
    levels: list[dict] = []
    for off in range(levels_left):
        m = float(w.sum()) / 2.0
        if m == 0.0:
            break
        labels, moves, q_init, q_best = _local_move_core(
            n, m, gamma, max_rounds, 3, src, dst, w
        )
        levels.append({"n": n, "m": m, "moves": moves, "dq": q_best - q_init})
        if (start_level + off) > 0 and q_best - q_init < min_gain:
            break
        lab_entry = labels if repr_ is None else repr_[labels]
        if fine is None:
            fine = lab_entry.copy()
        else:
            inv = np.full(n0, -1, np.int64)
            inv[repr_] = np.arange(n, dtype=np.int64)
            pos = inv[fine]
            mask = pos >= 0
            fine[mask] = lab_entry[pos[mask]]
        if moves == 0:
            break
        si, di, wn, uniq = _coarsen_core(labels, src, dst, w)
        n_coarse = len(uniq)
        if n_coarse >= n or n_coarse == 0:
            break
        repr_ = uniq if repr_ is None else repr_[uniq]
        src, dst, w = si, di, wn
        n = n_coarse
    if fine is None:
        fine = np.arange(n0, dtype=np.int64)
    return fine, levels


# levels at or below this many edge rows coarsen in one task; above it the
# distributed exchange path runs (first levels of a 100 TB graph)
_SMALL_COARSEN_EDGES = 4_000_000


def _coarsen(
    sym_edges: ray.data.Dataset, labels_ds: ray.data.Dataset, num_parts: int | None = None
) -> tuple[ray.data.Dataset, ray.data.Dataset, int]:
    """(coarse_sym_edges, mapping(v=orig_label, idx=dense), n_coarse).

    The coarse edge table is in DENSE community ids, includes the (C,C)
    self-loop rows, and is symmetric because the input is.
    """
    n_edges = sym_edges.count()
    if n_edges <= _SMALL_COARSEN_EDGES:
        lrefs = labels_ds.to_arrow_refs()
        coarse_t, map_t, n_coarse = _coarsen_one.remote(
            len(lrefs), *lrefs, *sym_edges.to_arrow_refs()
        )
        return (
            ray.data.from_arrow_refs([coarse_t]).materialize(),
            ray.data.from_arrow_refs([map_t]).materialize(),
            int(ray.get(n_coarse)),
        )
    from networkit_ray.common.exchange import exchange_join, exchange_unique
    from networkit_ray.graph.build import compact_ids

    e1 = exchange_join(
        sym_edges, labels_ds, left_on=["src"], right_on=["v"], num_parts=num_parts
    )
    e1 = e1.map_batches(
        lambda t: pa.table({"ls": t["label"], "dst": t["dst"], "w": t["w"]}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, labels_ds, left_on=["dst"], right_on=["v"], num_parts=num_parts)
    pairs = e2.map_batches(
        lambda t: pa.table({"src": t["ls"], "dst": t["label"], "w": t["w"]}),
        batch_format="pyarrow",
    )
    coarse = exchange_unique(pairs, ["src", "dst"], agg=[("w", "sum")], num_parts=num_parts)
    mapping, remapped = compact_ids(
        coarse.select_columns(["src", "dst"]), num_parts=num_parts
    )
    # compact_ids drops w; redo the remap keeping w (two joins, same pattern)
    m1 = exchange_join(coarse, mapping, left_on=["src"], right_on=["v"], num_parts=num_parts)
    m1 = m1.map_batches(
        lambda t: pa.table({"si": t["idx"], "dst": t["dst"], "w": t["w"]}),
        batch_format="pyarrow",
    )
    m2 = exchange_join(m1, mapping, left_on=["dst"], right_on=["v"], num_parts=num_parts)
    coarse_dense = m2.map_batches(
        lambda t: pa.table({"src": t["si"], "dst": t["idx"], "w": t["w"]}),
        batch_format="pyarrow",
    ).materialize()
    n_coarse = mapping.count()
    return coarse_dense, mapping.materialize(), n_coarse


def _split_self_loops(
    edges: ray.data.Dataset, num_nodes: int, num_parts: int
) -> tuple[ray.data.Dataset, list]:
    """(non-self rows, per-partition self-loop weight arrays)."""
    import pyarrow.compute as pc

    noself = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    ).materialize()
    selfrows = edges.map_batches(
        lambda t: t.filter(pc.equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    )

    @ray.remote
    def _selfw(part: int, *tables) -> np.ndarray:
        out = np.zeros(bsp.part_size(num_nodes, part, num_parts), np.float64)
        for t in tables:
            if t is None or t.num_rows == 0 or "src" not in t.column_names:
                continue
            v = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
            owner, loc = bsp.vplace(v, num_nodes, num_parts)
            mine = owner == part
            np.add.at(out, loc[mine], w[mine])
        return out

    refs = selfrows.to_arrow_refs()
    selfw = [_selfw.remote(p, *refs) for p in range(num_parts)]
    return noself, selfw


def louvain(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    weighted: bool = False,
    gamma: float = 1.0,
    max_levels: int = 8,
    max_rounds: int = 32,
    min_gain: float = 2e-3,
) -> tuple[ray.data.Dataset, dict]:
    """Symmetrized edge table → (v, label) modularity communities.

    ``label`` is the original-vertex-id representative of each community
    (deterministic; NOT necessarily the minimum member id).  Pass
    ``weighted=True`` if the table carries a ``w`` column; otherwise unit
    weights are assumed.
    """
    import pyarrow.compute as pc

    if not weighted:
        sym_edges = sym_edges.map_batches(
            lambda t: t.select(["src", "dst"]).append_column(
                "w", pa.array(np.ones(t.num_rows, np.float64))
            ),
            batch_format="pyarrow",
        )
    cur_edges = sym_edges.materialize()
    cur_n = num_nodes
    # fine_labels: (v, label) where BOTH columns are ORIGINAL vertex ids —
    # keeping one id space end-to-end avoids any dense-id/label ambiguity
    fine_labels: ray.data.Dataset | None = None
    # cur_repr: (u, orig) — current-level dense vertex id → original
    # representative id; None means the current space IS the original space
    cur_repr: ray.data.Dataset | None = None
    info: dict = {"levels": [], "rounds": 0}

    for level in range(max_levels):
        n_edges_cur = cur_edges.count()
        if n_edges_cur <= _SMALL_COARSEN_EDGES and num_parts is None:
            # state-sized from here on: run ALL remaining levels in one
            # task (see _louvain_tail), translate/compose once, stop
            fine_arr, tail_levels = ray.get(
                _louvain_tail.remote(
                    cur_n, gamma, max_rounds, min_gain,
                    max_levels - level, level, *cur_edges.to_arrow_refs()
                )
            )
            info["levels"].extend(tail_levels)
            info["rounds"] += len(tail_levels)
            lab_ds = ray.data.from_arrow(
                pa.table(
                    {
                        "v": pa.array(np.arange(cur_n, dtype=np.int64)),
                        "label": pa.array(fine_arr.astype(np.int64)),
                    }
                )
            ).materialize()
            P_lv = _lv_parts(cur_n)
            if cur_repr is None:
                lab_orig = lab_ds
            else:
                t1 = _translate(lab_ds, "v", cur_repr, P_lv)
                lab_orig = _translate(t1, "label", cur_repr, P_lv).materialize()
            if fine_labels is None:
                fine_labels = lab_orig
            else:
                fine_labels = _translate(
                    fine_labels, "label", _as_map(lab_orig, "v", "label"),
                    _lv_parts(num_nodes),
                ).materialize()
            break
        m = float(cur_edges.sum("w") or 0.0) / 2.0
        if m == 0.0:
            break
        if True:
            noself, selfw = None, None
            if level > 0:
                P0 = num_parts or bsp.default_num_parts(n_edges_cur)
                noself, selfw = _split_self_loops(cur_edges, cur_n, P0)
                g = build_pgraph(noself, cur_n, num_parts=P0, weighted=True)
            else:
                g = build_pgraph(cur_edges, cur_n, num_parts=num_parts, weighted=True)
            label_refs, moves, q_init, q_best = _local_move_refs(
                g, m, selfw, gamma=gamma, max_rounds=max_rounds
            )
            lab_ds = _labels_dataset(g, label_refs).materialize()
        info["levels"].append(
            {"n": cur_n, "m": m, "moves": moves, "dq": q_best - q_init}
        )
        info["rounds"] += 1
        # the self-loop coverage term is constant within a level, so the
        # within-level Q gain is exact; a level whose gain falls below
        # min_gain ends the hierarchy (weak-structure graphs otherwise
        # grind through max_levels of negligible improvements)
        if level > 0 and q_best - q_init < min_gain:
            break

        P_lv = _lv_parts(cur_n)
        # translate this level's (u → c) assignment into original-id space
        if cur_repr is None:
            lab_orig = lab_ds
        else:
            t1 = _translate(lab_ds, "v", cur_repr, P_lv)
            lab_orig = _translate(t1, "label", cur_repr, P_lv).materialize()

        if fine_labels is None:
            fine_labels = lab_orig
        else:
            # compose: fine.label (an original rep id) → its new rep
            fine_labels = _translate(
                fine_labels, "label", _as_map(lab_orig, "v", "label"),
                _lv_parts(num_nodes),
            ).materialize()
        if moves == 0:
            break

        coarse_dense, mapping, n_coarse = _coarsen(cur_edges, lab_ds, P_lv)
        if n_coarse >= cur_n or n_coarse == 0:
            break
        # next level's representative map: dense idx → original id
        inv_map = mapping.map_batches(
            lambda t: pa.table({"u": t["idx"], "orig": t["v"]}),
            batch_format="pyarrow",
        )
        if cur_repr is not None:
            inv_map = _translate(inv_map, "orig", cur_repr, P_lv)
        cur_repr = inv_map.materialize()
        cur_edges = coarse_dense
        cur_n = n_coarse

    out = fine_labels.map_batches(
        lambda t: pa.table(
            {
                "v": pc.cast(t["v"], pa.int64()),
                "label": pc.cast(t["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return out, info


# ---- Leiden-style refinement ---------------------------------------------


def refine_communities(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    labels: ray.data.Dataset,
    *,
    gamma: float = 1.0,
    max_rounds: int = 16,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Leiden-style refinement: split badly-connected communities.

    Reference: community/ParallelLeiden.cpp refinement phase (Traag et
    al. 2019) — within each input community, local moving restarts from
    SINGLETONS and vertices may only join subcommunities of their own
    parent community.  A disconnected parent community necessarily
    splits (membership only ever spreads along intra-parent edges); the
    coarsen step of a full Leiden loop would then aggregate the refined
    partition.

    Normative semantics: per-parent induced subgraph, synchronous
    parity-gated local moving with the same ΔQ formula as louvain()
    computed on the subgraph's own volume (m_sub), ties → smallest
    community id, singleton init; output label = original-vertex-id
    representative (min member id of each refined subcommunity).

    Scale shape: two label joins put each intra-community edge in its
    parent's group; per-parent groups run in parallel via map_groups
    (assumes one community's induced subgraph fits a worker — the same
    bounded-group contract as sessionize; at web scale a giant parent
    community would itself be sharded by a second-level refinement).
    Vertices with no intra-community edge become singletons.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from networkit_ray.common.exchange import exchange_join

    lab2 = labels.map_batches(
        lambda t: pa.table(
            {
                "lv": t["v"].combine_chunks().cast(pa.int64()),
                "lc": t["label"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    j1 = exchange_join(sym_edges, lab2, left_on=["src"], right_on=["lv"])
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["pc" if c == "lc" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    j2 = exchange_join(j1, lab2, left_on=["dst"], right_on=["lv"])
    intra = j2.map_batches(
        lambda t: t.filter(pc.equal(t["pc"], t["lc"])).select(["src", "dst", "pc"]),
        batch_format="pyarrow",
    )

    def refine_group(df: pd.DataFrame) -> pd.DataFrame:
        from networkit_ray.common.guards import check_group_rows

        check_group_rows(
            len(df), 1 << 26, "louvain.refine_group",
            "a parent community with >2^26 intra edges cannot refine as one "
            "task; shard it (e.g. raise the coarsening cutover or split the "
            "community by hash) before Leiden refinement.",
        )
        src = df["src"].to_numpy().astype(np.int64)
        dst = df["dst"].to_numpy().astype(np.int64)
        verts = np.unique(np.concatenate([src, dst]))
        n = len(verts)
        s = np.searchsorted(verts, src)
        d = np.searchsorted(verts, dst)
        w = np.ones(len(s), np.float64)
        m_sub = w.sum() / 2.0
        lab = np.arange(n, dtype=np.int64)  # singleton init
        degw = np.zeros(n, np.float64)
        np.add.at(degw, s, w)
        for rnd in range(max_rounds):
            vol = np.zeros(n, np.float64)
            np.add.at(vol, lab, degw)
            gate = (verts + rnd) % 2 == 0
            # w(u→C) histogram over incident edges
            order = np.lexsort((lab[d], s))
            ss, cc, ww = s[order], lab[d][order], w[order]
            first = np.r_[True, (ss[1:] != ss[:-1]) | (cc[1:] != cc[:-1])]
            gidx = np.cumsum(first) - 1
            hw = np.zeros(gidx[-1] + 1 if len(gidx) else 0, np.float64)
            np.add.at(hw, gidx, ww)
            hu, hc = ss[first], cc[first]
            cur = lab[hu]
            w_to_cur = np.zeros(n, np.float64)
            sel_cur = hc == cur
            np.add.at(w_to_cur, hu[sel_cur], hw[sel_cur])
            volB = vol[hc] - np.where(sel_cur, degw[hu], 0.0)
            volA = vol[cur] - degw[hu]
            gain = (hw - w_to_cur[hu]) / m_sub - gamma * degw[hu] * (
                volB - volA
            ) / (2.0 * m_sub * m_sub)
            # best candidate per u: (gain desc, community asc), must beat 0
            cand_order = np.lexsort((hc, -gain, hu))
            hu2 = hu[cand_order]
            firstu = np.r_[True, hu2[1:] != hu2[:-1]]
            bu = hu2[firstu]
            bc = hc[cand_order][firstu]
            bg = gain[cand_order][firstu]
            ok = (bg > 1e-12) & gate[bu] & (bc != lab[bu])
            if not ok.any():
                break
            lab[bu[ok]] = bc[ok]
        # representative = min original member id per refined community
        rep = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(rep, lab, verts)
        return pd.DataFrame({"v": verts, "label": rep[lab]})

    refined = intra.groupby("pc").map_groups(refine_group, batch_format="pandas")

    # vertices with no intra-community edge → singletons (label = self)
    allv = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(num_nodes, dtype=np.int64))})
    )
    out = exchange_join(allv, refined.materialize(), left_on=["v"], join_type="left outer")

    def fill(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        if "label" in t.column_names:
            lab = t["label"].to_numpy(zero_copy_only=False).astype(np.float64)
            lab = np.where(np.isnan(lab), v, lab).astype(np.int64)
        else:
            lab = v
        return pa.table({"v": pa.array(v), "label": pa.array(lab)})

    return out.map_batches(fill, batch_format="pyarrow"), {}
