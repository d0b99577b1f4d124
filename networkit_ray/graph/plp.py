"""PLP label-propagation community detection — deterministic synchronous schedule.

Semantics from the reference (networkit/cpp/community/PLP.cpp:25-118 and the
fork's MPLP, networkit/cpp/community/MPLP.cpp:27-158):

- init singleton labels label[u] = u (PLP.cpp:31-35);
- sweep: each non-isolated node adopts the label with the largest total
  neighbor weight (PLP.cpp:80-92); tie-break = smallest label id among the
  maxima (MPLP.cpp:124: ``(w > best) || (w == best && heaviest > lw)``);
- isolated nodes keep their singleton label (PLP.cpp:50-61);
- terminate when the number of updated nodes ≤ updateThreshold (default
  n/1e5, PLP.cpp:41-43) or max_iterations is reached.

The reference sweep is asynchronous/in-place (benign races, PLP.cpp:94-99) so
its labels are schedule-dependent; tests there assert properties, not exact
labels (SURVEY.md §5).  We define a *synchronous* (Jacobi) schedule —
iteration t reads only labels from t-1, with the same histogram and tie-break
rule — which makes results bit-identical across partition counts, CPU counts
and resume-from-checkpoint.  A max_iterations cap (default 100) guards the
2-cycles that synchronous LP can enter on bipartite-ish structures (the
async reference avoids them stochastically).

Superstep shape: per-edge (dst, label[src], w) messages, pre-aggregated per
(dst, label) inside each map task (the combiner — hub in-degree skew is
absorbed here), then per-destination-partition reduce does the final
(dst, label) sum and the argmax-with-min-label-tie-break.

Delta supersteps (unweighted packed path): the reference deactivates
settled nodes (PLP.cpp:94-99) so late sweeps only touch the boundary; the
synchronous analog is EXACT, not heuristic.  Each destination partition
pins its (dst_local·n + label) → count histogram in the object store after
one full sweep; from then on map tasks ship only ±1 count deltas for the
out-edges of vertices whose label changed last sweep, and the reduce
merges deltas into the pinned histogram (integer arithmetic — no float
drift) and re-runs the argmax only for destinations that received a
delta.  An untouched destination's histogram is unchanged, so its argmax
— and hence its label — is unchanged: the delta schedule is bit-identical
to the full recompute while late supersteps cost O(boundary), not O(m).

Memory: the pinned histograms hold one (int64 key, int64 count) entry per
distinct (dst, in-neighbor label) pair — ≤ m_q + n_q per partition, i.e.
the same object-store order as the CSR blocks themselves, spillable like
any pinned object.  Measured at scale-22 R-MAT (128 M sym edges, 32
CPUs): late sweeps 46-50 ms (≈2.7 G edge-equivalents/s), effective rate
over 25 iterations ≈1.5 G edge-scans/s·iter.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph
from networkit_ray.state import checkpoint as ckpt


@ray.remote
def _plp_init(vids: np.ndarray) -> np.ndarray:
    return vids.copy()


@ray.remote
def _plp_map(block: dict, labels: np.ndarray, chunk: int) -> tuple:
    """Per target partition: (dst_local, label, wsum) partial histograms."""
    from networkit_ray.graph.bsp import chunk_edge_index

    from networkit_ray.graph.bsp import grouped_dst, grouped_src

    P = len(block["part_bounds"]) - 1
    sl = grouped_src(block, chunk)
    if not len(sl):
        empty = (np.empty(0, np.int64), np.empty(0, np.uint64), np.empty(0, np.float64))
        return tuple([empty] * P)
    lab = labels[sl]
    dl = grouped_dst(block, chunk)
    w = (
        block["w"][chunk_edge_index(block, chunk)]
        if block["w"] is not None
        else np.ones(len(sl), np.float64)
    )
    if chunk < 0:
        pb = block["part_bounds"]
    else:
        # per-target-part edge boundaries within the chunk: first edge of the
        # first group of each part (groups are part-sorted and contiguous)
        c = block["chunks"][chunk]
        gs, gb = c["gs_rel"], c["gb"]
        n_edges = c["end"] - c["start"]
        pb = np.array(
            [gs[gb[q]] if gb[q] < len(gs) else n_edges for q in range(P)] + [n_edges],
            dtype=np.int64,
        )
    out = []
    for q in range(P):
        s, e = pb[q], pb[q + 1]
        if s == e:
            out.append((np.empty(0, np.int64), np.empty(0, np.uint64), np.empty(0, np.float64)))
            continue
        dq, lq, wq = dl[s:e], lab[s:e], w[s:e]
        # group by (dst, label): pack into one sort key when it fits int64
        # (labels are vertex ids < n; dst_local < n_q) — a single-key argsort
        # is ~2× a two-key lexsort; fall back to lexsort otherwise
        max_l = int(lq.max()) if len(lq) else 0
        if max_l < 2**31 and dq[-1] < 2**31:
            key = dq.astype(np.int64) * (max_l + 1) + lq.astype(np.int64)
            # introsort: ~3x a stable sort on int64 keys; stability is
            # irrelevant here (grouping by value, unit-weight sums exact)
            o2 = np.argsort(key)
        else:
            o2 = np.lexsort((lq, dq))
        dq, lq, wq = dq[o2], lq[o2], wq[o2]
        change = np.empty(len(dq), dtype=bool)
        change[0] = True
        change[1:] = (dq[1:] != dq[:-1]) | (lq[1:] != lq[:-1])
        starts = np.flatnonzero(change)
        out.append((dq[starts], lq[starts], np.add.reduceat(wq, starts)))
    return tuple(out)


@ray.remote
def _plp_map_packed(block: dict, labels: np.ndarray, chunk: int, n: int) -> tuple:
    """Unweighted fast path: per target partition ship (key, count) with
    key = dst_local * n + label packed into one int64 — a single
    ``np.sort`` (no argsort, no index gathers; unit weights become run
    lengths) and 12 B/message instead of the generic path's 20 B.
    Requires max_part_size * n < 2^62 (checked by the caller)."""
    from networkit_ray.graph.bsp import grouped_dst, grouped_src

    P = len(block["part_bounds"]) - 1
    empty = (np.empty(0, np.int64), np.empty(0, np.int32))
    sl = grouped_src(block, chunk)
    if not len(sl):
        return tuple([empty] * P)
    key_all = grouped_dst(block, chunk).astype(np.int64) * np.int64(n) + labels[
        sl
    ].astype(np.int64)
    if chunk < 0:
        pb = block["part_bounds"]
    else:
        c = block["chunks"][chunk]
        gs, gb = c["gs_rel"], c["gb"]
        n_edges = c["end"] - c["start"]
        pb = np.array(
            [gs[gb[q]] if gb[q] < len(gs) else n_edges for q in range(P)] + [n_edges],
            dtype=np.int64,
        )
    out = []
    for q in range(P):
        s, e = pb[q], pb[q + 1]
        if s == e:
            out.append(empty)
            continue
        k = np.sort(key_all[s:e])
        change = np.empty(len(k), dtype=bool)
        change[0] = True
        change[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(k))).astype(np.int32)
        out.append((k[starts], counts))
    return tuple(out)


@ray.remote(num_returns=4)
def _plp_reduce_packed_hist(labels: np.ndarray, n: int, *partials):
    """Packed-key reduce (keys pre-grouped per partial, one argsort merges;
    ascending key order IS (dst, label) order so the argmax-with-min-label
    scan needs no extra sort) that also RETURNS the merged (key → count)
    histogram so subsequent supersteps can run the delta path against
    it."""
    ks = [p[0] for p in partials if len(p[0])]
    if not ks:
        e64 = np.empty(0, np.int64)
        return labels, 0, e64, e64
    k = np.concatenate(ks)
    c = np.concatenate([p[1] for p in partials if len(p[1])]).astype(np.int64)
    o = np.argsort(k)
    k, c = k[o], c[o]
    change = np.empty(len(k), dtype=bool)
    change[0] = True
    change[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    k = k[starts]
    w = np.add.reduceat(c, starts)
    d = k // np.int64(n)
    l = (k % np.int64(n)).astype(labels.dtype)
    seg_change = d[1:] != d[:-1]
    seg_starts = np.flatnonzero(np.concatenate(([True], seg_change)))
    segmax = np.maximum.reduceat(w, seg_starts)
    seg_id = np.zeros(len(d), np.int64)
    seg_id[1:] = np.cumsum(seg_change)
    hit = np.flatnonzero(w == segmax[seg_id])
    seg_of_hit = seg_id[hit]
    first = np.empty(len(hit), dtype=bool)
    first[0] = True
    first[1:] = seg_of_hit[1:] != seg_of_hit[:-1]
    heads = hit[first]
    new = labels.copy()
    new[d[heads]] = l[heads]
    changed = int((new != labels).sum())
    return new, changed, k, w


@ray.remote
def _plp_map_delta(
    block: dict, prev_labels: np.ndarray, cur_labels: np.ndarray, chunk: int, n: int
) -> tuple:
    """Delta sweep: for edges whose SOURCE changed label last sweep, ship
    per target partition the combined (key, ±count) histogram deltas —
    key = dst_local·n + label, -1 under the old label, +1 under the new.
    Message volume, sort cost and reduce cost are all ∝ the changed
    boundary's out-edges, not m.  The one remaining O(m) component is
    the ``changed[sl]`` boolean gather over the grouped edge order —
    kept deliberately: it preserves the build-time hub-splitting chunks
    (a CSR-range gather would be O(boundary) but put a whole hub's
    out-edges in one task), and as a branch-free memory-bound pass it
    costs ~1/10 of the full path's histogram sort."""
    from networkit_ray.graph.bsp import grouped_dst, grouped_src

    P = len(block["part_bounds"]) - 1
    empty = (np.empty(0, np.int64), np.empty(0, np.int32))
    sl = grouped_src(block, chunk)
    if not len(sl):
        return tuple([empty] * P)
    changed = prev_labels != cur_labels
    mask = changed[sl]
    if not mask.any():
        return tuple([empty] * P)
    dl = grouped_dst(block, chunk)
    if chunk < 0:
        pb = block["part_bounds"]
    else:
        c = block["chunks"][chunk]
        gs, gb = c["gs_rel"], c["gb"]
        n_edges = c["end"] - c["start"]
        pb = np.array(
            [gs[gb[q]] if gb[q] < len(gs) else n_edges for q in range(P)] + [n_edges],
            dtype=np.int64,
        )
    out = []
    for q in range(P):
        s, e = pb[q], pb[q + 1]
        if s == e:
            out.append(empty)
            continue
        idx = s + np.flatnonzero(mask[s:e])
        if not len(idx):
            out.append(empty)
            continue
        base = dl[idx].astype(np.int64) * np.int64(n)
        src_sel = sl[idx]
        keys = np.concatenate(
            [base + prev_labels[src_sel].astype(np.int64),
             base + cur_labels[src_sel].astype(np.int64)]
        )
        cnt = np.empty(2 * len(idx), np.int32)
        cnt[: len(idx)] = -1
        cnt[len(idx):] = 1
        o2 = np.argsort(keys)
        keys, cnt = keys[o2], cnt[o2]
        change = np.empty(len(keys), dtype=bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        ck = keys[starts]
        cc = np.add.reduceat(cnt, starts)
        nz = cc != 0
        out.append((ck[nz], cc[nz].astype(np.int32)))
    return tuple(out)


@ray.remote(num_returns=4)
def _plp_reduce_delta(labels: np.ndarray, n: int, hk: np.ndarray, hc: np.ndarray, *partials):
    """Merge ±count deltas into the pinned histogram and re-run the
    argmax-with-min-label scan ONLY for destinations that received a
    delta.  Integer counts make the merged histogram exactly equal to a
    fresh full-sweep histogram, so labels are bit-identical to the full
    path; untouched destinations keep their labels (unchanged histogram
    ⇒ unchanged argmax)."""
    ks = [p[0] for p in partials if len(p[0])]
    if not ks:
        return labels, 0, hk, hc
    dk = np.concatenate(ks)
    dc = np.concatenate([p[1] for p in partials if len(p[1])]).astype(np.int64)
    o = np.argsort(dk)
    dk, dc = dk[o], dc[o]
    change = np.empty(len(dk), dtype=bool)
    change[0] = True
    change[1:] = dk[1:] != dk[:-1]
    starts = np.flatnonzero(change)
    dk = dk[starts]
    dc = np.add.reduceat(dc, starts)
    nz = dc != 0
    dk, dc = dk[nz], dc[nz]
    if not len(dk):
        return labels, 0, hk, hc
    touched = np.unique(dk // np.int64(n))
    pos = np.searchsorted(hk, dk)
    exists = np.zeros(len(dk), bool)
    in_rng = pos < len(hk)
    exists[in_rng] = hk[pos[in_rng]] == dk[in_rng]
    hc = hc.copy()  # object-store arrays are read-only
    hc[pos[exists]] += dc[exists]
    miss = ~exists
    if miss.any():
        hk = np.insert(hk, pos[miss], dk[miss])
        hc = np.insert(hc, pos[miss], dc[miss])
    keep = hc > 0
    if not keep.all():
        hk, hc = hk[keep], hc[keep]
    lo = np.searchsorted(hk, touched * np.int64(n))
    hi = np.searchsorted(hk, (touched + 1) * np.int64(n))
    lens = hi - lo
    valid = lens > 0
    touched, lo, lens = touched[valid], lo[valid], lens[valid]
    new = labels.copy()
    if len(touched):
        seg_starts = np.cumsum(lens) - lens
        total = int(lens.sum())
        seg_id = np.repeat(np.arange(len(touched)), lens)
        idx = np.arange(total) - np.repeat(seg_starts, lens) + np.repeat(lo, lens)
        k = hk[idx]
        c = hc[idx]
        segmax = np.maximum.reduceat(c, seg_starts)
        hit = np.flatnonzero(c == segmax[seg_id])
        seg_of_hit = seg_id[hit]
        first = np.empty(len(hit), dtype=bool)
        first[0] = True
        first[1:] = seg_of_hit[1:] != seg_of_hit[:-1]
        heads = hit[first]
        new[touched] = (k[heads] % np.int64(n)).astype(labels.dtype)
    changed = int((new != labels).sum())
    return new, changed, hk, hc


@ray.remote
def _plp_map_min(block: dict, chunk: int) -> tuple:
    """Iteration-0 sweep for unweighted simple graphs: with singleton
    initial labels every neighbor label is distinct and unit-weighted, so
    the argmax-with-min-label rule degenerates to *min neighbor vid* — one
    ``np.minimum.reduceat`` over the superstep-invariant dst grouping, no
    per-(dst, label) sort, and per-part messages of size #distinct-dst
    instead of #edges."""
    from networkit_ray.graph.bsp import _reduceat_messages, grouped_src

    # singleton label of local src i IS its vid
    lab = block["vids"][grouped_src(block, chunk)]
    return tuple(_reduceat_messages(block, lab, chunk, np.minimum))


@ray.remote(num_returns=2)
def _plp_reduce_min(labels: np.ndarray, *partials):
    """Combine (dst, min_label) partials → per-dst min (iteration-0 twin of
    ``_plp_reduce`` under the min-degenerate histogram)."""
    ds = [p[0] for p in partials if len(p[0])]
    if not ds:
        return labels, 0
    d = np.concatenate(ds)
    m = np.concatenate([p[1] for p in partials if len(p[0])])
    o = np.argsort(d, kind="stable")
    d, m = d[o], m[o]
    first = np.empty(len(d), dtype=bool)
    first[0] = True
    first[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(first)
    new = labels.copy()
    new[d[starts]] = np.minimum.reduceat(m, starts)
    changed = int((new != labels).sum())
    return new, changed


@ray.remote(num_returns=2)
def _plp_reduce(labels: np.ndarray, *partials):
    """Combine (dst, label, w) partials → argmax label (ties → smallest label)."""
    ds = [p[0] for p in partials if len(p[0])]
    if not ds:
        return labels, 0
    d = np.concatenate(ds)
    l = np.concatenate([p[1] for p in partials if len(p[0])])
    w = np.concatenate([p[2] for p in partials if len(p[0])])
    max_l = int(l.max()) if len(l) else 0
    if max_l < 2**31 and int(d.max()) < 2**31:
        o = np.argsort(d.astype(np.int64) * (max_l + 1) + l.astype(np.int64))
    else:
        o = np.lexsort((l, d))
    d, l, w = d[o], l[o], w[o]
    change = np.empty(len(d), dtype=bool)
    change[0] = True
    change[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(change)
    d, l = d[starts], l[starts]
    w = np.add.reduceat(w, starts)
    # argmax per dst, tie-break smallest label.  Rows are already sorted by
    # (dst, label), so per dst-segment the first row attaining the segment
    # max weight IS the smallest label among the maxima — a reduceat +
    # first-hit scan, O(n), replaces the former 3-key lexsort (the lexsort
    # dominated the whole superstep on iteration-0-sized message volumes).
    seg_change = d[1:] != d[:-1]
    seg_starts = np.flatnonzero(np.concatenate(([True], seg_change)))
    segmax = np.maximum.reduceat(w, seg_starts)
    seg_id = np.zeros(len(d), np.int64)
    seg_id[1:] = np.cumsum(seg_change)
    hit = np.flatnonzero(w == segmax[seg_id])  # exact: same float values
    seg_of_hit = seg_id[hit]
    first = np.empty(len(hit), dtype=bool)
    first[0] = True
    first[1:] = seg_of_hit[1:] != seg_of_hit[:-1]
    heads = hit[first]
    new = labels.copy()
    new[d[heads]] = l[heads]
    changed = int((new != labels).sum())
    return new, changed


def plp_refs(
    g: PGraph,
    *,
    update_threshold: int | None = None,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 4,
    resume: bool = False,
) -> tuple[list, dict]:
    P = g.num_parts
    theta = update_threshold if update_threshold is not None else g.num_nodes // 100000
    labels = None
    start_iter = 0
    if resume and checkpoint_dir:
        loaded = ckpt.load_latest(checkpoint_dir, "plp", g)
        if loaded is not None:
            raw, meta = loaded
            start_iter = meta["iteration"]

            @ray.remote
            def _as_u64(x):
                return x.astype(np.uint64)

            labels = [_as_u64.remote(r) for r in raw]
    min_sweep_first = False
    if labels is None:
        labels = [_plp_init.remote(g.vid_refs[p]) for p in range(P)]
        # fresh singleton start on an unweighted simple graph: sweep 0 is
        # exactly the min-neighbor-vid kernel (every neighbor label
        # distinct, unit weight, min-label tie-break) — see _plp_map_min
        min_sweep_first = not g.weighted

    iteration = start_iter
    timing = []
    import time

    units = g.map_units()
    # packed fast path: unweighted + (dst_local, label) fits one int64
    packed = (
        not g.weighted
        and g.num_nodes > 0
        and max(g.part_sizes()) * g.num_nodes < 2**62
    )
    # delta-superstep state: pinned per-partition histograms (hk, hc) of
    # prev_labels' full (dst, label) counts; None until a full packed
    # sweep has built them (fresh start, resume, or weighted path).
    hist: tuple[list, list] | None = None
    prev_labels: list | None = None
    last_updated: int | None = None
    while iteration < max_iterations:
        t0 = time.perf_counter()
        use_min = min_sweep_first and iteration == start_iter
        # delta sweep costs ~2× the changed vertices' out-edges; a full
        # sweep costs m.  Under heavy churn (early sweeps) full is
        # cheaper — switch to deltas once <30% of vertices moved.
        use_delta = (
            packed
            and not use_min
            and hist is not None
            and last_updated is not None
            and last_updated * 10 < g.num_nodes * 3
        )
        if use_min:
            map_out = [
                _plp_map_min.options(num_returns=P).remote(g.block_refs[p], c)
                for p, c in units
            ]
        elif use_delta:
            map_out = [
                _plp_map_delta.options(num_returns=P).remote(
                    g.block_refs[p], prev_labels[p], labels[p], c, g.num_nodes
                )
                for p, c in units
            ]
        elif packed:
            map_out = [
                _plp_map_packed.options(num_returns=P).remote(
                    g.block_refs[p], labels[p], c, g.num_nodes
                )
                for p, c in units
            ]
        else:
            map_out = [
                _plp_map.options(num_returns=P).remote(g.block_refs[p], labels[p], c)
                for p, c in units
            ]
        new_labels, count_refs = [], []
        new_hk, new_hc = [], []
        for q in range(P):
            if use_min:
                s, c = _plp_reduce_min.remote(labels[q], *[mo[q] for mo in map_out])
            elif use_delta:
                s, c, hk, hc = _plp_reduce_delta.remote(
                    labels[q], g.num_nodes, hist[0][q], hist[1][q],
                    *[mo[q] for mo in map_out],
                )
                new_hk.append(hk)
                new_hc.append(hc)
            elif packed:
                s, c, hk, hc = _plp_reduce_packed_hist.remote(
                    labels[q], g.num_nodes, *[mo[q] for mo in map_out]
                )
                new_hk.append(hk)
                new_hc.append(hc)
            else:
                s, c = _plp_reduce.remote(labels[q], *[mo[q] for mo in map_out])
            new_labels.append(s)
            count_refs.append(c)
        n_updated = sum(ray.get(count_refs))
        last_updated = n_updated
        if packed and not use_min:
            hist = (new_hk, new_hc)
        prev_labels = labels
        labels = new_labels
        iteration += 1
        timing.append(time.perf_counter() - t0)
        if checkpoint_dir and iteration % checkpoint_every == 0:
            out64 = [_labels_i64.remote(r) for r in labels]
            ckpt.save(
                checkpoint_dir, "plp", iteration, g, out64, "label",
                {"n_updated": n_updated},
            )
        if n_updated <= theta:
            break

    out = [_labels_i64.remote(r) for r in labels]
    return out, {"iterations": iteration, "timing": timing}


@ray.remote
def _labels_i64(labels: np.ndarray) -> np.ndarray:
    return labels.astype(np.int64)


def plp(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    weighted: bool = False,
    **kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """Symmetrized edge table → (v, label) community assignment.

    ``sym_edges`` must be a *simple* symmetrized table (each direction
    once, as ``symmetrize`` produces): the unweighted fresh-start fast
    path serves sweep 0 as min-neighbor-vid, which treats parallel edges
    as one edge.  For multigraph semantics pass ``weighted=True`` with an
    explicit per-edge ``w``.
    """
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts, weighted=weighted)
    refs, info = plp_refs(g, **kwargs)
    return bsp.state_to_dataset(g, refs, "label"), info


@ray.remote
def _block_deg(block: dict) -> np.ndarray:
    return block["out_deg"].astype(np.int64)


@ray.remote(num_returns=2)
def _lpdo_reduce(labels: np.ndarray, deg: np.ndarray, tier: int, num_tiers: int, *partials):
    """PLP reduce restricted to one log2-degree tier (LPDegreeOrdered).

    tier(v) = min(num_tiers-1, floor(log2(deg(v)))) for deg >= 1; lower
    tiers run first within an iteration, seeing the fresher labels the
    reference's low-degree-first sequential sweep sees.
    """
    ds = [p[0] for p in partials if len(p[0])]
    if not ds:
        return labels, 0
    d = np.concatenate(ds)
    l = np.concatenate([p[1] for p in partials if len(p[0])])
    w = np.concatenate([p[2] for p in partials if len(p[0])])
    o = np.lexsort((l, d))
    d, l, w = d[o], l[o], w[o]
    change = np.empty(len(d), dtype=bool)
    change[0] = True
    change[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(change)
    d, l = d[starts], l[starts]
    w = np.add.reduceat(w, starts)
    # rows sorted by (dst, label): first row attaining the per-dst max
    # weight is the min-label argmax (same O(n) scan as _plp_reduce)
    seg_change = d[1:] != d[:-1]
    seg_starts = np.flatnonzero(np.concatenate(([True], seg_change)))
    segmax = np.maximum.reduceat(w, seg_starts)
    seg_id = np.zeros(len(d), np.int64)
    seg_id[1:] = np.cumsum(seg_change)
    hit = np.flatnonzero(w == segmax[seg_id])
    seg_of_hit = seg_id[hit]
    first = np.empty(len(hit), dtype=bool)
    first[0] = True
    first[1:] = seg_of_hit[1:] != seg_of_hit[:-1]
    heads = hit[first]
    new = labels.copy()
    targets = d[heads]
    with np.errstate(divide="ignore"):
        tiers = np.minimum(
            num_tiers - 1,
            np.floor(np.log2(np.maximum(deg[targets], 1))).astype(np.int64),
        )
    sel = tiers == tier
    new[targets[sel]] = l[heads][sel]
    changed = int((new != labels).sum())
    return new, changed


def lp_degree_ordered(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_tiers: int = 4,
    update_threshold: int | None = None,
    max_iterations: int = 100,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, label) — LPDegreeOrdered community labels.

    Reference: community/LPDegreeOrdered.cpp:18-88 — label propagation
    with nodes processed in INCREASING degree order so low-degree nodes
    commit first and high-degree nodes see their fresh labels.  The
    distributed analog runs ``num_tiers`` sub-supersteps per iteration,
    one log2-degree tier at a time (ascending); within a tier the update
    is the standard synchronous argmax-min-label step.  Stops when an
    iteration updates ≤ θ = n/1e5 labels (reference's threshold).
    """
    g = bsp.build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    theta = (
        update_threshold
        if update_threshold is not None
        else g.num_nodes // 100000
    )
    labels = [_plp_init.remote(g.vid_refs[p]) for p in range(P)]
    degs = [_block_deg.remote(b) for b in g.block_refs]
    units = g.map_units()
    iteration = 0
    while iteration < max_iterations:
        total_updated = 0
        for tier in range(num_tiers):
            map_out = [
                _plp_map.options(num_returns=P).remote(
                    g.block_refs[p], labels[p], c
                )
                for p, c in units
            ]
            new_labels, count_refs = [], []
            for q in range(P):
                s, c = _lpdo_reduce.remote(
                    labels[q], degs[q], tier, num_tiers,
                    *[mo[q] for mo in map_out],
                )
                new_labels.append(s)
                count_refs.append(c)
            total_updated += sum(ray.get(count_refs))
            labels = new_labels
        iteration += 1
        if total_updated <= theta:
            break
    out = [_labels_i64.remote(r) for r in labels]
    return (
        bsp.state_to_dataset(g, out, "label"),
        {"iterations": iteration},
    )
