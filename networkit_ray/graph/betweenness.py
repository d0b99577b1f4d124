"""Betweenness centrality (sampled pivots) — distributed Brandes on BSP.

Reference: centrality/Betweenness.cpp:118 (exact Brandes) and
centrality/EstimateBetweenness.cpp (sampled pivots).  Brandes' per-source
machinery maps onto level-synchronous supersteps, and pivots are BATCHED:
K sources run in lockstep with (n_p, K) state, so a batch costs
2 × max-eccentricity supersteps instead of the per-pivot sum.

FORWARD (per batch): multi-source BFS with shortest-path counting —
    superstep t: frontier columns (dist = t) push σ along out-edges;
    an unvisited receiver sets dist = t+1 and σ = Σ incoming σ.

BACKWARD: dependency accumulation by descending level over the TRANSPOSE
graph —
    level L: vertices with dist = L send (1 + δ)/σ to their in-neighbors;
    a receiver with dist = L-1 accumulates δ += σ · Σ messages.
    (Only DAG edges contribute: the level filter drops same-level and
    forward edges exactly as Brandes' predecessor lists do.  Columns whose
    eccentricity is below L simply have no level-L senders.)

bc(v) = Σ over pivots of δ_s(v), scaled by n/k (EstimateBetweenness's
extrapolation).  With pivots = all vertices and scale 1 this IS exact
Brandes (tested against a numpy reference).  Pivot choice is seeded
deterministic, so results are independent of partitioning and cluster
size.

Memory note: map chunks materialize (E_chunk × K) message matrices —
the default ``pivot_batch=16`` keeps that ≈256 MB at 2M-edge chunks.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import (
    PGraph,
    build_pgraph,
    chunk_edge_index,
    message_values,
)


@ray.remote
def _bw_init(vids: np.ndarray, sources: np.ndarray) -> dict:
    n, K = len(vids), len(sources)
    dist = np.full((n, K), -1, dtype=np.int64)
    sigma = np.zeros((n, K), dtype=np.float64)
    for k, s in enumerate(sources):
        hit = np.flatnonzero(vids == np.uint64(s))
        if len(hit):
            dist[hit[0], k] = 0
            sigma[hit[0], k] = 1.0
    return {"dist": dist, "sigma": sigma}


@ray.remote
def _bw_fwd_map(block: dict, st: dict, level: int, chunk: int) -> tuple:
    idx = chunk_edge_index(block, chunk)
    src_local = block["src_local"][idx]
    sending = st["dist"][src_local] == level  # (E, K)
    vals = np.where(sending, st["sigma"][src_local], 0.0)
    # values only; destination indices pinned once per graph (bsp)
    return tuple(message_values(block, vals, chunk))


@ray.remote(num_returns=2)
def _bw_fwd_reduce(st: dict, level: int, idx_bundle: list, *values):
    dist, sigma = st["dist"].copy(), st["sigma"].copy()
    inc = np.zeros(dist.shape, dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            inc[idx] += sums
    newly = (dist < 0) & (inc > 0)
    dist[newly] = level + 1
    sigma[newly] = inc[newly]
    return {"dist": dist, "sigma": sigma}, int(newly.sum())


@ray.remote
def _bw_bwd_map(block: dict, st: dict, delta: np.ndarray, level: int, chunk: int) -> tuple:
    """Transpose-graph push: level-L entries send (1+δ)/σ per column."""
    idx = chunk_edge_index(block, chunk)
    src_local = block["src_local"][idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        per_src = np.where(
            st["sigma"] > 0, (1.0 + delta) / np.maximum(st["sigma"], 1e-300), 0.0
        )
    sending = st["dist"][src_local] == level
    vals = np.where(sending, per_src[src_local], 0.0)
    return tuple(message_values(block, vals, chunk))


@ray.remote
def _bw_bwd_reduce(st: dict, delta: np.ndarray, level: int, idx_bundle: list, *values):
    new = delta.copy()
    inc = np.zeros(delta.shape, dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            inc[idx] += sums
    at_prev = st["dist"] == level - 1
    new[at_prev] += st["sigma"][at_prev] * inc[at_prev]
    return new


@ray.remote
def _bw_zero1(n: int) -> np.ndarray:
    return np.zeros(n, dtype=np.float64)


@ray.remote
def _bw_zero2(n: int, k: int) -> np.ndarray:
    return np.zeros((n, k), dtype=np.float64)


@ray.remote
def _bw_accum(bc: np.ndarray, delta: np.ndarray, vids: np.ndarray, sources: np.ndarray) -> np.ndarray:
    """Fold a batch's per-pivot dependencies into bc, excluding δ(s) at s."""
    d = delta.copy()
    for k, s in enumerate(sources):
        hit = np.flatnonzero(vids == np.uint64(s))
        if len(hit):
            d[hit[0], k] = 0.0
    return bc + d.sum(axis=1)


@ray.remote
def _bw_max_level(st: dict) -> int:
    d = st["dist"]
    return int(d.max()) if d.size else -1


def _pivot_ids(num_nodes: int, k: int, seed: int) -> np.ndarray:
    """Seeded deterministic distinct pivots (independent of partitioning)."""
    rng = np.random.default_rng(seed)
    k = min(k, num_nodes)
    return np.sort(rng.choice(num_nodes, size=k, replace=False).astype(np.int64))


def _brandes_batch(
    g_fwd: PGraph, g_bwd: PGraph, batch: np.ndarray
) -> tuple[list, list, int]:
    """One K-pivot lockstep Brandes pass → (st_refs, delta_refs, supersteps).

    st[p] holds the (n_p, K) dist/sigma state, delta[p] the (n_p, K)
    per-pivot dependencies — retained by the Dyn* repair path."""
    P = g_fwd.num_parts
    units_f = g_fwd.map_units()
    units_b = g_bwd.map_units()
    sizes = g_fwd.part_sizes()
    K = len(batch)
    supersteps = 0
    st = [_bw_init.remote(g_fwd.vid_refs[p], batch) for p in range(P)]
    bundles_f = g_fwd.msg_bundle_refs()
    bundles_b = g_bwd.msg_bundle_refs()
    level = 0
    while True:
        supersteps += 1
        mo = [
            _bw_fwd_map.options(num_returns=P).remote(
                g_fwd.block_refs[p], st[p], level, c
            )
            for p, c in units_f
        ]
        new_st, ch = [], []
        for q in range(P):
            s2, c2 = _bw_fwd_reduce.remote(st[q], level, bundles_f[q], *[m[q] for m in mo])
            new_st.append(s2)
            ch.append(c2)
        grew = sum(ray.get(ch))
        st = new_st
        if grew == 0:
            break
        level += 1
    max_level = max(ray.get([_bw_max_level.remote(x) for x in st]))
    delta = [_bw_zero2.remote(sizes[p], K) for p in range(P)]
    for L in range(max_level, 0, -1):
        supersteps += 1
        mo = [
            _bw_bwd_map.options(num_returns=P).remote(
                g_bwd.block_refs[p], st[p], delta[p], L, c
            )
            for p, c in units_b
        ]
        delta = [
            _bw_bwd_reduce.remote(st[q], delta[q], L, bundles_b[q], *[m[q] for m in mo])
            for q in range(P)
        ]
    return st, delta, supersteps


def betweenness_refs(
    g_fwd: PGraph, g_bwd: PGraph, pivots: np.ndarray, *, pivot_batch: int = 16
) -> tuple[list, dict]:
    P = g_fwd.num_parts
    sizes = g_fwd.part_sizes()
    bc = [_bw_zero1.remote(sizes[p]) for p in range(P)]
    supersteps = 0
    for b0 in range(0, len(pivots), pivot_batch):
        batch = pivots[b0 : b0 + pivot_batch]
        _, delta, ss = _brandes_batch(g_fwd, g_bwd, batch)
        supersteps += ss
        bc = [
            _bw_accum.remote(bc[p], delta[p], g_fwd.vid_refs[p], batch)
            for p in range(P)
        ]
    return bc, {"pivots": len(pivots), "supersteps": supersteps}


@ray.remote
def _bw_scale(bc: np.ndarray, factor: float) -> np.ndarray:
    return bc * factor


def estimate_betweenness(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    n_samples: int = 16,
    seed: int = 42,
    num_parts: int | None = None,
    exact: bool = False,
    pivot_batch: int = 16,
    pivots: np.ndarray | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, betweenness) — sampled-pivot estimate (exact=True runs every
    pivot, i.e. exact Brandes; explicit ``pivots`` overrides the seeded
    draw, scaled by num_nodes/len(pivots)).  Pass the symmetrized table
    for undirected betweenness (each unordered pair then counts twice,
    matching the reference's undirected convention before its final
    halving)."""
    from networkit_ray.graph.build import transpose

    edges = edges.materialize()
    g_fwd = build_pgraph(edges, num_nodes, num_parts=num_parts)
    g_bwd = build_pgraph(transpose(edges), num_nodes, num_parts=g_fwd.num_parts)
    if exact:
        pivots = np.arange(num_nodes, dtype=np.int64)
        factor = 1.0
    elif pivots is not None:
        pivots = np.asarray(pivots, dtype=np.int64)
        if len(pivots) == 0:
            raise ValueError("pivots must be non-empty")
        if pivots.min() < 0 or pivots.max() >= num_nodes:
            raise ValueError(
                f"pivot ids must lie in [0, {num_nodes}); got "
                f"[{pivots.min()}, {pivots.max()}]"
            )
        factor = num_nodes / len(pivots)
    else:
        pivots = _pivot_ids(num_nodes, n_samples, seed)
        factor = num_nodes / len(pivots)
    refs, info = betweenness_refs(g_fwd, g_bwd, pivots, pivot_batch=pivot_batch)
    scaled = [_bw_scale.remote(r, factor) for r in refs]
    return bsp.state_to_dataset(g_fwd, scaled, "betweenness"), info


@ray.remote
def _bw_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


@ray.remote
def _bw_zero_like(vids: np.ndarray) -> np.ndarray:
    return np.zeros(len(vids), np.float64)


@ray.remote
def _bw_maxdiff(cur: np.ndarray, prev: np.ndarray, s_cur: float, s_prev: float) -> float:
    return float(np.abs(cur * s_cur - prev * s_prev).max()) if len(cur) else 0.0


def adaptive_betweenness(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    eps: float = 0.05,
    delta: float = 0.1,
    batch: int = 16,
    seed: int = 42,
    num_parts: int | None = None,
    sampler: str = "pcg",
) -> tuple[ray.data.Dataset, dict]:
    """(v, betweenness) — adaptively sampled betweenness; the (ε, δ)
    Hoeffding guarantee holds when the FULL ``k_max`` budget is consumed.

    Reference: centrality/KadabraBetweenness.cpp — adaptive sampling with
    progressive stopping bounds.  Normative simplification (documented):
    the sample budget is the Hoeffding + union bound
    ``k_max = ln(2n/δ) / (2ε²)`` on the per-pivot normalized dependency
    δ_s(v)/(n−1) ∈ [0, 1] (Kadabra's Rademacher machinery tightens the
    same guarantee).  Sampling also stops EARLY when ONE batch round moves
    no node's normalized estimate by more than ε/2 — a stability HEURISTIC
    (the adaptive behavior that makes Kadabra cheap on easy graphs); when
    it fires before ``k_max``, the result is a converged estimate without
    the formal (ε, δ) bound.  Pass ``batch >= k_max`` to force the full
    budget and keep the guarantee.

    Output is scaled like :func:`estimate_betweenness` (× n/k) so the two
    are directly comparable; info reports samples used vs the bound.

    ``sampler`` picks the per-round pivot draw: ``"pcg"`` (default) is the
    seeded PCG64 choice; ``"hash"`` ranks nodes by the multiplicative hash
    ``(v + seed + 7919·round) · golden64`` and takes the ``batch`` smallest
    — the same SQL-replayable rule as ``closeness._pivots``, making the
    whole adaptive schedule (budget, rounds, stop rule) oracle-checkable.
    Both draws satisfy the Hoeffding analysis identically (any fixed
    pivot multiset gives an unbiased per-pivot estimator).
    """
    from networkit_ray.graph.build import transpose

    edges = edges.materialize()
    g_fwd = build_pgraph(edges, num_nodes, num_parts=num_parts)
    g_bwd = build_pgraph(transpose(edges), num_nodes, num_parts=g_fwd.num_parts)
    P = g_fwd.num_parts
    k_max = int(np.ceil(np.log(2.0 * num_nodes / delta) / (2.0 * eps * eps)))

    total = [_bw_zero_like.remote(g_fwd.vid_refs[p]) for p in range(P)]
    prev = None
    k = prev_k = 0
    rounds = 0
    norm = float(max(num_nodes - 1, 1))
    if sampler not in ("pcg", "hash"):
        raise ValueError(f"unknown sampler {sampler!r} (want 'pcg' or 'hash')")
    while k < k_max:
        if sampler == "hash":
            from networkit_ray.graph.closeness import _pivots

            pivots = _pivots(num_nodes, min(batch, k_max - k), seed + 7919 * rounds)
        else:
            pivots = _pivot_ids(num_nodes, min(batch, k_max - k), seed + 7919 * rounds)
        refs, _ = betweenness_refs(g_fwd, g_bwd, pivots, pivot_batch=batch)
        total = [_bw_add.remote(total[p], refs[p]) for p in range(P)]
        k += len(pivots)
        rounds += 1
        if prev is not None:
            diff = max(
                ray.get(
                    [
                        _bw_maxdiff.remote(
                            total[p], prev[p], 1.0 / (k * norm), 1.0 / (prev_k * norm)
                        )
                        for p in range(P)
                    ]
                )
            )
            if diff <= eps / 2.0:
                break
        prev, prev_k = total, k
    factor = num_nodes / k
    scaled = [_bw_scale.remote(r, factor) for r in total]
    return (
        bsp.state_to_dataset(g_fwd, scaled, "betweenness"),
        {"samples": k, "bound": k_max, "rounds": rounds, "eps": eps, "delta": delta},
    )


# ---------------------------------------------------------------- Dyn repair
@ray.remote
def _bw_dist_rows(st: dict, local_idx: np.ndarray) -> np.ndarray:
    """(len(local_idx), K) distance rows — the affected-pivot probe."""
    return st["dist"][local_idx]


@ray.remote
def _bw_accum_cols(
    bc: np.ndarray,
    delta: np.ndarray,
    vids: np.ndarray,
    sources: np.ndarray,
    keep: np.ndarray,
) -> np.ndarray:
    """Fold only the ``keep``-masked pivot columns of a batch's δ into bc."""
    d = delta.copy()
    for k, s in enumerate(sources):
        if not keep[k]:
            d[:, k] = 0.0
            continue
        hit = np.flatnonzero(vids == np.uint64(s))
        if len(hit):
            d[hit[0], k] = 0.0
    return bc + d.sum(axis=1)


class DynBetweennessState:
    """Retained per-pivot Brandes state for incremental edge-insert repair.

    ``batches`` is a list of (pivot ids, per-partition st refs, per-partition
    δ refs); st holds each pivot's distance/σ table, δ its dependencies.
    Memory: 3·n·n_samples floats across the cluster — the price of repair.
    """

    def __init__(self, edges, g_fwd, g_bwd, num_nodes, pivots, batches):
        self.edges = edges
        self.g_fwd = g_fwd
        self.g_bwd = g_bwd
        self.num_nodes = num_nodes
        self.pivots = pivots
        self.batches = batches


def _dyn_scores(state: DynBetweennessState) -> ray.data.Dataset:
    P = state.g_fwd.num_parts
    sizes = state.g_fwd.part_sizes()
    bc = [_bw_zero1.remote(sizes[p]) for p in range(P)]
    for pivots_b, _, delta in state.batches:
        bc = [
            _bw_accum.remote(bc[p], delta[p], state.g_fwd.vid_refs[p], pivots_b)
            for p in range(P)
        ]
    factor = state.num_nodes / len(state.pivots)
    scaled = [_bw_scale.remote(r, factor) for r in bc]
    return bsp.state_to_dataset(state.g_fwd, scaled, "betweenness")


def dyn_betweenness(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    n_samples: int = 16,
    seed: int = 42,
    num_parts: int | None = None,
    pivot_batch: int = 16,
    pivots: np.ndarray | None = None,
) -> tuple[ray.data.Dataset, DynBetweennessState, dict]:
    """Sampled betweenness with retained repair state.

    Reference: centrality/DynApproxBetweenness.cpp (Bergamini–Meyerhenke
    incremental approximate betweenness: keep each sampled source's SSSP
    DAG; on edge insertion re-sample only the sources whose DAG changed).
    Here the per-pivot state is the batched-Brandes (dist, σ, δ) tables,
    kept as per-partition object refs.
    """
    from networkit_ray.graph.build import transpose

    edges = edges.materialize()
    g_fwd = build_pgraph(edges, num_nodes, num_parts=num_parts)
    g_bwd = build_pgraph(transpose(edges), num_nodes, num_parts=g_fwd.num_parts)
    if pivots is None:
        pivots = _pivot_ids(num_nodes, n_samples, seed)
    else:
        pivots = np.asarray(pivots, dtype=np.int64)
        if len(pivots) == 0:
            raise ValueError("pivots must be non-empty")
        if pivots.min() < 0 or pivots.max() >= num_nodes:
            raise ValueError(
                f"pivot ids must lie in [0, {num_nodes}); got "
                f"[{pivots.min()}, {pivots.max()}]"
            )
    batches = []
    supersteps = 0
    for b0 in range(0, len(pivots), pivot_batch):
        batch = pivots[b0 : b0 + pivot_batch]
        st, delta, ss = _brandes_batch(g_fwd, g_bwd, batch)
        supersteps += ss
        batches.append((batch, st, delta))
    state = DynBetweennessState(edges, g_fwd, g_bwd, num_nodes, pivots, batches)
    info = {"pivots": len(pivots), "supersteps": supersteps}
    return _dyn_scores(state), state, info


def dyn_betweenness_update(
    state: DynBetweennessState,
    new_edges: ray.data.Dataset,
    *,
    pivot_batch: int = 16,
) -> tuple[ray.data.Dataset, DynBetweennessState, dict]:
    """Repair after an edge-INSERT batch (no deletions, no new vertices —
    DynApproxBetweenness.cpp's supported event class).

    Pivot s needs recomputation iff some inserted edge (u, v) satisfies
    d_s(u) ≥ 0 and (v unreached or d_s(u)+1 ≤ d_s(v)) — i.e. the edge
    shortens a distance or adds a shortest path, changing s's DAG.  All
    other pivots keep their retained δ unchanged (their shortest-path DAGs
    are untouched by the insertions), so the repair cost scales with the
    number of AFFECTED pivots, not the sample size.

    ``new_edges`` is an event batch — small by definition; endpoints are
    pulled to the driver to build the probe (O(batch) rows).
    """
    from networkit_ray.graph.build import transpose
    from networkit_ray.graph.bsp import vplace

    P = state.g_fwd.num_parts
    n = state.num_nodes
    ep = new_edges.select_columns(["src", "dst"]).to_pandas()
    u = ep["src"].to_numpy().astype(np.int64)
    v = ep["dst"].to_numpy().astype(np.int64)
    if len(u) and max(u.max(), v.max()) >= n:
        raise ValueError("insert batch adds unknown vertices")

    # distance rows for every distinct endpoint, per batch: O(1) placement
    # arithmetic + one small gather per partition
    ends = np.unique(np.concatenate([u, v]))
    owner, local = vplace(ends, n, P)

    edges2 = state.edges.union(new_edges.select_columns(["src", "dst"])).materialize()
    g_fwd2 = build_pgraph(edges2, n, num_parts=P)
    g_bwd2 = build_pgraph(transpose(edges2), n, num_parts=P)

    new_batches = []
    recomputed = 0
    supersteps = 0
    for pivots_b, st, delta in state.batches:
        K = len(pivots_b)
        dist_rows = np.full((len(ends), K), -1, dtype=np.int64)
        for p in range(P):
            sel = np.flatnonzero(owner == p)
            if not len(sel):
                continue
            dist_rows[sel] = ray.get(
                _bw_dist_rows.remote(st[p], local[sel].astype(np.int64))
            )
        pos = {int(e): i for i, e in enumerate(ends)}
        du = dist_rows[[pos[int(x)] for x in u]] if len(u) else dist_rows[:0]
        dv = dist_rows[[pos[int(x)] for x in v]] if len(v) else dist_rows[:0]
        affected = (
            ((du >= 0) & ((dv < 0) | (du + 1 <= dv))).any(axis=0)
            if len(u)
            else np.zeros(K, dtype=bool)
        )
        keep = ~affected
        kept_pivots = pivots_b[keep]
        if keep.any():
            # retained δ/st stay valid on the NEW graph for these pivots
            st_k = [_bw_slice_cols.remote(st[p], np.flatnonzero(keep)) for p in range(P)]
            d_k = [_bw_col_select.remote(delta[p], np.flatnonzero(keep)) for p in range(P)]
            new_batches.append((kept_pivots, st_k, d_k))
        aff_pivots = pivots_b[affected]
        for b0 in range(0, len(aff_pivots), pivot_batch):
            batch = aff_pivots[b0 : b0 + pivot_batch]
            st2, d2, ss = _brandes_batch(g_fwd2, g_bwd2, batch)
            supersteps += ss
            recomputed += len(batch)
            new_batches.append((batch, st2, d2))

    new_state = DynBetweennessState(
        edges2, g_fwd2, g_bwd2, n, state.pivots, new_batches
    )
    info = {
        "affected_pivots": recomputed,
        "total_pivots": len(state.pivots),
        "supersteps": supersteps,
    }
    return _dyn_scores(new_state), new_state, info


@ray.remote
def _bw_slice_cols(st: dict, cols: np.ndarray) -> dict:
    return {"dist": st["dist"][:, cols], "sigma": st["sigma"][:, cols]}


@ray.remote
def _bw_col_select(delta: np.ndarray, cols: np.ndarray) -> np.ndarray:
    return delta[:, cols]
