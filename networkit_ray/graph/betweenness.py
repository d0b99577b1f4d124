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
    aggregate_messages,
    build_pgraph,
    chunk_edge_index,
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
    return tuple(aggregate_messages(block, vals, chunk))


@ray.remote(num_returns=2)
def _bw_fwd_reduce(st: dict, level: int, *partials):
    dist, sigma = st["dist"].copy(), st["sigma"].copy()
    inc = np.zeros(dist.shape, dtype=np.float64)
    for idx, sums in partials:
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
    return tuple(aggregate_messages(block, vals, chunk))


@ray.remote
def _bw_bwd_reduce(st: dict, delta: np.ndarray, level: int, *partials):
    new = delta.copy()
    inc = np.zeros(delta.shape, dtype=np.float64)
    for idx, sums in partials:
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


def betweenness_refs(
    g_fwd: PGraph, g_bwd: PGraph, pivots: np.ndarray, *, pivot_batch: int = 16
) -> tuple[list, dict]:
    P = g_fwd.num_parts
    units_f = g_fwd.map_units()
    units_b = g_bwd.map_units()
    sizes = g_fwd.part_sizes()
    bc = [_bw_zero1.remote(sizes[p]) for p in range(P)]
    supersteps = 0
    for b0 in range(0, len(pivots), pivot_batch):
        batch = pivots[b0 : b0 + pivot_batch]
        K = len(batch)
        st = [_bw_init.remote(g_fwd.vid_refs[p], batch) for p in range(P)]
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
                s2, c2 = _bw_fwd_reduce.remote(st[q], level, *[m[q] for m in mo])
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
                _bw_bwd_reduce.remote(st[q], delta[q], L, *[m[q] for m in mo])
                for q in range(P)
            ]
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
) -> tuple[ray.data.Dataset, dict]:
    """(v, betweenness) — sampled-pivot estimate (exact=True runs every
    pivot, i.e. exact Brandes).  Pass the symmetrized table for undirected
    betweenness (each unordered pair then counts twice, matching the
    reference's undirected convention before its final halving)."""
    from networkit_ray.graph.build import transpose

    edges = edges.materialize()
    g_fwd = build_pgraph(edges, num_nodes, num_parts=num_parts)
    g_bwd = build_pgraph(transpose(edges), num_nodes, num_parts=g_fwd.num_parts)
    if exact:
        pivots = np.arange(num_nodes, dtype=np.int64)
        factor = 1.0
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
) -> tuple[ray.data.Dataset, dict]:
    """(v, betweenness) — adaptively sampled betweenness with an
    (ε, δ) absolute-error guarantee on the NORMALIZED score.

    Reference: centrality/KadabraBetweenness.cpp — adaptive sampling with
    progressive stopping bounds.  Normative simplification (documented):
    the sample budget is the Hoeffding + union bound
    ``k_max = ln(2n/δ) / (2ε²)`` on the per-pivot normalized dependency
    δ_s(v)/(n−1) ∈ [0, 1] (Kadabra's Rademacher machinery tightens the
    same guarantee), and sampling stops EARLY when two consecutive batch
    rounds move no node's normalized estimate by more than ε/2 — the
    adaptive behavior that makes Kadabra cheap on easy graphs.

    Output is scaled like :func:`estimate_betweenness` (× n/k) so the two
    are directly comparable; info reports samples used vs the bound.
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
    while k < k_max:
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
