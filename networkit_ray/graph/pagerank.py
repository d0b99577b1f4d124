"""Distributed PageRank (power iteration) on the partitioned-CSR BSP engine.

Semantics follow the reference exactly (networkit/cpp/centrality/PageRank.cpp:18-102,
include/networkit/centrality/PageRank.hpp:26-73):

- init score[u] = 1/n over the full vertex universe (PageRank.cpp:20-24);
- superstep: pr[u] = (1-damp)/n + damp * Σ_{(v,u)} score[v] * w(v,u) / wdeg(v)
  (PageRank.cpp:54-64); undirected graphs pass the symmetrized edge table so
  "in-edges" are all incident edges;
- dangling nodes contribute nothing per iteration (mass leaks; fixed by the
  final normalization, not per-iteration redistribution) — same as reference;
- convergence (PageRank.cpp:39-49): iterations >= max_iterations OR
  residual <= tol with residual = Σ|Δ| (L1) or sqrt(ΣΔ²) (L2).  Reference
  defaults damp=0.85, tol=1e-8, norm=L2 (PageRank.hpp:38,65); the north rule
  pins L1/1e-6, so our default is norm="l1";
- post-normalization (PageRank.cpp:73-90): default divide by the global score
  sum (Σ=1); ``normalized=True`` divides by
  (1/n)·((1-damp) + damp·Σ_{outdeg(u)=0} score[u]).

Each superstep is one P×P object-store exchange; per-iteration state can be
checkpointed with lineage via ``state.checkpoint``.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph
from networkit_ray.state import checkpoint as ckpt


@ray.remote
def _pr_coef(block: dict) -> np.ndarray:
    """Per-edge superstep-invariant coefficient w(u,v)/wdeg(u) (or 1/outdeg),
    returned in GROUPED edge order so every superstep reads it as a
    contiguous slice (no per-superstep coef[edge_order] gather)."""
    src_local = block["src_local"]
    if block["w"] is not None:
        wdeg = np.zeros(len(block["vids"]), dtype=np.float64)
        np.add.at(wdeg, src_local, block["w"])
        coef = block["w"] / wdeg[src_local]
    else:
        out_deg = block["out_deg"].astype(np.float64)
        coef = 1.0 / out_deg[src_local]
    return coef[block["edge_order"]]


@ray.remote
def _pr_init(vids: np.ndarray, n: int, dtype: str = "float64") -> np.ndarray:
    return np.full(len(vids), 1.0 / n, dtype=np.dtype(dtype))


@ray.remote
def _pr_map(block: dict, coef: np.ndarray, scores: np.ndarray, chunk: int) -> tuple:
    # grouped-order slices: one scores gather per edge, everything else
    # contiguous sequential reads (coef arrives pre-grouped from _pr_coef).
    # Messages are VALUES ONLY — destination indices are superstep-invariant
    # and pinned once via PGraph.msg_index_refs(), halving exchange bytes
    # per superstep (the measured bottleneck, see BASELINE.md f32/f64 A/B).
    sl = bsp.grouped_src(block, chunk)
    if chunk < 0:
        coef_s = coef
    else:
        c = block["chunks"][chunk]
        coef_s = coef[c["start"] : c["end"]]
    # map-local math upcasts to float64 regardless of the state dtype
    vals = scores[sl].astype(np.float64) * coef_s
    out = bsp.message_values(block, vals, chunk)
    if scores.dtype == np.float32:
        # float32 message option (reference stores scores as f_weight =
        # float32, Globals.hpp:28): halve the per-superstep exchange
        # volume again; accumulation above stayed float64
        out = [s.astype(np.float32) for s in out]
    return tuple(out)


@ray.remote(num_returns=2)
def _pr_reduce(old: np.ndarray, damp: float, n: int, idx_bundle: list, *values):
    # idx_bundle = the partition's pinned per-map-unit destination indices
    # (PGraph.msg_bundle_refs(); resolves from the local object store after
    # the first superstep — nothing index-sized crosses the wire again);
    # values = the per-unit aggregated message values, in the same order.
    # float64 accumulator even on the float32 state path (the 1e-6 oracle)
    new = np.full(len(old), (1.0 - damp) / n, dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            new[idx] += damp * sums.astype(np.float64)  # idx unique per partial
    delta = new - old.astype(np.float64)
    stats = (np.abs(delta).sum(), float(delta @ delta), new.sum())
    return new.astype(old.dtype, copy=False), stats


@ray.remote
def _pr_scale(scores: np.ndarray, factor: float) -> np.ndarray:
    # output scores are always float64 (oracle schema), whatever the
    # superstep state dtype was
    return (scores.astype(np.float64)) / factor


@ray.remote
def _pr_dangling_sum(block: dict, scores: np.ndarray) -> float:
    return float(scores[block["out_deg"] == 0].sum())


@ray.remote
def _pr_total(scores: np.ndarray) -> float:
    return float(scores.sum())


def pagerank_refs(
    g: PGraph,
    *,
    damp: float = 0.85,
    tol: float = 1e-8,
    norm: str = "l1",
    max_iterations: int | None = None,
    normalized: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    init_scores: list | None = None,
    check_every: int = 1,
    dtype: str = "float64",
) -> tuple[list, dict]:
    """Run PageRank; returns (per-partition score refs, info dict).

    ``init_scores``: per-partition score arrays to warm-start from (the
    DynPageRank path — see warm_start_pagerank); power iteration from any
    positive start converges to the same fixpoint, just sooner when the
    start is yesterday's scores.

    ``check_every``: gather the residual only every k supersteps, so the
    driver submits k supersteps' task graphs ahead instead of barriering on
    ``ray.get(stat_refs)`` each iteration (cluster-scale: hides stragglers
    and driver RTT).  May overshoot convergence by up to k-1 supersteps —
    extra power iterations only tighten the fixpoint, so scores still match
    the reference within tol.

    ``dtype="float32"``: ship superstep state and messages as float32
    (reference stores scores as f_weight = float32, Globals.hpp:28) —
    halves exchange volume; all accumulation stays float64, and the final
    scores are returned float64 (matches the float64 path within ~1e-7)."""
    P = g.num_parts
    n = g.num_nodes
    coef_refs = [_pr_coef.remote(b) for b in g.block_refs]

    start_iter = 0
    scores = None
    if resume and checkpoint_dir:
        loaded = ckpt.load_latest(checkpoint_dir, "pagerank", g)
        if loaded is not None:
            scores, meta = loaded
            start_iter = meta["iteration"]
    if scores is None and init_scores is not None:
        scores = init_scores
    if scores is None:
        scores = [_pr_init.remote(g.vid_refs[p], n, dtype) for p in range(P)]

    iteration = start_iter
    residual = float("inf")
    prev_residual = float("inf")
    stalls = 0
    max_it = max_iterations if max_iterations is not None else 10**9
    units = g.map_units()
    # fixed-iteration runs (tol<=0) never need the residual mid-run: skip
    # the per-superstep ray.get barrier entirely so supersteps pipeline
    # back-to-back through the object store (the driver only submits)
    fixed_iters = tol <= 0 and max_iterations is not None and not checkpoint_dir
    stats = None
    stat_refs: list = []
    bundles = g.msg_bundle_refs()  # pinned once; supersteps ship values only
    while iteration < max_it:
        map_out = [
            _pr_map.options(num_returns=P).remote(
                g.block_refs[p], coef_refs[p], scores[p], c
            )
            for p, c in units
        ]
        new_scores, stat_refs = [], []
        for q in range(P):
            s, st = _pr_reduce.remote(
                scores[q], damp, n, bundles[q], *[mo[q] for mo in map_out]
            )
            new_scores.append(s)
            stat_refs.append(st)
        scores = new_scores
        iteration += 1
        if fixed_iters and iteration < max_it:
            continue
        if (
            iteration % max(1, check_every) != 0
            and iteration < max_it
            and not (checkpoint_dir and iteration % checkpoint_every == 0)
        ):
            continue
        stats = ray.get(stat_refs)
        l1 = sum(s[0] for s in stats)
        l2 = float(np.sqrt(sum(s[1] for s in stats)))
        residual = l1 if norm == "l1" else l2
        if checkpoint_dir and iteration % checkpoint_every == 0:
            ckpt.save(
                checkpoint_dir, "pagerank", iteration, g, scores, "score",
                {"residual": residual, "damp": damp, "tol": tol},
            )
        if residual <= tol:
            break
        # numeric-floor guard: power iteration shrinks the residual by
        # ~damp per superstep, so two consecutive checks without real
        # progress mean the state dtype can't express further improvement
        # (e.g. dtype="float32" floors the L1 residual near n·2⁻²⁴ — a
        # tol below that would otherwise loop forever)
        if residual >= prev_residual * 0.999:
            stalls += 1
            if stalls >= 2:
                break
        else:
            stalls = 0
        prev_residual = residual

    # final normalization (PageRank.cpp:73-90)
    if normalized:
        dangling = sum(ray.get([
            _pr_dangling_sum.remote(g.block_refs[p], scores[p]) for p in range(P)
        ]))
        factor = ((1.0 - damp) + damp * dangling) / n
    else:
        if iteration > start_iter:
            factor = sum(s[2] for s in stats)
        else:
            factor = sum(ray.get([_pr_total.remote(s) for s in scores]))
    scores = [_pr_scale.remote(s, factor) for s in scores]
    info = {"iterations": iteration, "residual": residual}
    return scores, info


def pagerank(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    weighted: bool = False,
    **kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """End-to-end: edge table → (v, score) vertex table.

    ``edges`` is the *message* direction: for directed PageRank pass the
    directed table (messages flow src→dst along out-edges); for undirected
    pass the symmetrized table.
    """
    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=weighted)
    refs, info = pagerank_refs(g, **kwargs)
    return bsp.state_to_dataset(g, refs, "score"), info


@ray.remote
def _ppr_restart(vids: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    r = np.zeros(len(vids), np.float64)
    r[np.isin(vids.astype(np.int64), seeds)] = 1.0 / len(seeds)
    return r


@ray.remote
def _ppr_reduce(restart: np.ndarray, damp: float, idx_bundle: list, *values) -> np.ndarray:
    new = (1.0 - damp) * restart
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            new[idx] += damp * sums
    return new


def personalized_pagerank(
    edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    damp: float = 0.85,
    iterations: int = 30,
    num_parts: int | None = None,
    weighted: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(v, score) personalized PageRank: teleport mass restarts at the seed
    set instead of uniformly (scd/ApproximatePageRank.cpp semantics, here
    as fixed-iteration synchronous power iteration so the SQL twin is
    exact; dangling mass leaks — the 'strong' PPR convention).

    x_{t+1} = (1-α)·r + α·Aᵀ_deg x_t,  r = uniform on seeds, x_0 = r.
    """
    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=weighted)
    P = g.num_parts
    seeds_arr = np.asarray(sorted(set(seeds)), np.int64)
    coef_refs = [_pr_coef.remote(b) for b in g.block_refs]
    restart = [_ppr_restart.remote(g.vid_refs[p], seeds_arr) for p in range(P)]
    scores = restart
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    for _ in range(iterations):
        map_out = [
            _pr_map.options(num_returns=P).remote(
                g.block_refs[p], coef_refs[p], scores[p], c
            )
            for p, c in units
        ]
        scores = [
            _ppr_reduce.remote(
                restart[q], damp, bundles[q], *[mo[q] for mo in map_out]
            )
            for q in range(P)
        ]
    return bsp.state_to_dataset(g, scores, "score"), {"iterations": iterations}


@ray.remote
def _tpr_zeros(vids: np.ndarray) -> np.ndarray:
    return np.zeros(len(vids), np.float64)


@ray.remote(num_returns=2)
def _tpr_reduce(acc: np.ndarray, damp: float, collect: bool, idx_bundle: list, *values):
    new = np.zeros(len(acc), np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            new[idx] += damp * sums
    acc2 = acc + (1.0 - damp) * new if collect else acc
    return new, acc2


def truncated_pagerank(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    damp: float = 0.85,
    trunc: int = 3,
    iterations: int = 10,
    num_parts: int | None = None,
    weighted: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(v, score) Truncated PageRank — the link-spam demotion variant of
    Becchetti et al., "Link analysis for web spam detection" (TWEB 2008):
    drop the first ``trunc`` path-length terms of the PageRank series so a
    page cannot earn rank from its immediate link-farm neighborhood,

        TPR(v) = (1-d) · Σ_{t=trunc+1..iterations} (x_t)(v),
        x_t = d · Mᵀ x_{t-1},   x_0 = uniform 1/n,

    i.e. only supporters at distance > trunc contribute.  Spam farms score
    high on PageRank but low on TPR; the ratio is a spam feature.  No
    teleport inside the recursion and dangling mass leaks (the series
    expansion of the same PageRank.cpp:54-64 operator the plain kernel
    uses); scores are returned raw (un-normalized) so the fixed-iteration
    SQL twin is exact.

    Scale shape: identical to ``pagerank`` — one P×P exchange per
    superstep over the pinned partitioned CSR; the accumulator is a second
    per-partition vector updated in the same reduce task (no extra pass).
    """
    if trunc >= iterations:
        raise ValueError("truncated_pagerank: need iterations > trunc")
    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=weighted)
    P = g.num_parts
    coef_refs = [_pr_coef.remote(b) for b in g.block_refs]
    x = [_pr_init.remote(g.vid_refs[p], num_nodes, "float64") for p in range(P)]
    acc = [_tpr_zeros.remote(g.vid_refs[p]) for p in range(P)]
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    for t in range(1, iterations + 1):
        map_out = [
            _pr_map.options(num_returns=P).remote(
                g.block_refs[p], coef_refs[p], x[p], c
            )
            for p, c in units
        ]
        nx, nacc = [], []
        for q in range(P):
            xq, aq = _tpr_reduce.remote(
                acc[q], damp, t > trunc, bundles[q], *[mo[q] for mo in map_out]
            )
            nx.append(xq)
            nacc.append(aq)
        x, acc = nx, nacc
    return (
        bsp.state_to_dataset(g, acc, "score"),
        {"iterations": iterations, "trunc": trunc},
    )


# ---- warm-start (DynPageRank-style) --------------------------------------


@ray.remote
def _pr_scatter(t, num_nodes: int, num_parts: int) -> tuple:
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
    sc = t["score"].to_numpy(zero_copy_only=False).astype(np.float64)
    parts = bsp.vowner(v, num_nodes, num_parts)
    order = np.argsort(parts, kind="stable")
    v, sc, parts = v[order], sc[order], parts[order]
    cut = np.searchsorted(parts, np.arange(num_parts + 1))
    return tuple(
        (v[cut[q] : cut[q + 1]], sc[cut[q] : cut[q + 1]]) for q in range(num_parts)
    )


@ray.remote
def _pr_seed(vids: np.ndarray, num_nodes: int, num_parts: int, *slices) -> np.ndarray:
    sc = np.full(len(vids), 1.0 / num_nodes, np.float64)
    for v, s in slices:
        if len(v):
            sc[bsp.vlocal(v, num_nodes, num_parts)] = s
    return sc


def warm_start_pagerank(
    edges: ray.data.Dataset,
    num_nodes: int,
    prev_scores: ray.data.Dataset,
    *,
    num_parts: int | None = None,
    weighted: bool = False,
    **kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """PageRank over an UPDATED graph seeded with the previous scores.

    The streaming-update analog of DynPageRank: after an edge-batch
    change, restart power iteration from yesterday's score vector —
    the fixpoint is identical (unique for damp < 1), and the iteration
    count tracks how far the scores moved, not the mixing time from
    uniform.  New vertices absent from ``prev_scores`` start at 1/n.
    """
    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=weighted)
    P = g.num_parts
    scat = [
        _pr_scatter.options(num_returns=P).remote(r, num_nodes, P)
        for r in prev_scores.to_arrow_refs()
    ]
    init = [
        _pr_seed.remote(g.vid_refs[q], num_nodes, P, *[s[q] for s in scat])
        for q in range(P)
    ]
    # pagerank() returns NORMALIZED scores, but the internal iteration's
    # fixpoint is unnormalized (dangling mass evaporates each superstep,
    # PageRank.cpp end-normalization semantics): its sum is
    # s* = (1−d)/(1 − d·(1−dangling_frac)).  Rescale the seed to s* or the
    # warm start's initial residual is O(1−s*) and saves nothing.
    damp = kwargs.get("damp", 0.85)
    dang = float(
        sum(ray.get([
            _pr_dangling_sum.remote(g.block_refs[p], init[p]) for p in range(P)
        ]))
    )
    s_star = (1.0 - damp) / (1.0 - damp * (1.0 - dang))
    init = [_pr_scale.remote(x, 1.0 / s_star) for x in init]
    refs, info = pagerank_refs(g, init_scores=init, **kwargs)
    return bsp.state_to_dataset(g, refs, "score"), info
