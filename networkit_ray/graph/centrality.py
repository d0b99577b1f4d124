"""Power-iteration centrality family on the BSP engine (Katz, eigenvector).

Same superstep shape as PageRank (one P×P exchange per iteration over the
pinned partitioned CSR), different update rules:

- :func:`katz` — centrality/KatzCentrality.cpp semantics:
  x_{t+1}[u] = α · Σ_{(v,u)} x_t[v] + β, iterated to L2-residual tolerance
  or a fixed count, then L2-normalized.  α must be < 1/λ_max to converge.
- :func:`eigenvector` — centrality/EigenvectorCentrality.cpp:22-55: power
  iteration x_{t+1} = A^T x_t with an L2 normalization after every step.

Both are exactly expressible as chained SQL CTEs for fixed iteration counts
(the oracle twin in __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph, chunk_edge_index, message_values


@ray.remote
def _vec_init(vids: np.ndarray, value: float) -> np.ndarray:
    return np.full(len(vids), value, dtype=np.float64)


@ray.remote
def _gather_map(block: dict, x: np.ndarray, chunk: int) -> tuple:
    """messages = x[src] summed per dst (weighted: × w)."""
    idx = chunk_edge_index(block, chunk)
    vals = x[block["src_local"][idx]]
    if block["w"] is not None:
        vals = vals * block["w"][idx]
    # values only; destination indices pinned once per graph (bsp)
    return tuple(message_values(block, vals, chunk))


@ray.remote(num_returns=2)
def _affine_reduce(old: np.ndarray, alpha: float, beta: float, idx_bundle: list, *values):
    new = np.full(len(old), beta, dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            new[idx] += alpha * sums
    delta = new - old
    return new, (float(delta @ delta), float(new @ new))


@ray.remote
def _scale(x: np.ndarray, factor: float) -> np.ndarray:
    return x / factor


def _iterate(
    g: PGraph,
    alpha: float,
    beta: float,
    *,
    tol: float,
    max_iterations: int,
    normalize_each: bool,
    init: list | None = None,
    normalize_end: bool = True,
) -> tuple[list, dict]:
    P = g.num_parts
    x = init or [_vec_init.remote(g.vid_refs[p], 1.0 / g.num_nodes) for p in range(P)]
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    it = 0
    resid = float("inf")
    while it < max_iterations:
        map_out = [
            _gather_map.options(num_returns=P).remote(g.block_refs[p], x[p], c)
            for p, c in units
        ]
        new_x, stat_refs = [], []
        for q in range(P):
            s, st = _affine_reduce.remote(x[q], alpha, beta, bundles[q], *[mo[q] for mo in map_out])
            new_x.append(s)
            stat_refs.append(st)
        stats = ray.get(stat_refs)
        x = new_x
        it += 1
        norm2 = float(np.sqrt(sum(s[1] for s in stats)))
        if normalize_each and norm2 > 0:
            x = [_scale.remote(xp, norm2) for xp in x]
            # residual meaningful only against the normalized previous iterate;
            # eigenvector mode uses max_iterations (reference uses per-step
            # norm checks too, EigenvectorCentrality.cpp:40-53)
            resid = float(np.sqrt(sum(s[0] for s in stats)))
        else:
            resid = float(np.sqrt(sum(s[0] for s in stats)))
            if resid <= tol:
                break
    if not normalize_each and normalize_end:
        norm2 = float(
            np.sqrt(sum(ray.get([_sq_sum.remote(xp) for xp in x])))
        )
        if norm2 > 0:
            x = [_scale.remote(xp, norm2) for xp in x]
    return x, {"iterations": it, "residual": resid}


@ray.remote
def _sq_sum(x: np.ndarray) -> float:
    return float(x @ x)


def katz(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    tol: float = 1e-9,
    max_iterations: int = 10**9,
    num_parts: int | None = None,
    weighted: bool = False,
    return_raw: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(v, score) Katz centrality, L2-normalized at convergence
    (``return_raw=True`` skips the end normalization and returns the
    fixpoint-scale vector — the seed format :func:`warm_start_katz`
    expects)."""
    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=weighted)
    refs, info = _iterate(
        g, alpha, beta, tol=tol, max_iterations=max_iterations,
        normalize_each=False, normalize_end=not return_raw,
    )
    return bsp.state_to_dataset(g, refs, "score"), info


def warm_start_katz(
    edges: ray.data.Dataset,
    num_nodes: int,
    prev_raw_scores: ray.data.Dataset,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    tol: float = 1e-9,
    max_iterations: int = 10**9,
    num_parts: int | None = None,
    weighted: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """Katz over an UPDATED graph seeded with previous FIXPOINT-SCALE
    scores (the DynKatzCentrality analog of warm_start_pagerank).

    The affine map x ← αA^T x + β is a contraction for α < 1/λ_max, so the
    fixpoint is unique — the warm start changes iteration count, never the
    answer.  Vertices absent from ``prev_raw_scores`` (new nodes) start at
    1/n.  Output is L2-normalized like :func:`katz`.
    """
    from networkit_ray.graph.pagerank import _pr_scatter, _pr_seed

    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=weighted)
    P = g.num_parts
    scat = [
        _pr_scatter.options(num_returns=P).remote(r, num_nodes, P)
        for r in prev_raw_scores.to_arrow_refs()
    ]
    init = [
        _pr_seed.remote(g.vid_refs[q], num_nodes, P, *[s[q] for s in scat])
        for q in range(P)
    ]
    refs, info = _iterate(
        g, alpha, beta, tol=tol, max_iterations=max_iterations,
        normalize_each=False, init=init,
    )
    return bsp.state_to_dataset(g, refs, "score"), info


def eigenvector(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    max_iterations: int = 100,
    num_parts: int | None = None,
    weighted: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(v, score) eigenvector centrality (power iteration, per-step L2 norm).

    Pass the symmetrized table for undirected graphs.
    """
    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=weighted)
    refs, info = _iterate(
        g, 1.0, 0.0, tol=0.0, max_iterations=max_iterations, normalize_each=True
    )
    return bsp.state_to_dataset(g, refs, "score"), info
