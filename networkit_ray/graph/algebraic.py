"""Distributed Laplacian solves: commute-time (effective-resistance) distance.

Reference semantics: distance/CommuteTimeDistance.cpp:154-189 —
``distance(u,v) = sqrt(|x_u − x_v| · vol(G))`` with ``x = L⁺(e_u − e_v)``
(the reference solves with LAMG; here plain conjugate gradient, which is
exact for connected graphs since the RHS is mean-free and CG keeps
iterates in range(L)).  Also stands in for the algebraic/ family
(CSRMatrix::laplacianMatrix + spectral helpers): the Laplacian matvec
``L p = D p − A p`` is ONE BSP superstep (weighted-sum messages along
edges + local weighted-degree scaling), so every Krylov-space algorithm
runs as a superstep loop with two vertex-sized driver folds (dot
products) per iteration.

All K requested pairs solve SIMULTANEOUSLY as a multi-RHS block-CG: state
is an (n_p × K) matrix per partition, exactly the batching used by
multi-source BFS — supersteps cost one (E × K) message matrix, driver
traffic is K scalars per iteration.  Constant shifts of x cancel in
x_u − x_v, so no mean-deflation is needed.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph.bsp import (
    build_pgraph,
    chunk_edge_index,
    aggregate_messages,
    vlocal,
    vowner,
)


@ray.remote
def _wdeg(block: dict) -> np.ndarray:
    n_v = len(block["vids"])
    d = np.zeros(n_v, np.float64)
    w = block["w"]
    if w is None:
        np.add.at(d, block["src_local"], 1.0)
    else:
        np.add.at(d, block["src_local"], w.astype(np.float64))
    return d


@ray.remote
def _vol_partial(wdeg: np.ndarray) -> float:
    return float(wdeg.sum())


@ray.remote(num_returns=3)
def _cg_init(vids: np.ndarray, sources: np.ndarray, targets: np.ndarray):
    """x=0, r=p=b with b_k = e_{s_k} − e_{t_k} restricted to this partition."""
    n_v, K = len(vids), len(sources)
    b = np.zeros((n_v, K), np.float64)
    v64 = vids.astype(np.int64)
    for k in range(K):
        hit = np.flatnonzero(v64 == sources[k])
        if len(hit):
            b[hit[0], k] += 1.0
        hit = np.flatnonzero(v64 == targets[k])
        if len(hit):
            b[hit[0], k] -= 1.0
    return np.zeros((n_v, K), np.float64), b, b.copy()


@ray.remote
def _cg_map(block: dict, p_vec: np.ndarray, chunk: int) -> tuple:
    eidx = chunk_edge_index(block, chunk)
    src_l = block["src_local"][eidx]
    vals = p_vec[src_l]
    w = block["w"]
    if w is not None:
        vals = vals * w[eidx, None].astype(np.float64)
    return tuple(aggregate_messages(block, vals, chunk))


@ray.remote(num_returns=2)
def _cg_Ap(wdeg: np.ndarray, p_vec: np.ndarray, *partials):
    Ap = wdeg[:, None] * p_vec
    for idx, sums in partials:
        if len(idx):
            np.add.at(Ap, idx, -sums)
    return Ap, (p_vec * Ap).sum(axis=0)


@ray.remote(num_returns=3)
def _cg_update(x: np.ndarray, r: np.ndarray, p: np.ndarray, Ap: np.ndarray, alpha: np.ndarray):
    x = x + alpha[None, :] * p
    r = r - alpha[None, :] * Ap
    return x, r, (r * r).sum(axis=0)


@ray.remote
def _cg_pupdate(r: np.ndarray, p: np.ndarray, beta: np.ndarray) -> np.ndarray:
    return r + beta[None, :] * p


@ray.remote
def _cg_extract(vids: np.ndarray, x: np.ndarray, wanted: np.ndarray):
    mask = np.isin(vids.astype(np.int64), wanted)
    return vids[mask].astype(np.int64), x[mask]


def commute_time_distance(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    pairs: list[tuple[int, int]],
    *,
    weighted: bool = False,
    tol: float = 1e-12,
    max_iterations: int = 500,
    num_parts: int | None = None,
) -> tuple["pa.Table", dict]:
    """(src, dst, ctd) for explicit pairs; ctd = sqrt(|x_s − x_t|·vol).

    Pairs must lie in one connected component (the reference's LAMG setup
    makes the same ``setupConnected`` assumption,
    CommuteTimeDistance.cpp:20-37).
    """
    import pyarrow as pa

    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts, weighted=weighted)
    P = g.num_parts
    units = g.map_units()
    K = len(pairs)
    sources = np.array([s for s, _ in pairs], np.int64)
    targets = np.array([t for _, t in pairs], np.int64)

    wdeg = [_wdeg.remote(b) for b in g.block_refs]
    vol = sum(ray.get([_vol_partial.remote(d) for d in wdeg]))

    x, r, p = zip(*[
        _cg_init.remote(g.vid_refs[q], sources, targets) for q in range(P)
    ])
    x, r, p = list(x), list(r), list(p)
    rr = np.full(K, 2.0)  # ||b||² per column is exactly 2
    iters = 0
    while iters < max_iterations and rr.max() > tol * tol:
        map_out = [
            _cg_map.options(num_returns=P).remote(g.block_refs[q], p[q], c)
            for q, c in units
        ]
        Ap, pap_refs = [], []
        for q in range(P):
            a, s = _cg_Ap.remote(wdeg[q], p[q], *[mo[q] for mo in map_out])
            Ap.append(a)
            pap_refs.append(s)
        pAp = np.sum(ray.get(pap_refs), axis=0)
        alpha = np.where(pAp > 0, rr / np.where(pAp > 0, pAp, 1.0), 0.0)
        rr_refs = []
        for q in range(P):
            xq, rq, s = _cg_update.remote(x[q], r[q], p[q], Ap[q], alpha)
            x[q], r[q] = xq, rq
            rr_refs.append(s)
        rr_new = np.sum(ray.get(rr_refs), axis=0)
        beta = np.where(rr > 0, rr_new / np.where(rr > 0, rr, 1.0), 0.0)
        p = [_cg_pupdate.remote(r[q], p[q], beta) for q in range(P)]
        rr = rr_new
        iters += 1

    wanted = np.unique(np.concatenate([sources, targets]))
    parts = ray.get(
        [_cg_extract.remote(g.vid_refs[q], x[q], wanted) for q in range(P)]
    )
    row_of = {}
    for vs, xs in parts:
        for i, v in enumerate(vs):
            row_of[int(v)] = xs[i]
    ctd = [
        float(np.sqrt(abs(row_of[int(s)][k] - row_of[int(t)][k]) * vol))
        for k, (s, t) in enumerate(pairs)
    ]
    table = pa.table(
        {
            "src": pa.array(sources, pa.int64()),
            "dst": pa.array(targets, pa.int64()),
            "ctd": pa.array(ctd, pa.float64()),
        }
    )
    return table, {"iterations": iters, "residual": float(rr.max()), "vol": vol}
