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
    message_values,
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
    # values only per CG step; destination indices pinned once per graph
    return tuple(message_values(block, vals, chunk))


@ray.remote(num_returns=2)
def _cg_Ap(wdeg: np.ndarray, p_vec: np.ndarray, idx_bundle: list, *values):
    Ap = wdeg[:, None] * p_vec
    for idx, sums in zip(idx_bundle, values):
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


@ray.remote
def _rr_partial(b: np.ndarray) -> np.ndarray:
    return (b * b).sum(axis=0)


def _block_cg(g, wdeg, b, *, tol: float, max_iterations: int):
    """Multi-RHS CG for L x = b; b = list of P (n_p × K) refs.

    Returns (x refs, iterations, final residual-norm² per column)."""
    P = g.num_parts
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    x = [_cg_zeros_like.remote(bq) for bq in b]
    r = list(b)
    p = [_cg_copy.remote(bq) for bq in b]
    rr = np.sum(ray.get([_rr_partial.remote(bq) for bq in b]), axis=0)
    tol2 = tol * tol
    iters = 0
    while iters < max_iterations and rr.max() > tol2:
        map_out = [
            _cg_map.options(num_returns=P).remote(g.block_refs[q], p[q], c)
            for q, c in units
        ]
        Ap, pap_refs = [], []
        for q in range(P):
            a, s = _cg_Ap.remote(wdeg[q], p[q], bundles[q], *[mo[q] for mo in map_out])
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
    return x, iters, rr


@ray.remote
def _cg_zeros_like(b: np.ndarray) -> np.ndarray:
    return np.zeros_like(b)


@ray.remote
def _cg_copy(b: np.ndarray) -> np.ndarray:
    return b.copy()


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
    K = len(pairs)
    sources = np.array([s for s, _ in pairs], np.int64)
    targets = np.array([t for _, t in pairs], np.int64)

    wdeg = [_wdeg.remote(b) for b in g.block_refs]
    vol = sum(ray.get([_vol_partial.remote(d) for d in wdeg]))

    _, b, _ = zip(*[
        _cg_init.remote(g.vid_refs[q], sources, targets) for q in range(P)
    ])
    x, iters, rr = _block_cg(
        g, wdeg, list(b), tol=tol, max_iterations=max_iterations
    )

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


# ----------------------------------------------------------------------
# Spanning edge centrality (effective resistance per edge)
# ----------------------------------------------------------------------

def _sign_hash(u: np.ndarray, v: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 64-bit hash per undirected edge; bit i is column i's
    ±1 sign (replaces Aux::Random so results are parallelism-invariant)."""
    from networkit_ray.sources.synth import _splitmix64

    a = np.minimum(u, v).astype(np.uint64)
    b = np.maximum(u, v).astype(np.uint64)
    return _splitmix64(a * np.uint64(0x9E3779B97F4A7C15) + b + np.uint64(seed))


@ray.remote
def _sec_rhs_map(block: dict, n_v: int, k: int, seed: int, chunk: int):
    """Per-chunk contribution to rhs_i(v) = Σ_e q_i(e)·B(e,v): +q at the
    canonical src, −q messaged to the canonical dst (edges iterated once
    via the u<v mask on the symmetrized table)."""
    eidx = chunk_edge_index(block, chunk)
    src_l = block["src_local"][eidx]
    u = block["vids"][src_l]
    v = block["dst"][eidx]
    mask = u < v
    h = _sign_hash(u, v, seed)
    inv = 1.0 / np.sqrt(k)
    bits = (h[:, None] >> np.arange(k, dtype=np.uint64)[None, :]) & np.uint64(1)
    r = np.where(bits == 1, inv, -inv) * mask[:, None]
    local = np.zeros((n_v, k), np.float64)
    np.add.at(local, src_l, r)
    msgs = aggregate_messages(block, -r, chunk)
    return tuple(msgs) + (local,)


@ray.remote
def _sec_rhs_reduce(n_local: int, *parts) -> np.ndarray:
    locals_, msgs = parts[:n_local], parts[n_local:]
    b = np.zeros_like(locals_[0])
    for loc in locals_:
        b += loc
    for idx, sums in msgs:
        if len(idx):
            np.add.at(b, idx, sums)
    return b


@ray.remote
def _sec_x_table(vids: np.ndarray, x: np.ndarray) -> "pa.Table":
    import pyarrow as pa

    cols = {"v": pa.array(vids.astype(np.int64))}
    for i in range(x.shape[1]):
        cols[f"x{i}"] = pa.array(x[:, i])
    return pa.table(cols)


def spanning_edge_centrality(
    sym_edges: ray.data.Dataset,
    canon_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    k: int = 48,
    seed: int = 42,
    tol: float = 1e-10,
    max_iterations: int = 500,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(src, dst, sec) ≈ effective resistance per canonical edge.

    centrality/SpanningEdgeCentrality.cpp:68-105 runApproximation: k
    random ±1/√k edge-incidence projections (JL sketch), one Laplacian
    solve per column — here ALL k columns solve in ONE multi-RHS block-CG
    — then sec(e) = Σ_i (x_i[u] − x_i[v])².  k ≤ 64 (the signs are the
    bits of one counter hash per edge).  Connected-graph assumption as in
    the reference's setupConnected.
    """
    import pyarrow as pa

    from networkit_ray.common.exchange import exchange_join

    if not 1 <= k <= 64:
        raise ValueError("k must be in [1, 64]")
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    units = g.map_units()
    sizes = g.part_sizes()
    wdeg = [_wdeg.remote(b) for b in g.block_refs]

    map_out = [
        _sec_rhs_map.options(num_returns=P + 1).remote(
            g.block_refs[p], sizes[p], k, seed, c
        )
        for p, c in units
    ]
    b = []
    for q in range(P):
        own = [mo[P] for (p, _), mo in zip(units, map_out) if p == q]
        b.append(_sec_rhs_reduce.remote(len(own), *own, *[mo[q] for mo in map_out]))

    x, iters, rr = _block_cg(g, wdeg, b, tol=tol, max_iterations=max_iterations)
    xt = ray.data.from_arrow_refs(
        [_sec_x_table.remote(g.vid_refs[q], x[q]) for q in range(P)]
    )

    xcols = [f"x{i}" for i in range(k)]
    e1 = exchange_join(canon_edges, xt, left_on=["src"], right_on=["v"])
    e1 = e1.map_batches(
        lambda t: t.rename_columns(
            [f"u_{c}" if c in xcols else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, xt, left_on=["dst"], right_on=["v"])

    def score(t: pa.Table) -> pa.Table:
        acc = np.zeros(t.num_rows, np.float64)
        for c in xcols:
            a = t[f"u_{c}"].to_numpy(zero_copy_only=False)
            bb = t[c].to_numpy(zero_copy_only=False)
            d = a - bb
            acc += d * d
        return pa.table(
            {
                "src": t["src"].combine_chunks().cast(pa.int64()),
                "dst": t["dst"].combine_chunks().cast(pa.int64()),
                "sec": pa.array(acc),
            }
        )

    scored = e2.map_batches(score, batch_format="pyarrow")
    return scored, {"iterations": iters, "k": k, "residual": float(rr.max())}


@ray.remote
def _ec_diag_partial(x: np.ndarray) -> np.ndarray:
    return (x * x).sum(axis=1)


@ray.remote
def _ec_table(vids: np.ndarray, diag: np.ndarray, n: int, tr: float) -> "pa.Table":
    import pyarrow as pa

    return pa.table(
        {
            "v": pa.array(vids.astype(np.int64)),
            "diag": pa.array(diag),
            "electrical_closeness": pa.array((n - 1) / (n * diag + tr)),
        }
    )


def electrical_closeness(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    k: int = 48,
    seed: int = 42,
    tol: float = 1e-10,
    max_iterations: int = 500,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, diag, electrical_closeness) — approximate diag(L⁺) closeness.

    Reference: centrality/ApproxElectricalCloseness.cpp — electrical
    closeness C(v) = (n−1) / Σ_u r_eff(u,v); with zero-row-sum L⁺ the
    farness collapses to n·L⁺[v,v] + tr(L⁺), so only diag(L⁺) is needed
    (the reference estimates it with UST sampling; here the JL identity
    L⁺ = (L⁺Bᵀ)(BL⁺) gives diag(L⁺)_v ≈ ‖x_v‖² from the SAME k-column
    sketch solve x = L⁺BᵀQᵀ as spanning_edge_centrality — one multi-RHS
    block-CG serves both operators).  Unweighted, connected graphs.
    """
    if not 1 <= k <= 64:
        raise ValueError("k must be in [1, 64]")
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    units = g.map_units()
    sizes = g.part_sizes()
    wdeg = [_wdeg.remote(b) for b in g.block_refs]

    map_out = [
        _sec_rhs_map.options(num_returns=P + 1).remote(
            g.block_refs[p], sizes[p], k, seed, c
        )
        for p, c in units
    ]
    b = []
    for q in range(P):
        own = [mo[P] for (p, _), mo in zip(units, map_out) if p == q]
        b.append(_sec_rhs_reduce.remote(len(own), *own, *[mo[q] for mo in map_out]))

    x, iters, rr = _block_cg(g, wdeg, b, tol=tol, max_iterations=max_iterations)
    diag = [_ec_diag_partial.remote(x[q]) for q in range(P)]
    tr = float(sum(ray.get([_vol_partial.remote(d) for d in diag])))
    out = ray.data.from_arrow_refs(
        [_ec_table.remote(g.vid_refs[q], diag[q], num_nodes, tr) for q in range(P)]
    )
    return out, {"iterations": iters, "k": k, "trace": tr, "residual": float(rr.max())}
