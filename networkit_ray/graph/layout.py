"""PivotMDS graph layout on the batched multi-source BFS engine.

Reference semantics: viz/PivotMDS.cpp:22-111 — distances from ``numPivots``
pivots to every node, double-centering of the (raw, NOT squared) n×k
distance matrix exactly as the reference does it (rowMean/k, colMean/n,
grandMean = Σdist/(n·k)), then the top-``dim`` eigenvectors of CᵀC with
coordinates = C·v.  Deviations, both documented:

- pivots are deterministic (evenly spaced ids) instead of
  GraphTools::randomNodes, so layouts reproduce across runs/parallelism;
- CᵀC is k×k (k = numPivots ≤ dozens), so we eigendecompose it exactly on
  the driver (np.linalg.eigh) instead of power-iteration-with-deflation —
  same dominant subspace, no iteration-count sensitivity.  Eigenvector
  sign is fixed by making the largest-|component| positive.

Distributed shape: ONE batched k-source BFS (supersteps = max pivot
eccentricity), then three vertex-sized per-partition passes (column sums
→ centering + k×k Gram partials → coordinates).  Nothing n-sized crosses
the driver; unreached (pivot, node) cells contribute 0, matching the
reference's sparse-triplet behavior.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.graph.bfs import multi_bfs_refs
from networkit_ray.graph.bsp import PGraph, build_pgraph


@ray.remote
def _pmds_colsums(dists: np.ndarray):
    D = np.where(dists < 0, 0.0, dists).astype(np.float64)
    return D.sum(axis=0), float(D.sum())


@ray.remote
def _pmds_gram(dists: np.ndarray, col_mean: np.ndarray, grand_mean: float):
    D = np.where(dists < 0, 0.0, dists).astype(np.float64)
    k = D.shape[1]
    row_mean = D.sum(axis=1) / k
    C = D - row_mean[:, None] - col_mean[None, :] + grand_mean
    return C.T @ C


@ray.remote
def _pmds_coords(
    vids: np.ndarray,
    dists: np.ndarray,
    col_mean: np.ndarray,
    grand_mean: float,
    V: np.ndarray,
) -> pa.Table:
    D = np.where(dists < 0, 0.0, dists).astype(np.float64)
    k = D.shape[1]
    row_mean = D.sum(axis=1) / k
    C = D - row_mean[:, None] - col_mean[None, :] + grand_mean
    pos = C @ V
    cols = {"v": pa.array(vids.astype(np.int64))}
    for d in range(V.shape[1]):
        cols["xyzw"[d] if d < 4 else f"c{d}"] = pa.array(pos[:, d])
    return pa.table(cols)


def pivot_mds(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_pivots: int = 8,
    dim: int = 2,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(v, x, y[, z, w]) PivotMDS coordinates over the symmetrized graph."""
    num_pivots = min(num_pivots, num_nodes)
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    pivots = np.unique(
        (np.arange(num_pivots, dtype=np.int64) * num_nodes) // num_pivots
    ).astype(np.uint64)
    dist_refs = multi_bfs_refs(g, pivots)

    partials = ray.get([_pmds_colsums.remote(d) for d in dist_refs])
    col_sum = np.sum([c for c, _ in partials], axis=0)
    total = sum(t for _, t in partials)
    col_mean = col_sum / num_nodes
    grand_mean = total / (num_nodes * len(pivots))

    M = np.sum(
        ray.get([_pmds_gram.remote(d, col_mean, grand_mean) for d in dist_refs]),
        axis=0,
    )
    evals, evecs = np.linalg.eigh(M)
    order = np.argsort(evals)[::-1][:dim]
    V = evecs[:, order]
    # deterministic sign: largest-|component| of each eigenvector positive
    for d in range(V.shape[1]):
        j = int(np.argmax(np.abs(V[:, d])))
        if V[j, d] < 0:
            V[:, d] = -V[:, d]

    refs = [
        _pmds_coords.remote(g.vid_refs[p], dist_refs[p], col_mean, grand_mean, V)
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(refs)


@ray.remote
def _stress_init(vids: np.ndarray, seed: int, num_nodes: int) -> np.ndarray:
    from networkit_ray.sources.synth import _splitmix64

    base = (np.array([seed], np.uint64) * np.uint64(0x9E3779B97F4A7C15))[0]
    v = vids.astype(np.uint64)
    x = _splitmix64(v * np.uint64(2) + base).astype(np.float64) / 2.0**64
    y = _splitmix64(v * np.uint64(2) + np.uint64(1) + base).astype(np.float64) / 2.0**64
    return np.stack([x, y], axis=1) * np.sqrt(num_nodes)


@ray.remote(num_returns=3)
def _stress_step(
    vids: np.ndarray, dists: np.ndarray, coords: np.ndarray, pivot_xy: np.ndarray,
    pivots: np.ndarray,
):
    """One stress-majorization update against the pivot anchors.

    Returns (new coords, stress partial, this partition's pivot rows)."""
    d = dists.astype(np.float64)  # (n_p, k), -1 unreachable
    ok = d > 0
    w = np.where(ok, 1.0 / np.maximum(d, 1.0) ** 2, 0.0)  # (n_p, k)
    diff = coords[:, None, :] - pivot_xy[None, :, :]  # (n_p, k, 2)
    norm = np.sqrt((diff**2).sum(axis=2))
    unit = diff / np.maximum(norm, 1e-12)[:, :, None]
    target = pivot_xy[None, :, :] + d[:, :, None] * unit  # (n_p, k, 2)
    wsum = w.sum(axis=1)
    new = np.where(
        (wsum > 0)[:, None],
        (w[:, :, None] * target).sum(axis=1) / np.maximum(wsum, 1e-12)[:, None],
        coords,
    )
    stress = float((w * (norm - np.where(ok, d, 0.0)) ** 2)[ok].sum())
    mask = np.isin(vids.astype(np.int64), pivots)
    return new, stress, (vids[mask].astype(np.int64), new[mask])


def stress_layout(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_pivots: int = 8,
    iterations: int = 30,
    seed: int = 42,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """((v, x, y) layout, info with per-iteration "stress_trace").

    Reference: viz/MaxentStress.cpp — the reference minimizes a sparse
    stress term (known-distance pairs) plus a max-entropy repulsion term;
    this is the STRESS half with pivot hop distances as the known pairs
    (the reference's own sparsification samples pivot-like anchor sets).
    Each iteration is the classic majorization update
    x_v ← Σ_p w(x_p + d·unit(x_v − x_p)) / Σ w with w = 1/d², which
    monotonically decreases the stress objective (tested).

    Distributed shape: one batched k-source BFS, then per-iteration
    vertex-partition-local numpy updates; only the k pivot coordinate
    rows (k×2 floats) cross the driver per iteration.
    """
    num_pivots = min(num_pivots, num_nodes)
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    pivots_u = np.unique(
        (np.arange(num_pivots, dtype=np.int64) * num_nodes) // num_pivots
    )
    dist_refs = multi_bfs_refs(g, pivots_u.astype(np.uint64))
    coords = [_stress_init.remote(g.vid_refs[p], seed, num_nodes) for p in range(P)]

    @ray.remote
    def _pivot_rows(vids: np.ndarray, xy: np.ndarray):
        mask = np.isin(vids.astype(np.int64), pivots_u)
        return vids[mask].astype(np.int64), xy[mask]

    rows = ray.get([_pivot_rows.remote(g.vid_refs[p], coords[p]) for p in range(P)])

    def assemble(parts):
        px = np.zeros((len(pivots_u), 2))
        pos = {int(v): i for i, v in enumerate(pivots_u)}
        for vs, xy in parts:
            for v, c in zip(vs, xy):
                px[pos[int(v)]] = c
        return px

    pivot_xy = assemble(rows)
    stresses = []
    for _ in range(iterations):
        outs = [
            _stress_step.remote(
                g.vid_refs[p], dist_refs[p], coords[p], pivot_xy, pivots_u
            )
            for p in range(P)
        ]
        coords = [o[0] for o in outs]
        stresses.append(float(np.sum(ray.get([o[1] for o in outs]))))
        pivot_xy = assemble(ray.get([o[2] for o in outs]))

    import pyarrow as pa

    @ray.remote
    def _out(vids: np.ndarray, xy: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "v": pa.array(vids.astype(np.int64)),
                "x": pa.array(xy[:, 0]),
                "y": pa.array(xy[:, 1]),
            }
        )

    ds = ray.data.from_arrow_refs([_out.remote(g.vid_refs[p], coords[p]) for p in range(P)])
    return ds, {"stress_trace": stresses}
