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
