"""Sampled harmonic / closeness centrality approximation.

Reference family: centrality/ApproxCloseness.cpp, HarmonicCloseness — BFS
fan-outs from sampled pivots averaged into per-vertex estimates (the
sketch-aggregate pattern of SURVEY.md §2.5).  Here each pivot runs one
min-plus BFS on the pinned BSP graph (graph/bfs.py machinery), and the
per-vertex estimates combine the pivot distance columns:

    harmonic(u) ≈ (n/s) · Σ_{p in pivots, d(p,u)>0} 1/d(p,u)
        (estimator of Σ_all 1/d; exact when s = n)
    closeness(u) ≈ s·(n-1) / (n·Σ_p d(p,u))   over reached pivots
        (Eppstein–Wang-style; equals (n-1)/Σd exactly when s = n on a
        connected graph; on disconnected graphs the sum covers reached
        pivots only, matching the reference's reachable-set convention)

Pivots are the ``s`` smallest hash64-ranked vertex ids — deterministic at
any parallelism (the reference samples with its seeded PRNG; tests there
assert estimator properties, not exact values).  With s = n (all pivots, on
an undirected graph) the harmonic estimate is exact.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bfs import multi_bfs_refs
from networkit_ray.graph.bsp import PGraph, build_pgraph


def _pivots(num_nodes: int, sample: int, seed: int) -> np.ndarray:
    """Deterministic pivot sample: smallest multiplicative-hash ranks."""
    ids = np.arange(num_nodes, dtype=np.uint64)
    rank = (ids + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    return np.sort(ids[np.argsort(rank)[:sample]]).astype(np.int64)


@ray.remote
def _combine(n: int, s: int, dists: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    d = dists.T  # (s, n_p) int64, -1 unreachable
    pos = d > 0
    harm = np.where(pos, 1.0 / np.where(pos, d, 1), 0.0).sum(axis=0) * n / s
    tot = np.where(d > 0, d, 0).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        clo = np.where(tot > 0, s * (n - 1) / (n * tot), 0.0)
    return harm, clo


def approx_harmonic_closeness(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    sample: int = 16,
    seed: int = 42,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, harmonic, closeness) sampled estimates over an undirected graph."""
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    sample = min(sample, num_nodes)
    pivots = _pivots(num_nodes, sample, seed)
    # ONE batched multi-source BFS: supersteps = max ecc, not Σ ecc
    dist_refs = multi_bfs_refs(g, pivots)

    import pyarrow as pa

    @ray.remote
    def to_table(vids, harm_clo) -> pa.Table:
        harm, clo = harm_clo
        return pa.table(
            {
                "v": pa.array(vids.astype(np.int64)),
                "harmonic": pa.array(harm),
                "closeness": pa.array(clo),
            }
        )

    out_refs = []
    for p in range(g.num_parts):
        combined = _combine.remote(num_nodes, sample, dist_refs[p])
        out_refs.append(to_table.remote(g.vid_refs[p], combined))
    return ray.data.from_arrow_refs(out_refs), {"pivots": pivots.tolist()}


def exact_harmonic_closeness(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    batch_k: int = 16,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(v, harmonic, closeness) EXACT centralities via batched all-sources BFS.

    closeness(u) = (n−1)/Σ_{v reached} d(v,u) (reachable-set convention,
    0 for isolated) — TopCloseness.cpp exact semantics alongside the
    harmonic variant.

    Reference: centrality/TopHarmonicCloseness.cpp computes exact top-k
    with NBBound pruning; on this engine the same result comes from the
    batched multi-source BFS (K sources per superstep wave) run over ALL
    sources — harmonic(u) = Σ_{v≠u, d(v,u)<∞} 1/d(v,u).  Exact mode is
    for modest vertex counts (n/batch_k waves); at web scale use
    approx_harmonic_closeness (sampled pivots) instead.
    """
    import pyarrow as pa

    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts

    @ray.remote
    def _acc_init(vids):
        return np.zeros((len(vids), 2), np.float64)

    @ray.remote
    def _acc_add(acc, dists):
        d = dists.astype(np.float64)
        pos = d > 0
        out = acc.copy()
        out[:, 0] += np.where(pos, 1.0 / np.where(pos, d, 1.0), 0.0).sum(axis=1)
        out[:, 1] += np.where(pos, d, 0.0).sum(axis=1)
        return out

    acc = [_acc_init.remote(g.vid_refs[p]) for p in range(P)]
    sources = np.arange(num_nodes, dtype=np.int64)
    for i in range(0, num_nodes, batch_k):
        dist_refs = multi_bfs_refs(g, sources[i : i + batch_k])
        acc = [_acc_add.remote(acc[p], dist_refs[p]) for p in range(P)]

    @ray.remote
    def _to_table(vids, a):
        tot = a[:, 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            clo = np.where(tot > 0, (num_nodes - 1) / tot, 0.0)
        return pa.table(
            {
                "v": pa.array(vids.astype(np.int64)),
                "harmonic": pa.array(a[:, 0]),
                "closeness": pa.array(clo),
            }
        )

    return ray.data.from_arrow_refs(
        [_to_table.remote(g.vid_refs[p], acc[p]) for p in range(P)]
    )


def volume(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    rs: tuple[int, ...] = (1, 2, 3),
    sample: int = 8,
    seed: int = 42,
    num_parts: int | None = None,
):
    """(r, volume) — average number of nodes within hop distance r of a
    sampled node (the sampled node itself included, d = 0).

    Reference: distance/Volume.cpp (bounded-radius BFS from random
    samples).  Samples are the deterministic multiplicative-hash pivots
    shared with approx closeness, so a DuckDB twin reproduces them
    exactly; the per-pivot ball sizes come from one multi-source BFS and
    per-partition counting — only |rs| scalars reach the driver.
    """
    import pyarrow as pa

    pivots = _pivots(num_nodes, sample, seed)
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    dist_refs = multi_bfs_refs(g, pivots)
    rarr = np.array(rs, dtype=np.int64)

    @ray.remote
    def _count(dists: np.ndarray) -> np.ndarray:
        d = dists.astype(np.int64)  # (n_p, s), -1 unreachable
        return np.array(
            [((d >= 0) & (d <= r)).sum() for r in rarr], dtype=np.int64
        )

    counts = np.sum(ray.get([_count.remote(ref) for ref in dist_refs]), axis=0)
    return pa.table(
        {
            "r": pa.array(rarr),
            "volume": pa.array(counts.astype(np.float64) / len(pivots)),
        }
    )
