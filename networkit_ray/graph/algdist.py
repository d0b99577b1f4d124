"""Algebraic distance on graphs (distance/AlgebraicDistance.cpp semantics).

R independent test vectors are smoothed T times with Jacobi relaxation

    x_{t+1}[u] = ω·x_t[u] + (1-ω)·mean_{v∈Γ(u)} x_t[v]      (ω = 0.5)

and the per-edge algebraic distance is Σ_r |x_r[u] − x_r[v]| (the p=1
norm variant).  Vertices far apart in the smoothed coordinates sit in
different well-connected regions — the classic sparsification /
coarsening affinity score.

BSP mapping: same pinned-CSR superstep as Katz/eigenvector (one P×P
exchange per iteration), plus an in-degree vector computed by a single
all-ones superstep.  The seeded init is multiplicative-congruential
(x0 = ((v+1)·GOLD mod 2^64)/2^64) rather than splitmix so the DuckDB
twin can reproduce it with HUGEINT arithmetic alone — adequate spread
for a relaxation seed; documented determinism contract like walks.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.common.exchange import exchange_join
from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph, chunk_edge_index
from networkit_ray.graph.centrality import _gather_map

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_M64 = float(2**64)


@ray.remote
def _seed_init(vids: np.ndarray, system: int) -> np.ndarray:
    h = (vids.astype(np.uint64) + np.uint64(1 + system)) * _GOLD
    return h.astype(np.float64) / _M64


@ray.remote
def _ones(vids: np.ndarray) -> np.ndarray:
    return np.ones(len(vids), dtype=np.float64)


@ray.remote
def _fold_indeg(n_local_ref: np.ndarray, idx_bundle: list, *values) -> np.ndarray:
    deg = np.zeros(len(n_local_ref), dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            deg[idx] += sums
    return deg


@ray.remote
def _relax(old: np.ndarray, indeg: np.ndarray, omega: float, idx_bundle: list, *values) -> np.ndarray:
    # _gather_map ships VALUES ONLY (centrality.py); idx_bundle is the
    # partition's pinned destination-index bundle (PGraph.msg_bundle_refs)
    s = np.zeros(len(old), dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            s[idx] += sums
    live = indeg > 0
    new = old.copy()
    new[live] = omega * old[live] + (1.0 - omega) * s[live] / indeg[live]
    return new


def _smooth(g: PGraph, system: int, iterations: int, omega: float) -> list:
    P = g.num_parts
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    ones = [_ones.remote(g.vid_refs[p]) for p in range(P)]
    deg_parts = [
        _gather_map.options(num_returns=P).remote(g.block_refs[p], ones[p], c)
        for p, c in units
    ]
    indeg = [
        _fold_indeg.remote(ones[q], bundles[q], *[mo[q] for mo in deg_parts])
        for q in range(P)
    ]
    x = [_seed_init.remote(g.vid_refs[p], system) for p in range(P)]
    for _ in range(iterations):
        map_out = [
            _gather_map.options(num_returns=P).remote(g.block_refs[p], x[p], c)
            for p, c in units
        ]
        x = [
            _relax.remote(x[q], indeg[q], omega, bundles[q], *[mo[q] for mo in map_out])
            for q in range(P)
        ]
    return x


def algebraic_distances(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    systems: int = 2,
    iterations: int = 10,
    omega: float = 0.5,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(src, dst, ad) per canonical edge, ad = Σ_r |x_r[src] − x_r[dst]|."""
    g = build_pgraph(sym, num_nodes, num_parts=num_parts)
    canon = sym.map_batches(
        lambda t: t.filter(
            pa.compute.less(t["src"], t["dst"])
        ).select(["src", "dst"]),
        batch_format="pyarrow",
    )
    out = None
    for r in range(systems):
        xr = _smooth(g, r, iterations, omega)
        xs = bsp.state_to_dataset(g, xr, "x")
        j1 = exchange_join(
            canon,
            xs.map_batches(
                lambda t: pa.table({"src": t["v"], "xa": t["x"]}),
                batch_format="pyarrow",
            ),
            left_on=["src"],
        )
        j2 = exchange_join(
            j1,
            xs.map_batches(
                lambda t: pa.table({"dst": t["v"], "xb": t["x"]}),
                batch_format="pyarrow",
            ),
            left_on=["dst"],
        )
        contrib = j2.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "ad": pa.compute.abs(
                        pa.compute.subtract(t["xa"], t["xb"])
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        out = contrib if out is None else out.union(contrib)
    from ray.data.aggregate import Sum

    return out.groupby(["src", "dst"]).aggregate(Sum("ad", alias_name="ad"))
