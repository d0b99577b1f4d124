"""SALSA (Stochastic Approach for Link-Structure Analysis) on the BSP engine.

Lempel & Moran's degree-normalized variant of HITS — the random-walk
link-analysis companion the reference's centrality family (PageRank/Katz/
Eigenvector, centrality/PageRank.cpp) stops short of; on a web link graph
SALSA's authority side is the stationary distribution of the alternating
backward/forward random walk, far less spammable by tightly-knit
communities than raw HITS.

    auth_k(v) = sum_{(u,v) in E} hub_{k-1}(u) / outdeg(u)
    hub_k(u)  = sum_{(u,v) in E} auth_k(v)   / indeg(v)

each L1-normalized — the walk conserves probability mass, so the sums stay
meaningful and the fixed-iteration DuckDB twin is exact.

Execution shape: identical to HITS (graph/hits.py) — two pinned CSR graphs
(forward + transpose), one P×P object-store exchange per half-step — except
messages carry the superstep-invariant 1/outdeg coefficient of the pushing
side, which is exactly PageRank's unweighted coefficient (pagerank.py:
_pr_coef) precomputed once per block in grouped edge order.  The L1 norm is
a P-way scalar gather per half-step (inherent driver barrier, as with
HITS's L2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph, message_values
from networkit_ray.graph.build import transpose


@ray.remote
def _salsa_coef(block: dict) -> np.ndarray:
    """Per-edge 1/outdeg(src) in grouped order (superstep-invariant)."""
    out_deg = block["out_deg"].astype(np.float64)
    coef = 1.0 / out_deg[block["src_local"]]
    return coef[block["edge_order"]]


@ray.remote
def _salsa_init(vids: np.ndarray, n: int) -> np.ndarray:
    return np.full(len(vids), 1.0 / n, dtype=np.float64)


@ray.remote
def _salsa_map(block: dict, coef: np.ndarray, scores: np.ndarray, chunk: int) -> tuple:
    sl = bsp.grouped_src(block, chunk)
    if chunk < 0:
        coef_s = coef
    else:
        c = block["chunks"][chunk]
        coef_s = coef[c["start"] : c["end"]]
    # values only; destination indices pinned once per graph (bsp)
    return tuple(message_values(block, scores[sl] * coef_s, chunk))


@ray.remote(num_returns=2)
def _salsa_reduce(size: int, idx_bundle: list, *values):
    new = np.zeros(size, dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            new[idx] += sums
    return new, float(new.sum())


@ray.remote
def _salsa_scale(x: np.ndarray, total: float) -> np.ndarray:
    return x / total if total > 0 else x


def _push_l1(g: PGraph, coef: list, scores: list, units: list) -> list:
    """One half-step: push scores * 1/outdeg along g's edges, sum per
    destination, L1-normalize globally."""
    P = g.num_parts
    sizes = g.part_sizes()
    bundles = g.msg_bundle_refs()
    map_out = [
        _salsa_map.options(num_returns=P).remote(
            g.block_refs[p], coef[p], scores[p], c
        )
        for p, c in units
    ]
    new, tot = [], []
    for q in range(P):
        s, t = _salsa_reduce.remote(sizes[q], bundles[q], *[mo[q] for mo in map_out])
        new.append(s)
        tot.append(t)
    total = float(sum(ray.get(tot)))
    return [_salsa_scale.remote(s, total) for s in new]


@ray.remote
def _salsa_table(vids: np.ndarray, hub: np.ndarray, auth: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "v": pa.array(vids.astype(np.int64)),
            "hub": pa.array(hub),
            "auth": pa.array(auth),
        }
    )


def salsa(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    iterations: int = 20,
    num_parts: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(v, hub, auth) SALSA scores over the dense universe 0..num_nodes-1.

    ``edges`` is the directed deduplicated link table.  Fixed ``iterations``
    so the DuckDB alternating-walk twin is exact; hub_0 = 1/n everywhere.
    ``checkpoint_dir``/``resume``: per-iteration lineage checkpoints of both
    state halves, re-shardable across ``num_parts`` (state/checkpoint.py).
    """
    from networkit_ray.state import checkpoint as ckpt

    g_f = build_pgraph(edges, num_nodes, num_parts=num_parts)
    P = g_f.num_parts
    g_b = build_pgraph(transpose(edges), num_nodes, num_parts=P)
    units_f, units_b = g_f.map_units(), g_b.map_units()
    coef_f = [_salsa_coef.remote(g_f.block_refs[p]) for p in range(P)]
    coef_b = [_salsa_coef.remote(g_b.block_refs[p]) for p in range(P)]

    hub = [_salsa_init.remote(g_f.vid_refs[p], num_nodes) for p in range(P)]
    auth = hub
    start = 0
    if resume and checkpoint_dir:
        lh = ckpt.load_latest(checkpoint_dir, "salsa/hub", g_f)
        la = ckpt.load_latest(checkpoint_dir, "salsa/auth", g_f)
        if lh is not None and la is not None and lh[1]["iteration"] == la[1]["iteration"]:
            hub, auth = lh[0], la[0]
            start = lh[1]["iteration"]
    for k in range(start, iterations):
        auth = _push_l1(g_f, coef_f, hub, units_f)
        hub = _push_l1(g_b, coef_b, auth, units_b)
        if checkpoint_dir and (k + 1) % checkpoint_every == 0:
            ckpt.save(checkpoint_dir, "salsa/hub", k + 1, g_f, hub, "hub", {})
            ckpt.save(checkpoint_dir, "salsa/auth", k + 1, g_f, auth, "auth", {})

    refs = [
        _salsa_table.remote(g_f.vid_refs[p], hub[p], auth[p]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(refs), {
        "iterations": iterations,
        "resumed_from": start,
    }
