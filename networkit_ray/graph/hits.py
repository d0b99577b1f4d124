"""HITS (hubs & authorities) on the partitioned-CSR BSP engine.

Kleinberg's link-analysis kernel — the standard companion to PageRank on a
web link graph (the reference stops at PageRank/Katz/Eigenvector,
centrality/PageRank.cpp, centrality/KatzCentrality.cpp; HITS is the
link-graph extension a web-scale corpus pipeline needs for hub/authority
page triage).

    auth_k = A^T hub_{k-1};  hub_k = A auth_k;  each L2-normalized.

Execution shape: two pinned CSR graphs — the edge table as given (messages
flow src→dst: pushing hub scores yields authority sums) and its transpose
(pushing authority scores yields hub sums).  Each half-step is one P×P
object-store exchange identical to a PageRank superstep minus the degree
coefficient; the L2 norm is a P-way scalar gather per half-step (HITS
requires per-iteration normalization for numeric stability — scores grow by
the dominant singular value otherwise, so the driver barrier is inherent,
unlike PageRank's pipelined fixed-iteration path).
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
def _hits_init(vids: np.ndarray, n: int) -> np.ndarray:
    return np.full(len(vids), 1.0 / np.sqrt(n), dtype=np.float64)


@ray.remote
def _hits_map(block: dict, scores: np.ndarray, chunk: int) -> tuple:
    sl = bsp.grouped_src(block, chunk)
    # values only; destination indices pinned once per graph (bsp)
    return tuple(message_values(block, scores[sl], chunk))


@ray.remote(num_returns=2)
def _hits_reduce(size: int, idx_bundle: list, *values):
    new = np.zeros(size, dtype=np.float64)
    for idx, sums in zip(idx_bundle, values):
        if len(idx):
            new[idx] += sums
    return new, float(new @ new)


@ray.remote
def _hits_scale(x: np.ndarray, norm: float) -> np.ndarray:
    return x / norm if norm > 0 else x


def _push_normalize(g: PGraph, scores: list, units: list) -> list:
    """One half-step: push ``scores`` along g's edges, sum per destination,
    L2-normalize globally."""
    P = g.num_parts
    sizes = g.part_sizes()
    bundles = g.msg_bundle_refs()
    map_out = [
        _hits_map.options(num_returns=P).remote(g.block_refs[p], scores[p], c)
        for p, c in units
    ]
    new, sq = [], []
    for q in range(P):
        s, n2 = _hits_reduce.remote(sizes[q], bundles[q], *[mo[q] for mo in map_out])
        new.append(s)
        sq.append(n2)
    norm = float(np.sqrt(sum(ray.get(sq))))
    return [_hits_scale.remote(s, norm) for s in new]


@ray.remote
def _hits_table(vids: np.ndarray, hub: np.ndarray, auth: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "v": pa.array(vids.astype(np.int64)),
            "hub": pa.array(hub),
            "auth": pa.array(auth),
        }
    )


def hits(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    iterations: int = 20,
    num_parts: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(v, hub, auth) over the dense vertex universe 0..num_nodes-1.

    ``edges`` is the directed link table (a page's out-links).  Fixed
    ``iterations`` so the DuckDB power-iteration twin is exact.

    ``checkpoint_dir`` saves both state halves per iteration with lineage
    (state/checkpoint.py tags ``hits/hub`` + ``hits/auth``); ``resume``
    restarts from the newest complete pair, re-sharding if ``num_parts``
    changed — the north rule's mid-algorithm resume, same as PageRank's.
    """
    from networkit_ray.state import checkpoint as ckpt

    g_f = build_pgraph(edges, num_nodes, num_parts=num_parts)
    P = g_f.num_parts
    g_b = build_pgraph(transpose(edges), num_nodes, num_parts=P)
    units_f, units_b = g_f.map_units(), g_b.map_units()

    hub = [_hits_init.remote(g_f.vid_refs[p], num_nodes) for p in range(P)]
    auth = hub
    start = 0
    if resume and checkpoint_dir:
        lh = ckpt.load_latest(checkpoint_dir, "hits/hub", g_f)
        la = ckpt.load_latest(checkpoint_dir, "hits/auth", g_f)
        if lh is not None and la is not None:
            (hub, mh), (auth, ma) = lh, la
            if mh["iteration"] != ma["iteration"]:  # torn pair: restart
                hub = [
                    _hits_init.remote(g_f.vid_refs[p], num_nodes)
                    for p in range(P)
                ]
                auth, start = hub, 0
            else:
                start = mh["iteration"]
    for k in range(start, iterations):
        auth = _push_normalize(g_f, hub, units_f)
        hub = _push_normalize(g_b, auth, units_b)
        if checkpoint_dir and (k + 1) % checkpoint_every == 0:
            ckpt.save(checkpoint_dir, "hits/hub", k + 1, g_f, hub, "hub", {})
            ckpt.save(checkpoint_dir, "hits/auth", k + 1, g_f, auth, "auth", {})

    refs = [
        _hits_table.remote(g_f.vid_refs[p], hub[p], auth[p]) for p in range(P)
    ]
    return ray.data.from_arrow_refs(refs), {
        "iterations": iterations,
        "resumed_from": start,
    }
