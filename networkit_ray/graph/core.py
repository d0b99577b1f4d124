"""k-core decomposition — distributed h-index iteration on the BSP engine.

Reference: centrality/CoreDecomposition.cpp:185-270 — sequential bucket
peeling over a shared-memory adjacency.  Bucket peeling is inherently
serial in k; the round-1 distributed peeling re-expression needed
O(max_core × cascade-depth) full-edge semi-join shuffles (hundreds on web
graphs).  This version uses the locality property of core numbers
(Montresor, De Pellegrini, Miorandi, "Distributed k-core decomposition",
IEEE TPDS 2013): initialize c(v) = deg(v) and iterate

    c(v) ← H({ min(c(u), c(v)) : u ∈ N(v) })

where H is the h-index (the largest k such that at least k neighbors have
value ≥ k).  The sequence is monotonically non-increasing and its fixpoint
is exactly the core number; convergence takes O(tens) of rounds on
real-world graphs instead of O(max_core) peels, and the edge set is never
rewritten.

Execution shape per round (all on the pinned range-partitioned PGraph):

1. each partition PULLS its neighbors' current values by unique dst id —
   the pull routing (unique dst ids split by owner range) is STATIC and
   precomputed once, so a round is two small task waves plus a vectorized
   local update;
2. the h-index per vertex is computed with one lexsort + one
   ``np.add.reduceat`` over the CSR segments (h = count of positions j in
   the descending-sorted neighbor values with value ≥ j+1 — the predicate
   is prefix-monotone within a segment, so the count IS the h-index).

The result is schedule- and partition-count-independent (exact fixpoint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph


@ray.remote
def _core_prep(block: dict, num_nodes: int, num_parts: int) -> dict:
    """Static pull structure: owner-grouped unique dst ids + per-edge index.

    ``uniq`` is grouped by owning partition (``cut`` bounds the groups), so
    the per-round responses, concatenated in partition order, align with
    ``uniq`` directly; ``inv`` maps each CSR edge to its dst's slot.
    ``loc`` pre-resolves each unique dst's local index at its owner so the
    per-round responder does a plain gather (no per-round permutation).
    """
    uniq0, inv0 = np.unique(block["dst"], return_inverse=True)
    parts = bsp.vowner(uniq0, num_nodes, num_parts)
    order = np.argsort(parts, kind="stable")
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    cut = np.searchsorted(parts[order], np.arange(num_parts + 1))
    uniq = uniq0[order]
    loc = bsp.vlocal(uniq, num_nodes, num_parts)
    return {
        "uniq": uniq,
        "loc": loc,
        "inv": pos[inv0.astype(np.int64)],
        "cut": cut,
    }


@ray.remote
def _core_init(block: dict) -> np.ndarray:
    return block["out_deg"].astype(np.int64)


@ray.remote
def _core_request(prep: dict, num_parts: int) -> tuple:
    """Per-owner slices of the unique dst LOCAL indices (static across rounds)."""
    loc, cut = prep["loc"], prep["cut"]
    return tuple(loc[cut[q] : cut[q + 1]] for q in range(num_parts))


@ray.remote
def _core_respond(c: np.ndarray, *reqs) -> tuple:
    return tuple(c[r] for r in reqs)


@ray.remote(num_returns=2)
def _core_update(block: dict, prep: dict, c: np.ndarray, *resp_slices):
    """One h-index sweep over this partition's CSR segments."""
    vals_uniq = (
        np.concatenate(resp_slices) if resp_slices else np.empty(0, np.int64)
    )
    # per-edge neighbor value, clipped at the owner's current value
    w = vals_uniq[prep["inv"]] if len(vals_uniq) else np.empty(0, np.int64)
    src_local = block["src_local"]
    np.minimum(w, c[src_local], out=w)
    order = np.lexsort((-w, src_local))  # per-segment descending values
    ws = w[order]
    indptr, deg = block["indptr"], block["out_deg"]
    pos = np.arange(len(ws), dtype=np.int64) - np.repeat(indptr[:-1], deg)
    sat = (ws >= pos + 1).astype(np.int64)
    h = np.zeros(len(deg), np.int64)
    nz = deg > 0
    if nz.any():
        h[nz] = np.add.reduceat(sat, indptr[:-1][nz])
    new_c = np.minimum(c, h)
    return new_c, int((new_c < c).sum())


def core_decomposition_refs(
    g: PGraph,
    *,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 8,
    resume: bool = False,
) -> tuple[list, dict]:
    """h-index iteration to fixpoint; returns (per-partition core refs, info).

    Restart-safe: the h-index operator is monotone non-increasing from any
    intermediate state, so resuming from a checkpointed ``c`` converges to
    the identical fixpoint.
    """
    from networkit_ray.state import checkpoint as ckpt

    P = g.num_parts
    preps = [_core_prep.remote(b, g.num_nodes, P) for b in g.block_refs]
    c = None
    rounds = 0
    if resume and checkpoint_dir:
        loaded = ckpt.load_latest(checkpoint_dir, "kcore", g)
        if loaded is not None:
            c, meta = loaded
            rounds = meta["iteration"]
    if c is None:
        c = [_core_init.remote(b) for b in g.block_refs]
    req = [
        _core_request.options(num_returns=P).remote(preps[p], P) for p in range(P)
    ]
    while True:
        resp = [
            _core_respond.options(num_returns=P).remote(
                c[q], *[req[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        new_c, changed_refs = [], []
        for p in range(P):
            nc, ch = _core_update.remote(
                g.block_refs[p], preps[p], c[p], *[resp[q][p] for q in range(P)]
            )
            new_c.append(nc)
            changed_refs.append(ch)
        changed = sum(ray.get(changed_refs))
        c = new_c
        rounds += 1
        if checkpoint_dir and rounds % checkpoint_every == 0:
            ckpt.save(
                checkpoint_dir, "kcore", rounds, g, c, "core", {"changed": changed}
            )
        if changed == 0:
            break
    return c, {"rounds": rounds}


def core_decomposition(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 8,
    resume: bool = False,
    **_compat,
) -> tuple[ray.data.Dataset, dict]:
    """Symmetrized edge table → (v, core) for all vertices 0..num_nodes-1.

    Isolated vertices get core 0.  Exact (fixpoint of the h-index
    operator = core number), independent of partitioning.
    """
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    refs, info = core_decomposition_refs(
        g,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = bsp.state_to_dataset(g, refs, "core")
    info["max_core"] = int(out.max("core")) if num_nodes else 0
    return out, info
