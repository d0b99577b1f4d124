"""Connected components via synchronous hash-min label exchange.

Mirrors the reference's ParallelConnectedComponents
(networkit/cpp/components/ParallelConnectedComponents.cpp:21-98):

- undirected only — pass the symmetrized edge table (both directions);
- init label[u] = u (Partition::allToSingletons, :30-31);
- iterate: label[u] ← min(label[u], min over neighbors) (:59-63), with an
  active frontier — a vertex broadcasts only in the superstep after its
  label changed (:65-77 re-activation), all vertices active at start;
- converge when no label changes.  Converged labels are the minimum node id
  of each component (schedule-independent, exact-match oracle).

The asynchronous in-place updates of the reference are replaced by a
deterministic synchronous (Jacobi) schedule; the fixed point is identical
(min id per component).  Inactive sources send a MAX-uint64 sentinel so the
superstep-invariant grouped min-aggregation stays O(E) with no re-sort.

The reference's 8-iteration coarsening fallback (:50,82 →
ParallelPartitionCoarsening) is a constant-factor optimization for
high-diameter graphs; here each superstep is one P×P exchange and the label
table stays partitioned, so we run plain hash-min to convergence (a
contraction fallback can be layered on the same engine later).
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph, chunk_edge_index, min_messages
from networkit_ray.state import checkpoint as ckpt

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # = "none" (Globals.hpp:31), no message


@ray.remote
def _cc_init(vids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return vids.copy(), np.ones(len(vids), dtype=bool)


@ray.remote
def _cc_map(block: dict, state: tuple, chunk: int) -> tuple:
    labels, active = state
    src_local = block["src_local"][chunk_edge_index(block, chunk)]
    per_edge = labels[src_local]
    if not active.all():
        per_edge = np.where(active[src_local], per_edge, _SENTINEL)
    return tuple(min_messages(block, per_edge, chunk))


@ray.remote(num_returns=2)
def _cc_reduce(state: tuple, *partials):
    labels, _ = state
    new = labels.copy()
    for idx, mins in partials:
        if len(idx):
            np.minimum.at(new, idx, mins)  # idx unique per partial; .at for overlap across partials is handled by successive calls
    changed = new < labels
    return (new, changed), int(changed.sum())


def connected_components_refs(
    g: PGraph,
    *,
    max_iterations: int = 10**9,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 4,
    resume: bool = False,
) -> tuple[list, dict]:
    P = g.num_parts
    state = None
    start_iter = 0
    if resume and checkpoint_dir:
        loaded = ckpt.load_latest(checkpoint_dir, "components", g)
        if loaded is not None:
            label_refs, meta = loaded
            start_iter = meta["iteration"]

            @ray.remote
            def _mk_state(labels):
                return labels.astype(np.uint64), np.ones(len(labels), dtype=bool)

            state = [_mk_state.remote(r) for r in label_refs]
    if state is None:
        state = [_cc_init.remote(g.vid_refs[p]) for p in range(P)]

    iteration = start_iter
    units = g.map_units()
    while iteration < max_iterations:
        map_out = [
            _cc_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, count_refs = [], []
        for q in range(P):
            s, c = _cc_reduce.remote(state[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            count_refs.append(c)
        changed = sum(ray.get(count_refs))
        state = new_state
        iteration += 1
        if checkpoint_dir and iteration % checkpoint_every == 0:
            labels_only = [_state_labels.remote(s) for s in state]
            ckpt.save(
                checkpoint_dir, "components", iteration, g, labels_only, "label",
                {"changed": changed},
            )
        if changed == 0:
            break

    labels = [_state_labels.remote(s) for s in state]
    return labels, {"iterations": iteration}


@ray.remote
def _state_labels(state: tuple) -> np.ndarray:
    return state[0].astype(np.int64)


def connected_components(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    **kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """Symmetrized edge table → (v, label) with label = component min id."""
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    refs, info = connected_components_refs(g, **kwargs)
    return bsp.state_to_dataset(g, refs, "label"), info
