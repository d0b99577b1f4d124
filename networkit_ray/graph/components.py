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
ParallelPartitionCoarsening) addresses high-diameter graphs; the distributed
equivalent here is POINTER JUMPING (label[u] ← label[label[u]] to fixpoint
after every edge round once ``shortcut_after`` rounds pass) — O(log²)
rounds on road-network-like diameters instead of O(diameter), with the
identical component-min fixed point.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph
from networkit_ray.state import checkpoint as ckpt

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # = "none" (Globals.hpp:31), no message


@ray.remote
def _cc_init(vids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return vids.copy(), np.ones(len(vids), dtype=bool)


@ray.remote
def _cc_map(block: dict, state: tuple, chunk: int, narrow: bool) -> tuple:
    # messages are VALUES ONLY — destination indices are superstep-invariant
    # and pinned once via PGraph.msg_bundle_refs(), halving exchange bytes.
    # ``narrow``: labels are component min-ids < num_nodes, so when
    # num_nodes < 2^32-1 the aggregated mins ship as uint32 (4 B not 8 B
    # per message — the f32-PageRank trick applied to the integer kernel);
    # the uint32 sentinel 0xFFFFFFFF still exceeds every valid label, so
    # min semantics are unchanged.  Cast AFTER the reduceat: O(messages),
    # not O(edges).
    from networkit_ray.graph import bsp as _bsp
    from networkit_ray.graph.bsp import grouped_src

    labels, active = state
    src_local = grouped_src(block, chunk)
    per_edge = labels[src_local]
    if not active.all():
        per_edge = np.where(active[src_local], per_edge, _SENTINEL)
    vals = _bsp.message_values(block, per_edge, chunk, op=np.minimum)
    if narrow:
        return tuple(v.astype(np.uint32) for v in vals)
    return tuple(vals)


@ray.remote(num_returns=2)
def _cc_reduce(state: tuple, idx_bundle: list, *values):
    labels, _ = state
    new = labels.copy()
    for idx, mins in zip(idx_bundle, values):
        if len(idx):
            if mins.dtype != new.dtype:  # narrow (uint32) wire format
                mins = mins.astype(new.dtype)
            np.minimum.at(new, idx, mins)  # idx unique per partial; .at for overlap across partials is handled by successive calls
    changed = new < labels
    return (new, changed), int(changed.sum())


# ---- pointer-jumping shortcut phase (label[u] ← label[label[u]]) ----------
# High-diameter graphs (road networks, chains) make plain hash-min take
# O(diameter) supersteps; interleaving pointer jumping halves label-chain
# lengths every round → O(log² n) total.  A shortcut round is a pull over
# the label forest: partition p asks owner(x) for label[x] for every
# distinct x = label[u] it holds (two small task waves, state-sized not
# edge-sized).  This replaces the reference's coarsening recursion
# (ParallelConnectedComponents.cpp:82-94) with the standard shortcutting
# technique; converged labels are identical (component min ids).


@ray.remote
def _sc_request(state: tuple, num_nodes: int, num_parts: int) -> tuple:
    labels, _ = state
    want = np.unique(labels)
    parts = bsp.vowner(want, num_nodes, num_parts)
    order = np.argsort(parts, kind="stable")
    cut = np.searchsorted(parts[order], np.arange(num_parts + 1))
    w = want[order]
    return tuple(w[cut[q] : cut[q + 1]] for q in range(num_parts))


@ray.remote
def _sc_respond(num_nodes: int, num_parts: int, state: tuple, *requests) -> tuple:
    labels, _ = state
    return tuple(
        labels[bsp.vlocal(req, num_nodes, num_parts)] for req in requests
    )


@ray.remote(num_returns=2)
def _sc_apply(state: tuple, nq: int, *arrs):
    """arrs[:nq] = the request slices this partition sent, arrs[nq:] = the
    matching responses (varargs so Ray dereferences every slice)."""
    labels, active = state
    keys = np.concatenate(arrs[:nq])
    vals = np.concatenate(arrs[nq:])
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    new = np.minimum(labels, vals[np.searchsorted(keys, labels)])
    changed = new < labels
    return (new, active | changed), int(changed.sum())


def _shortcut_round(g: PGraph, state: list) -> tuple[list, int]:
    """One pointer-jumping round over the label forest; returns (state, changed)."""
    P = g.num_parts
    reqs = [
        _sc_request.options(num_returns=P).remote(state[p], g.num_nodes, P)
        for p in range(P)
    ]
    resp = [
        _sc_respond.options(num_returns=P).remote(
            g.num_nodes, P, state[q], *[reqs[p][q] for p in range(P)]
        )
        for q in range(P)
    ]
    new_state, count_refs = [], []
    for p in range(P):
        s, c = _sc_apply.remote(
            state[p], P, *[reqs[p][q] for q in range(P)], *[resp[q][p] for q in range(P)]
        )
        new_state.append(s)
        count_refs.append(c)
    return new_state, sum(ray.get(count_refs))


def connected_components_refs(
    g: PGraph,
    *,
    max_iterations: int = 10**9,
    shortcut_after: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 4,
    resume: bool = False,
    init_state: list | None = None,
) -> tuple[list, dict]:
    """Hash-min supersteps; past ``shortcut_after`` un-converged rounds,
    each edge round is followed by pointer jumping to fixpoint (see
    _shortcut_round) so high-diameter graphs converge in O(log²) rounds."""
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
    if state is None and init_state is not None:
        state = init_state  # warm start (incremental_cc)
    if state is None:
        state = [_cc_init.remote(g.vid_refs[p]) for p in range(P)]

    iteration = start_iter
    total_jumps = 0
    units = g.map_units()
    bundles = g.msg_bundle_refs()  # pinned once; supersteps ship values only
    narrow = g.num_nodes < 0xFFFFFFFF  # uint32 label messages (see _cc_map)
    while iteration < max_iterations:
        map_out = [
            _cc_map.options(num_returns=P).remote(
                g.block_refs[p], state[p], c, narrow
            )
            for p, c in units
        ]
        new_state, count_refs = [], []
        for q in range(P):
            s, c = _cc_reduce.remote(
                state[q], bundles[q], *[mo[q] for mo in map_out]
            )
            new_state.append(s)
            count_refs.append(c)
        changed = sum(ray.get(count_refs))
        state = new_state
        iteration += 1
        jumps = 0
        if iteration >= shortcut_after:
            while True:
                state, sc_changed = _shortcut_round(g, state)
                jumps += 1
                total_jumps += 1
                if sc_changed == 0:
                    break
        if checkpoint_dir and iteration % checkpoint_every == 0:
            labels_only = [_state_labels.remote(s) for s in state]
            ckpt.save(
                checkpoint_dir, "components", iteration, g, labels_only, "label",
                {"changed": changed},
            )
        if changed == 0 and (iteration < shortcut_after or jumps == 1):
            # edge fixpoint, and (if shortcutting) the final jump confirmed
            # the label forest is flat
            break

    labels = [_state_labels.remote(s) for s in state]
    return labels, {"iterations": iteration, "jumps": total_jumps}


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


# ---- incremental (dynamic) connected components --------------------------


@ray.remote
def _icc_scatter(t, num_nodes: int, num_parts: int) -> tuple:
    """Route (v, label) rows to their owning partition (vowner layout,
    NOT the generic hash exchange — state arrays are owner-indexed)."""
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.uint64)
    parts = bsp.vowner(v, num_nodes, num_parts)
    order = np.argsort(parts, kind="stable")
    v, lab, parts = v[order], lab[order], parts[order]
    cut = np.searchsorted(parts, np.arange(num_parts + 1))
    return tuple((v[cut[q] : cut[q + 1]], lab[cut[q] : cut[q + 1]]) for q in range(num_parts))


@ray.remote
def _icc_seed(vids: np.ndarray, num_nodes: int, num_parts: int, *slices) -> tuple:
    lab = vids.copy().astype(np.uint64)
    for v, l in slices:
        if len(v):
            lab[bsp.vlocal(v, num_nodes, num_parts)] = l
    return lab, np.ones(len(vids), dtype=bool)


def incremental_cc(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    prev_labels: ray.data.Dataset,
    *,
    num_parts: int | None = None,
    **kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """CC after edge INSERTIONS, warm-started from the previous labels.

    Reference: components/DynConnectedComponents.cpp (edge-insertion
    component merge).  Under insertions the min-label fixpoint only
    decreases, and every previous label names a vertex inside the same
    (new) component — so seeding hash-min with the old labels is exact,
    and supersteps track the MERGE chain depth instead of the graph
    diameter (the streaming-update path: re-run over base ∪ delta with
    the old labels, don't recompute from scratch).  Result is identical
    to connected_components on the full edge set.
    """
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    scat = [
        _icc_scatter.options(num_returns=P).remote(r, num_nodes, P)
        for r in prev_labels.to_arrow_refs()
    ]
    init = [
        _icc_seed.remote(g.vid_refs[q], num_nodes, P, *[s[q] for s in scat])
        for q in range(P)
    ]
    refs, info = connected_components_refs(g, init_state=init, **kwargs)
    return bsp.state_to_dataset(g, refs, "label"), info
