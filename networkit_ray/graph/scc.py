"""Directed components: weakly (WCC) and strongly (SCC) connected.

Reference: components/StronglyConnectedComponents.cpp:32-46 (sequential
Tarjan) and components/WeaklyConnectedComponents.cpp.  Tarjan's stack is
inherently sequential; the distributed re-expression is the FW-BW coloring
algorithm (Orzan; also Hong et al.), which is exact:

    remaining = all vertices
    repeat until remaining is empty:
      1. COLOR: propagate color(v) = max id u with u →* v (within the
         remaining subgraph) to fixpoint — a max-label superstep loop on
         the forward graph, same shape as hash-min CC;
      2. MARK: roots are vertices with color(c) = c; propagate "marked
         with color c" BACKWARD (transpose graph), accepted only by
         remaining vertices with the SAME color — marked vertices both
         reach and are reached by their root, i.e. SCC(root);
      3. assign scc = color for marked vertices; remove them.

    Each round removes ≥1 SCC per color class; acyclic id-ordered chains
    (e.g. ascending paths) finish in ONE round because every vertex is its
    own color root.  Finally labels are canonicalized to the MIN member id
    per SCC (groupby + join, state-sized) so the result is oracle-exact
    against a reachability-closure SQL twin.

Both direction graphs are built once and pinned (forward + transpose);
every per-round step is vectorized over the partitioned CSR blocks.

WCC = hash-min CC on the internally-symmetrized edge table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph, chunk_edge_index


def weakly_connected_components(
    edges: ray.data.Dataset, num_nodes: int, **kwargs
) -> tuple[ray.data.Dataset, dict]:
    """Directed edge table → (v, label), label = component min id.

    Symmetrizes internally (WeaklyConnectedComponents.cpp ignores
    direction) and runs the hash-min + pointer-jumping CC kernel.
    """
    from networkit_ray.graph.build import symmetrize
    from networkit_ray.graph.components import connected_components

    return connected_components(symmetrize(edges), num_nodes, **kwargs)


# ---- SCC state: per-partition dict of aligned arrays ----------------------
#   color: int64  (current max-reaching id; -1 outside remaining)
#   remaining: bool
#   scc: int64    (-1 = unassigned)


@ray.remote
def _scc_init(vids: np.ndarray) -> dict:
    n = len(vids)
    return {
        "color": vids.astype(np.int64),
        "remaining": np.ones(n, dtype=bool),
        "scc": np.full(n, -1, dtype=np.int64),
    }


@ray.remote
def _color_map(block: dict, st: dict, chunk: int) -> tuple:
    """Per-edge forward message: sender's color (or -1 if not remaining)."""
    order = chunk_edge_index(block, chunk)
    src_local = block["src_local"][order]
    vals = np.where(st["remaining"][src_local], st["color"][src_local], -1)
    return tuple(bsp._reduceat_messages(block, vals, chunk, np.maximum))


@ray.remote(num_returns=2)
def _color_reduce(st: dict, *partials):
    color = st["color"]
    new = color.copy()
    for idx, mx in partials:
        if len(idx):
            np.maximum.at(new, idx, mx.astype(np.int64))
    new = np.where(st["remaining"], new, color)
    changed = int((new > color).sum())
    return {**st, "color": new}, changed


@ray.remote
def _mark_init(vids: np.ndarray, st: dict) -> np.ndarray:
    return st["remaining"] & (st["color"] == vids.astype(np.int64))


@ray.remote
def _mark_map(block: dict, st: dict, marked: np.ndarray, chunk: int) -> tuple:
    """Backward-graph message: (dst_local, color) pairs from marked senders,
    deduped per (target, color) — the combiner for hub in-degree skew."""
    P = len(block["part_bounds"]) - 1
    order = chunk_edge_index(block, chunk)
    src_local = block["src_local"][order]
    sel = marked[src_local]
    if not sel.any():
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple([empty] * P)
    dp = block["dst_part"][order][sel]
    dl = block["dst_local"][order][sel]
    col = st["color"][src_local[sel]]
    # dedup (dst_part, dst_local, color)
    o = np.lexsort((col, dl, dp))
    dp, dl, col = dp[o], dl[o], col[o]
    keep = np.empty(len(dp), dtype=bool)
    keep[0] = True
    keep[1:] = (dp[1:] != dp[:-1]) | (dl[1:] != dl[:-1]) | (col[1:] != col[:-1])
    dp, dl, col = dp[keep], dl[keep], col[keep]
    cut = np.searchsorted(dp, np.arange(P + 1))
    return tuple(
        (dl[cut[q] : cut[q + 1]], col[cut[q] : cut[q + 1]]) for q in range(P)
    )


@ray.remote(num_returns=2)
def _mark_reduce(st: dict, marked: np.ndarray, *partials):
    new = marked.copy()
    color = st["color"]
    for dl, col in partials:
        if len(dl):
            hit = col == color[dl]
            new[dl[hit]] = True
    new &= st["remaining"]
    grew = new & ~marked
    return new, int(grew.sum())


@ray.remote(num_returns=2)
def _scc_assign(st: dict, marked: np.ndarray):
    scc = st["scc"].copy()
    scc[marked] = st["color"][marked]
    remaining = st["remaining"] & ~marked
    return (
        {**st, "scc": scc, "remaining": remaining},
        int(remaining.sum()),
    )


@ray.remote
def _scc_reset_color(vids: np.ndarray, st: dict) -> dict:
    color = np.where(st["remaining"], vids.astype(np.int64), st["color"])
    return {**st, "color": color}


def strongly_connected_components_refs(
    g_fwd: PGraph, g_bwd: PGraph, *, max_rounds: int = 10**6
) -> tuple[list, dict]:
    P = g_fwd.num_parts
    st = [_scc_init.remote(g_fwd.vid_refs[p]) for p in range(P)]
    units_f = g_fwd.map_units()
    units_b = g_bwd.map_units()
    rounds = supersteps = 0
    while rounds < max_rounds:
        rounds += 1
        # 1. forward max-color propagation to fixpoint
        while True:
            supersteps += 1
            mo = [
                _color_map.options(num_returns=P).remote(
                    g_fwd.block_refs[p], st[p], c
                )
                for p, c in units_f
            ]
            new_st, ch = [], []
            for q in range(P):
                s, c2 = _color_reduce.remote(st[q], *[m[q] for m in mo])
                new_st.append(s)
                ch.append(c2)
            changed = sum(ray.get(ch))
            st = new_st
            if changed == 0:
                break
        # 2. backward marking restricted to same color
        marked = [_mark_init.remote(g_fwd.vid_refs[p], st[p]) for p in range(P)]
        while True:
            supersteps += 1
            mo = [
                _mark_map.options(num_returns=P).remote(
                    g_bwd.block_refs[p], st[p], marked[p], c
                )
                for p, c in units_b
            ]
            new_marked, ch = [], []
            for q in range(P):
                m2, c2 = _mark_reduce.remote(st[q], marked[q], *[m[q] for m in mo])
                new_marked.append(m2)
                ch.append(c2)
            grew = sum(ray.get(ch))
            marked = new_marked
            if grew == 0:
                break
        # 3. assign + shrink
        out = [_scc_assign.remote(st[p], marked[p]) for p in range(P)]
        st = [o[0] for o in out]
        n_remaining = sum(ray.get([o[1] for o in out]))
        if n_remaining == 0:
            break
        st = [_scc_reset_color.remote(g_fwd.vid_refs[p], st[p]) for p in range(P)]

    labels = [_scc_labels.remote(s) for s in st]
    return labels, {"rounds": rounds, "supersteps": supersteps}


@ray.remote
def _scc_labels(st: dict) -> np.ndarray:
    return st["scc"]


def strongly_connected_components(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    **kwargs,
) -> tuple[ray.data.Dataset, dict]:
    """Directed edge table → (v, label), label = SCC MIN member id.

    The FW-BW roots are deterministic but not minimal, so labels are
    canonicalized with one groupby(min) + join (state-sized).
    """
    from networkit_ray.common.exchange import exchange_join
    from ray.data.aggregate import Min

    edges = edges.materialize()
    g_fwd = build_pgraph(edges, num_nodes, num_parts=num_parts)
    from networkit_ray.graph.build import transpose

    g_bwd = build_pgraph(transpose(edges), num_nodes, num_parts=g_fwd.num_parts)
    refs, info = strongly_connected_components_refs(g_fwd, g_bwd, **kwargs)
    raw = bsp.state_to_dataset(g_fwd, refs, "root").materialize()
    mins = raw.groupby("root").aggregate(Min("v", alias_name="mlabel")).materialize()
    out = exchange_join(raw, mins, left_on=["root"])
    labels = out.map_batches(
        lambda t: pa.table({"v": t["v"], "label": t["mlabel"]}),
        batch_format="pyarrow",
    )
    return labels, info
