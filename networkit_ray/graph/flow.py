"""Edmonds-Karp max-flow / min-cut as residual-BFS supersteps.

Reference semantics: flow/EdmondsKarp.cpp (run = repeat { shortest
augmenting path by BFS; push bottleneck } until no s→t path;
getMaxFlow / getSourceSet).  Re-expressed on the BSP engine:

- the graph is the *symmetrized weighted* edge table, capacity w in both
  directions (the reference treats undirected edges the same way);
- per-partition RESIDUAL arrays live beside the immutable CSR blocks,
  aligned with each block's edge arrays; an augmentation rewrites only the
  touched partitions' arrays (copy-on-write refs, O(m/P) per touched
  partition);
- each BFS is a level-synchronous frontier expansion over edges with
  residual > 0, carrying min-parent pointers (deterministic: the smallest
  frontier neighbor wins), so the augmenting path is a *shortest* path as
  Edmonds-Karp requires;
- path backtrack / bottleneck / capacity updates are O(path length)
  driver-side RPCs on tiny payloads; the only O(n) driver state in this
  module is ``cut_clustering``'s vertex-sized assignment array (numpy,
  never Python objects), which is gated by an explicit ``driver_limit``
  guard — edge-sized data never leaves the object store.

Scale note: max-flow is inherently sequential in the number of augmenting
paths (≤ O(V·E) supersteps worst case); this operator is for *graph-sized*
cuts (the reference's own use), not a per-record transform.  The BFS
inside each augmentation is fully distributed.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import (
    PGraph,
    build_pgraph,
    chunk_edge_index,
    message_values,
    vlocal,
    vowner,
)

_SENT = np.uint64(0xFFFFFFFFFFFFFF)


@ray.remote
def _resid_init(block: dict) -> np.ndarray:
    w = block["w"]
    if w is None:
        return np.ones(len(block["dst"]), np.float64)
    return w.astype(np.float64).copy()


@ray.remote
def _fbfs_init(vids: np.ndarray, source: int):
    visited = np.zeros(len(vids), bool)
    parent = np.full(len(vids), -1, np.int64)
    frontier = np.zeros(len(vids), bool)
    hit = np.flatnonzero(vids == np.uint64(source))
    if len(hit):
        visited[hit[0]] = True
        frontier[hit[0]] = True
    return visited, parent, frontier


@ray.remote
def _fbfs_map(block: dict, resid: np.ndarray, state: tuple, chunk: int) -> tuple:
    visited, _, frontier = state
    eidx = chunk_edge_index(block, chunk)
    src_l = block["src_local"][eidx]
    ok = frontier[src_l] & (resid[eidx] > 0)
    per_edge = np.where(ok, block["vids"][src_l], _SENT)
    # values only; destination indices pinned once per graph (bsp)
    return tuple(message_values(block, per_edge, chunk, op=np.minimum))


@ray.remote(num_returns=2)
def _fbfs_reduce(state: tuple, target_local: int, idx_bundle: list, *values):
    visited, parent, _ = state
    msg = np.full(len(visited), _SENT, np.uint64)
    for idx, mins in zip(idx_bundle, values):
        if len(idx):
            np.minimum.at(msg, idx, mins.astype(np.uint64))
    newly = (~visited) & (msg < _SENT)
    visited = visited | newly
    parent = parent.copy()
    parent[newly] = msg[newly].astype(np.int64)
    t_hit = bool(target_local >= 0 and newly[target_local])
    return (visited, parent, newly), (int(newly.sum()), t_hit)


@ray.remote
def _parent_of(state: tuple, local_idx: int) -> int:
    return int(state[1][local_idx])


@ray.remote
def _edge_lookup(block: dict, resid: np.ndarray, u_local: int, v: int):
    """(edge index, residual) of edge u→v inside u's partition."""
    s, e = block["indptr"][u_local], block["indptr"][u_local + 1]
    j = np.flatnonzero(block["dst"][s:e] == np.uint64(v))
    if not len(j):
        return -1, 0.0
    i = int(s + j[0])
    return i, float(resid[i])


@ray.remote
def _apply_updates(resid: np.ndarray, updates: list) -> np.ndarray:
    out = resid.copy()
    for i, delta in updates:
        out[i] += delta
    return out


@ray.remote
def _source_side(vids: np.ndarray, state: tuple) -> np.ndarray:
    return state[0].astype(np.int64)


def max_flow(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    source: int,
    target: int,
    *,
    weighted: bool = True,
    num_parts: int | None = None,
    max_augmentations: int = 10**9,
) -> tuple[float, ray.data.Dataset, dict]:
    """Edmonds-Karp max flow source→target on the symmetrized graph.

    Returns (flow value, (v, in_source_set) dataset over ALL vertices,
    info dict with augmentation/superstep counts).  The source set is the
    s-side of a minimum cut (vertices reachable in the final residual
    graph), matching EdmondsKarp::getSourceSet.
    """
    if source == target:
        raise ValueError("source == target")
    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts, weighted=weighted)
    P = g.num_parts
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    resid = [_resid_init.remote(b) for b in g.block_refs]

    def owner(v: int) -> int:
        return int(vowner(np.array([v], np.uint64), num_nodes, P)[0])

    def local(v: int) -> int:
        return int(vlocal(np.array([v], np.uint64), num_nodes, P)[0])

    t_part, t_local = owner(target), local(target)
    flow = 0.0
    augs = 0
    supersteps = 0
    state = None
    while augs < max_augmentations:
        state = [_fbfs_init.remote(g.vid_refs[p], source) for p in range(P)]
        t_hit = False
        while True:
            map_out = [
                _fbfs_map.options(num_returns=P).remote(
                    g.block_refs[p], resid[p], state[p], c
                )
                for p, c in units
            ]
            new_state, stat_refs = [], []
            for q in range(P):
                s_, st = _fbfs_reduce.remote(
                    state[q],
                    t_local if q == t_part else -1,
                    bundles[q],
                    *[mo[q] for mo in map_out],
                )
                new_state.append(s_)
                stat_refs.append(st)
            state = new_state
            supersteps += 1
            stats = ray.get(stat_refs)
            if any(h for _, h in stats):
                t_hit = True
                break
            if sum(c for c, _ in stats) == 0:
                break
        if not t_hit:
            break

        # backtrack the (shortest) augmenting path driver-side
        path = []
        v = target
        while v != source:
            u = ray.get(_parent_of.remote(state[owner(v)], local(v)))
            path.append((u, v))
            v = u
        fwd = ray.get(
            [
                _edge_lookup.remote(g.block_refs[owner(u)], resid[owner(u)], local(u), v)
                for u, v in path
            ]
        )
        bottleneck = min(r for _, r in fwd)
        rev = ray.get(
            [
                _edge_lookup.remote(g.block_refs[owner(v)], resid[owner(v)], local(v), u)
                for u, v in path
            ]
        )
        updates: dict[int, list] = {}
        for (u, v), (ei, _) in zip(path, fwd):
            updates.setdefault(owner(u), []).append((ei, -bottleneck))
        for (u, v), (ei, _) in zip(path, rev):
            if ei >= 0:  # reverse edge always exists on a symmetrized table
                updates.setdefault(owner(v), []).append((ei, bottleneck))
        for p, ups in updates.items():
            resid[p] = _apply_updates.remote(resid[p], ups)
        flow += bottleneck
        augs += 1

    # final failed BFS's visited set IS the s-side of a min cut
    side = [_source_side.remote(g.vid_refs[p], state[p]) for p in range(P)]
    ds = bsp.state_to_dataset(g, side, "in_source_set")
    return flow, ds, {"augmentations": augs, "supersteps": supersteps}


def cut_clustering(
    sym_w: ray.data.Dataset,
    num_nodes: int,
    alpha: float,
    *,
    num_parts: int | None = None,
    driver_limit: int = 1 << 27,
) -> ray.data.Dataset:
    """(v, label) — Flake–Tarjan cut clustering.

    Reference: community/CutClustering.cpp — augment the weighted graph
    with a sink t connected to every node by an α-edge; process nodes by
    (degree DESC, id ASC); for each still-unassigned u, the SOURCE SIDE of
    the minimum u–t cut becomes u's cluster (absorbing earlier labels).
    The minimal source side (vertices reachable in the final residual) is
    the canonical minimum cut, so the result is implementation-independent
    and deterministic.

    Scale note: the cluster-count many max-flows are the algorithm's
    inherent sequential spine (same as the reference); each flow's BFS
    supersteps are fully distributed.  The assignment array and the
    degree-order permutation are vertex-sized numpy driver state (never
    Python dicts/rows); ``driver_limit`` (default 2^27 vertices, ~3 GB
    of int64 state) converts a silent driver OOM at pathological scale
    into an immediate error naming the override lever.
    """
    import pyarrow as pa
    from ray.data.aggregate import Count

    if num_nodes > driver_limit:
        raise ValueError(
            f"cut_clustering: num_nodes={num_nodes:,} exceeds "
            f"driver_limit={driver_limit:,}. The assignment array is "
            "vertex-sized driver state; pass a higher driver_limit= to "
            "override on a big-memory driver, or pre-partition the graph."
        )

    t = num_nodes
    ids = np.arange(num_nodes, dtype=np.int64)
    sink_rows = pa.table(
        {
            "src": pa.array(np.concatenate([ids, np.full(num_nodes, t, np.int64)])),
            "dst": pa.array(np.concatenate([np.full(num_nodes, t, np.int64), ids])),
            "w": pa.array(np.full(2 * num_nodes, float(alpha))),
        }
    )
    aug = sym_w.union(ray.data.from_arrow(sink_rows)).materialize()

    deg_df = (
        sym_w.groupby("src").aggregate(Count(alias_name="deg")).to_pandas()
    )
    deg = np.zeros(num_nodes, np.int64)
    deg[deg_df["src"].to_numpy(np.int64)] = deg_df["deg"].to_numpy(np.int64)
    # (degree DESC, id ASC): stable argsort on -deg keeps id order inside
    # equal-degree runs — same order as the reference's comparator.
    order = np.argsort(-deg, kind="stable")

    labels = np.full(num_nodes, -1, dtype=np.int64)
    n_flows = 0
    for u in order:
        if labels[u] != -1:
            continue
        _, side, _ = max_flow(aug, num_nodes + 1, int(u), t, num_parts=num_parts)
        side_df = side.to_pandas()
        v_arr = side_df["v"].to_numpy(np.int64)
        in_src = side_df["in_source_set"].to_numpy(bool)
        members = v_arr[in_src & (v_arr != t)]
        labels[members] = u
        n_flows += 1
    return ray.data.from_arrow(
        pa.table({"v": pa.array(ids), "label": pa.array(labels)})
    )
