"""BFS hop distances as min-plus supersteps on the BSP engine.

Frontier expansion (networkit/cpp/distance/BFS.cpp) re-expressed exactly
like hash-min connected components (SURVEY.md §2.12: "BFS = frontier
expansion ≙ iterative semi-join + distance-min aggregate"): state is the
tentative distance (∞ sentinel = unreached), each superstep pushes
dist[src]+1 along out-edges and min-reduces per destination; only vertices
whose distance changed broadcast next round.  Terminates when no distance
improves — exactly eccentricity(source) supersteps.

Unreachable vertices keep distance -1 in the output (matching the
convention of returning no path).
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
    grouped_src,
    message_values,
)

_INF = np.uint64(0xFFFFFFFFFFFFFF)  # large sentinel; +1 never overflows uint64


@ray.remote
def _bfs_init(vids: np.ndarray, source: int) -> tuple[np.ndarray, np.ndarray]:
    # vids are permuted (unsorted), aligned with the local state index
    dist = np.full(len(vids), _INF, dtype=np.uint64)
    active = np.zeros(len(vids), dtype=bool)
    hit = np.flatnonzero(vids == np.uint64(source))
    if len(hit):
        dist[hit[0]] = 0
        active[hit[0]] = True
    return dist, active


@ray.remote
def _bfs_map(block: dict, state: tuple, chunk: int) -> tuple:
    dist, active = state
    src_local = grouped_src(block, chunk)
    # VALUES ONLY: destination indices are superstep-invariant, pinned
    # once per graph via PGraph.msg_bundle_refs() (see bsp.message_values)
    per_edge = np.where(active[src_local], dist[src_local] + np.uint64(1), _INF)
    return tuple(message_values(block, per_edge, chunk, op=np.minimum))


@ray.remote(num_returns=2)
def _bfs_reduce(state: tuple, idx_bundle: list, *values):
    # idx_bundle = this partition's pinned per-map-unit destination indices
    dist, _ = state
    new = dist.copy()
    for idx, mins in zip(idx_bundle, values):
        if len(idx):
            np.minimum.at(new, idx, mins)
    changed = new < dist
    return (new, changed), int(changed.sum())


@ray.remote
def _bfs_out(state: tuple) -> np.ndarray:
    dist = state[0]
    out = dist.astype(np.int64)
    out[dist >= _INF] = -1
    return out


@ray.remote
def _mbfs_init(vids: np.ndarray, sources: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n_p, K) distance/active state for K simultaneous sources."""
    K = len(sources)
    dist = np.full((len(vids), K), _INF, dtype=np.uint64)
    active = np.zeros((len(vids), K), dtype=bool)
    for k, s in enumerate(sources):
        hit = np.flatnonzero(vids == np.uint64(s))
        if len(hit):
            dist[hit[0], k] = 0
            active[hit[0], k] = True
    return dist, active


@ray.remote
def _mbfs_map(block: dict, state: tuple, chunk: int) -> tuple:
    dist, active = state
    src_local = grouped_src(block, chunk)
    per_edge = np.where(
        active[src_local], dist[src_local] + np.uint64(1), _INF
    )  # (E, K); values-only messages, indices pinned per graph
    return tuple(message_values(block, per_edge, chunk, op=np.minimum))


@ray.remote(num_returns=2)
def _mbfs_reduce(state: tuple, idx_bundle: list, *values):
    dist, _ = state
    new = dist.copy()
    for idx, mins in zip(idx_bundle, values):
        if len(idx):
            np.minimum.at(new, idx, mins.astype(np.uint64))
    changed = new < dist
    return (new, changed), int(changed.sum())


@ray.remote
def _mbfs_out(state: tuple) -> np.ndarray:
    dist = state[0]
    out = dist.astype(np.int64)
    out[dist >= _INF] = -1
    return out


def multi_bfs_refs(g: PGraph, sources: np.ndarray) -> list:
    """K-source BFS in ONE superstep loop: per-partition (n_p, K) distance
    arrays; total supersteps = max eccentricity over sources instead of the
    per-source sum — the batching that makes sampled closeness /
    hop-sketch estimators round-efficient.

    Memory note: each map chunk materializes an (E_chunk × K) message
    matrix; keep K ≤ ~16 for the default 2M-edge chunks (256 MB peak) or
    run several batches.
    """
    P = g.num_parts
    state = [_mbfs_init.remote(g.vid_refs[p], sources) for p in range(P)]
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    while True:
        map_out = [
            _mbfs_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, counts = [], []
        for q in range(P):
            s, c = _mbfs_reduce.remote(state[q], bundles[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            counts.append(c)
        changed = sum(ray.get(counts))
        state = new_state
        if changed == 0:
            break
    return [_mbfs_out.remote(s) for s in state]


@ray.remote
def _sssp_init(vids: np.ndarray, source: int) -> tuple[np.ndarray, np.ndarray]:
    dist = np.full(len(vids), np.inf, dtype=np.float64)
    active = np.zeros(len(vids), dtype=bool)
    hit = np.flatnonzero(vids == np.uint64(source))
    if len(hit):
        dist[hit[0]] = 0.0
        active[hit[0]] = True
    return dist, active


@ray.remote
def _sssp_map(block: dict, state: tuple, chunk: int) -> tuple:
    dist, active = state
    order = chunk_edge_index(block, chunk)
    src_local = block["src_local"][order]
    w = block["w"][order]
    per_edge = np.where(active[src_local], dist[src_local] + w, np.inf)
    return tuple(message_values(block, per_edge, chunk, op=np.minimum))


@ray.remote
def _sssp_out(state: tuple) -> np.ndarray:
    dist = state[0].copy()
    dist[~np.isfinite(dist)] = -1.0
    return dist


def sssp_distances(
    edges: ray.data.Dataset,
    num_nodes: int,
    source: int,
    *,
    num_parts: int | None = None,
    max_iterations: int = 10**9,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 4,
    resume: bool = False,
) -> tuple[ray.data.Dataset, dict]:
    """(v, dist) weighted shortest-path distances from ``source``
    (-1.0 = unreachable).  Reference: distance/Dijkstra.cpp — the serial
    heap is replaced by frontier-limited distributed Bellman-Ford
    (min-plus supersteps): each round relaxes out-edges of vertices whose
    distance improved, converging in at most (longest shortest path hops)
    rounds.  Non-negative weights assumed (as Dijkstra); the ``w`` column
    is required.

    Scale note: delta-stepping bucketing would cut rounds on
    high-diameter weighted graphs; web-scale link graphs are low-diameter
    so the frontier form is round-efficient there.
    """
    from networkit_ray.state import checkpoint as ckpt

    g = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=True)
    P = g.num_parts
    state = None
    it = 0
    if resume and checkpoint_dir:
        loaded = ckpt.load_latest(checkpoint_dir, "sssp", g)
        if loaded is not None:
            dist_refs, meta = loaded
            it = meta["iteration"]

            @ray.remote
            def _mk_state(d):
                d = d.copy()
                d[d < 0] = np.inf
                return d, np.ones(len(d), dtype=bool)  # re-activate everything

            state = [_mk_state.remote(r) for r in dist_refs]
    if state is None:
        state = [_sssp_init.remote(g.vid_refs[p], source) for p in range(P)]
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    while it < max_iterations:
        map_out = [
            _sssp_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, count_refs = [], []
        for q in range(P):
            s, c = _bfs_reduce.remote(state[q], bundles[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            count_refs.append(c)
        changed = sum(ray.get(count_refs))
        state = new_state
        it += 1
        if checkpoint_dir and it % checkpoint_every == 0:
            ckpt.save(
                checkpoint_dir, "sssp", it, g,
                [_sssp_out.remote(s) for s in state], "dist",
                {"changed": changed, "source": source},
            )
        if changed == 0:
            break
    dists = [_sssp_out.remote(s) for s in state]
    return bsp.state_to_dataset(g, dists, "dist"), {"iterations": it}


def bfs_distances(
    edges: ray.data.Dataset,
    num_nodes: int,
    source: int,
    *,
    num_parts: int | None = None,
    max_iterations: int = 10**9,
) -> tuple[ray.data.Dataset, dict]:
    """(v, dist) hop distances from ``source`` (-1 = unreachable).

    ``edges`` gives the traversal direction; pass the symmetrized table for
    undirected BFS.
    """
    g = build_pgraph(edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    state = [_bfs_init.remote(g.vid_refs[p], source) for p in range(P)]
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    it = 0
    while it < max_iterations:
        map_out = [
            _bfs_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, count_refs = [], []
        for q in range(P):
            s, c = _bfs_reduce.remote(state[q], bundles[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            count_refs.append(c)
        changed = sum(ray.get(count_refs))
        state = new_state
        it += 1
        if changed == 0:
            break
    dists = [_bfs_out.remote(s) for s in state]
    return bsp.state_to_dataset(g, dists, "dist"), {"iterations": it}


@ray.remote
def _spsp_extract(vids: np.ndarray, dists: np.ndarray, targets: np.ndarray):
    """Rows of the (n_p, K) distance matrix for local target vertices."""
    mask = np.isin(vids.astype(np.int64), targets)
    return vids[mask].astype(np.int64), dists[mask]


def spsp(
    edges: ray.data.Dataset,
    num_nodes: int,
    pairs: list[tuple[int, int]],
    *,
    num_parts: int | None = None,
) -> "pa.Table":
    """(src, dst, dist) hop distances for explicit source→target pairs.

    distance/SPSP.cpp runs one BFS per requested source and reads off the
    target rows; here all unique sources run as ONE batched multi-source
    BFS (`multi_bfs_refs`, supersteps = max source eccentricity), then only
    the |targets| matching state rows leave the workers — the driver pull
    is O(|sources|·|targets|), never O(n).  dist = -1 when unreachable.
    ``edges`` gives the traversal direction (pass symmetrized for
    undirected pairs).
    """
    import pyarrow as pa

    sources = np.array(sorted({s for s, _ in pairs}), dtype=np.uint64)
    targets = np.array(sorted({t for _, t in pairs}), dtype=np.int64)
    g = build_pgraph(edges, num_nodes, num_parts=num_parts)
    refs = multi_bfs_refs(g, sources)
    parts = ray.get(
        [
            _spsp_extract.remote(g.vid_refs[p], refs[p], targets)
            for p in range(g.num_parts)
        ]
    )
    k_of = {int(s): k for k, s in enumerate(sources)}
    row_of = {}
    for vs, d in parts:
        for i, v in enumerate(vs):
            row_of[int(v)] = d[i]
    out_s, out_t, out_d = [], [], []
    for s, t in pairs:
        d = row_of.get(t)
        out_s.append(s)
        out_t.append(t)
        out_d.append(int(d[k_of[s]]) if d is not None else -1)
    return pa.table(
        {
            "src": pa.array(out_s, pa.int64()),
            "dst": pa.array(out_t, pa.int64()),
            "dist": pa.array(out_d, pa.int64()),
        }
    )


@ray.remote
def _ibfs_scatter(t, num_nodes: int, num_parts: int) -> tuple:
    """Route (v, dist >= 0) rows to the owning partition (vowner layout)."""
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = d >= 0
    v, d = v[keep].astype(np.uint64), d[keep].astype(np.uint64)
    parts = bsp.vowner(v, num_nodes, num_parts)
    order = np.argsort(parts, kind="stable")
    v, d, parts = v[order], d[order], parts[order]
    cut = np.searchsorted(parts, np.arange(num_parts + 1))
    return tuple(
        (v[cut[q] : cut[q + 1]], d[cut[q] : cut[q + 1]])
        for q in range(num_parts)
    )


@ray.remote
def _ibfs_seed(vids: np.ndarray, num_nodes: int, num_parts: int, source: int, *slices):
    dist = np.full(len(vids), _INF, dtype=np.uint64)
    for v, d in slices:
        if len(v):
            dist[bsp.vlocal(v, num_nodes, num_parts)] = d
    hit = np.flatnonzero(vids == np.uint64(source))
    if len(hit):
        dist[hit[0]] = 0
    active = dist < _INF
    return dist, active


def incremental_bfs(
    edges: ray.data.Dataset,
    num_nodes: int,
    source: int,
    prev_dist: ray.data.Dataset,
    *,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, dist) BFS after edge INSERTIONS, warm-started from old distances.

    Reference: distance/DynBFS.cpp (edge-insertion distance update).
    Under insertions hop distances only DECREASE, so yesterday's distances
    are valid upper bounds; seeding the min-relaxation with them converges
    to the exact new distances in supersteps ≈ the depth of the affected
    region instead of the full eccentricity — identical result to a
    from-scratch BFS over the augmented edge table.

    ``prev_dist``: (v, dist) with -1 = unreachable (bfs_distances output).
    """
    g = build_pgraph(edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    scat = [
        _ibfs_scatter.options(num_returns=P).remote(r, num_nodes, P)
        for r in prev_dist.to_arrow_refs()
    ]
    state = [
        _ibfs_seed.remote(g.vid_refs[q], num_nodes, P, source, *[s[q] for s in scat])
        for q in range(P)
    ]
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    it = 0
    while True:
        map_out = [
            _bfs_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, count_refs = [], []
        for q in range(P):
            s, c = _bfs_reduce.remote(state[q], bundles[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            count_refs.append(c)
        changed = sum(ray.get(count_refs))
        state = new_state
        it += 1
        if changed == 0:
            break
    refs = [_bfs_out.remote(s) for s in state]
    return bsp.state_to_dataset(g, refs, "dist"), {"supersteps": it}


def bidirectional_bfs_distance(
    edges: ray.data.Dataset,
    num_nodes: int,
    source: int,
    target: int,
    *,
    num_parts: int | None = None,
) -> tuple[int, dict]:
    """Hop distance source→target, or -1 (directed; BidirectionalBFS.cpp).

    Two frontier waves — forward from ``source`` on the graph, backward
    from ``target`` on the transpose — expand alternately; the search
    stops once the best meeting value Σ min_v (d_f(v)+d_b(v)) can no
    longer improve (levels_f + levels_b ≥ best).  Supersteps ≈ d/2 + d/2
    instead of d, and each wave touches only its own ball — the classic
    point-to-point win over full BFS.
    """
    from networkit_ray.graph.build import transpose

    if source == target:
        return 0, {"supersteps": 0}
    edges = edges.materialize()
    g_f = build_pgraph(edges, num_nodes, num_parts=num_parts)
    P = g_f.num_parts
    g_b = build_pgraph(transpose(edges), num_nodes, num_parts=P)

    sf = [_bfs_init.remote(g_f.vid_refs[p], source) for p in range(P)]
    sb = [_bfs_init.remote(g_b.vid_refs[p], target) for p in range(P)]
    units_f, units_b = g_f.map_units(), g_b.map_units()

    @ray.remote
    def _meet(st_f: tuple, st_b: tuple) -> int:
        df, db = st_f[0], st_b[0]
        tot = df + db  # uint64; INF sentinel + small stays huge
        m = int(tot.min()) if len(tot) else int(_INF)
        return m

    best = int(_INF)
    lvl_f = lvl_b = 0
    it = 0
    while True:
        # expand the side with the shallower wave (balanced balls)
        fwd = lvl_f <= lvl_b
        g, st, units = (g_f, sf, units_f) if fwd else (g_b, sb, units_b)
        bundles = g.msg_bundle_refs()
        map_out = [
            _bfs_map.options(num_returns=P).remote(g.block_refs[p], st[p], c)
            for p, c in units
        ]
        new_state, count_refs = [], []
        for q in range(P):
            s, c = _bfs_reduce.remote(st[q], bundles[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            count_refs.append(c)
        changed = sum(ray.get(count_refs))
        if fwd:
            sf = new_state
            lvl_f += 1
        else:
            sb = new_state
            lvl_b += 1
        it += 1
        best = min(best, min(ray.get([_meet.remote(sf[p], sb[p]) for p in range(P)])))
        if changed == 0 and fwd and lvl_b >= lvl_f:
            # forward wave exhausted; let backward also run to exhaustion
            pass
        if best <= lvl_f + lvl_b:
            break
        if changed == 0:
            # current side exhausted; if the other side also cannot extend
            # past the bound, stop
            other_done_probe = lvl_f + lvl_b
            if fwd:
                lvl_f = 10**9  # never pick this side again
            else:
                lvl_b = 10**9
            if lvl_f >= 10**9 and lvl_b >= 10**9:
                break
    return (best if best < int(_INF) else -1), {"supersteps": it}


def apsp_table(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    batch_k: int = 16,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(s, v, d) hop distances for every REACHABLE ordered pair (d ≥ 0,
    self rows d = 0 included; unreachable pairs are omitted, the sparse
    analog of APSP's infinity entries).

    Reference: distance/APSP.cpp (one BFS/Dijkstra per source).  Here the
    sources run through the batched multi-source BFS (K per wave), and
    each partition emits its (source, vertex, d) rows directly — the
    result table is built distributed, never on the driver.  Exact mode
    is for modest vertex counts (n²·8B output); use the sampled
    hop-histogram / pivot estimators at web scale.
    """
    import pyarrow as pa

    from networkit_ray.graph.bsp import build_pgraph

    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts

    @ray.remote
    def _rows(vids: np.ndarray, dists: np.ndarray, sources: np.ndarray) -> pa.Table:
        d = dists.astype(np.int64)  # (n_p, k)
        k = d.shape[1]
        vv = np.repeat(vids.astype(np.int64), k)
        ss = np.tile(sources.astype(np.int64), len(vids))
        dd = d.reshape(-1)
        keep = dd >= 0
        return pa.table(
            {"s": pa.array(ss[keep]), "v": pa.array(vv[keep]), "d": pa.array(dd[keep])}
        )

    sources = np.arange(num_nodes, dtype=np.int64)
    refs = []
    for i in range(0, num_nodes, batch_k):
        batch = sources[i : i + batch_k]
        dist_refs = multi_bfs_refs(g, batch)
        refs.extend(_rows.remote(g.vid_refs[p], dist_refs[p], batch) for p in range(P))
    return ray.data.from_arrow_refs(refs)


def neighborhood_function(
    apsp: ray.data.Dataset, max_h: int | None = None
) -> "pa.Table":
    """(h, nf) — exact neighborhood function N(h) = # ordered pairs with
    0 < d ≤ h (distance/NeighborhoodFunction.cpp), from an
    :func:`apsp_table` result via one histogram + cumulative sum."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    hist = (
        apsp.map_batches(
            lambda t: t.filter(pa.compute.greater(t["d"], pa.scalar(0, pa.int64()))),
            batch_format="pyarrow",
        )
        .groupby("d")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("d")
    )
    ds = hist["d"].to_numpy().astype(np.int64)
    ns = hist["n"].to_numpy().astype(np.int64)
    top = int(max_h if max_h is not None else (ds.max() if len(ds) else 0))
    hs = np.arange(1, top + 1, dtype=np.int64)
    nf = np.array([ns[ds <= h].sum() for h in hs], dtype=np.int64)
    return pa.table({"h": pa.array(hs), "nf": pa.array(nf)})


@ray.remote
def _sssp_min_active(state: tuple) -> float:
    dist, active = state
    return float(dist[active].min()) if active.any() else float("inf")


@ray.remote
def _sssp_meet(st_f: tuple, st_b: tuple) -> float:
    tot = st_f[0] + st_b[0]
    return float(tot.min()) if len(tot) else float("inf")


def bidirectional_sssp_distance(
    edges: ray.data.Dataset,
    num_nodes: int,
    source: int,
    target: int,
    *,
    num_parts: int | None = None,
) -> tuple[float, dict]:
    """Weighted source→target distance, or -1.0 (BidirectionalDijkstra.cpp).

    Forward min-plus wave from ``source``, backward wave from ``target``
    on the transpose, expanded alternately (smaller active-minimum first).
    Stopping rule (safe for non-negative weights on the frontier
    Bellman-Ford: the active minimum is non-decreasing, and any
    not-yet-counted s→t path passes through an active vertex on each
    unexhausted side): stop once min(activeMin_f, activeMin_b) ≥ best
    meeting value.  Requires the ``w`` column.
    """
    from networkit_ray.graph.build import transpose
    from networkit_ray.graph.bsp import build_pgraph

    if source == target:
        return 0.0, {"supersteps": 0}
    edges = edges.materialize()
    g_f = build_pgraph(edges, num_nodes, num_parts=num_parts, weighted=True)
    P = g_f.num_parts
    g_b = build_pgraph(transpose(edges), num_nodes, num_parts=P, weighted=True)

    sf = [_sssp_init.remote(g_f.vid_refs[p], source) for p in range(P)]
    sb = [_sssp_init.remote(g_b.vid_refs[p], target) for p in range(P)]
    units_f, units_b = g_f.map_units(), g_b.map_units()
    best = float("inf")
    it = 0
    while True:
        min_f = min(ray.get([_sssp_min_active.remote(s) for s in sf]))
        min_b = min(ray.get([_sssp_min_active.remote(s) for s in sb]))
        if min(min_f, min_b) >= best:
            break
        fwd = min_f <= min_b
        g, st, units = (g_f, sf, units_f) if fwd else (g_b, sb, units_b)
        bundles = g.msg_bundle_refs()
        map_out = [
            _sssp_map.options(num_returns=P).remote(g.block_refs[p], st[p], c)
            for p, c in units
        ]
        new_state = []
        for q in range(P):
            s, _ = _bfs_reduce.remote(st[q], bundles[q], *[mo[q] for mo in map_out])
            new_state.append(s)
        if fwd:
            sf = new_state
        else:
            sb = new_state
        it += 1
        best = min(
            best, min(ray.get([_sssp_meet.remote(sf[p], sb[p]) for p in range(P)]))
        )
    return (best if np.isfinite(best) else -1.0), {"supersteps": it}
