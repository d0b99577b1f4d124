"""Biconnected components via Tarjan–Vishkin on a BFS spanning forest.

Reference: components/BiconnectedComponents.cpp computes the per-edge
biconnected-component partition with a sequential Hopcroft–Tarjan DFS;
the classic parallel equivalent (Tarjan & Vishkin 1985, the formulation
in JáJá §5.3) replaces the DFS with ANY rooted spanning tree plus four
per-vertex quantities — preorder pre(v), subtree size nd(v), low(v),
high(v) — and reduces biconnectivity to connected components of an
auxiliary graph over the non-root vertices (each identified with its
parent tree edge):

  R1  non-tree edge {v,w}, neither endpoint an ancestor of the other
      → aux edge {v, w}
  R2  tree edge (v, u=p(v)), u not a root, and the subtree of v escapes
      u's preorder interval (low(v) < pre(u) or high(v) ≥ pre(u)+nd(u))
      → aux edge {v, u}

Edge labeling: tree edge (v,p(v)) gets comp(v); a non-tree edge {v,w}
with w an ancestor of v gets comp(v) (and comp(w) if v ancestor of w);
unrelated endpoints are already unioned by R1 so either works.

Engine shape: multi-root BFS (one superstep loop, roots = CC labels) for
the forest; parent = min neighbor one level up (one exchange+groupby).
The tree sweeps (nd bottom-up, pre top-down, low/high bottom-up) run on
the DRIVER over dense O(num_nodes) numpy arrays, one vectorized pass per
BFS level — this is the module's deliberate single-driver concession
(the sweeps are sequential in tree depth; distributing them buys nothing
until the VERTEX table outgrows one machine).  It is bounded by an
explicit ``driver_limit`` guard that raises with the override lever
instead of silently OOMing.  Everything EDGE-sized stays distributed:
non-tree reach is a ``map_batches`` + ``groupby`` aggregate, R1 aux
edges and the final per-edge labels are ``map_batches`` passes over
broadcast (``ray.put``) parent/preorder/nd/label arrays — the driver
never materializes the edge table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min

from networkit_ray.graph import bsp
from networkit_ray.graph.bfs import _bfs_map, _bfs_out, _bfs_reduce, _INF
from networkit_ray.graph.bsp import build_pgraph


@ray.remote
def _mr_init(vids: np.ndarray, roots: np.ndarray) -> tuple:
    dist = np.full(len(vids), _INF, dtype=np.uint64)
    active = np.zeros(len(vids), dtype=bool)
    hit = np.isin(vids.astype(np.int64), roots)
    dist[hit] = 0
    active[hit] = True
    return dist, active


def _forest_distances(g, roots: np.ndarray) -> ray.data.Dataset:
    """(v, dist) BFS levels from every root simultaneously."""
    P = g.num_parts
    state = [_mr_init.remote(g.vid_refs[p], roots) for p in range(P)]
    units = g.map_units()
    bundles = g.msg_bundle_refs()
    while True:
        map_out = [
            _bfs_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, counts = [], []
        for q in range(P):
            s, c = _bfs_reduce.remote(state[q], bundles[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            counts.append(c)
        changed = sum(ray.get(counts))
        state = new_state
        if changed == 0:
            break
    refs = [_bfs_out.remote(s) for s in state]
    return bsp.state_to_dataset(g, refs, "dist")


def biconnected_components(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    driver_limit: int = 1 << 27,
) -> ray.data.Dataset:
    """(src, dst, comp) — biconnected-component label per canonical edge.

    ``sym_edges``: symmetrized simple edge table.  comp = the smallest
    non-root vertex id whose parent tree edge lies in the component
    (deterministic, parallelism-invariant).

    The tree sweeps hold a handful of O(num_nodes) int64 arrays on the
    driver (~50 B/vertex); ``driver_limit`` (default 2^27 ≈ 134 M
    vertices ≈ 6 GiB) bounds that concession explicitly — raise it only
    with commensurate driver memory.  Edge-sized work never leaves the
    cluster.
    """
    from networkit_ray.graph.components import connected_components

    if num_nodes > driver_limit:
        raise ValueError(
            f"biconnected_components holds O(num_nodes) driver-side arrays "
            f"for the tree sweeps; num_nodes={num_nodes:,} exceeds "
            f"driver_limit={driver_limit:,}. Pass a higher driver_limit= "
            f"only if the driver has ~50 bytes/vertex of headroom."
        )

    sym = sym_edges.materialize()
    labels, _ = connected_components(sym, num_nodes, num_parts=num_parts)
    roots = (
        labels.map_batches(
            lambda t: t.filter(pc.equal(t["v"], t["label"])),
            batch_format="pyarrow",
        )
        .select_columns(["v"])
        .to_pandas()["v"]
        .to_numpy()
        .astype(np.int64)
    )

    g = build_pgraph(sym, num_nodes, num_parts=num_parts)
    dist = _forest_distances(g, roots).materialize()

    # parent(v) = min neighbor u with dist(u) = dist(v) - 1, computed as a
    # distributed broadcast-filter + aggregate: dist is an n-row table.
    n = num_nodes
    dist_arr = np.full(n, np.iinfo(np.int64).max, np.int64)
    dp = dist.to_pandas()
    dist_arr[dp["v"].to_numpy().astype(np.int64)] = (
        dp["dist"].to_numpy().astype(np.int64)
    )
    dist_ref = ray.put(dist_arr)

    def tree_cands(t: pa.Table, *, _d=dist_ref) -> pa.Table:
        d = ray.get(_d) if isinstance(_d, ray.ObjectRef) else _d
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d[s] + 1 == d[v]
        return pa.table(
            {
                "v": pa.array(v[keep]),
                "cand": pa.array(s[keep]),
                "lvl": pa.array(d[v[keep]]),
            }
        )

    parent = (
        sym.map_batches(tree_cands, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Min("cand", alias_name="parent"), Min("lvl", alias_name="lvl"))
        .materialize()
    )

    # ---- driver-side dense vertex arrays (the guarded O(n) concession)
    vt = parent.to_pandas()
    v_arr = vt["v"].to_numpy().astype(np.int64)
    par = np.full(n, -1, np.int64)
    par[v_arr] = vt["parent"].to_numpy().astype(np.int64)
    lvl = np.zeros(n, np.int64)
    lvl[v_arr] = vt["lvl"].to_numpy().astype(np.int64)
    max_lvl = int(lvl.max()) if n else 0
    is_root = np.zeros(n, bool)
    is_root[roots] = True

    # level index: vertex ids of each level, one np pass
    by_lvl = [v_arr[lvl[v_arr] == k] for k in range(1, max_lvl + 1)]

    # nd: bottom-up subtree sizes (vectorized per level)
    nd = np.ones(n, np.int64)
    for k in range(max_lvl, 0, -1):
        sel = by_lvl[k - 1]
        if len(sel):
            np.add.at(nd, par[sel], nd[sel])

    # pre: top-down preorder — children ordered by id get parent's pre + 1
    # + prefix sums of elder siblings' nd
    pre = np.zeros(n, np.int64)
    rs = np.sort(roots)
    pre[rs] = np.cumsum(nd[rs]) - nd[rs]
    for k in range(1, max_lvl + 1):
        sel = np.sort(by_lvl[k - 1])
        if not len(sel):
            continue
        sub = sel[np.argsort(par[sel], kind="stable")]
        ps = par[sub]
        starts = np.r_[True, ps[1:] != ps[:-1]]
        cs_excl = np.cumsum(nd[sub]) - nd[sub]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(len(sub)), 0))
        pre[sub] = pre[ps] + 1 + (cs_excl - cs_excl[run_start])

    # ---- low/high: min/max preorder reachable via subtree + ONE non-tree
    # edge.  Non-tree reach is a distributed aggregate over the edge table
    # (broadcast parent + preorder arrays; edges never reach the driver).
    par_ref = ray.put(par)
    pre_ref = ray.put(pre)

    def nontree_reach(t: pa.Table, *, _p=par_ref, _q=pre_ref) -> pa.Table:
        p = ray.get(_p) if isinstance(_p, ray.ObjectRef) else _p
        q = ray.get(_q) if isinstance(_q, ray.ObjectRef) else _q
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = (p[v] != s) & (p[s] != v)
        return pa.table({"v": pa.array(v[nt]), "p": pa.array(q[s[nt]])})

    reach = (
        sym.map_batches(nontree_reach, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Min("p", alias_name="mn"), Max("p", alias_name="mx"))
        .to_pandas()
    )
    low = pre.copy()
    high = pre.copy()
    if len(reach):  # a pure forest has no non-tree edges at all
        rv = reach["v"].to_numpy().astype(np.int64)
        np.minimum.at(low, rv, reach["mn"].to_numpy().astype(np.int64))
        np.maximum.at(high, rv, reach["mx"].to_numpy().astype(np.int64))
    # bottom-up fold of children lows/highs (vectorized per level)
    for k in range(max_lvl, 0, -1):
        sel = by_lvl[k - 1]
        if len(sel):
            np.minimum.at(low, par[sel], low[sel])
            np.maximum.at(high, par[sel], high[sel])

    # ---- auxiliary graph edges.  R1 (edge-sized) is a distributed pass;
    # R2 (vertex-sized) comes from the driver arrays.
    nd_ref = ray.put(nd)

    def r1_aux(t: pa.Table, *, _p=par_ref, _q=pre_ref, _n=nd_ref) -> pa.Table:
        p = ray.get(_p) if isinstance(_p, ray.ObjectRef) else _p
        q = ray.get(_q) if isinstance(_q, ray.ObjectRef) else _q
        sz = ray.get(_n) if isinstance(_n, ray.ObjectRef) else _n
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = s < d
        a, b = s[canon], d[canon]
        tree_row = (p[b] == a) | (p[a] == b)
        anc_ab = (q[a] <= q[b]) & (q[b] < q[a] + sz[a])
        anc_ba = (q[b] <= q[a]) & (q[a] < q[b] + sz[b])
        r1 = ~tree_row & ~anc_ab & ~anc_ba
        a, b = a[r1], b[r1]
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    aux_r1 = sym.map_batches(r1_aux, batch_format="pyarrow")

    # R2: tree edge (v, u=p(v)), u not a root, subtree(v) escapes u
    vv = v_arr
    uu = par[vv]
    r2 = ~is_root[uu] & ((low[vv] < pre[uu]) | (high[vv] >= pre[uu] + nd[uu]))
    a2, b2 = vv[r2], uu[r2]
    aux_r2 = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([a2, b2])),
                "dst": pa.array(np.concatenate([b2, a2])),
            }
        )
    )

    from networkit_ray.graph.components import connected_components as _cc

    aux_labels, _ = _cc(aux_r1.union(aux_r2), num_nodes, num_parts=num_parts)
    comp = np.arange(n, dtype=np.int64)  # isolated carriers label themselves
    al = aux_labels.to_pandas()
    comp[al["v"].to_numpy().astype(np.int64)] = (
        al["label"].to_numpy().astype(np.int64)
    )

    # ---- label the original canonical edges (distributed): the carrier
    # vertex is the child endpoint of a tree edge, else the preorder-deeper
    # endpoint of a back/cross edge
    comp_ref = ray.put(comp)

    def label_edges(
        t: pa.Table, *, _p=par_ref, _q=pre_ref, _n=nd_ref, _c=comp_ref
    ) -> pa.Table:
        p = ray.get(_p) if isinstance(_p, ray.ObjectRef) else _p
        q = ray.get(_q) if isinstance(_q, ray.ObjectRef) else _q
        sz = ray.get(_n) if isinstance(_n, ray.ObjectRef) else _n
        cmp_ = ray.get(_c) if isinstance(_c, ray.ObjectRef) else _c
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = s < d
        a, b = s[canon], d[canon]
        anc_ab = (q[a] <= q[b]) & (q[b] < q[a] + sz[a])
        carrier = np.where(
            p[b] == a, b, np.where(p[a] == b, a, np.where(anc_ab, b, a))
        )
        return pa.table(
            {
                "src": pa.array(a),
                "dst": pa.array(b),
                "comp": pa.array(cmp_[carrier]),
            }
        )

    return sym.map_batches(label_edges, batch_format="pyarrow")
