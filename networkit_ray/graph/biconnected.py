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
the forest; parent = min neighbor one level up (one exchange+groupby);
nd / pre / low+high are level-synchronous passes over vertex tables
(bottom-up, top-down, bottom-up — 3·depth small shuffles, each touching
one level's rows); the aux graph reuses the hash-min CC kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from networkit_ray.common.exchange import exchange_join
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
    while True:
        map_out = [
            _bfs_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, counts = [], []
        for q in range(P):
            s, c = _bfs_reduce.remote(state[q], *[mo[q] for mo in map_out])
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
) -> ray.data.Dataset:
    """(src, dst, comp) — biconnected-component label per canonical edge.

    ``sym_edges``: symmetrized simple edge table.  comp = the smallest
    non-root vertex id whose parent tree edge lies in the component
    (deterministic, parallelism-invariant).
    """
    from networkit_ray.graph.components import connected_components

    sym = sym_edges.materialize()
    labels, _ = connected_components(sym, num_nodes, num_parts=num_parts)
    labels = labels.materialize()
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

    # parent(v) = min neighbor u with dist(u) = dist(v) - 1
    d_src = dist.map_batches(
        lambda t: pa.table({"src": t["v"], "ds": t["dist"]}),
        batch_format="pyarrow",
    )
    d_dst = dist.map_batches(
        lambda t: pa.table({"dst": t["v"], "dd": t["dist"]}),
        batch_format="pyarrow",
    )
    ed = exchange_join(
        exchange_join(sym, d_src, left_on=["src"]), d_dst, left_on=["dst"]
    ).materialize()

    parent = (
        ed.map_batches(
            lambda t: t.filter(
                pc.equal(pc.add(t["ds"], pa.scalar(1, t["ds"].type)), t["dd"])
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: pa.table({"v": t["dst"], "cand": t["src"], "lvl": t["dd"]}),
            batch_format="pyarrow",
        )
        .groupby("v")
        .aggregate(Min("cand", alias_name="parent"), Min("lvl", alias_name="lvl"))
        .materialize()
    )
    # vertex table rows: (v, parent, lvl); roots absent (no parent)
    vt = parent.to_pandas()
    vt["v"] = vt["v"].astype(np.int64)
    vt["parent"] = vt["parent"].astype(np.int64)
    vt["lvl"] = vt["lvl"].astype(np.int64)

    # ---- driver-coordinated level passes on the vertex table.  Each pass
    # is vectorized numpy over one level's rows; the vertex table is n rows
    # (not edges).  At cluster scale this table is the same size as any
    # label state the BSP kernels pin; the level loops shuffle only
    # level-sized slices.
    lvl = vt["lvl"].to_numpy()
    v_arr = vt["v"].to_numpy()
    p_arr = vt["parent"].to_numpy()
    max_lvl = int(lvl.max()) if len(lvl) else 0
    idx_of = {int(x): i for i, x in enumerate(v_arr)}
    root_set = set(roots.tolist())

    # nd: bottom-up subtree sizes (roots handled implicitly: only non-root
    # rows exist; root nd not needed by R2 since u root is excluded)
    nd = np.ones(len(v_arr), dtype=np.int64)
    nd_full = {int(x): 1 for x in v_arr}
    for r in roots.tolist():
        nd_full[r] = 1
    for level in range(max_lvl, 0, -1):
        sel = lvl == level
        if not sel.any():
            continue
        contrib = pd.DataFrame(
            {"p": p_arr[sel], "s": nd[sel]}
        ).groupby("p")["s"].sum()
        for pv, sv in contrib.items():
            nd_full[int(pv)] += int(sv)
            if int(pv) in idx_of:
                nd[idx_of[int(pv)]] += int(sv)

    # pre: top-down preorder — children ordered by id get parent's pre + 1
    # + prefix sums of elder siblings' nd
    pre_full = {}
    next_base = 0
    for r in sorted(root_set):
        pre_full[r] = next_base
        next_base += nd_full[r]
    pre = np.zeros(len(v_arr), dtype=np.int64)
    for level in range(1, max_lvl + 1):
        sel = np.flatnonzero(lvl == level)
        if not len(sel):
            continue
        sub = sel[np.lexsort((v_arr[sel],))]
        sub = sub[np.argsort(p_arr[sub], kind="stable")]
        ps = p_arr[sub]
        starts = np.r_[True, ps[1:] != ps[:-1]]
        # segmented exclusive cumsum of sibling subtree sizes, offset by
        # the parent's preorder + 1 at each run start
        cs_excl = np.cumsum(nd[sub]) - nd[sub]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(len(sub)), 0))
        base = np.array([pre_full[int(x)] for x in ps[starts]], np.int64)
        base_rep = np.repeat(base, np.diff(np.r_[np.flatnonzero(starts), len(sub)]))
        offs = base_rep + 1 + (cs_excl - cs_excl[run_start])
        pre[sub] = offs
        for i, x in zip(sub, v_arr[sub]):
            pre_full[int(x)] = int(pre[i])

    # low/high: min/max preorder reachable via subtree + ONE non-tree edge
    pre_ds = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.array(list(pre_full.keys()), np.int64)),
                "pre": pa.array(np.array(list(pre_full.values()), np.int64)),
            }
        )
    )
    p_src = pre_ds.map_batches(
        lambda t: pa.table({"src": t["v"], "ps": t["pre"]}),
        batch_format="pyarrow",
    )
    p_dst = pre_ds.map_batches(
        lambda t: pa.table({"dst": t["v"], "pd_": t["pre"]}),
        batch_format="pyarrow",
    )
    ep = exchange_join(
        exchange_join(sym, p_src, left_on=["src"]), p_dst, left_on=["dst"]
    ).materialize()

    # classify edges: tree edge iff (dst, src) == (v, parent) pair
    par_full = {int(a): int(b) for a, b in zip(v_arr, p_arr)}

    ep_df = ep.to_pandas()
    s_np = ep_df["src"].to_numpy().astype(np.int64)
    d_np = ep_df["dst"].to_numpy().astype(np.int64)
    ps_np = ep_df["ps"].to_numpy().astype(np.int64)
    pd_np = ep_df["pd_"].to_numpy().astype(np.int64)
    par_of = np.array([par_full.get(int(x), -1) for x in d_np], np.int64)
    is_tree = par_of == s_np  # row (src=parent, dst=child)

    # per-vertex non-tree reach: min/max pre over non-tree neighbors
    nt = ~is_tree & (np.array([par_full.get(int(x), -1) for x in s_np], np.int64) != d_np)
    reach = pd.DataFrame(
        {"v": d_np[nt], "mn": ps_np[nt], "mx": ps_np[nt]}
    ).groupby("v").agg(mn=("mn", "min"), mx=("mx", "max"))

    nd_arr = {k: nd_full[k] for k in nd_full}
    low = {}
    high = {}
    for x in pre_full:
        low[x] = pre_full[x]
        high[x] = pre_full[x]
    for x, row in reach.iterrows():
        low[int(x)] = min(low[int(x)], int(row.mn))
        high[int(x)] = max(high[int(x)], int(row.mx))
    # bottom-up fold of children lows/highs
    for level in range(max_lvl, 0, -1):
        sel = np.flatnonzero(lvl == level)
        for i in sel:
            pv = int(p_arr[i])
            xv = int(v_arr[i])
            low[pv] = min(low[pv], low[xv])
            high[pv] = max(high[pv], high[xv])

    # ---- auxiliary graph edges (over non-root vertices) — vectorized
    # lookups: pre/nd/parent per endpoint via pandas maps
    pre_map = pd.Series(pre_full)
    nd_map = pd.Series(nd_arr)
    par_map = pd.Series(par_full)
    canon_rows = s_np < d_np

    ci = np.flatnonzero(canon_rows)
    a_np, b_np = s_np[ci], d_np[ci]
    pa_v = pre_map.reindex(a_np).to_numpy()
    pb_v = pre_map.reindex(b_np).to_numpy()
    na_v = nd_map.reindex(a_np).to_numpy()
    nb_v = nd_map.reindex(b_np).to_numpy()
    parb = par_map.reindex(b_np).fillna(-1).to_numpy().astype(np.int64)
    para = par_map.reindex(a_np).fillna(-1).to_numpy().astype(np.int64)
    tree_row = (parb == a_np) | (para == b_np)
    anc_ab = (pa_v <= pb_v) & (pb_v < pa_v + na_v)
    anc_ba = (pb_v <= pa_v) & (pa_v < pb_v + nb_v)
    r1 = ~tree_row & ~anc_ab & ~anc_ba
    aux_a = [a_np[r1]]
    aux_b = [b_np[r1]]
    # R2: tree edge (v, u=p(v)), u not root, subtree(v) escapes u
    vv = np.array(list(par_full.keys()), np.int64)
    uu = np.array(list(par_full.values()), np.int64)
    nonroot_u = ~np.isin(uu, np.fromiter(root_set, np.int64, len(root_set)))
    low_v = pd.Series(low).reindex(vv).to_numpy()
    high_v = pd.Series(high).reindex(vv).to_numpy()
    pre_u = pre_map.reindex(uu).to_numpy()
    nd_u = nd_map.reindex(uu).to_numpy()
    r2 = nonroot_u & ((low_v < pre_u) | (high_v >= pre_u + nd_u))
    aux_a.append(vv[r2])
    aux_b.append(uu[r2])
    aux_edges = list(
        zip(np.concatenate(aux_a).tolist(), np.concatenate(aux_b).tolist())
    )

    from networkit_ray.graph.components import connected_components as _cc

    if aux_edges:
        ae = np.array(aux_edges, np.int64)
        aux_sym = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(np.concatenate([ae[:, 0], ae[:, 1]])),
                    "dst": pa.array(np.concatenate([ae[:, 1], ae[:, 0]])),
                }
            )
        )
        aux_labels, _ = _cc(aux_sym, num_nodes, num_parts=num_parts)
        comp_of = {
            int(r.v): int(r.label)
            for r in aux_labels.to_pandas().itertuples(index=False)
        }
    else:
        comp_of = {}

    # ---- label the original canonical edges (vectorized): the carrier
    # vertex is the child endpoint of a tree edge, else the preorder-deeper
    # endpoint of a back/cross edge
    carrier = np.where(
        parb == a_np,
        b_np,
        np.where(
            para == b_np,
            a_np,
            np.where(anc_ab, b_np, a_np),
        ),
    )
    comp_s = pd.Series(comp_of, dtype=np.float64)
    comp_v = comp_s.reindex(carrier).to_numpy()
    comp_v = np.where(np.isnan(comp_v), carrier, comp_v).astype(np.int64)

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(a_np),
                "dst": pa.array(b_np),
                "comp": pa.array(comp_v),
            }
        )
    )
