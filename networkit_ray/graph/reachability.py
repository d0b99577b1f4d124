"""Reachable-node counts on a directed graph.

Reference: reachability/ReachableNodes.cpp:25-85 (runDirected, exact
mode) — compute SCCs, build the condensed DAG, BFS from each SCC and sum
the member counts of every reached SCC; each member of the source SCC is
assigned that total (the source SCC counts itself, so the vertex itself
is included).

Engine shape: FW-BW SCC labels (scc.py), two hash-exchange joins to
condense the edge table, then the batched K-source BFS (bfs.multi_bfs_refs)
over the condensed DAG with a per-partition component-size vector so each
wave accumulates Σ csize[reached] per source.  Exact all-sources mode is
O(C/K) BFS waves for C SCCs — the same exact-mode cost profile as the
reference; at web scale use the sampled/bound variants instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from networkit_ray.graph import bsp
from networkit_ray.graph.bfs import multi_bfs_refs
from networkit_ray.graph.bsp import build_pgraph


@ray.remote
def _rn_scatter(t: pa.Table, num_nodes: int, num_parts: int) -> tuple:
    """Route (label, csize) rows to the label's owning partition."""
    if len(t) == 0 or "label" not in t.column_names:
        # groupby can emit 0-row blocks with a bare schema
        empty = np.array([], dtype=np.uint64)
        return tuple(
            (empty, empty.astype(np.int64)) for _ in range(num_parts)
        )
    v = t["label"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["csize"].to_numpy(zero_copy_only=False).astype(np.int64)
    parts = bsp.vowner(v, num_nodes, num_parts)
    order = np.argsort(parts, kind="stable")
    v, c, parts = v[order], c[order], parts[order]
    cut = np.searchsorted(parts, np.arange(num_parts + 1))
    return tuple(
        (v[cut[q] : cut[q + 1]], c[cut[q] : cut[q + 1]])
        for q in range(num_parts)
    )


@ray.remote
def _rn_sizes(vids: np.ndarray, num_nodes: int, num_parts: int, *slices) -> np.ndarray:
    arr = np.zeros(len(vids), dtype=np.int64)
    for v, c in slices:
        if len(v):
            arr[bsp.vlocal(v, num_nodes, num_parts)] = c
    return arr


@ray.remote
def _rn_wave(dist: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Per-source Σ csize over reached vertices for one partition (K,)."""
    reached = dist >= 0  # (n_p, K); -1 = unreachable
    return (reached * sizes[:, None]).sum(axis=0).astype(np.int64)


def reachable_counts(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    batch_k: int = 64,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(v, reachable) — number of nodes reachable from v (v included)."""
    from networkit_ray.common.exchange import exchange_join
    from networkit_ray.graph.build import dedup_edges
    from networkit_ray.graph.scc import strongly_connected_components

    labels, _ = strongly_connected_components(
        edges, num_nodes, num_parts=num_parts
    )
    labels = labels.materialize()
    sizes = (
        labels.groupby("label")
        .aggregate(Count(alias_name="csize"))
        .materialize()
    )

    # condensed DAG: map both endpoints to their SCC label, drop intra-SCC
    # edges, dedup — comp ids live in the same dense 0..n-1 universe (min
    # member ids), so the BFS state covers every comp plus csize-0 fillers
    lsrc = labels.map_batches(
        lambda t: pa.table({"src": t["v"], "ls": t["label"]}),
        batch_format="pyarrow",
    )
    ldst = labels.map_batches(
        lambda t: pa.table({"dst": t["v"], "ld": t["label"]}),
        batch_format="pyarrow",
    )
    j = exchange_join(
        exchange_join(edges, lsrc, left_on=["src"]), ldst, left_on=["dst"]
    )

    def condense(t: pa.Table) -> pa.Table:
        out = pa.table({"src": t["ls"], "dst": t["ld"]})
        import pyarrow.compute as pc

        return out.filter(pc.not_equal(out["src"], out["dst"]))

    ce = dedup_edges(j.map_batches(condense, batch_format="pyarrow")).materialize()

    g = build_pgraph(ce, num_nodes, num_parts=num_parts)
    P = g.num_parts
    scat = [
        _rn_scatter.options(num_returns=P).remote(r, num_nodes, P)
        for r in sizes.to_arrow_refs()
    ]
    size_refs = [
        _rn_sizes.remote(g.vid_refs[q], num_nodes, P, *[s[q] for s in scat])
        for q in range(P)
    ]

    comp_ids = np.sort(
        sizes.select_columns(["label"]).to_pandas()["label"].to_numpy()
    ).astype(np.int64)
    reach = np.zeros(len(comp_ids), dtype=np.int64)
    for i in range(0, len(comp_ids), batch_k):
        batch = comp_ids[i : i + batch_k]
        dist_refs = multi_bfs_refs(g, batch)
        waves = ray.get(
            [_rn_wave.remote(dist_refs[p], size_refs[p]) for p in range(P)]
        )
        reach[i : i + len(batch)] = np.sum(waves, axis=0)

    comp_reach = ray.data.from_arrow(
        pa.table(
            {"label": pa.array(comp_ids), "reachable": pa.array(reach)}
        )
    )
    out = exchange_join(labels, comp_reach, left_on=["label"])
    return out.map_batches(
        lambda t: pa.table({"v": t["v"], "reachable": t["reachable"]}),
        batch_format="pyarrow",
    )


def all_simple_paths(
    edges: ray.data.Dataset,
    source: int,
    target: int,
    cutoff: int,
) -> ray.data.Dataset:
    """(path: list<int64>) — all simple directed paths source→target, ≤ cutoff edges.

    Reference: reachability/AllSimplePaths.cpp (directed, unweighted,
    source ≠ target).  Round-synchronous frontier expansion: at round d
    every live path has exactly d+1 vertices, so the simplicity filter is
    one vectorized (paths × 1) membership test on a dense matrix — no
    per-row Python.  One hash-exchange join per round; worst case is the
    reference's own exponential path count, so cutoff bounds the work.
    """
    from networkit_ray.common.exchange import exchange_join

    if source == target:
        raise ValueError("source must differ from target")
    if cutoff < 1:
        raise ValueError("cutoff must be >= 1")

    enbr = edges.map_batches(
        lambda t: pa.table({"head": t["src"], "nxt": t["dst"]}),
        batch_format="pyarrow",
    ).materialize()

    path_type = pa.list_(pa.int64())
    # the path is carried as one int64 column per position (p0..pL) — every
    # live path has the same length within a round, and Arrow hash joins
    # don't accept list payload columns; completed paths convert to a
    # list<int64> column on collection
    frontier = ray.data.from_arrow(
        pa.table(
            {
                "head": pa.array([source], pa.int64()),
                "p0": pa.array([source], pa.int64()),
            }
        )
    )
    done: list[ray.data.Dataset] = []

    for d in range(cutoff):
        joined = exchange_join(frontier, enbr, left_on=["head"])
        pcols = [f"p{i}" for i in range(d + 1)]

        def extend(t: pa.Table, pcols=pcols) -> pa.Table:
            if len(t) == 0 or pcols[0] not in t.column_names:
                cols = {"head": pa.array([], pa.int64())}
                for c in pcols + [f"p{len(pcols)}"]:
                    cols[c] = pa.array([], pa.int64())
                return pa.table(cols)
            mat = np.column_stack(
                [
                    t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                    for c in pcols
                ]
            )
            nxt = t["nxt"].to_numpy(zero_copy_only=False).astype(np.int64)
            ok = ~(mat == nxt[:, None]).any(axis=1)
            cols = {"head": pa.array(nxt[ok])}
            for i, c in enumerate(pcols):
                cols[c] = pa.array(mat[ok, i])
            cols[f"p{len(pcols)}"] = pa.array(nxt[ok])
            return pa.table(cols)

        nxt_paths = joined.map_batches(extend, batch_format="pyarrow").materialize()
        ncols = pcols + [f"p{d + 1}"]

        def collect(t: pa.Table, ncols=ncols) -> pa.Table:
            m = t.filter(pc.equal(t["head"], pa.scalar(target, pa.int64())))
            mat = np.column_stack(
                [
                    m[c].to_numpy(zero_copy_only=False).astype(np.int64)
                    for c in ncols
                ]
            ) if len(m) else np.empty((0, len(ncols)), np.int64)
            return pa.table({"path": pa.array(list(mat), path_type)})

        done.append(
            nxt_paths.map_batches(collect, batch_format="pyarrow")
        )
        frontier = nxt_paths.map_batches(
            lambda t: t.filter(
                pc.not_equal(t["head"], pa.scalar(target, pa.int64()))
            ),
            batch_format="pyarrow",
        ).materialize()
        if frontier.count() == 0:
            break

    out = done[0]
    for dd in done[1:]:
        out = out.union(dd)
    return out
