"""k-clique counting and maximal-clique enumeration.

Reference family: networkit/cpp/clique/MaximalCliques.cpp (degeneracy-order
Bron-Kerbosch) — re-expressed for Ray Data as joins over the same
(degree, id)-rank orientation that drives triangles.py:

- 4-cliques: every 4-clique {a,b,c,d} in rank order contains the two
  triangles (a;b,c) and (a;b,d) sharing the oriented pair (a,b) plus the
  closing edge (c,d).  So: self-join the triangle table (x, y, corner) on
  (corner, x) → candidate pairs (y1, y2), then a semi-join against the
  oriented edge set on (y1, y2) keeps exactly the rank-ordered closures —
  each 4-clique counted once.  Shuffle keys: (corner, x) for the pair
  expansion, (y1, y2) for the closure.  Skew note: the pair expansion is
  quadratic in triangles-per-oriented-edge; the (deg,id) orientation bounds
  out-degrees at O(sqrt(m)) which keeps common-neighbor counts of an
  oriented pair far below raw hub degrees on web graphs.

- maximal cliques: each maximal clique K is discovered at its lowest-rank
  member v (K \\ {v} is a clique inside N+(v)); per-corner Bron-Kerbosch
  over the oriented out-neighborhood enumerates candidates, and a global
  maximality filter drops K when some vertex outside K is adjacent to all
  of K (checked with one explode + sym-edge join + per-(clique, nbr)
  count == |K|).  Candidates are generated per hash partition of the
  corner (same exchange as wedge generation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from networkit_ray.common.exchange import exchange_join, partition_refs
from networkit_ray.graph.triangles import (
    oriented_edges,
    triangle_corners,
    undirected_degrees,
)


def four_clique_count(canon: ray.data.Dataset, num_nodes: int) -> int:
    """Number of 4-cliques in the canonical (lo<hi) undirected edge table."""
    deg = undirected_degrees(canon).materialize()
    oriented = oriented_edges(canon, deg, num_nodes).materialize()
    tri = triangle_corners(oriented).materialize()
    if tri.count() == 0:
        return 0
    right = tri.map_batches(
        lambda t: pa.table({"corner2": t["corner"], "x2": t["x"], "y2": t["y"]}),
        batch_format="pyarrow",
    )
    pairs = exchange_join(
        tri, right, left_on=["corner", "x"], right_on=["corner2", "x2"]
    )

    def ordered(t: pa.Table) -> pa.Table:
        y1 = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = t["y2"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = y1 != y2
        return pa.table({"y1": pa.array(y1[keep]), "y2": pa.array(y2[keep])})

    # both orders of each {c, d} pair survive `ordered`; the oriented-edge
    # semi-join keeps only the rank-ordered one, so each 4-clique counts once
    cand = pairs.map_batches(ordered, batch_format="pyarrow")
    closed = exchange_join(
        cand,
        oriented.select_columns(["a", "b"]),
        left_on=["y1", "y2"],
        right_on=["a", "b"],
        join_type="left semi",
    )
    return closed.count()


def clique_counts(canon: ray.data.Dataset, num_nodes: int) -> dict:
    """{'k3': triangle count, 'k4': 4-clique count} over the canonical table."""
    deg = undirected_degrees(canon).materialize()
    oriented = oriented_edges(canon, deg, num_nodes).materialize()
    tri = triangle_corners(oriented).materialize()
    k3 = tri.count()
    if k3 == 0:
        return {"k3": 0, "k4": 0}
    right = tri.map_batches(
        lambda t: pa.table({"corner2": t["corner"], "x2": t["x"], "y2": t["y"]}),
        batch_format="pyarrow",
    )
    pairs = exchange_join(
        tri, right, left_on=["corner", "x"], right_on=["corner2", "x2"]
    )

    def ordered(t: pa.Table) -> pa.Table:
        y1 = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = t["y2"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = y1 != y2
        return pa.table({"y1": pa.array(y1[keep]), "y2": pa.array(y2[keep])})

    cand = pairs.map_batches(ordered, batch_format="pyarrow")
    k4 = exchange_join(
        cand,
        oriented.select_columns(["a", "b"]),
        left_on=["y1", "y2"],
        right_on=["a", "b"],
        join_type="left semi",
    ).count()
    return {"k3": k3, "k4": k4}


def _bk_pivot(adj: dict, R: list, P: set, X: set, out: list) -> None:
    """Classic Bron-Kerbosch with pivoting over a python adjacency dict.

    Runs inside a remote task on ONE corner's oriented out-neighborhood
    (size O(sqrt(m)) by the orientation bound), never on the full graph.
    """
    if not P and not X:
        out.append(sorted(R))
        return
    pivot = max(P | X, key=lambda u: len(adj[u] & P))
    for v in sorted(P - adj[pivot]):
        _bk_pivot(adj, R + [v], P & adj[v], X & adj[v], out)
        P = P - {v}
        X = X | {v}


@ray.remote
def _corner_cliques(part_id, *tables):
    """Candidate cliques for one hash partition of corners.

    Input rows are oriented edges (a, b, rb) grouped so that every
    out-edge of each corner in this partition is present, PLUS the
    oriented edges needed to induce the subgraph among out-neighbors are
    looked up from the same rows (neighborhood closure is provided by the
    caller shipping the full oriented edge set's relevant slices: edges
    whose source is an out-neighbor of a local corner are routed here by
    a second exchange — see maximal_cliques).
    """
    ts = [t for t in tables if t is not None]
    if not ts:
        return None
    t = pa.concat_tables(ts)
    a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    corner_mask = t["is_corner"].to_numpy(zero_copy_only=False).astype(bool)
    # adjacency among ALL vertices seen in this partition's slice
    adj: dict = {}
    for u, v in zip(a, b):
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    out_adj: dict = {}
    for u, v in zip(a[corner_mask], b[corner_mask]):
        out_adj.setdefault(int(u), set()).add(int(v))
    rows: list = []
    for u in sorted(out_adj):
        out_n = out_adj[u]
        sub = {v: (adj.get(v, set()) & out_n) for v in out_n}
        found: list = []
        _bk_pivot(sub, [u], set(out_n), set(), found)
        rows.extend(found)
    if not rows:
        return None
    # globally unique id: partition index in the high bits, local counter
    # below (< 2^40 candidates per partition task)
    gid = (np.int64(part_id) << np.int64(40)) + np.arange(len(rows), dtype=np.int64)
    sizes = np.array([len(r) for r in rows], dtype=np.int64)
    member = np.concatenate([np.asarray(r, dtype=np.int64) for r in rows])
    return pa.table(
        {
            "clique_id": pa.array(np.repeat(gid, sizes)),
            "member": pa.array(member),
            "size": pa.array(np.repeat(sizes, sizes)),
        }
    )


def maximal_cliques(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(clique_id, member) rows of all maximal cliques (size >= 2).

    Two-phase: per-corner Bron-Kerbosch over oriented out-neighborhoods
    (candidates = cliques whose lowest-rank member is the corner, maximal
    within {corner} u N+(corner)), then a global maximality filter: a
    candidate K dies iff some vertex x (necessarily lower-rank than some
    member) is adjacent to ALL of K — detected by joining members against
    the symmetric edge table and counting per-(candidate, x) hits == |K|.
    """
    deg = undirected_degrees(canon).materialize()
    oriented = oriented_edges(canon, deg, num_nodes).materialize()
    P = max(2, min(64, int(ray.cluster_resources().get("CPU", 8))))

    # route every oriented edge (a, b) to partition(hash(a)) flagged as a
    # corner edge, and ALSO to the partitions of each of a's in-corners —
    # approximated by routing (a, b) additionally by hash of NOTHING: we
    # instead ship the closure edges by a join: edges (a, b) where a is an
    # out-neighbor of some corner c are exactly edges whose source appears
    # as a dst of the corner's out-edges.  One exchange join computes the
    # (corner_part, a, b) routing table.
    eo = oriented.select_columns(["a", "b"]).materialize()

    def flag_corner(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "route": t["a"],
                "is_corner": pa.array(np.ones(len(t), dtype=bool)),
            }
        )

    corner_rows = eo.map_batches(flag_corner, batch_format="pyarrow")

    # closure rows: for each oriented edge (corner, nbr) route every
    # out-edge of nbr to corner's partition (so the induced subgraph on
    # N+(corner) is local).  join eo (as nbr out-edges) with eo (as corner
    # edges) on source == corner's dst.
    nbr_edges = exchange_join(
        eo.map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"], "join_v": t["a"]}),
            batch_format="pyarrow",
        ),
        eo.map_batches(
            lambda t: pa.table({"c0": t["a"], "n0": t["b"]}), batch_format="pyarrow"
        ),
        left_on=["join_v"],
        right_on=["n0"],
    )
    closure_rows = nbr_edges.map_batches(
        lambda t: pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "route": t["c0"],
                "is_corner": pa.array(np.zeros(len(t), dtype=bool)),
            }
        ),
        batch_format="pyarrow",
    )
    routed = corner_rows.union(closure_rows)
    slices = partition_refs(routed, ["route"], P)
    refs = [_corner_cliques.remote(p, *[s[p] for s in slices]) for p in range(P)]
    keep = [r for r, t in zip(refs, ray.get(refs)) if t is not None]
    if not keep:
        return ray.data.from_arrow(
            pa.schema([("clique_id", pa.int64()), ("member", pa.int64())]).empty_table()
        )
    cand = ray.data.from_arrow_refs(keep).materialize()

    # maximality filter: explode member -> join sym edges -> per (clique, nbr)
    # count; a clique with any nbr-count == size has an extender -> drop.
    sym = canon.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "w": pa.concat_arrays(
                    [
                        t["dst"].combine_chunks().cast(pa.int64()),
                        t["src"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    nb = exchange_join(cand, sym, left_on=["member"], right_on=["u"])
    counts = (
        nb.map_batches(
            lambda t: pa.table(
                {"clique_id": t["clique_id"], "x": t["w"], "size": t["size"]}
            ),
            batch_format="pyarrow",
        )
        .groupby(["clique_id", "x"])
        .aggregate(Count(alias_name="hits"), )
    )
    sizes = (
        cand.select_columns(["clique_id", "size"])
        .groupby("clique_id")
        .max("size")
    )
    full = exchange_join(counts, sizes, left_on=["clique_id"])

    def extenders(t: pa.Table) -> pa.Table:
        hits = t["hits"].to_numpy(zero_copy_only=False).astype(np.int64)
        size = t["max(size)"].to_numpy(zero_copy_only=False).astype(np.int64)
        bad = hits == size
        return pa.table({"clique_id": t["clique_id"].filter(pa.array(bad))})

    dead = full.map_batches(extenders, batch_format="pyarrow")
    alive = exchange_join(
        cand.select_columns(["clique_id", "member"]),
        dead,
        left_on=["clique_id"],
        join_type="left anti",
    )
    return alive
