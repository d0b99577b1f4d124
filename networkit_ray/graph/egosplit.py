"""EgoSplitting overlapping communities (persona-graph method).

Reference: community/EgoSplitting.cpp (Epasto–Lattanzi–Paes Leme, KDD'17).
Phases, re-expressed for Datasets + the CC kernel:

1. EGO-NET PARTITION — the ego-net of u is the subgraph induced on N(u);
   its edges are exactly the triangle rows through u, so one triangle pass
   feeds every ego-net (no per-vertex BFS).  Each ego-net is split into
   connected components (the reference's default local clusterer), part
   representative = min member id.
2. PERSONAS — persona (u, part); edge (u,v) becomes a persona edge between
   u's persona containing v and v's persona containing u.  Persona key is
   packed u·2³² + rep (ids < 2³² here; a hash64 key through compact_ids is
   the same path at web scale, and compaction is applied either way).
3. PERSONA PARTITION — hash-min CC on the compacted persona graph;
   community id = min packed persona key in the component (deterministic).
4. MEMBERSHIP — vertex u belongs to every community its personas landed
   in: the output (v, community) is OVERLAPPING (≥1 row per vertex).

Scale shape: one triangle enumeration, per-ego map_groups components
(ego-nets are degree-bounded — the documented bounded-group contract),
two persona joins, one CC run on a graph no larger than 2m personas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from networkit_ray.common.exchange import exchange_join

_PACK = np.int64(1) << np.int64(32)


def _ego_parts(canon: ray.data.Dataset, sym: ray.data.Dataset, num_nodes: int):
    """(ego, nbr, rep) — each neighbor's component representative within
    the ego-net of ``ego``."""
    import pandas as pd

    from networkit_ray.graph.triangles import oriented_edges, triangle_corners, undirected_degrees

    deg = undirected_degrees(canon)
    tri = triangle_corners(oriented_edges(canon, deg, num_nodes))

    def explode(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["corner"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ego": pa.array(np.concatenate([x, y, c])),
                "a": pa.array(np.concatenate([y, x, x])),
                "b": pa.array(np.concatenate([c, c, y])),
            }
        )

    pairs = tri.map_batches(explode, batch_format="pyarrow")
    singles = sym.map_batches(
        lambda t: pa.table(
            {
                "ego": t["src"].combine_chunks().cast(pa.int64()),
                "a": t["dst"].combine_chunks().cast(pa.int64()),
                "b": pa.array(np.full(len(t), -1, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def components(df: pd.DataFrame) -> pd.DataFrame:
        from networkit_ray.common.guards import check_group_rows

        check_group_rows(
            len(df), 1 << 24, "egosplit.components",
            "an ego net with >2^24 wedge rows means a mega-hub ego; cap "
            "ego degree (sample neighbors) before ego splitting.",
        )
        ego = int(df["ego"].iloc[0])
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        members = np.unique(np.concatenate([a, b[b >= 0]]))
        idx = {int(v): i for i, v in enumerate(members)}
        parent = np.arange(len(members))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for u, w in zip(a[b >= 0], b[b >= 0]):
            ri, rj = find(idx[int(u)]), find(idx[int(w)])
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        root = np.array([find(i) for i in range(len(members))])
        rep = np.full(len(members), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(rep, root, members)
        return pd.DataFrame(
            {"ego": ego, "nbr": members, "rep": rep[root]}
        )

    return (
        pairs.union(singles)
        .groupby("ego")
        .map_groups(components, batch_format="pandas")
    )


def ego_splitting(
    canon: ray.data.Dataset,
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, community) overlapping memberships; ≥1 row per non-isolated v."""
    from networkit_ray.graph.build import compact_ids
    from networkit_ray.graph.components import connected_components

    M = _ego_parts(canon, sym, num_nodes).materialize()

    j1 = exchange_join(
        canon.select_columns(["src", "dst"]), M,
        left_on=["src", "dst"], right_on=["ego", "nbr"],
    )
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["rep_s" if c == "rep" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    j2 = exchange_join(j1, M, left_on=["dst", "src"], right_on=["ego", "nbr"])

    def persona_edge(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        rs = t["rep_s"].to_numpy(zero_copy_only=False).astype(np.int64)
        rd = t["rep"].to_numpy(zero_copy_only=False).astype(np.int64)
        p1 = s * _PACK + rs
        p2 = d * _PACK + rd
        return pa.table(
            {
                "src": pa.array(np.minimum(p1, p2)),
                "dst": pa.array(np.maximum(p1, p2)),
            }
        )

    pedges = j2.map_batches(persona_edge, batch_format="pyarrow")
    mapping, dense = compact_ids(pedges, num_parts=num_parts)
    mapping = mapping.map_batches(
        lambda t: pa.table(
            {
                "packed": t["v"].combine_chunks().cast(pa.int64()),
                "idx": t["idx"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_personas = mapping.count()

    from networkit_ray.graph.build import symmetrize

    labels, cc_info = connected_components(
        symmetrize(dense).materialize(), n_personas, num_parts=num_parts
    )
    lab = exchange_join(labels, mapping, left_on=["v"], right_on=["idx"])
    # community id = min packed persona key in the component
    comm = lab.groupby("label").aggregate(Min("packed", alias_name="community"))
    lab2 = exchange_join(lab, comm, left_on=["label"])

    member_edges = lab2.map_batches(
        lambda t: pa.table(
            {
                "v": pa.array(
                    (
                        t["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
                        // int(_PACK)
                    )
                ),
                "community": t["community"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    # singleton personas (no persona edge) are their own community
    all_personas = M.map_batches(
        lambda t: pa.table(
            {
                "packed": pa.array(
                    t["ego"].to_numpy(zero_copy_only=False).astype(np.int64)
                    * int(_PACK)
                    + t["rep"].to_numpy(zero_copy_only=False).astype(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
    )
    from networkit_ray.common.exchange import exchange_unique

    all_personas = exchange_unique(all_personas, ["packed"])
    lonely = exchange_join(
        all_personas, mapping, left_on=["packed"], join_type="left anti"
    ).map_batches(
        lambda t: pa.table(
            {
                "v": pa.array(
                    t["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
                    // int(_PACK)
                ),
                "community": t["packed"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = exchange_unique(member_edges.union(lonely), ["v", "community"])
    return out, {"n_personas": n_personas, "cc": cc_info}
