"""SCAN structural clustering (cores / borders / outliers).

Reference: sparsification/SCANStructuralSimilarityScore.cpp for the
similarity, plus the SCAN algorithm (Xu et al., KDD'07) the score family
serves.  Normative semantics (mirrored by the DuckDB twin):

    σ(u,v)   = (tri(u,v) + 2) / sqrt((deg(u)+1)·(deg(v)+1))
               (closed-neighborhood overlap: the +2 counts u and v,
               exactly |N[u] ∩ N[v]| for an edge in tri(u,v) triangles)
    ε-edge   = canonical edge with σ ≥ eps
    core(v)  ⇔ (# incident ε-edges) + 1 ≥ mu   (the +1 is v itself)
    clusters = connected components of the core–core ε-subgraph,
               label = min core id (isolated cores keep their own id)
    border w = non-core with ≥1 core ε-neighbor; label = min neighbor
               cluster label
    outlier  = everything else, label −1

Scale shape: one triangle-score pass, one degree join, one ε filter,
hash-min CC on the (much smaller) core–core subgraph, two bounded joins
for borders — no per-row Python, no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

from networkit_ray.common.exchange import exchange_join


def scan_similarity(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, sigma) structural similarity per canonical edge."""
    from networkit_ray.graph.triangles import edge_triangle_scores, undirected_degrees

    tri = edge_triangle_scores(canon, num_nodes)
    deg = undirected_degrees(canon)
    j1 = exchange_join(tri, deg, left_on=["src"], right_on=["v"])
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["degu" if c == "deg" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    j2 = exchange_join(j1, deg, left_on=["dst"], right_on=["v"])

    def sigma(t: pa.Table) -> pa.Table:
        tr = t["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        du = t["degu"].to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src": t["src"].combine_chunks().cast(pa.int64()),
                "dst": t["dst"].combine_chunks().cast(pa.int64()),
                "sigma": pa.array((tr + 2.0) / np.sqrt((du + 1.0) * (dv + 1.0))),
            }
        )

    return j2.map_batches(sigma, batch_format="pyarrow")


def scan_clustering(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    eps: float,
    mu: int,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, label) for every vertex: cluster min-core-id, or −1 outlier."""
    from networkit_ray.graph.components import connected_components

    sim = scan_similarity(canon, num_nodes)
    eedge = sim.map_batches(
        lambda t: t.filter(pc.greater_equal(t["sigma"], eps)).select(["src", "dst"]),
        batch_format="pyarrow",
    ).materialize()

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d])),
                "dst": pa.array(np.concatenate([d, s])),
            }
        )

    esym = eedge.map_batches(both, batch_format="pyarrow").materialize()
    edeg = esym.groupby("src").aggregate(Count(alias_name="nd"))
    cores = (
        edeg.map_batches(
            lambda t: pa.table(
                {"v": t.filter(pc.greater_equal(pc.add(t["nd"], 1), mu))["src"]
                 .combine_chunks()
                 .cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    cc_sub = exchange_join(
        exchange_join(esym, cores, left_on=["src"], right_on=["v"], join_type="left semi"),
        cores,
        left_on=["dst"],
        right_on=["v"],
        join_type="left semi",
    )
    labels_all, info = connected_components(cc_sub, num_nodes, num_parts=num_parts)
    core_lab = exchange_join(
        labels_all, cores, left_on=["v"], right_on=["v"], join_type="left semi"
    ).materialize()

    # borders: non-core ε-neighbors of cores inherit the min cluster label
    nbr_of_core = exchange_join(
        esym, cores, left_on=["src"], right_on=["v"], join_type="left semi"
    )
    with_lab = exchange_join(nbr_of_core, core_lab, left_on=["src"], right_on=["v"])
    border = (
        exchange_join(
            with_lab.select_columns(["dst", "label"]),
            cores,
            left_on=["dst"],
            right_on=["v"],
            join_type="left anti",
        )
        .groupby("dst")
        .aggregate(Min("label", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "v": t["dst"].combine_chunks().cast(pa.int64()),
                    "label": t["label"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    assigned = core_lab.select_columns(["v", "label"]).union(border).materialize()
    allv = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(num_nodes, dtype=np.int64))})
    )
    out = exchange_join(allv, assigned, left_on=["v"], join_type="left outer")

    def fill(t: pa.Table) -> pa.Table:
        if "label" not in t.column_names:
            lab = np.full(len(t), -1, np.int64)
        else:
            lab = t["label"].to_numpy(zero_copy_only=False).astype(np.float64)
            lab = np.where(np.isnan(lab), -1, lab).astype(np.int64)
        return pa.table(
            {"v": t["v"].combine_chunks().cast(pa.int64()), "label": pa.array(lab)}
        )

    return out.map_batches(fill, batch_format="pyarrow"), {
        "eps": eps,
        "mu": mu,
        "cc_info": info,
    }
