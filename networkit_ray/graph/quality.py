"""Partition quality measures and partition ops.

- :func:`modularity` — community/Modularity.cpp:26-87 + Coverage.cpp:14-40:
  Q = coverage − Σ_c (vol_c / 2m)², coverage = intra-community edge fraction.
- :func:`assortativity` — correlation/Assortativity.cpp:1-110: Pearson
  correlation of endpoint degrees over the symmetrized edge list.
- :func:`subset_sizes` / :func:`num_subsets` — structures/Partition.hpp:221-250.
- :func:`partition_intersection` — community/PartitionIntersection.cpp:16:
  meet of two partitions, relabeled densely by ascending (label1, label2).

All are Dataset joins + aggregates (no BSP; non-iterative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from networkit_ray.common.exchange import exchange_join
from networkit_ray.graph.build import zip_with_index
from networkit_ray.graph.triangles import undirected_degrees


def _nparts(n: int) -> int:
    return max(2, min(64, n // 500_000 + 2))


def modularity(
    canon: ray.data.Dataset, labels: ray.data.Dataset, num_nodes: int
) -> float:
    """Unweighted modularity of a partition (labels: (v, label)).

    canon = canonical (lo<hi) undirected edge table.
    """
    m = canon.count()
    e1 = exchange_join(canon, labels, left_on=["src"], right_on=["v"])
    e1 = e1.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"], "ls": t["label"]}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, labels, left_on=["dst"], right_on=["v"])
    intra = e2.map_batches(
        lambda t: t.filter(pc.equal(t["ls"], t["label"])), batch_format="pyarrow"
    ).count()

    deg = undirected_degrees(canon)
    dl = exchange_join(deg, labels, left_on=["v"])
    vols = dl.groupby("label").aggregate(Sum("deg", alias_name="vol"))
    two_m = 2.0 * m
    sq = vols.map_batches(
        lambda t: pa.table(
            {"s": pa.array((t["vol"].to_numpy(zero_copy_only=False) / two_m) ** 2)}
        ),
        batch_format="pyarrow",
    )
    expected = sq.sum("s")
    return intra / m - expected


def assortativity(sym_edges: ray.data.Dataset, num_nodes: int) -> float:
    """Degree assortativity: Pearson r of (deg(src), deg(dst)) over the
    symmetrized edge list — matches DuckDB's corr() on the same join."""
    # degree over the symmetrized table = out-degree per src
    from networkit_ray.graph.build import degree_table

    deg = degree_table(sym_edges, key="src").materialize()
    e1 = exchange_join(sym_edges, deg, left_on=["src"], right_on=["v"])
    e1 = e1.map_batches(
        lambda t: pa.table({"dst": t["dst"], "dx": pc.cast(t["deg"], pa.float64())}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, deg, left_on=["dst"], right_on=["v"])

    def moments(t: pa.Table) -> pa.Table:
        x = t["dx"].to_numpy(zero_copy_only=False)
        y = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
                "sxy": pa.array([(x * y).sum()]),
            }
        )

    mom = e2.map_batches(moments, batch_format="pyarrow")
    tot = {c: mom.sum(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    n = tot["n"]
    cov = tot["sxy"] / n - (tot["sx"] / n) * (tot["sy"] / n)
    vx = tot["sxx"] / n - (tot["sx"] / n) ** 2
    vy = tot["syy"] / n - (tot["sy"] / n) ** 2
    return float(cov / np.sqrt(vx * vy))


def subset_sizes(labels: ray.data.Dataset) -> ray.data.Dataset:
    """(label, size) histogram — Partition::subsetSizeMap."""
    return labels.groupby("label").aggregate(Count(alias_name="size"))


def num_subsets(labels: ray.data.Dataset) -> int:
    return subset_sizes(labels).count()


def compact_partition(labels: ray.data.Dataset) -> ray.data.Dataset:
    """Partition::compact — relabel to dense 0..k-1 by ascending old label."""
    distinct = subset_sizes(labels).select_columns(["label"]).sort("label")
    mapping = zip_with_index(distinct, "new_label").materialize()
    out = exchange_join(labels, mapping, left_on=["label"])
    return out.map_batches(
        lambda t: pa.table({"v": t["v"], "label": t["new_label"]}),
        batch_format="pyarrow",
    )


def partition_intersection(
    labels1: ray.data.Dataset, labels2: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """Meet of two partitions: cells = nonempty (l1, l2) pairs, relabeled
    densely in ascending (l1, l2) order. Returns (v, label)."""
    from networkit_ray.common.exchange import exchange_unique

    l2r = labels2.map_batches(
        lambda t: pa.table({"v": t["v"], "label2": t["label"]}), batch_format="pyarrow"
    )
    j = exchange_join(labels1, l2r, left_on=["v"]).materialize()
    pairs = exchange_unique(j.select_columns(["label", "label2"]), ["label", "label2"]).sort(
        ["label", "label2"]
    )
    mapping = zip_with_index(pairs, "new_label").materialize()
    out = exchange_join(j, mapping, left_on=["label", "label2"])
    return out.map_batches(
        lambda t: pa.table({"v": t["v"], "label": t["new_label"]}),
        batch_format="pyarrow",
    )
