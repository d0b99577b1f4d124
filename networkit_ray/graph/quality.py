"""Partition quality measures and partition ops.

- :func:`modularity` — community/Modularity.cpp:26-87 + Coverage.cpp:14-40:
  Q = coverage − Σ_c (vol_c / 2m)², coverage = intra-community edge fraction.
- :func:`coverage` / :func:`edge_cut` — community/Coverage.cpp:14-40,
  community/EdgeCut.cpp: intra-edge fraction / inter-edge count.
- :func:`conductance_table` — community/IsolatedInterpartitionConductance.cpp
  semantics: per cluster C, cut(C) / min(vol(C), 2m − vol(C)).
- :func:`nmi` / :func:`ari` — community/NMIDistance.cpp,
  community/AdjustedRandMeasure.cpp: information-theoretic / pair-counting
  partition similarity from the (l1, l2) confusion counts.
- :func:`assortativity` — correlation/Assortativity.cpp:1-110: Pearson
  correlation of endpoint degrees over the symmetrized edge list.
- :func:`subset_sizes` / :func:`num_subsets` — structures/Partition.hpp:221-250.
- :func:`partition_intersection` — community/PartitionIntersection.cpp:16:
  meet of two partitions, relabeled densely by ascending (label1, label2).

All are Dataset joins + aggregates (no BSP; non-iterative).  The confusion
matrix for NMI/ARI is k1×k2 COUNTS (one groupby over the vertex table), so
the driver-side entropy/combinatorics math is community-count-sized, never
vertex-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

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


def _edge_labels(
    canon: ray.data.Dataset, labels: ray.data.Dataset
) -> ray.data.Dataset:
    """Attach both endpoint labels to each canonical edge → (ls, ld)."""
    e1 = exchange_join(canon, labels, left_on=["src"], right_on=["v"])
    e1 = e1.map_batches(
        lambda t: pa.table({"dst": t["dst"], "ls": t["label"]}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, labels, left_on=["dst"], right_on=["v"])
    return e2.map_batches(
        lambda t: pa.table({"ls": t["ls"], "ld": t["label"]}),
        batch_format="pyarrow",
    )


def coverage(canon: ray.data.Dataset, labels: ray.data.Dataset) -> float:
    """Intra-community edge fraction (Coverage.cpp:14-40)."""
    el = _edge_labels(canon, labels).materialize()
    m = el.count()
    if m == 0:
        return 1.0
    intra = el.map_batches(
        lambda t: t.filter(pc.equal(t["ls"], t["ld"])), batch_format="pyarrow"
    ).count()
    return intra / m


def edge_cut(canon: ray.data.Dataset, labels: ray.data.Dataset) -> int:
    """Number of inter-community edges (community/EdgeCut.cpp)."""
    el = _edge_labels(canon, labels).materialize()
    return el.count() - el.map_batches(
        lambda t: t.filter(pc.equal(t["ls"], t["ld"])), batch_format="pyarrow"
    ).count()


def conductance_table(
    canon: ray.data.Dataset, labels: ray.data.Dataset
) -> ray.data.Dataset:
    """(label, cut, vol, conductance) per cluster.

    conductance(C) = cut(C) / min(vol(C), 2m − vol(C)); clusters whose
    denominator is 0 (empty or whole-graph) get conductance 0 — the
    IsolatedInterpartitionConductance convention.
    """
    m = canon.count()
    el = _edge_labels(canon, labels).materialize()
    inter = el.map_batches(
        lambda t: t.filter(pc.not_equal(t["ls"], t["ld"])), batch_format="pyarrow"
    )
    # each inter edge contributes 1 to BOTH endpoint clusters' cuts
    cuts = (
        inter.map_batches(
            lambda t: pa.table(
                {
                    "label": pa.concat_arrays(
                        [t["ls"].combine_chunks(), t["ld"].combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("label")
        .aggregate(Count(alias_name="cut"))
    )
    deg = undirected_degrees(canon)
    dl = exchange_join(deg, labels, left_on=["v"])
    vols = dl.groupby("label").aggregate(Sum("deg", alias_name="vol")).materialize()
    j = exchange_join(vols, cuts, left_on=["label"], join_type="left outer")

    def final(t: pa.Table) -> pa.Table:
        vol = t["vol"].to_numpy(zero_copy_only=False).astype(np.float64)
        cut = (
            t["cut"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "cut" in t.column_names
            else np.zeros(len(vol))
        )
        cut = np.where(np.isnan(cut), 0.0, cut)
        denom = np.minimum(vol, 2.0 * m - vol)
        cond = np.where(denom > 0, cut / np.maximum(denom, 1.0), 0.0)
        return pa.table(
            {
                "label": t["label"],
                "cut": pa.array(cut.astype(np.int64)),
                "vol": pa.array(vol.astype(np.int64)),
                "conductance": pa.array(cond),
            }
        )

    return j.map_batches(final, batch_format="pyarrow")


def _confusion(labels1: ray.data.Dataset, labels2: ray.data.Dataset):
    """k1×k2 confusion counts + marginals (small driver-side arrays)."""
    l2r = labels2.map_batches(
        lambda t: pa.table({"v": t["v"], "label2": t["label"]}), batch_format="pyarrow"
    )
    j = exchange_join(labels1, l2r, left_on=["v"])
    cells = (
        j.groupby(["label", "label2"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    nij = cells["n"].to_numpy().astype(np.float64)
    ai = cells.groupby("label")["n"].sum().to_numpy().astype(np.float64)
    bj = cells.groupby("label2")["n"].sum().to_numpy().astype(np.float64)
    # per-cell marginals aligned with nij
    am = cells.groupby("label")["n"].transform("sum").to_numpy().astype(np.float64)
    bm = cells.groupby("label2")["n"].transform("sum").to_numpy().astype(np.float64)
    return nij, ai, bj, am, bm


def nmi(labels1: ray.data.Dataset, labels2: ray.data.Dataset, num_nodes: int) -> float:
    """Normalized mutual information, 2·I/(H1+H2) (NMIDistance.cpp returns
    the dissimilarity 1 − NMI; this returns the similarity)."""
    nij, ai, bj, am, bm = _confusion(labels1, labels2)
    n = float(num_nodes)
    info = float(np.sum((nij / n) * np.log((nij * n) / (am * bm))))
    h1 = -float(np.sum((ai / n) * np.log(ai / n)))
    h2 = -float(np.sum((bj / n) * np.log(bj / n)))
    if h1 + h2 == 0.0:
        return 1.0
    return 2.0 * info / (h1 + h2)


def ari(labels1: ray.data.Dataset, labels2: ray.data.Dataset, num_nodes: int) -> float:
    """Adjusted Rand index (AdjustedRandMeasure.cpp returns 1 − ARI)."""

    def c2(x):
        return x * (x - 1.0) / 2.0

    nij, ai, bj, _, _ = _confusion(labels1, labels2)
    n = float(num_nodes)
    sum_ij = float(np.sum(c2(nij)))
    sum_a = float(np.sum(c2(ai)))
    sum_b = float(np.sum(c2(bj)))
    expected = sum_a * sum_b / c2(n)
    max_index = 0.5 * (sum_a + sum_b)
    if max_index == expected:
        return 1.0
    return (sum_ij - expected) / (max_index - expected)


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


def stable_partition_nodes(
    sym_edges: ray.data.Dataset, labels: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(v, stable) — the fork's per-node partition-stability marker
    (community/StablePartitionNodes.cpp:42-70): node u is stable iff its
    own community's weight in its neighborhood is nonzero AND strictly
    greater than every other community's weight there; isolated nodes are
    stable by definition.

    Joins+aggregates only: label onto dst → (src, nlabel) histogram →
    own-vs-best-other comparison per node."""
    nl = exchange_join(
        sym_edges.select_columns(["src", "dst"]),
        labels.map_batches(
            lambda t: pa.table({"v": t["v"], "nl": t["label"]}),
            batch_format="pyarrow",
        ),
        left_on=["dst"],
        right_on=["v"],
    )
    lw = (
        nl.map_batches(
            lambda t: pa.table({"src": t["src"], "nl": t["nl"]}),
            batch_format="pyarrow",
        )
        .groupby(["src", "nl"])
        .aggregate(Count(alias_name="w"))
    )
    own = exchange_join(
        lw,
        labels.map_batches(
            lambda t: pa.table({"v": t["v"], "own": t["label"]}),
            batch_format="pyarrow",
        ),
        left_on=["src"],
        right_on=["v"],
    )

    def fold(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        nlab = t["nl"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        ownl = t["own"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_own = nlab == ownl
        return pa.table(
            {
                "src": pa.array(src),
                "own_w": pa.array(np.where(is_own, w, 0)),
                "other_w": pa.array(np.where(is_own, 0, w)),
            }
        )

    per = (
        own.map_batches(fold, batch_format="pyarrow")
        .groupby("src")
        .aggregate(
            Sum("own_w", alias_name="own_w"), Max("other_w", alias_name="max_other")
        )
    )

    # nodes with no edges never appear above — emit them stable=true via a
    # left outer join from the dense universe (isolated ⇒ stable)
    universe = labels.select_columns(["v"])
    j = exchange_join(
        universe,
        per.map_batches(
            lambda t: pa.table(
                {"v": t["src"], "own_w": t["own_w"], "max_other": t["max_other"]}
            ),
            batch_format="pyarrow",
        ),
        left_on=["v"],
        join_type="left outer",
    )

    def mark(t: pa.Table) -> pa.Table:
        ow = t["own_w"].to_numpy(zero_copy_only=False) if "own_w" in t.column_names else None
        if ow is None:
            return pa.table(
                {"v": t["v"], "stable": pa.array(np.ones(len(t), dtype=bool))}
            )
        ow = np.nan_to_num(ow.astype(np.float64), nan=-1.0)
        mo = np.nan_to_num(
            t["max_other"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
        )
        stable = (ow == -1.0) | ((ow > 0) & (ow > mo))
        return pa.table({"v": t["v"], "stable": pa.array(stable)})

    return j.map_batches(mark, batch_format="pyarrow")


def hub_dominance(
    canon: ray.data.Dataset, labels: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(label, hub_dominance) per community (community/HubDominance.cpp):
    max internal degree over (|C|−1) — how star-like each community is.
    Internal degree = edges to same-community neighbors."""
    el1 = exchange_join(
        canon,
        labels.map_batches(
            lambda t: pa.table({"v": t["v"], "ls": t["label"]}),
            batch_format="pyarrow",
        ),
        left_on=["src"],
        right_on=["v"],
    )
    el = exchange_join(
        el1,
        labels.map_batches(
            lambda t: pa.table({"v": t["v"], "ld": t["label"]}),
            batch_format="pyarrow",
        ),
        left_on=["dst"],
        right_on=["v"],
    )
    intra = el.map_batches(
        lambda t: t.filter(pc.equal(t["ls"], t["ld"])), batch_format="pyarrow"
    )
    ends = intra.map_batches(
        lambda t: pa.table(
            {
                "v": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "label": pa.concat_arrays(
                    [
                        t["ls"].combine_chunks().cast(pa.int64()),
                        t["ld"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Max as _Max

    indeg = ends.groupby(["label", "v"]).aggregate(Count(alias_name="d"))
    maxdeg = indeg.groupby("label").aggregate(_Max("d", alias_name="maxd"))
    sizes = labels.groupby("label").aggregate(Count(alias_name="size"))
    j = exchange_join(sizes, maxdeg, left_on=["label"], join_type="left outer")

    def dom(t: pa.Table) -> pa.Table:
        size = t["size"].to_numpy(zero_copy_only=False).astype(np.float64)
        if "maxd" in t.column_names:
            md = np.nan_to_num(
                t["maxd"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
            )
        else:
            md = np.zeros(len(size))
        hd = np.where(size > 1, md / np.where(size > 1, size - 1, 1.0), 1.0)
        return pa.table({"label": t["label"], "hub_dominance": pa.array(hd)})

    return j.map_batches(dom, batch_format="pyarrow")


def intrapartition_density(
    canon: ray.data.Dataset, labels: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(label, density) per community (community/IntrapartitionDensity.cpp):
    intra-edge count over |C|·(|C|−1)/2; singletons report 1.0 (vacuous)."""
    el1 = exchange_join(
        canon,
        labels.map_batches(
            lambda t: pa.table({"v": t["v"], "ls": t["label"]}),
            batch_format="pyarrow",
        ),
        left_on=["src"],
        right_on=["v"],
    )
    el = exchange_join(
        el1,
        labels.map_batches(
            lambda t: pa.table({"v": t["v"], "ld": t["label"]}),
            batch_format="pyarrow",
        ),
        left_on=["dst"],
        right_on=["v"],
    )
    intra = el.map_batches(
        lambda t: pa.table(
            {"label": t.filter(pc.equal(t["ls"], t["ld"]))["ls"]}
        ),
        batch_format="pyarrow",
    ).groupby("label").aggregate(Count(alias_name="m_in"))
    sizes = labels.groupby("label").aggregate(Count(alias_name="size"))
    j = exchange_join(sizes, intra, left_on=["label"], join_type="left outer")

    def dens(t: pa.Table) -> pa.Table:
        size = t["size"].to_numpy(zero_copy_only=False).astype(np.float64)
        if "m_in" in t.column_names:
            mi = np.nan_to_num(
                t["m_in"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
            )
        else:
            mi = np.zeros(len(size))
        pairs = size * (size - 1.0) / 2.0
        d = np.where(pairs > 0, mi / np.where(pairs > 0, pairs, 1.0), 1.0)
        return pa.table({"label": t["label"], "density": pa.array(d)})

    return j.map_batches(dens, batch_format="pyarrow")


def _c2_sums(labels1: ray.data.Dataset, labels2: ray.data.Dataset):
    """(Σc2(intersection cells), Σc2(zeta sizes), Σc2(eta sizes))."""

    def c2(x):
        return x * (x - 1.0) / 2.0

    nij, ai, bj, _, _ = _confusion(labels1, labels2)
    return float(np.sum(c2(nij))), float(np.sum(c2(ai))), float(np.sum(c2(bj)))


def jaccard_measure(
    labels1: ray.data.Dataset, labels2: ray.data.Dataset, num_nodes: int
) -> float:
    """Jaccard dissimilarity of two partitions (community/JaccardMeasure.cpp:
    1 − 2·s11 / (n(n−1) − 2·s00) over node pairs, via cluster-size sums)."""
    si, sz, se = _c2_sums(labels1, labels2)
    n = float(num_nodes)
    s11 = si
    s00 = n * (n - 1.0) / 2.0 + si - (sz + se)
    divisor = n * (n - 1.0) - 2.0 * s00
    if divisor <= 0:
        return 0.0
    return 1.0 - (2.0 * s11) / divisor


def node_structural_rand(
    labels1: ray.data.Dataset, labels2: ray.data.Dataset, num_nodes: int
) -> float:
    """Node-structural Rand dissimilarity
    (community/NodeStructuralRandMeasure.cpp: 1 − 2A/(n(n−1)) with
    A = n(n−1)/2 + 2·Σc2(cells) − Σc2(zeta) − Σc2(eta))."""
    si, sz, se = _c2_sums(labels1, labels2)
    n = float(num_nodes)
    a = n * (n - 1.0) / 2.0 + 2.0 * si - (sz + se)
    return 1.0 - 2.0 * a / (n * (n - 1.0))


def graph_structural_rand(
    canon: ray.data.Dataset, labels1: ray.data.Dataset, labels2: ray.data.Dataset
) -> float:
    """Graph-structural Rand dissimilarity
    (community/GraphStructuralRandMeasure.cpp): 1 − (e11 + e00)/m over the
    undirected edge set, where e11 = connected pairs on which both
    partitions agree, e00 = pairs on which both disagree."""
    l2r = labels2.map_batches(
        lambda t: pa.table({"v": t["v"], "label2": t["label"]}), batch_format="pyarrow"
    )
    both = exchange_join(labels1, l2r, left_on=["v"])
    e1 = exchange_join(canon, both, left_on=["src"], right_on=["v"])
    e1 = e1.map_batches(
        lambda t: pa.table({"dst": t["dst"], "l1s": t["label"], "l2s": t["label2"]}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, both, left_on=["dst"], right_on=["v"])

    def partial(t: pa.Table) -> pa.Table:
        a1 = pc.equal(t["l1s"], t["label"]).to_numpy(zero_copy_only=False)
        a2 = pc.equal(t["l2s"], t["label2"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "e11": pa.array([int(np.sum(a1 & a2))], pa.int64()),
                "e00": pa.array([int(np.sum(~a1 & ~a2))], pa.int64()),
                "m": pa.array([len(t)], pa.int64()),
            }
        )

    agg = e2.map_batches(partial, batch_format="pyarrow")
    tot = agg.sum(["e11", "e00", "m"])
    m = tot["sum(m)"]
    if m == 0:
        raise ValueError("graph-structural rand measure undefined on an edgeless graph")
    return 1.0 - (tot["sum(e11)"] + tot["sum(e00)"]) / m


def partition_fragmentation(
    labels: ray.data.Dataset, cc_labels: ray.data.Dataset
) -> ray.data.Dataset:
    """(label, fragmentation) per cluster of ``labels``
    (community/PartitionFragmentation.cpp): 1 − (largest connected piece of
    the cluster)/(cluster size), where pieces come from intersecting the
    partition with connected components."""
    ccr = cc_labels.map_batches(
        lambda t: pa.table({"v": t["v"], "cc": t["label"]}), batch_format="pyarrow"
    )
    j = exchange_join(labels, ccr, left_on=["v"])
    cells = j.groupby(["label", "cc"]).aggregate(Count(alias_name="n"))
    per = cells.groupby("label").aggregate(
        Max("n", alias_name="biggest"), Sum("n", alias_name="size")
    )

    def frag(t: pa.Table) -> pa.Table:
        big = t["biggest"].to_numpy(zero_copy_only=False).astype(np.float64)
        size = t["size"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"label": t["label"], "fragmentation": pa.array(1.0 - big / size)}
        )

    return per.map_batches(frag, batch_format="pyarrow")


def expansion_table(
    canon: ray.data.Dataset, labels: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(label, cut, size, expansion) per cluster
    (community/IsolatedInterpartitionExpansion.cpp): expansion(C) =
    cut(C) / min(|C|, n − |C|); a whole-graph cluster (denominator 0)
    gets 0 — same degenerate-cluster convention as conductance_table."""
    el = _edge_labels(canon, labels)
    inter = el.map_batches(
        lambda t: t.filter(pc.not_equal(t["ls"], t["ld"])), batch_format="pyarrow"
    )
    cuts = (
        inter.map_batches(
            lambda t: pa.table(
                {
                    "label": pa.concat_arrays(
                        [t["ls"].combine_chunks(), t["ld"].combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("label")
        .aggregate(Count(alias_name="cut"))
    )
    sizes = labels.groupby("label").aggregate(Count(alias_name="size")).materialize()
    j = exchange_join(sizes, cuts, left_on=["label"], join_type="left outer")

    def final(t: pa.Table) -> pa.Table:
        size = t["size"].to_numpy(zero_copy_only=False).astype(np.float64)
        cut = (
            t["cut"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "cut" in t.column_names
            else np.zeros(len(size))
        )
        cut = np.where(np.isnan(cut), 0.0, cut)
        denom = np.minimum(size, float(num_nodes) - size)
        exp = np.where(denom > 0, cut / np.maximum(denom, 1.0), 0.0)
        return pa.table(
            {
                "label": t["label"],
                "cut": pa.array(cut.astype(np.int64)),
                "size": pa.array(size.astype(np.int64)),
                "expansion": pa.array(exp),
            }
        )

    return j.map_batches(final, batch_format="pyarrow")


def map_equation(canon: ray.data.Dataset, labels: ray.data.Dataset) -> float:
    """Two-level map-equation codelength of a partition (nats).

    Reference: community/LouvainMapEquation.cpp (mapEquation():
    ``plogp(totalCut) − 2·Σ plogp(cut_i) + Σ plogp(cut_i + vol_i) −
    Σ plogp(vol_i)`` with p = w / totalVolume, totalVolume = 2m).  The
    optimizer's objective exposed as a first-class partition measure —
    per-cluster cuts and volumes come from the same join/aggregate as
    :func:`conductance_table`, so this is one small driver-side reduction
    over a cluster-count-sized table.
    """
    m = canon.count()
    tot_vol = 2.0 * m
    if tot_vol == 0:
        return 0.0
    tbl = conductance_table(canon, labels).to_pandas()
    cut = tbl["cut"].to_numpy().astype(np.float64)
    vol = tbl["vol"].to_numpy().astype(np.float64)

    def plogp(w):
        w = np.asarray(w, np.float64)
        p = w / tot_vol
        return np.where(w > 0, p * np.log(np.where(w > 0, p, 1.0)), 0.0)

    total_cut = float(cut.sum())
    return float(
        plogp(total_cut)
        - 2.0 * plogp(cut).sum()
        + plogp(cut + vol).sum()
        - plogp(vol).sum()
    )


def hashing_overlapper(
    labels1: ray.data.Dataset, labels2: ray.data.Dataset
) -> ray.data.Dataset:
    """(v, label) — hash-combined partition intersection
    (overlap/HashingOverlapper.cpp, two-partition case): combined key =
    ((l1 XOR 0xffff) << 16) | (l2 XOR 0xffff), hashed (splitmix64 standing
    in for the reference's djb2 — any mixing hash, the reference compacts
    afterwards) and compacted to dense labels ordered by hash value.

    Scale shape: one hash join + a vectorized key map; the compaction map
    is cluster-product-sized (small), built once on the driver.
    """
    from networkit_ray.sources.synth import _splitmix64

    l2r = labels2.map_batches(
        lambda t: pa.table({"v": t["v"], "label2": t["label"]}), batch_format="pyarrow"
    )
    j = exchange_join(labels1, l2r, left_on=["v"]).materialize()

    def key(t: pa.Table) -> pa.Table:
        l1 = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        l2 = t["label2"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = ((l1 ^ 0xFFFF) << 16) | (l2 ^ 0xFFFF)
        # mask to 63 bits so the value is int64-safe end to end and the
        # SQL twin's ordering (mod 2^63) matches exactly
        h = (_splitmix64(k.astype(np.uint64)) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(
            np.int64
        )
        return pa.table({"v": t["v"], "h": pa.array(h)})

    hashed = j.map_batches(key, batch_format="pyarrow").materialize()
    distinct = np.sort(np.array(hashed.unique("h"), dtype=np.int64))
    rank = {int(h): i for i, h in enumerate(distinct)}

    def compact(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        lab = np.array([rank[int(x)] for x in h], dtype=np.int64)
        return pa.table({"v": t["v"], "label": pa.array(lab)})

    return hashed.map_batches(compact, batch_format="pyarrow")
