"""Driver contract: entry() smoke, queries() battery, oracle_sql() DuckDB twins.

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in networkit_ray) calls ray.init()/ray.shutdown().

Every queries() entry is an operator/pipeline from SURVEY.md §2 re-expressed
Ray-Data-first; each oracle_sql() entry is the ANSI-SQL equivalent DuckDB
runs on the same parquet views (region nation customer supplier part orders
lineitem events documents embeddings).  Column names and rounding are pinned
identically on both sides (DuckDB ROUND = half-away; engine uses
common.hashing.round_half_away).  Iterative kernels use FIXED iteration
counts here so the SQL twin (chained CTE levels) is exact; convergence-driven
variants are exercised in tests/ and bench.py.

Queries without an oracle entry (PLP, MinHash/SimHash/embedding near-dup,
LSH ANN, multimodal, R-MAT) are non-SQL-expressible (iterative argmax
schedules, hash-sketch families, stubs); the driver records rows-only checks
for them.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

PR_ITERS = 30  # fixed power-iteration count shared by engine and SQL oracle
HITS_ITERS = 20  # fixed HITS iteration count shared by engine and SQL oracle
WARM_ITERS = 10  # fixed warm-phase iteration count (warm_pagerank/warm_katz)


# ---------------------------------------------------------------- helpers
# The driver runs each query independently; the derived graph variants are
# shared inputs, so memoize them MATERIALIZED per sf_dir (pinned in the
# session's object store — the same reuse pattern the BSP engine applies to
# CSR blocks).  Keyed on sf_dir only; the derivation is deterministic.
_GRAPH_CACHE: dict = {}


def _derived(sf_dir):
    key = ("derived", sf_dir)
    if key not in _GRAPH_CACHE:
        from networkit_ray.sources.derive import derived_edges

        edges, n = derived_edges(sf_dir)
        _GRAPH_CACHE[key] = (edges.materialize(), n)
    return _GRAPH_CACHE[key]


def _sym(sf_dir):
    key = ("sym", sf_dir)
    if key not in _GRAPH_CACHE:
        from networkit_ray.graph.build import symmetrize

        edges, n = _derived(sf_dir)
        _GRAPH_CACHE[key] = (symmetrize(edges).materialize(), n)
    return _GRAPH_CACHE[key]


def _canon(sf_dir):
    key = ("canon", sf_dir)
    if key not in _GRAPH_CACHE:
        from networkit_ray.graph.build import canonicalize

        edges, n = _derived(sf_dir)
        _GRAPH_CACHE[key] = (canonicalize(edges).materialize(), n)
    return _GRAPH_CACHE[key]


def _cc_labels(sf_dir):
    key = ("cc", sf_dir)
    if key not in _GRAPH_CACHE:
        from networkit_ray.graph.components import connected_components

        sym, n = _sym(sf_dir)
        labels, _ = connected_components(sym, n)
        _GRAPH_CACHE[key] = (labels.materialize(), n)
    return _GRAPH_CACHE[key]


def _docs(sf_dir, columns=None):
    """documents table, column-pruned at the read: pass the minimal
    ``columns`` per query so only needed columns leave storage."""
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _round_col(ds, col, decimals):
    from networkit_ray.common.hashing import round_half_away

    def f(t: pa.Table) -> pa.Table:
        vals = round_half_away(t[col].to_numpy(zero_copy_only=False), decimals)
        i = t.column_names.index(col)
        return t.set_column(i, col, pa.array(vals))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------- queries
def q_edge_table(sf_dir):
    edges, _ = _derived(sf_dir)
    return edges


def q_edge_table_sym(sf_dir):
    sym, _ = _sym(sf_dir)
    return sym


def q_degree_table(sf_dir):
    from networkit_ray.graph.build import degree_table

    edges, _ = _derived(sf_dir)
    return degree_table(edges, key="src", out_name="deg")


def q_in_degree_table(sf_dir):
    from networkit_ray.graph.build import degree_table

    edges, _ = _derived(sf_dir)
    return degree_table(edges, key="dst", out_name="deg")


def q_max_degree(sf_dir):
    from networkit_ray.graph.build import max_degree

    edges, _ = _derived(sf_dir)
    return pa.table({"max_deg": pa.array([max_degree(edges, key="src")], pa.int64())})


def q_graph_stats(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.build import graph_stats

    edges, n = _derived(sf_dir)
    s = graph_stats(edges, n, directed=True)
    return pa.table(
        {
            "n": pa.array([s["n"]], pa.int64()),
            "m": pa.array([s["m"]], pa.int64()),
            "density": pa.array(round_half_away([s["density"]], 8)),
            "volume": pa.array([s["volume"]], pa.int64()),
        }
    )


def q_transpose(sf_dir):
    from networkit_ray.graph.build import transpose

    edges, _ = _derived(sf_dir)
    return transpose(edges)


def q_subgraph(sf_dir):
    from networkit_ray.graph.build import subgraph

    edges, n = _derived(sf_dir)
    half = n // 2
    return subgraph(edges, lambda v: v < half)


def q_compact_ids(sf_dir):
    from networkit_ray.graph.build import compact_ids

    edges, _ = _derived(sf_dir)
    mapping, _ = compact_ids(edges)
    return mapping


def q_pagerank(sf_dir):
    from networkit_ray.graph.pagerank import pagerank

    edges, n = _derived(sf_dir)
    scores, _ = pagerank(edges, n, tol=0.0, max_iterations=PR_ITERS)
    return _round_col(scores, "score", 8)


def q_pagerank_topk(sf_dir):
    import pandas as pd

    from networkit_ray.graph.pagerank import pagerank

    edges, n = _derived(sf_dir)
    scores, _ = pagerank(edges, n, tol=0.0, max_iterations=PR_ITERS)
    top = (
        _round_col(scores, "score", 8)
        .sort(["score", "v"], descending=[True, False])
        .limit(10)
    )
    df = top.to_pandas()
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["rank", "v", "score"]]


def q_connected_components(sf_dir):
    labels, _ = _cc_labels(sf_dir)
    return labels


def q_cc_sizes(sf_dir):
    from networkit_ray.graph.quality import subset_sizes

    labels, _ = _cc_labels(sf_dir)
    return subset_sizes(labels)


def q_num_components(sf_dir):
    from networkit_ray.graph.quality import num_subsets

    labels, _ = _cc_labels(sf_dir)
    return pa.table({"n_components": pa.array([num_subsets(labels)], pa.int64())})


def q_scc(sf_dir):
    from networkit_ray.graph.scc import strongly_connected_components

    edges, n = _derived(sf_dir)
    labels, _ = strongly_connected_components(edges, n)
    return labels


def q_wcc(sf_dir):
    from networkit_ray.graph.scc import weakly_connected_components

    edges, n = _derived(sf_dir)
    labels, _ = weakly_connected_components(edges, n)
    return labels


def q_plp_communities(sf_dir):
    from networkit_ray.graph.plp import plp

    sym, n = _sym(sf_dir)
    labels, _ = plp(sym, n, update_threshold=0, max_iterations=25)
    return labels


def q_louvain(sf_dir):
    """community/PLM.cpp analog (parity-gated synchronous local moving +
    coarsening); oracle-exact — full multi-level replay in SQL
    (_louvain_parts: unrolled move rounds with the best-Q̂ stop fold,
    coarsening, min-gain-gated prolongation); parity/determinism tests in
    tests/test_louvain.py."""
    from networkit_ray.graph.louvain import louvain

    sym, n = _sym(sf_dir)
    labels, _ = louvain(sym, n)
    return labels


def q_ego_splitting(sf_dir):
    """community/EgoSplitting.cpp analog (persona-graph overlapping
    communities); oracle-exact — all-integer replay (_egosplit_sql:
    per-ego min-label closures, packed persona keys, persona-graph
    closure); planted-structure oracles in tests/test_egosplit.py."""
    from networkit_ray.graph.egosplit import ego_splitting

    canon, n = _canon(sf_dir)
    sym, _ = _sym(sf_dir)
    out, _info = ego_splitting(canon, sym, n)
    return out.sort(["v", "community"])


def q_leiden_refine(sf_dir):
    """community/ParallelLeiden.cpp refinement-phase analog on the
    louvain() output; oracle-exact — the louvain replay's labels feed a
    global singleton-init refinement replay with per-parent freeze
    (_leiden_refine_sql); split/boundary/determinism oracles in
    tests/test_louvain.py::TestRefineCommunities."""
    from networkit_ray.graph.louvain import louvain, refine_communities

    sym, n = _sym(sf_dir)
    labels, _ = louvain(sym, n)
    out, _ = refine_communities(sym, n, labels.materialize())
    return out.sort("v")


def q_louvain_modularity(sf_dir):
    """Modularity of the louvain() partition; oracle-exact — the louvain
    replay's labels through the same ROUND-8 modularity formula the
    `modularity` twin uses (_louvain_modularity_sql)."""
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.louvain import louvain
    from networkit_ray.graph.quality import modularity

    sym, n = _sym(sf_dir)
    canon, _ = _canon(sf_dir)
    labels, _ = louvain(sym, n)
    q = modularity(canon, labels, n)
    return pa.table({"modularity": pa.array(round_half_away([q], 8))})


def q_modularity(sf_dir):
    import ray.data

    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import modularity

    canon, n = _canon(sf_dir)
    labels = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.arange(n, dtype=np.int64)),
                "label": pa.array(np.arange(n, dtype=np.int64) % 10),
            }
        )
    )
    q = modularity(canon, labels, n)
    return pa.table({"modularity": pa.array(round_half_away([q], 8))})


def _mod_labels(n, k):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.arange(n, dtype=np.int64)),
                "label": pa.array(np.arange(n, dtype=np.int64) % k),
            }
        )
    )


def q_coverage(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import coverage

    canon, n = _canon(sf_dir)
    c = coverage(canon, _mod_labels(n, 10))
    return pa.table({"coverage": pa.array(round_half_away([c], 8))})


def q_edge_cut(sf_dir):
    from networkit_ray.graph.quality import edge_cut

    canon, n = _canon(sf_dir)
    c = edge_cut(canon, _mod_labels(n, 10))
    return pa.table({"edge_cut": pa.array([c], pa.int64())})


def q_conductance(sf_dir):
    from networkit_ray.graph.quality import conductance_table

    canon, n = _canon(sf_dir)
    out = conductance_table(canon, _mod_labels(n, 10))
    return _round_col(out, "conductance", 8).sort("label")


def q_nmi(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import nmi

    _, n = _canon(sf_dir)
    v = nmi(_mod_labels(n, 10), _mod_labels(n, 7), n)
    return pa.table({"nmi": pa.array(round_half_away([v], 8))})


def q_ari(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import ari

    _, n = _canon(sf_dir)
    v = ari(_mod_labels(n, 10), _mod_labels(n, 7), n)
    return pa.table({"ari": pa.array(round_half_away([v], 8))})


def q_ring_lattice(sf_dir):
    from networkit_ray.sources.synth import ring_lattice_edges

    _, n = _canon(sf_dir)
    ds, _ = ring_lattice_edges(n, 3)
    return ds.sort(["src", "dst"])


def q_sbm_edges(sf_dir):
    from networkit_ray.sources.synth import stochastic_blockmodel_edges

    _, nc = _canon(sf_dir)
    n = min(nc, 2000)
    ds, _ = stochastic_blockmodel_edges(n, 10, 0.05, 0.005, seed=42)
    return ds.sort(["src", "dst"])


def q_havel_hakimi_degrees(sf_dir):
    from networkit_ray.graph.triangles import undirected_degrees
    from networkit_ray.sources.synth import havel_hakimi_edges

    _, n = _canon(sf_dir)
    seq = np.arange(n, dtype=np.int64) % 4 + 1
    ds, _ = havel_hakimi_edges(seq)
    return undirected_degrees(ds).sort("v")


def q_lfr_edges(sf_dir):
    """generators/LFRGenerator.cpp analog, in the replayable mode
    (canonical per-community order, counter-hashed draws only — see
    lfr._intra_group); oracle-exact — the full pipeline (powerlaw degrees,
    stochastic-rounded internal degrees, size draws, capacity-feasible
    assignment rounds, per-community Havel–Hakimi, bucket stub pairing)
    replayed in SQL (_lfr_parts); degree/mixing/recovery invariants for
    BOTH modes in tests/test_lfr.py."""
    from networkit_ray.sources.lfr import lfr_graph

    _, nc = _canon(sf_dir)
    n = min(max(nc, 200), 600)
    edges, _, _ = lfr_graph(
        n, mu=0.15, min_deg=4, max_deg=20, min_comm=20, max_comm=60, seed=42,
        replayable=True,
    )
    return edges.sort(["src", "dst"])


def q_lfr_edges_default(sf_dir):
    """Default-mode LFR — PCG64 edge-switch randomization, the SHIPPING
    configuration (generators/LFRGenerator.cpp uses an
    EdgeSwitchingMarkovChainGenerator; the certified replayable twin is
    q_lfr_edges).  Deliberately rows-only (round-4 advice): the
    edge-switched draw has no SQL twin, so the driver checks row-count +
    schema stability here while tests/test_lfr.py pins this exact mode's
    degree/mixing/community-recovery invariants."""
    from networkit_ray.sources.lfr import lfr_graph

    _, nc = _canon(sf_dir)
    n = min(max(nc, 200), 600)
    edges, _, _ = lfr_graph(
        n, mu=0.15, min_deg=4, max_deg=20, min_comm=20, max_comm=60, seed=42,
    )
    return edges.sort(["src", "dst"])


def q_lfr_mixing(sf_dir):
    """Planted vs realized LFR summary (replayable mode); oracle-exact —
    the edge replay plus the inter-community fraction (_lfr_parts);
    tolerance invariants in tests/test_lfr.py."""
    from networkit_ray.sources.lfr import lfr_graph, realized_mixing

    _, nc = _canon(sf_dir)
    n = min(max(nc, 200), 600)
    edges, comms, info = lfr_graph(
        n, mu=0.15, min_deg=4, max_deg=20, min_comm=20, max_comm=60, seed=42,
        replayable=True,
    )
    edges = edges.materialize()
    from networkit_ray.common.hashing import round_half_away

    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "m": pa.array([edges.count()], pa.int64()),
            "n_communities": pa.array([info["communities"]], pa.int64()),
            "realized_mu": pa.array(
                round_half_away([realized_mixing(edges, comms)], 6)
            ),
        }
    )


def q_dorogovtsev_mendes(sf_dir):
    from networkit_ray.sources.synth import dorogovtsev_mendes_edges

    _, n = _canon(sf_dir)
    ds, _ = dorogovtsev_mendes_edges(n, seed=42)
    t = ds.materialize()
    m = t.count()
    nodes = t.map_batches(
        lambda b: pa.table(
            {
                "v": pa.concat_arrays(
                    [b["src"].combine_chunks(), b["dst"].combine_chunks()]
                )
            }
        ),
        batch_format="pyarrow",
    ).unique("v")
    return pa.table(
        {
            "n_nodes": pa.array([len(nodes)], pa.int64()),
            "n_edges": pa.array([m], pa.int64()),
        }
    )


def _mod_cover(n, k, extra_mod, extra_base, extra_k):
    """(v, c) cover: base cluster v%k for all v, plus cluster
    extra_base + v%extra_k for every v with v%extra_mod == 0 (SQL-twinned)."""
    import ray.data

    v = np.arange(n, dtype=np.int64)
    ev = v[v % extra_mod == 0]
    return ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.concatenate([v, ev])),
                "c": pa.array(
                    np.concatenate([v % k, extra_base + ev % extra_k])
                ),
            }
        )
    )


def q_cover_f1(sf_dir):
    from networkit_ray.graph.cover import cover_f1_similarity

    _, n = _canon(sf_dir)
    out = cover_f1_similarity(
        _mod_cover(n, 5, 3, 5, 7), _mod_cover(n, 6, 4, 6, 5)
    )
    return _round_col(out, "f1", 8).sort("c")


def q_cover_hub_dominance(sf_dir):
    from networkit_ray.graph.cover import cover_hub_dominance

    canon, n = _canon(sf_dir)
    out = cover_hub_dominance(canon, _mod_cover(n, 5, 3, 5, 7))
    return _round_col(out, "dominance", 8).sort("c")


def q_overlapping_nmi(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.cover import overlapping_nmi_distance

    _, n = _canon(sf_dir)
    v = overlapping_nmi_distance(
        _mod_cover(n, 5, 3, 5, 7), _mod_cover(n, 6, 4, 6, 5), n
    )
    return pa.table({"onmi_distance": pa.array(round_half_away([v], 8))})


def q_hashing_overlapper(sf_dir):
    from networkit_ray.graph.quality import hashing_overlapper

    _, n = _canon(sf_dir)
    return hashing_overlapper(_mod_labels(n, 6), _mod_labels(n, 4)).sort("v")


def q_jaccard_measure(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import jaccard_measure

    _, n = _canon(sf_dir)
    v = jaccard_measure(_mod_labels(n, 10), _mod_labels(n, 7), n)
    return pa.table({"jaccard_dissimilarity": pa.array(round_half_away([v], 8))})


def q_node_rand(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import node_structural_rand

    _, n = _canon(sf_dir)
    v = node_structural_rand(_mod_labels(n, 10), _mod_labels(n, 7), n)
    return pa.table({"node_rand": pa.array(round_half_away([v], 8))})


def q_graph_rand(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import graph_structural_rand

    canon, n = _canon(sf_dir)
    v = graph_structural_rand(canon, _mod_labels(n, 10), _mod_labels(n, 7))
    return pa.table({"graph_rand": pa.array(round_half_away([v], 8))})


def q_partition_fragmentation(sf_dir):
    from networkit_ray.graph.quality import partition_fragmentation

    _, n = _canon(sf_dir)
    cc = _cc_labels(sf_dir)
    out = partition_fragmentation(_mod_labels(n, 6), cc[0])
    return _round_col(out, "fragmentation", 8).sort("label")


def q_expansion(sf_dir):
    from networkit_ray.graph.quality import expansion_table

    canon, n = _canon(sf_dir)
    out = expansion_table(canon, _mod_labels(n, 10), n)
    return _round_col(out, "expansion", 8).sort("label")


def q_triangle_count(sf_dir):
    from networkit_ray.graph.triangles import triangle_count

    canon, n = _canon(sf_dir)
    return pa.table(
        {"n_triangles": pa.array([triangle_count(canon, n)], pa.int64())}
    )


def q_triangles_per_vertex(sf_dir):
    from networkit_ray.graph.triangles import triangles_per_vertex

    canon, n = _canon(sf_dir)
    return triangles_per_vertex(canon, n)


def q_lcc(sf_dir):
    from networkit_ray.graph.triangles import local_clustering_coefficient

    canon, n = _canon(sf_dir)
    return _round_col(local_clustering_coefficient(canon, n), "lcc", 8)


def q_assortativity(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import assortativity

    sym, n = _sym(sf_dir)
    r = assortativity(sym, n)
    return pa.table({"assortativity": pa.array(round_half_away([r], 8))})


def q_partition_intersection(sf_dir):
    import ray.data

    from networkit_ray.graph.quality import partition_intersection
    from networkit_ray.sources.derive import num_customers

    n = num_customers(sf_dir)
    v = np.arange(n, dtype=np.int64)
    l1 = ray.data.from_arrow(pa.table({"v": v, "label": v % 6}))
    l2 = ray.data.from_arrow(pa.table({"v": v, "label": v % 4}))
    return partition_intersection(l1, l2, n)


def q_greedy_coloring(sf_dir):
    from networkit_ray.graph.coloring import greedy_coloring

    sym, n = _sym(sf_dir)
    # rows-only: JP round depth = longest decreasing-priority path (45 at
    # sf0.01) — too deep for an unrolled SQL twin; properness/determinism
    # are covered by tests/test_forest_algdist.py::TestGreedyColoring
    out, _info = greedy_coloring(sym, n)
    return out.sort("v")


def q_k_truss(sf_dir):
    from networkit_ray.graph.triangles import k_truss

    canon, n = _canon(sf_dir)
    out, info = k_truss(canon, n, 4)
    assert info["rounds"] <= 16, "oracle replays 16 rounds"
    return out.sort(["src", "dst"])


def q_clique_counts(sf_dir):
    import pandas as pd

    from networkit_ray.graph.cliques import clique_counts

    canon, n = _canon(sf_dir)
    c = clique_counts(canon, n)
    return pd.DataFrame({"k3": [c["k3"]], "k4": [c["k4"]]})


def q_maximal_cliques(sf_dir):
    import pyarrow as pa

    from networkit_ray.graph.cliques import maximal_cliques

    # oracle-exact: (size, count) histogram of maximal cliques (size >= 2)
    # — a canonical graph object, so the twin (_maxclique_sql) enumerates
    # cliques by ordered extension instead of replaying Bron-Kerbosch;
    # exactness vs a brute-force Bron-Kerbosch is also covered by
    # tests/test_cliques.py
    from ray.data.aggregate import Count

    canon, n = _canon(sf_dir)
    mc = maximal_cliques(canon, n)
    per_clique = mc.groupby("clique_id").aggregate(Count(alias_name="size"))
    return (
        per_clique.map_batches(
            lambda t: pa.table({"size": t["size"].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("size")
        .aggregate(Count(alias_name="num_cliques"))
        .sort("size")
    )


def q_group_degree(sf_dir):
    import pandas as pd

    from networkit_ray.graph.groupcent import group_degree

    sym, n = _sym(sf_dir)
    picks, _total = group_degree(sym, n, 4)
    return pd.DataFrame(picks, columns=["rank", "v", "gain"])


def q_harmonic_closeness_exact(sf_dir):
    """centrality/TopHarmonicCloseness.cpp exact analog on the supplier
    ring graph (all-sources batched BFS; top-k is a sort away)."""
    from networkit_ray.graph.closeness import exact_harmonic_closeness
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    out = exact_harmonic_closeness(sym.materialize(), s)
    return _round_col(_round_col(out, "harmonic", 8), "closeness", 8).sort("v")


def q_diameter(sf_dir):
    import pandas as pd

    from networkit_ray.graph.diameter import exact_diameter
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    res = exact_diameter(sym.materialize(), s)
    return pd.DataFrame([{"diameter": res["diameter"]}])


def q_lfm_cover_full(sf_dir):
    """LFM overlapping cover on the FULL derived customer graph — the
    round-3 certified workload (the exact twin q_lfm_cover moved to the
    supplier ring to keep the unrolled SQL tractable; round-4 advice
    asked that the full-graph default stay on the driver surface).
    Rows-only: coverage/determinism invariants in tests/test_scd.py."""
    from networkit_ray.graph.scd import lfm_cover

    sym, n = _sym(sf_dir)
    return lfm_cover(
        sym.materialize(), n, seeds_per_round=16, seed=42
    ).sort(["c", "v"])


def q_lfm_cover(sf_dir):
    """Full LFM overlapping cover on the supplier ring graph (the
    radius-3 regions keep the unrolled twin's add rounds tractable);
    oracle-exact — per-round signed-splitmix seed ranking + batched
    expansion replay (_lfm_cover_sql); full-graph coverage/determinism/
    per-seed-expansion-equality tests in tests/test_scd.py."""
    from networkit_ray.graph.scd import lfm_cover
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    return lfm_cover(
        sym.materialize(), s, seeds_per_round=16, seed=42
    ).sort(["c", "v"])


def q_warm_katz(sf_dir):
    """DynKatzCentrality-style warm start: the base graph's fixpoint-scale
    Katz vector seeds the full-graph iteration (identical fixpoint);
    oracle-exact — two-phase unrolled twin (_warm_katz_sql: 20 base-graph
    affine iterations, raw scale, WARM_ITERS full-graph iterations, L2
    end-normalization); fixpoint-equality under tol-driven stopping is
    covered by tests/test_kernels.py."""
    from networkit_ray.graph.centrality import katz, warm_start_katz

    edges, n = _derived(sf_dir)

    def base_only(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array((s + d) % 7 != 0))

    base = edges.map_batches(base_only, batch_format="pyarrow").materialize()
    raw, _ = katz(base, n, alpha=0.05, tol=0.0, max_iterations=20, return_raw=True)
    out, _ = warm_start_katz(
        edges, n, raw.materialize(), alpha=0.05, tol=0.0, max_iterations=WARM_ITERS
    )
    return _round_col(out, "score", 8).sort("v")


def q_warm_pagerank(sf_dir):
    """DynPageRank-style warm start: base-graph scores seed the full-graph
    power iteration (identical fixpoint, iterations track the score drift
    — 125→1 on an unchanged graph); oracle-exact — two-phase unrolled twin
    (_warm_pagerank_sql: PR_ITERS base-graph power iterations, seed
    rescaled to the unnormalized fixpoint scale s* = (1−d)/(1−d(1−dang)),
    WARM_ITERS full-graph iterations, divide-by-sum); fixpoint-equality
    under tol-driven stopping is covered by
    tests/test_kernels.py::TestWarmStartPageRank."""
    from networkit_ray.graph.pagerank import pagerank, warm_start_pagerank

    edges, n = _derived(sf_dir)

    def base_only(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array((s + d) % 7 != 0))

    base = edges.map_batches(base_only, batch_format="pyarrow").materialize()
    prev, _ = pagerank(base, n, tol=0.0, max_iterations=PR_ITERS)
    out, _info = warm_start_pagerank(
        edges, n, prev.materialize(), tol=0.0, max_iterations=WARM_ITERS
    )
    return _round_col(out, "score", 8).sort("v")


def q_incremental_cc(sf_dir):
    """components/DynConnectedComponents.cpp analog: labels of the base
    graph ((src+dst)%7 != 0 edges) warm-start hash-min over base ∪ delta;
    result is exactly the full-graph CC (same oracle as
    connected_components)."""
    from networkit_ray.graph.components import connected_components, incremental_cc

    sym, n = _sym(sf_dir)

    def base_only(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array((s + d) % 7 != 0))

    base = sym.map_batches(base_only, batch_format="pyarrow").materialize()
    prev, _ = connected_components(base, n)
    out, _info = incremental_cc(sym, n, prev.materialize())
    return out.sort("v")


def q_node2vec_walks(sf_dir):
    """embedding/Node2Vec.cpp biased-walk analog (p=0.5, q=2 — BFS-ish);
    oracle-exact — unrolled-step SQL twin (_n2v_sql; dyadic weights make
    the inverse-CDF sums order-independent) + exact numpy-replica oracle
    in tests/test_node2vec.py."""
    from networkit_ray.graph.walks import node2vec_walks

    sym, n = _sym(sf_dir)
    return node2vec_walks(
        sym, n, length=4, n_walkers=32, p=0.5, q=2.0
    ).sort(["walker", "step"])


def q_group_closeness(sf_dir):
    import pandas as pd

    from networkit_ray.graph.groupcent import group_closeness

    sym, n = _sym(sf_dir)
    picks = group_closeness(sym, n, 3, pool=8)
    return pd.DataFrame(picks, columns=["rank", "v", "farness"])


def q_sgns_embeddings(sf_dir):
    """Node2Vec's word2vec half (LearnEmbedding.cpp analog): SGNS over
    the deterministic walks, in the 2⁻²⁴-lattice replayable mode (exact
    gradient sums — see embedding._grad_partial); oracle-exact — full
    training replay in SQL (_sgns_sql: walks, windowed pairs with pinned
    batch indices, splitmix negatives, quantized scores/contributions,
    one exactly-summed update per epoch); pair-replica and
    planted-cluster separation tests in tests/test_embedding.py."""
    from networkit_ray.graph.embedding import sgns_embeddings
    from networkit_ray.graph.walks import random_walks

    sym, n = _sym(sf_dir)
    walks = random_walks(sym, n, n_walkers=128, length=8, seed=42).materialize()
    out = sgns_embeddings(walks, n, dim=8, epochs=3, lr=0.05, seed=42, lattice=True)
    for j in range(8):
        out = _round_col(out, f"e{j}", 6)
    return out.sort("v")


def q_sgns_embeddings_default(sf_dir):
    """Default-mode SGNS — full-precision float SGD, the SHIPPING
    configuration (the certified 2⁻²⁴-lattice twin is
    q_sgns_embeddings).  Deliberately rows-only (round-4 advice): float
    accumulation order varies with scheduling, so the driver checks
    row-count + schema stability here while
    tests/test_embedding.py:76-120 pins this mode's replica-equality and
    planted-cluster separation invariants."""
    from networkit_ray.graph.embedding import sgns_embeddings
    from networkit_ray.graph.walks import random_walks

    sym, n = _sym(sf_dir)
    walks = random_walks(sym, n, n_walkers=128, length=8, seed=42).materialize()
    out = sgns_embeddings(walks, n, dim=8, epochs=3, lr=0.05, seed=42)
    for j in range(8):
        out = _round_col(out, f"e{j}", 6)
    return out.sort("v")


def q_ged_walk(sf_dir):
    """GedWalk greedy group (truncated-levels normative semantics);
    oracle-exact — unrolled greedy-round twin (_gedwalk_sql: the
    masked/unmasked walk DPs are integer-valued so order-independent in
    float64) + dense-replica tests in tests/test_gedwalk.py."""
    import pandas as pd

    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.gedwalk import ged_walk

    edges, n = _derived(sf_dir)
    picks = ged_walk(edges, n, 3, levels=5, pool=8)
    df = pd.DataFrame(picks, columns=["rank", "v", "score"])
    df["score"] = round_half_away(df["score"].to_numpy(), 6)
    return df


def q_group_harmonic_closeness(sf_dir):
    import pandas as pd

    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.groupcent import group_harmonic_closeness

    sym, n = _sym(sf_dir)
    picks = group_harmonic_closeness(sym, n, 3, pool=8)
    df = pd.DataFrame(picks, columns=["rank", "v", "harmonic"])
    df["harmonic"] = round_half_away(df["harmonic"].to_numpy(), 8)
    return df


SEIR_PARAMS = {"t_max": 8, "trans_p": 0.3, "e_time": 2, "i_time": 3, "zero": 0}


def q_seir(sf_dir):
    from networkit_ray.graph.seir import seir

    sym, n = _sym(sf_dir)
    return seir(sym, n, **SEIR_PARAMS)


def q_path_growing_matching(sf_dir):
    """Drake–Hougardy path-growing matching, run on the induced subgraph
    of vertices < 96 (a SQL-twinnable conformance size: the twin unrolls
    one round per vertex REMOVAL, so the instance must bound the round
    count); oracle-exact — _pgm_sql replays start-vertex selection
    (live-degree desc, id asc), heaviest-edge growth (weight desc,
    neighbor asc), the M1/M2 alternation with per-path take reset, and
    the final heavier-matching pick.  Full-graph validity/half-approx/
    determinism tests stay in tests/test_randomize_suitor.py."""
    from networkit_ray.graph.matching import path_growing_matching

    canon, n = _canon(sf_dir)

    def with_w(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (src < 96) & (dst < 96)
        t = t.filter(pa.array(keep))
        src, dst = src[keep], dst[keep]
        return t.append_column(
            "w", pa.array(((src + dst) % 7 + 1).astype(np.float64))
        )

    cw = canon.map_batches(with_w, batch_format="pyarrow").materialize()
    return path_growing_matching(cw, min(n, 96)).sort(["src", "dst"])


def q_suitor_matching(sf_dir):
    from networkit_ray.graph.matching import suitor_matching

    canon, n = _canon(sf_dir)

    def with_w(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": pa.array((src + dst) % 7 + 1),
            }
        )

    weighted = canon.map_batches(with_w, batch_format="pyarrow")
    out, _info = suitor_matching(weighted, n, max_weight=7)
    return out.sort(["src", "dst"])


def q_edge_switch_degrees(sf_dir):
    from networkit_ray.graph.randomize import edge_switching
    from networkit_ray.graph.triangles import undirected_degrees

    canon, n = _canon(sf_dir)
    out, _info = edge_switching(canon, rounds=3, seed=7)
    return undirected_degrees(out).sort("v")


def q_local_max_matching(sf_dir):
    from networkit_ray.graph.matching import local_max_matching

    canon, n = _canon(sf_dir)
    out, info = local_max_matching(canon, n)
    assert info["rounds"] <= 16, "oracle replays 16 rounds"
    return out.sort(["src", "dst"])


def q_jaccard_edge_scores(sf_dir):
    from networkit_ray.graph.triangles import jaccard_edge_scores

    canon, n = _canon(sf_dir)
    return _round_col(jaccard_edge_scores(canon, n), "jaccard", 8)


def q_hub_dominance(sf_dir):
    from networkit_ray.graph.quality import hub_dominance

    canon, n = _canon(sf_dir)
    return _round_col(
        hub_dominance(canon, _mod_labels(n, 10), n), "hub_dominance", 8
    ).sort("label")


def q_sfigality(sf_dir):
    from networkit_ray.graph.vertexmeasures import sfigality

    sym, n = _sym(sf_dir)
    return _round_col(sfigality(sym, n), "sfigality", 8).sort("v")


def q_laplacian_centrality(sf_dir):
    from networkit_ray.graph.vertexmeasures import laplacian_centrality

    sym, n = _sym(sf_dir)
    return laplacian_centrality(sym, n).sort("v")


def q_local_partition_coverage(sf_dir):
    from networkit_ray.graph.vertexmeasures import local_partition_coverage

    sym, n = _sym(sf_dir)
    return _round_col(
        local_partition_coverage(sym, _mod_labels(n, 10), n), "lpc", 8
    ).sort("v")


def q_permanence(sf_dir):
    from networkit_ray.graph.vertexmeasures import permanence

    sym, n = _sym(sf_dir)
    canon, _ = _canon(sf_dir)
    return _round_col(
        permanence(sym, canon, _mod_labels(n, 10), n), "permanence", 8
    ).sort("v")


def q_intrapartition_density(sf_dir):
    from networkit_ray.graph.quality import intrapartition_density

    canon, n = _canon(sf_dir)
    return _round_col(
        intrapartition_density(canon, _mod_labels(n, 10), n), "density", 8
    ).sort("label")


def q_luby_mis(sf_dir):
    from networkit_ray.graph.mis import luby_mis

    sym, n = _sym(sf_dir)
    out, info = luby_mis(sym, n)
    assert info["rounds"] <= 16, "oracle replays 16 rounds"
    return out.sort("v")


def q_reciprocity(sf_dir):
    """Fraction of directed edges whose reverse also exists
    (correlation/../graph-measure family; trivial on the exchange join)."""
    from networkit_ray.common.exchange import exchange_join
    from networkit_ray.common.hashing import round_half_away

    edges, n = _derived(sf_dir)
    m = edges.count()
    rev = edges.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow",
    )
    mutual = exchange_join(
        edges, rev, left_on=["src", "dst"], join_type="left semi"
    ).count()
    return pa.table(
        {"reciprocity": pa.array(round_half_away([mutual / m], 8))}
    )


def q_degree_histogram(sf_dir):
    from ray.data.aggregate import Count

    from networkit_ray.graph.build import degree_table

    edges, n = _derived(sf_dir)
    return (
        degree_table(edges, key="src", out_name="deg")
        .groupby("deg")
        .aggregate(Count(alias_name="n_nodes"))
        .sort("deg")
    )


def q_stable_partition_nodes(sf_dir):
    from networkit_ray.graph.quality import stable_partition_nodes

    sym, n = _sym(sf_dir)
    return stable_partition_nodes(sym, _mod_labels(n, 10), n)


def q_link_prediction(sf_dir):
    from networkit_ray.graph.linkpred import link_prediction_scores

    sym, n = _sym(sf_dir)
    canon, _ = _canon(sf_dir)
    out = link_prediction_scores(sym, canon)
    out = _round_col(out, "jaccard", 8)
    out = _round_col(out, "adamic_adar", 8)
    return _round_col(out, "resource_alloc", 8)


def q_degree_preserving_shuffle(sf_dir):
    from networkit_ray.graph.randomize import degree_preserving_shuffle

    sym, n = _sym(sf_dir)
    return degree_preserving_shuffle(sym, n, seed=42).sort("v")


def q_same_community(sf_dir):
    from networkit_ray.graph.linkpred import (
        link_prediction_scores,
        same_community_index,
    )

    sym, n = _sym(sf_dir)
    canon, _ = _canon(sf_dir)
    pairs = link_prediction_scores(sym, canon)
    return same_community_index(pairs, _mod_labels(n, 10)).sort(["u", "v"])


def q_lm_cross_entropy(sf_dir):
    from networkit_ray.text.analysis import lm_cross_entropy

    out = lm_cross_entropy(_docs(sf_dir, ["doc_id", "text"]))
    return _round_col(out, "cross_entropy", 8).sort("doc_id")


def q_contamination(sf_dir):
    """Benchmark-contamination check: train docs sharing a word-trigram
    with the doc_id%97==0 held-out benchmark slice."""
    from networkit_ray.dedup.jaccard import contamination_check

    docs = _docs(sf_dir, ["doc_id", "text"])

    def split(keep_bm):
        def f(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = d % 97 == 0
            return t.filter(pa.array(m if keep_bm else ~m))

        return f

    bm = docs.map_batches(split(True), batch_format="pyarrow")
    tr = docs.map_batches(split(False), batch_format="pyarrow")
    return contamination_check(tr, bm, k=3).sort("doc_id")


def q_token_shards(sf_dir):
    from networkit_ray.text.analysis import token_shards

    return token_shards(_docs(sf_dir, ["doc_id", "text"]), 2000).sort("doc_id")


def q_doc_sample(sf_dir):
    from networkit_ray.text.analysis import sample_documents

    out = sample_documents(_docs(sf_dir, ["doc_id", "lang"]), 0.4, seed=3)
    return out.select_columns(["doc_id", "lang"]).sort("doc_id")


def q_link_roc(sf_dir):
    """ROC/AUC of the common-neighbors predictor against a 30% held-out
    hash-coin split of the canonical edges (ROCMetric.cpp flow)."""
    from networkit_ray.graph.linkpred import (
        link_prediction_roc,
        link_prediction_scores,
    )

    canon, n = _canon(sf_dir)
    thresh = int(0.3 * 2**31)

    def coin_split(keep_test):
        def f(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = (src * 2654435761 + dst * 40503 + 7) % 2**31 < thresh
            return t.filter(pa.array(c if keep_test else ~c))

        return f

    test = canon.map_batches(coin_split(True), batch_format="pyarrow").materialize()
    train = canon.map_batches(coin_split(False), batch_format="pyarrow").materialize()
    train_sym = train.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    preds = link_prediction_scores(train_sym, train)
    return link_prediction_roc(preds, test, "cn")


def q_edge_triangle_scores(sf_dir):
    from networkit_ray.graph.triangles import edge_triangle_scores

    canon, n = _canon(sf_dir)
    return edge_triangle_scores(canon, n)


def q_sparsify_triangles(sf_dir):
    from networkit_ray.graph.triangles import (
        edge_triangle_scores,
        sparsify_global_threshold,
    )

    canon, n = _canon(sf_dir)
    return sparsify_global_threshold(edge_triangle_scores(canon, n), 1)


def q_quadrangle_scores(sf_dir):
    from networkit_ray.graph.triangles import quadrangle_edge_scores

    canon, n = _canon(sf_dir)
    return quadrangle_edge_scores(canon, n).sort(["src", "dst"])


def q_geometric_mean_scores(sf_dir):
    from networkit_ray.graph.triangles import (
        edge_triangle_scores,
        geometric_mean_scores,
    )

    canon, n = _canon(sf_dir)
    scored = edge_triangle_scores(canon, n).materialize()
    out = geometric_mean_scores(scored, "tri")
    return _round_col(out, "gm_score", 8).sort(["src", "dst"])


def q_blended_scores(sf_dir):
    from networkit_ray.graph.sparsification import blend_edge_scores
    from networkit_ray.graph.triangles import edge_triangle_scores, jaccard_edge_scores

    canon, n = _canon(sf_dir)
    a = edge_triangle_scores(canon, n).materialize()
    b = jaccard_edge_scores(canon, n).materialize()
    out = blend_edge_scores(a, "tri", b, "jaccard", 0.25)
    return _round_col(out, "blend_score", 8).sort(["src", "dst"])


def q_score_as_weight(sf_dir):
    from networkit_ray.graph.build import weighted_degree_table
    from networkit_ray.graph.sparsification import edge_score_as_weight
    from networkit_ray.graph.triangles import edge_triangle_scores

    canon, n = _canon(sf_dir)
    scored = edge_score_as_weight(
        edge_triangle_scores(canon, n), "tri", offset=1.0, factor=0.5
    )
    sym_w = scored.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
                "w": pa.concat_arrays(
                    [t["w"].combine_chunks(), t["w"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = weighted_degree_table(sym_w)
    return _round_col(out, "wdeg", 8).sort("v")


def q_prefix_jaccard_scores(sf_dir):
    """Prefix-Jaccard edge scores (non-parametric Simmelian core);
    oracle-exact — event-level SQL twin (integer-count ratios round
    identically) + brute-force-replica tests in
    tests/test_sparsification.py."""
    from networkit_ray.graph.sparsification import prefix_jaccard_scores

    canon, n = _canon(sf_dir)
    out = prefix_jaccard_scores(canon, n)
    return _round_col(out, "pj_score", 8).sort(["src", "dst"])


def q_normalized_triangle_scores(sf_dir):
    from networkit_ray.graph.sparsification import normalize_edge_scores
    from networkit_ray.graph.triangles import edge_triangle_scores

    canon, n = _canon(sf_dir)
    scored = edge_triangle_scores(canon, n).materialize()
    out = normalize_edge_scores(scored, "tri", invert=True)
    return _round_col(out, "norm_score", 8).sort(["src", "dst"])


def q_linearized_triangle_scores(sf_dir):
    from networkit_ray.graph.sparsification import linearize_edge_scores
    from networkit_ray.graph.triangles import edge_triangle_scores

    canon, n = _canon(sf_dir)
    scored = edge_triangle_scores(canon, n).materialize()
    out = linearize_edge_scores(scored, "tri")
    return _round_col(out, "lin_score", 8).sort(["src", "dst"])


def q_local_degree_scores(sf_dir):
    from networkit_ray.graph.sparsification import local_degree_scores

    sym, n = _sym(sf_dir)
    out = local_degree_scores(sym, n)
    return _round_col(out, "ld_score", 8).sort(["src", "dst"])


def q_simmelian_overlap(sf_dir):
    from networkit_ray.graph.sparsification import simmelian_overlap_scores

    canon, n = _canon(sf_dir)
    return simmelian_overlap_scores(canon, n, max_rank=10).sort(["src", "dst"])


def q_multiscale_scores(sf_dir):
    from networkit_ray.graph.sparsification import multiscale_scores

    sym, _ = _sym(sf_dir)

    def add_w(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return t.append_column("w", pa.array(((src + dst) % 7 + 1).astype(np.float64)))

    sym_w = sym.map_batches(add_w, batch_format="pyarrow")
    out = multiscale_scores(sym_w)
    return _round_col(out, "ms_score", 8).sort(["src", "dst"])


def q_chance_corrected_triangles(sf_dir):
    from networkit_ray.graph.sparsification import chance_corrected_triangle_scores

    canon, n = _canon(sf_dir)
    out = chance_corrected_triangle_scores(canon, n)
    return _round_col(out, "cct_score", 8).sort(["src", "dst"])


def q_random_edge_scores(sf_dir):
    from networkit_ray.graph.sparsification import random_edge_scores

    canon, _ = _canon(sf_dir)
    out = random_edge_scores(canon, seed=42)
    return _round_col(out, "re_score", 8).sort(["src", "dst"])


def q_k_path_centrality(sf_dir):
    from networkit_ray.graph.walks import k_path_centrality

    sym, n = _sym(sf_dir)
    out = k_path_centrality(sym, n, k=5, num_walks=n // 2, seed=42)
    return _round_col(out, "score", 8).sort("v")


def q_apsp(sf_dir):
    from networkit_ray.graph.bfs import apsp_table
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    return apsp_table(sym.materialize(), s).sort(["s", "v"])


def _dyn_apsp_repaired(sf_dir):
    """Shared engine for the DynAPSP family: hold out 6 hash-selected
    canonical ring edges, run APSP on the partial graph, then repair via
    sequential insert events (distance/DynAPSP.cpp semantics).  Repair
    == full recompute, so the oracle is the full-graph closure."""
    from networkit_ray.graph.bfs import apsp_table
    from networkit_ray.graph.dynapsp import dyn_apsp_update
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    sym = sym.materialize()

    def canon_hash(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (a < b) & ((a * 31 + b) % 7 == 0)
        return pa.table({"src": pa.array(a[keep]), "dst": pa.array(b[keep])})

    held = (
        sym.map_batches(canon_hash, batch_format="pyarrow")
        .sort(["src", "dst"])
        .take(6)
    )
    held_pairs = [(int(r["src"]), int(r["dst"])) for r in held]
    hs = {(u, w) for u, w in held_pairs} | {(w, u) for u, w in held_pairs}
    hu = np.array([p[0] for p in hs], np.int64)
    hw = np.array([p[1] for p in hs], np.int64)

    def drop_held(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        # membership in the ≤12-pair held set via packed-key isin
        keep = ~np.isin(a * (2**32) + b, hu * (2**32) + hw)
        return t.filter(pa.array(keep))

    part = sym.map_batches(drop_held, batch_format="pyarrow").materialize()
    base = apsp_table(part, s)
    return dyn_apsp_update(base, held_pairs, s)


def q_dyn_apsp(sf_dir):
    """distance/DynAPSP.cpp analog: insert-event APSP repair over the
    supplier ring with 6 held-out edges re-inserted sequentially; exact
    oracle = the full-graph recursive-BFS closure (same SQL as `apsp`)."""
    return _dyn_apsp_repaired(sf_dir).sort(["s", "v"])


def q_dyn_top_harmonic(sf_dir):
    """centrality/DynTopHarmonicCloseness.cpp analog: top-10 harmonic
    closeness maintained over the DynAPSP-repaired distance table
    (rounded to 9 decimals before ranking, ties by vertex id)."""
    from networkit_ray.graph.dynapsp import top_harmonic_from_apsp

    return top_harmonic_from_apsp(_dyn_apsp_repaired(sf_dir), 10)


def q_neighborhood_function(sf_dir):
    from networkit_ray.graph.bfs import apsp_table, neighborhood_function
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    return neighborhood_function(apsp_table(sym.materialize(), s))


def q_volume(sf_dir):
    from networkit_ray.graph.closeness import volume

    sym, n = _sym(sf_dir)
    return volume(sym, n, rs=(1, 2, 3), sample=8, seed=42)


def q_top_harmonic_closeness(sf_dir):
    """centrality/TopHarmonicCloseness.cpp: top-k by exact harmonic score
    (deterministic (harmonic DESC, v) tiebreak on both sides)."""
    from networkit_ray.graph.closeness import exact_harmonic_closeness
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    out = exact_harmonic_closeness(sym.materialize(), s)
    out = _round_col(_round_col(out, "harmonic", 8), "closeness", 8)
    return out.sort(["harmonic", "v"], descending=[True, False]).limit(10)


def q_forest_fire_scores(sf_dir):
    from networkit_ray.graph.sparsification import forest_fire_scores

    canon, n = _canon(sf_dir)
    out = forest_fire_scores(canon, n, pf=0.7, num_fires=max(1, n // 50), seed=42)
    return _round_col(out, "ff_score", 8).sort(["src", "dst"])


def q_jaccard_distance(sf_dir):
    from networkit_ray.graph.triangles import jaccard_distances

    canon, n = _canon(sf_dir)
    out = jaccard_distances(canon, n)
    return _round_col(out, "jaccard_distance", 8).sort(["src", "dst"])


def q_adamic_adar_distance(sf_dir):
    from networkit_ray.graph.triangles import adamic_adar_distances

    canon, n = _canon(sf_dir)
    out = adamic_adar_distances(canon, n)
    return _round_col(out, "aa_distance", 8).sort(["src", "dst"])


def _perturbed(g1):
    """G2 = G1 minus (src+dst)%3==0 plus reversals of src%5==0 (SQL-twinned)."""
    from networkit_ray.graph.build import dedup_edges

    def perturb(t):
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (s + d) % 3 != 0
        rev = s % 5 == 0
        return pa.table(
            {
                "src": pa.array(np.concatenate([s[keep], d[rev]])),
                "dst": pa.array(np.concatenate([d[keep], s[rev]])),
            }
        )

    return dedup_edges(g1.map_batches(perturb, batch_format="pyarrow"))


def q_graph_difference(sf_dir):
    """Edit list G1→G2 over the deterministic perturbation of the derived graph."""
    from networkit_ray.graph.dynamics import graph_difference

    g1, n = _derived(sf_dir)
    return graph_difference(g1, _perturbed(g1)).sort(["kind", "u", "v"])


def q_apply_events_roundtrip(sf_dir):
    """GraphUpdater law: apply_events(G1, graph_difference(G1, G2)) == G2."""
    from networkit_ray.graph.dynamics import apply_events, graph_difference

    g1, n = _derived(sf_dir)
    g2 = _perturbed(g1)
    diff = graph_difference(g1, g2).materialize()
    return apply_events(g1, diff).sort(["src", "dst"])


def q_clustering_generator(sf_dir):
    """Continuous balanced k=7 synthetic partition over the customer universe."""
    from networkit_ray.sources.derive import num_customers
    from networkit_ray.sources.synth import generate_clustering

    n = num_customers(sf_dir)
    return generate_clustering(n, "continuous", k=7).sort("v")


def q_gce_community(sf_dir):
    """GCE objective-M expansion from two seeds; oracle-exact — unrolled
    greedy-round twin (_gce_sql: integer counts, one float division per
    compared quantity, strict-improvement argmax with smallest-id ties)."""
    from networkit_ray.graph.scd import gce_communities

    sym, n = _sym(sf_dir)
    return gce_communities(sym, n, [0, 7], radius=3, max_size=50).sort(
        ["seed", "v"]
    )


def q_lte_community(sf_dir):
    """LocalTightnessExpansion from two seeds; oracle-exact — shared
    pop/add twin (_scd_popadd_sql variant='lte': adjacency-cosine
    similarities, E/X acceptance, discard-until-pass pop replay)."""
    from networkit_ray.graph.scd import lte_communities

    sym, n = _sym(sf_dir)
    return lte_communities(sym, n, [0, 7], radius=3, max_size=50).sort(
        ["seed", "v"]
    )


def q_localt_community(sf_dir):
    """LocalT triangle-score expansion from two seeds; oracle-exact —
    unrolled greedy-round twin (_localt_sql: all-integer triangle counts
    and scores, (score desc, ext asc, id asc) selection)."""
    from networkit_ray.graph.scd import localt_communities

    sym, n = _sym(sf_dir)
    return localt_communities(sym, n, [0, 7], radius=3, max_size=40).sort(
        ["seed", "v"]
    )


def q_two_phase_l(sf_dir):
    """TwoPhaseL L-metric expansion from two seeds; oracle-exact —
    unrolled two-phase twin (_twophasel_sql: integer stats, single-division
    lin/lex/L, snapshot-ordered phase-2 removals)."""
    from networkit_ray.graph.scd import two_phase_l_communities

    sym, n = _sym(sf_dir)
    return two_phase_l_communities(sym, n, [0, 7], radius=3, max_size=50).sort(
        ["seed", "v"]
    )


def q_combined_scd(sf_dir):
    """CliqueDetect-anchored GCE expansion; oracle-exact — the GCE twin
    seeded with the canonical max-clique init (_gce_sql clique_init=)."""
    from networkit_ray.graph.scd import combined_scd

    sym, n = _sym(sf_dir)
    return combined_scd(sym, n, [0, 7], radius=3, max_size=50).sort(
        ["seed", "v"]
    )


def q_random_bfs_community(sf_dir):
    """BFS-order community of 25 nodes around seed 0 ((dist, id) order)."""
    from networkit_ray.graph.scd import random_bfs_community

    sym, n = _sym(sf_dir)
    return random_bfs_community(sym, n, 0, 25).sort(["seed", "v"])


def q_tce_community(sf_dir):
    """TCE conductance-guarded expansion from two seeds; oracle-exact —
    shared pop/add twin (_scd_popadd_sql variant='tce': triadic-closure
    scores, global-degree/region-cut conductance test, discard-until-pass
    pop replay)."""
    from networkit_ray.graph.scd import tce_communities

    sym, n = _sym(sf_dir)
    return tce_communities(sym, n, [0, 7], radius=3, max_size=50).sort(
        ["seed", "v"]
    )


def q_partitioned_sink_roundtrip(sf_dir):
    """Resumable hash-bucketed Parquet sink: write -> read-complete-buckets."""
    import tempfile

    from networkit_ray.state.sink import read_partitioned, write_partitioned

    g1, n = _derived(sf_dir)
    d = tempfile.mkdtemp(prefix="sink_")
    write_partitioned(g1, d, ["src"], num_buckets=8)
    return read_partitioned(d).sort(["src", "dst"])


def q_binary_edgelist_roundtrip(sf_dir):
    """Binary (little-endian u64 pair) edge-list write -> byte-range read."""
    import os
    import tempfile

    from networkit_ray.sources.edgelist import (
        read_binary_edge_list,
        write_binary_edge_list,
    )

    g1, n = _derived(sf_dir)
    d = tempfile.mkdtemp(prefix="binel_")
    write_binary_edge_list(g1, d)
    return read_binary_edge_list(d, records_per_task=2000).sort(["src", "dst"])


def q_graphtool_roundtrip(sf_dir):
    """graph-tool binary write -> read (io/GraphToolBinary{Writer,Reader}.cpp):
    the directed derived edge table must survive byte-exact."""
    import tempfile

    from networkit_ray.sources.binary_graph import (
        read_graphtool_binary,
        write_graphtool_binary,
    )

    g1, n = _derived(sf_dir)
    p = tempfile.mktemp(prefix="gt_", suffix=".gt")
    write_graphtool_binary(g1, n, p, directed=True)
    out, n2, directed = read_graphtool_binary(p)
    assert n2 == n and directed
    return out.sort(["src", "dst"])


def q_thrill_roundtrip(sf_dir):
    """Thrill binary write -> read (io/ThrillGraphBinary{Writer,Reader}.cpp):
    the canonical (lo, hi) undirected edge table must survive byte-exact."""
    import tempfile

    from networkit_ray.sources.binary_graph import (
        read_thrill_binary,
        write_thrill_binary,
    )

    canon, n = _canon(sf_dir)
    p = tempfile.mktemp(prefix="thrill_", suffix=".bin")
    write_thrill_binary(canon, n, p)
    out, n2 = read_thrill_binary(p, n)
    assert n2 == n
    return out.sort(["src", "dst"])


def q_dibap_roundtrip(sf_dir):
    """DibaP 'GI' write -> read (io/DibapGraphReader.cpp): the canonical
    undirected edge table must survive through the symmetric CSR layout."""
    import tempfile

    from networkit_ray.sources.binary_graph import read_dibap, write_dibap

    canon, n = _canon(sf_dir)
    p = tempfile.mktemp(prefix="dibap_", suffix=".gi")
    write_dibap(canon, n, p)
    out, n2, _coords = read_dibap(p)
    assert n2 == n
    return out.sort(["src", "dst"])


def q_binary_partition_roundtrip(sf_dir):
    """Fixed-width binary partition write -> read
    (io/BinaryPartition{Writer,Reader}.cpp), labels = out-degrees so the
    DuckDB twin is the degree table."""
    import tempfile

    from networkit_ray.graph.build import degree_table
    from networkit_ray.sources.binary_graph import (
        read_binary_partition,
        write_binary_partition,
    )
    from networkit_ray.sources.derive import num_customers

    edges, _ = _derived(sf_dir)
    n = num_customers(sf_dir)
    deg = degree_table(edges, key="src", out_name="label")
    # cover all n nodes (degree_table only lists vertices with out-edges)
    import ray.data as _rd

    base = _rd.from_arrow(
        pa.table(
            {
                "v": pa.array(np.arange(n, dtype=np.int64)),
                "label": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )
    )
    from networkit_ray.common.exchange import exchange_join

    def fill(t: pa.Table) -> pa.Table:
        # empty-right exchange partitions lack the joined column
        lab = (
            pa.compute.coalesce(t["lab2"], t["label"])
            if "lab2" in t.column_names
            else t["label"]
        )
        return pa.table({"v": t["v"], "label": lab})

    merged = exchange_join(
        base,
        deg.map_batches(
            lambda t: pa.table({"v": t["v"], "lab2": t["label"]}),
            batch_format="pyarrow",
        ),
        left_on=["v"],
        join_type="left outer",
    ).map_batches(fill, batch_format="pyarrow")
    p = tempfile.mktemp(prefix="binpart_", suffix=".bin")
    write_binary_partition(merged, p, width=8)
    out = read_binary_partition(p, width=8)
    return out.map_batches(
        lambda t: t.filter(pa.compute.greater(t["label"], 0)),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: pa.table({"v": t["v"], "deg": t["label"]}),
        batch_format="pyarrow",
    ).sort("v")


def q_incremental_bfs(sf_dir):
    """DynBFS analog: warm-start BFS after inserting reversals of src%7==0;
    oracle = from-scratch BFS over the augmented graph."""
    from networkit_ray.graph.bfs import bfs_distances, incremental_bfs
    from networkit_ray.graph.build import dedup_edges

    g1, n = _derived(sf_dir)

    def aug(t):
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = s % 7 == 0
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d[rev]])),
                "dst": pa.array(np.concatenate([d, s[rev]])),
            }
        )

    full = dedup_edges(g1.map_batches(aug, batch_format="pyarrow")).materialize()
    prev, _ = bfs_distances(g1, n, 0)
    out, _info = incremental_bfs(full, n, 0, prev.materialize())
    return out.sort("v")


def q_bidirectional_bfs(sf_dir):
    """Point-to-point hop distance 0→1 via alternating forward/backward waves."""
    from networkit_ray.graph.bfs import bidirectional_bfs_distance

    edges, n = _derived(sf_dir)
    d, _info = bidirectional_bfs_distance(edges, n, 0, 1)
    return pa.table({"dist": pa.array([d], pa.int64())})


def q_kmeans_clusters(sf_dir):
    """Spherical k-means cluster sizes over the embeddings table (rows-only)."""
    import ray.data

    from ray.data.aggregate import Count

    from networkit_ray.ann.search import kmeans_assign

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return (
        kmeans_assign(emb, n_centroids=8, lloyd_iters=3)
        .groupby("cluster")
        .aggregate(Count(alias_name="n_vecs"))
        .sort("cluster")
    )


def q_normalize_text(sf_dir):
    """Byte-deterministic normalization (lower, ws-collapse, trim)."""
    from networkit_ray.text.analysis import normalize_text

    return normalize_text(_docs(sf_dir, ["doc_id", "text"])).sort("doc_id")


def q_agglomerative(sf_dir):
    """Matching-based agglomerative communities; oracle-exact — the twin
    unrolls the fixed 4 levels × 4 handshake rounds with bit-exact
    integer-valued modularity gains (_agglomerative_sql)."""
    from networkit_ray.graph.agglomerative import agglomerative_communities

    canon, n = _canon(sf_dir)
    labels, _info = agglomerative_communities(canon, n, max_levels=4, num_parts=4)
    return labels.sort("v")


def q_scd_ground_truth(sf_dir):
    """Best-match Jaccard/F1/precision/recall of v%5 communities vs the
    continuous k=7 ground truth (SCDGroundTruthComparison, ignoreSeeds)."""
    from networkit_ray.graph.scd import scd_ground_truth_comparison
    from networkit_ray.sources.derive import num_customers
    from networkit_ray.sources.synth import generate_clustering

    n = num_customers(sf_dir)
    found = generate_clustering(n, "noncontinuous", k=5).map_batches(
        lambda t: pa.table({"seed": t["label"], "v": t["v"]}),
        batch_format="pyarrow",
    )
    truth = generate_clustering(n, "continuous", k=7)
    out = scd_ground_truth_comparison(found, truth)
    for c in ["jaccard", "f1", "precision", "recall"]:
        out = _round_col(out, c, 8)
    return out.sort("seed")


def q_clique_detect(sf_dir):
    """CliqueDetect seed communities; oracle-exact — the max clique of
    N(s) is canonical (lexicographic tie-break), so the twin
    (_cliquedetect_sql) enumerates by ordered extension."""
    from networkit_ray.graph.scd import clique_detect

    sym, n = _sym(sf_dir)
    return clique_detect(sym, n, [0, 7]).sort(["seed", "v"])


def q_lp_degree_ordered(sf_dir):
    """LPDegreeOrdered communities; exact unrolled tiered-argmax SQL twin
    (_lpdo_sql) replays the 4-tier sub-superstep schedule."""
    from networkit_ray.graph.plp import lp_degree_ordered

    sym, n = _sym(sf_dir)
    labels, _info = lp_degree_ordered(sym, n, update_threshold=0)
    return labels.sort("v")


def q_biconnected(sf_dir):
    """Per-edge biconnected-component labels (rows-only: Tarjan-Vishkin)."""
    from networkit_ray.graph.biconnected import biconnected_components

    sym, n = _sym(sf_dir)
    return biconnected_components(sym, n).sort(["src", "dst"])


def q_lfm_community(sf_dir):
    """LFMLocal fitness expansion from two seeds; oracle-exact — unrolled
    add+purge twin (_lfm_sql: alpha=1 fitness is one integer division;
    purge steps unrolled to a bounded depth like BFS level bounds)."""
    from networkit_ray.graph.scd import lfm_communities

    sym, n = _sym(sf_dir)
    return lfm_communities(
        sym, n, [0, 7], alpha=1.0, radius=3, max_size=50
    ).sort(["seed", "v"])


def q_set_conductance(sf_dir):
    """SetConductance of the v%5==0 vertex set on the symmetrized graph."""
    import ray.data

    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.scd import set_conductance

    sym, n = _sym(sf_dir)
    comm = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(0, n, 5, dtype=np.int64))})
    )
    c = set_conductance(sym, comm)
    return pa.table({"conductance": pa.array(round_half_away([c], 8))})


def q_simple_paths(sf_dir):
    """Path-length histogram of all simple paths 0→1 with ≤5 edges."""
    from ray.data.aggregate import Count

    from networkit_ray.graph.reachability import all_simple_paths

    edges, n = _derived(sf_dir)
    paths = all_simple_paths(edges, 0, 1, 5)

    def lengths(t):
        if len(t) == 0 or "path" not in t.column_names:
            return pa.table({"len": pa.array([], pa.int64())})
        ln = np.array([len(p) - 1 for p in t["path"].to_pylist()], np.int64)
        return pa.table({"len": pa.array(ln)})

    return (
        paths.map_batches(lengths, batch_format="pyarrow")
        .groupby("len")
        .aggregate(Count(alias_name="n_paths"))
        .sort("len")
    )


def q_curveball_degrees(sf_dir):
    """Degree histogram AFTER GlobalCurveball — must equal the original's
    (exact degree-sequence preservation is the randomizer's invariant, and
    the SQL twin is the pre-randomization histogram)."""
    from ray.data.aggregate import Count

    from networkit_ray.graph.curveball import global_curveball

    canon, n = _canon(sf_dir)
    out = global_curveball(canon, n, rounds=4, seed=7)

    def endpoints(t):
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(np.concatenate([s, d]))})

    return (
        out.map_batches(endpoints, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Count(alias_name="deg"))
        .groupby("deg")
        .aggregate(Count(alias_name="n_nodes"))
        .sort("deg")
    )


def q_bloom_prefilter(sf_dir):
    """Bloom no-false-negative invariant: probing the member set itself
    finds every distinct doc_id (count twin = COUNT(DISTINCT doc_id))."""
    import ray.data

    from networkit_ray.common.bloom import bloom_probe, build_bloom
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).materialize()
    ref = build_bloom(docs, "doc_id", m_bits=1 << 20, num_hashes=4)
    probed = bloom_probe(docs, "doc_id", ref, m_bits=1 << 20, num_hashes=4)
    distinct = (
        probed.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "hit": pa.array(
                        t["maybe_member"].to_numpy(zero_copy_only=False).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(Sum("hit", alias_name="h"))
    )
    agg = distinct.map_batches(
        lambda t: pa.table(
            {
                "n_found": pa.array(
                    [int((t["h"].to_numpy(zero_copy_only=False) > 0).sum())]
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("n_found", alias_name="n_found"))
    return pa.table({"n_found": pa.array([int(agg["n_found"] or 0)], pa.int64())})


def q_dgs_roundtrip(sf_dir):
    """DGS write -> read -> apply replay must reproduce G2 (same oracle)."""
    import os
    import tempfile

    from networkit_ray.graph.dynamics import apply_events, graph_difference
    from networkit_ray.sources.dgs import read_dgs, write_dgs

    g1, n = _derived(sf_dir)
    diff = graph_difference(g1, _perturbed(g1)).materialize()
    path = os.path.join(tempfile.mkdtemp(prefix="dgs_"), "stream.dgs")
    write_dgs(diff, path)
    back = read_dgs(path).materialize()
    return apply_events(g1, back).sort(["src", "dst"])


def q_reachable_nodes(sf_dir):
    from networkit_ray.graph.reachability import reachable_counts

    edges, n = _derived(sf_dir)
    return reachable_counts(edges, n).sort("v")


def q_local_similarity(sf_dir):
    from networkit_ray.graph.sparsification import local_similarity_scores

    canon, n = _canon(sf_dir)
    out = local_similarity_scores(canon, n)
    return _round_col(out, "ls_score", 8).sort(["src", "dst"])


SCAN_PARAMS = {"eps": 0.15, "mu": 3}


def q_scan_clustering(sf_dir):
    from networkit_ray.graph.scan import scan_clustering

    canon, n = _canon(sf_dir)
    out, _info = scan_clustering(canon, n, **SCAN_PARAMS)
    return out.sort("v")


def q_eccentricity(sf_dir):
    from networkit_ray.graph.bfs import bfs_distances

    edges, n = _sym(sf_dir)
    dist, _ = bfs_distances(edges, n, 0)

    def reduce_ecc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t["dist"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        keep = d >= 0
        if not keep.any():
            return pa.table(
                {"farthest": pa.array([], pa.int64()), "ecc": pa.array([], pa.int64())}
            )
        d, v = d[keep], v[keep]
        mx = d.max()
        return pa.table(
            {
                "farthest": pa.array([int(v[d == mx].min())]),
                "ecc": pa.array([int(mx)]),
            }
        )

    # per-block partial (block max + min-id argmax) then one tiny final fold
    partial = dist.map_batches(reduce_ecc, batch_format="pyarrow")
    t = pa.concat_tables(list(partial.iter_batches(batch_format="pyarrow")))
    ecc = t["ecc"].to_numpy(zero_copy_only=False)
    far = t["farthest"].to_numpy(zero_copy_only=False)
    mx = int(ecc.max())
    return pa.table(
        {
            "farthest": pa.array([int(far[ecc == mx].min())]),
            "ecc": pa.array([mx], pa.int64()),
        }
    )


def q_personalized_pagerank(sf_dir):
    from networkit_ray.graph.pagerank import personalized_pagerank

    edges, n = _derived(sf_dir)
    scores, _ = personalized_pagerank(edges, n, [0, 1], iterations=PR_ITERS)
    return _round_col(scores, "score", 8)


def q_pagerank_nibble(sf_dir):
    from networkit_ray.graph.nibble import pagerank_nibble

    sym, n = _sym(sf_dir)
    out, _ = pagerank_nibble(sym, n, [0], iterations=PR_ITERS, max_k=256)
    return out


def q_graph_profile(sf_dir):
    """profiling.Profile.create analog (networkit/profiling/profiling.py:
    241-310): one declarative battery of measures over the derived graph,
    assembled from the engine's existing kernels (all memoized)."""
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.build import graph_stats, max_degree
    from networkit_ray.graph.quality import assortativity, num_subsets, subset_sizes
    from networkit_ray.graph.triangles import triangle_count, undirected_degrees

    edges, n = _derived(sf_dir)
    canon, _ = _canon(sf_dir)
    sym, _ = _sym(sf_dir)
    labels, _ = _cc_labels(sf_dir)
    s = graph_stats(edges, n, directed=True)
    tri = triangle_count(canon, n)
    wedges = float(
        undirected_degrees(canon)
        .map_batches(
            lambda t: pa.table(
                {
                    "w": pa.compute.divide(
                        pa.compute.multiply(
                            t["deg"], pa.compute.subtract(t["deg"], 1)
                        ),
                        2,
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("w")
    )
    gcc = 3.0 * tri / wedges if wedges else 0.0
    largest = int(subset_sizes(labels).max("size"))
    return pa.table(
        {
            "n": pa.array([s["n"]], pa.int64()),
            "m": pa.array([s["m"]], pa.int64()),
            "density": pa.array(round_half_away([s["density"]], 8)),
            "max_degree": pa.array([max_degree(edges)], pa.int64()),
            "n_components": pa.array([num_subsets(labels)], pa.int64()),
            "largest_component": pa.array([largest], pa.int64()),
            "n_triangles": pa.array([tri], pa.int64()),
            "global_cc": pa.array(round_half_away([gcc], 8)),
            "assortativity": pa.array(
                round_half_away([assortativity(sym, n)], 8)
            ),
        }
    )


def q_spanning_forest(sf_dir):
    from networkit_ray.graph.forest import spanning_forest

    canon, n = _canon(sf_dir)
    return spanning_forest(canon, n).sort(["src", "dst"])


def q_algebraic_distances(sf_dir):
    from networkit_ray.graph.algdist import algebraic_distances

    sym, n = _sym(sf_dir)
    return _round_col(
        algebraic_distances(sym, n, systems=2, iterations=10), "ad", 8
    )


def q_random_walks(sf_dir):
    from networkit_ray.graph.walks import random_walks

    sym, n = _sym(sf_dir)
    return random_walks(sym, n, length=4, n_walkers=32, seed=42)


# ------- web
def q_web_text_roundtrip(sf_dir):
    from networkit_ray.web.extract import extract_texts
    from networkit_ray.web.htmlgen import pages_dataset

    return extract_texts(pages_dataset(sf_dir))


def q_web_edges(sf_dir):
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import pages_dataset

    return extract_edges(pages_dataset(sf_dir), ids="doc")


def q_warc_roundtrip(sf_dir):
    """Common-Crawl-native ingestion: pages → WARC shards on disk →
    parse (one task per shard) → outlink extraction; byte-identical html
    recovery means the edge table equals the direct-extraction oracle
    (sources/warc.py)."""
    import os
    import shutil

    from networkit_ray.sources.warc import read_warc, write_warc
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import pages_dataset

    # dir keyed on the FULL normalized path (two sf roots sharing a basename
    # must not collide) and wiped first — write_warc's resumable shard-skip
    # would otherwise serve stale shards if the corpus at sf_dir changed
    out = "/tmp/nkr_warc_" + os.path.normpath(sf_dir).strip("/").replace("/", "_")
    shutil.rmtree(out, ignore_errors=True)
    write_warc(pages_dataset(sf_dir), out, shards=8).materialize()
    return extract_edges(read_warc(out), ids="doc")


def q_robots_allowed(sf_dir):
    """robots.txt admission over the page corpus (web/robots.py): per-host
    rules parsed once per actor from a ray.put broadcast; longest-match
    Allow/Disallow REP semantics.  Synthesized rules are arithmetic in
    the host id, so admission has an exact SQL twin."""
    from networkit_ray.web.htmlgen import D_DOMAINS
    from networkit_ray.web.robots import robots_filter, robots_table
    from networkit_ray.web.htmlgen import pages_dataset

    out = robots_filter(pages_dataset(sf_dir), robots_table(D_DOMAINS))
    return out.select_columns(["url", "allowed"])


def q_host_capped_sample(sf_dir):
    """Domain balancing: ≤ 5 pages per host, smallest doc_id first
    (web/extract.py:cap_per_host); twin = ROW_NUMBER over host."""
    from networkit_ray.web.extract import cap_per_host
    from networkit_ray.web.htmlgen import pages_dataset

    return cap_per_host(pages_dataset(sf_dir), 5).sort(["host", "doc_id"])


def q_host_stats(sf_dir):
    """Per-host page counts and byte volume parsed from the url column
    (web/extract.py:host_stats); twin reconstructs hosts in SQL."""
    from networkit_ray.web.extract import host_stats
    from networkit_ray.web.htmlgen import pages_dataset

    return host_stats(pages_dataset(sf_dir)).sort("host")


def q_web_pagerank(sf_dir):
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.graph.pagerank import pagerank
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import num_documents, pages_dataset

    n = num_documents(sf_dir)
    edges = drop_self_loops(extract_edges(pages_dataset(sf_dir), ids="doc"))
    scores, _ = pagerank(edges, n, tol=0.0, max_iterations=PR_ITERS)
    return _round_col(scores, "score", 8)


def q_truncated_pagerank(sf_dir):
    """Becchetti et al. Truncated PageRank over the page graph: spam-farm
    demotion by dropping the first `trunc` path-length terms of the
    PageRank series (graph/pagerank.py:truncated_pagerank); twin unrolls
    the teleport-free recursion x_t = d·Mᵀx_{t-1} and sums (1-d)·x_t for
    t in (trunc, iters]."""
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.graph.pagerank import truncated_pagerank
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import num_documents, pages_dataset

    n = num_documents(sf_dir)
    edges = drop_self_loops(extract_edges(pages_dataset(sf_dir), ids="doc"))
    scores, _ = truncated_pagerank(edges, n, trunc=3, iterations=10)
    return _round_col(scores, "score", 8)


def q_host_edges(sf_dir):
    """Weighted host-level link graph: distinct page edges grouped by
    (host(src), host(dst)) with link-count weights (web/hostgraph.py:
    host_edges); twin reconstructs hosts from doc ids."""
    from networkit_ray.web.hostgraph import host_edges
    from networkit_ray.web.htmlgen import pages_dataset

    return host_edges(pages_dataset(sf_dir)).sort(["src", "dst"])


def q_host_pagerank(sf_dir):
    """Weighted PageRank over the host graph, self-loops dropped
    (web/hostgraph.py:host_pagerank); twin is a weighted power-iteration
    CTE over the reconstructed host edges."""
    from networkit_ray.web.hostgraph import host_pagerank
    from networkit_ray.web.htmlgen import pages_dataset

    scores, _ = host_pagerank(
        pages_dataset(sf_dir), tol=0.0, max_iterations=PR_ITERS
    )
    return _round_col(scores, "score", 8).sort("host")


def q_host_trustrank(sf_dir):
    """TrustRank over the host graph — weighted PPR restarting at a
    4-host trusted whitelist (web/hostgraph.py:host_trustrank)."""
    from networkit_ray.web.hostgraph import host_trustrank

    from networkit_ray.web.htmlgen import pages_dataset

    seeds = [f"site{i:04d}.example" for i in range(4)]
    scores, _ = host_trustrank(
        pages_dataset(sf_dir), seeds, iterations=PR_ITERS
    )
    return _round_col(scores, "score", 8).sort("host")


def q_anchor_summary(sf_dir):
    """Per-target anchor corpus: most common anchor per dst with total
    in-links (web/extract.py:anchor_summary)."""
    from networkit_ray.web.extract import anchor_summary, extract_anchors
    from networkit_ray.web.htmlgen import pages_dataset

    anchors = extract_anchors(pages_dataset(sf_dir), ids="doc")
    return anchor_summary(anchors).sort("dst")


def q_web_hits(sf_dir):
    """HITS hubs & authorities over the extracted page link graph
    (graph/hits.py); twin is the L2-normalized power-iteration CTE."""
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.graph.hits import hits
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import num_documents, pages_dataset

    n = num_documents(sf_dir)
    edges = drop_self_loops(
        extract_edges(pages_dataset(sf_dir), ids="doc")
    ).materialize()
    res, _ = hits(edges, n, iterations=HITS_ITERS)
    return _round_col(_round_col(res, "hub", 8), "auth", 8).sort("v")


def q_web_salsa(sf_dir):
    """SALSA hubs & authorities over the page link graph (graph/salsa.py) —
    degree-normalized alternating walk, L1 norms; twin is the exact
    fixed-iteration CTE."""
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.graph.salsa import salsa
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import num_documents, pages_dataset

    n = num_documents(sf_dir)
    edges = drop_self_loops(
        extract_edges(pages_dataset(sf_dir), ids="doc")
    ).materialize()
    res, _ = salsa(edges, n, iterations=HITS_ITERS)
    return _round_col(_round_col(res, "hub", 8), "auth", 8).sort("v")


# Deterministic edge thinning that gives the page graph a non-trivial
# bow-tie (all six Broder regions populated at N=500 and N=5000): keep an
# edge iff ((src*31 + dst*17) % 97) % 10 < 4 — shared verbatim with the SQL
# twin.
BOWTIE_KEEP_SQL = "((src * 31 + dst * 17) % 97) % 10 < 4"


def q_web_bowtie(sf_dir):
    """Broder bow-tie decomposition (CORE/IN/OUT/TUBE/TENDRIL/DISC) of the
    deterministically thinned page graph (graph/bowtie.py); twin derives
    every region from one recursive transitive closure."""
    import numpy as _np
    import pyarrow as _pa

    from networkit_ray.graph.bowtie import bowtie_decomposition
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import num_documents, pages_dataset

    n = num_documents(sf_dir)
    edges = drop_self_loops(extract_edges(pages_dataset(sf_dir), ids="doc"))

    def thin(t: _pa.Table) -> _pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return t.filter(_pa.array((s * 31 + d * 17) % 97 % 10 < 4))

    regions, _ = bowtie_decomposition(
        edges.map_batches(thin, batch_format="pyarrow"), n
    )
    return regions.sort("v")


def q_host_spam_mass(sf_dir):
    """Relative spam mass per host: (pagerank - trustrank) / pagerank over
    the weighted host graph, 4-host whitelist (web/hostgraph.py:
    host_spam_mass); twin composes the two rank CTEs on identically
    rounded scores."""
    from networkit_ray.web.hostgraph import host_spam_mass
    from networkit_ray.web.htmlgen import pages_dataset

    seeds = [f"site{i:04d}.example" for i in range(4)]
    return host_spam_mass(
        pages_dataset(sf_dir), seeds, iterations=PR_ITERS
    ).sort("host")


def q_powerlaw_alpha_hosts(sf_dir):
    """Hill/CSN power-law exponent of the weighted host in-degree
    distribution (graph/powerlaw.py:hill_alpha, the estimation half of the
    reference's generators/PowerlawDegreeSequence.cpp:1); twin is the
    closed-form MLE in SQL."""
    import pyarrow as _pa

    from networkit_ray.common.exchange import exchange_unique
    from networkit_ray.graph.powerlaw import hill_alpha_table
    from networkit_ray.web.hostgraph import host_edges
    from networkit_ray.web.htmlgen import pages_dataset

    he = host_edges(pages_dataset(sf_dir))
    ind = exchange_unique(
        he.map_batches(
            lambda t: _pa.table({"host": t["dst"], "deg": t["w"]}),
            batch_format="pyarrow",
        ),
        ["host"],
        agg=[("deg", "sum")],
        schema=_pa.schema([("host", _pa.string()), ("deg", _pa.int64())]),
    )
    return hill_alpha_table(ind, col="deg", dmin=5)


def q_cocitation_topk(sf_dir):
    """Top-20 co-cited page pairs (Small's co-citation count) on the page
    graph (graph/cocitation.py); twin is the src self-join."""
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.graph.cocitation import cocitation_scores, top_pairs
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import pages_dataset

    edges = drop_self_loops(extract_edges(pages_dataset(sf_dir), ids="doc"))
    return top_pairs(cocitation_scores(edges), k=20)


def q_coupling_topk(sf_dir):
    """Top-20 bibliographically coupled page pairs (Kessler) — co-citation
    on the transpose (graph/cocitation.py:coupling_scores)."""
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.graph.cocitation import coupling_scores, top_pairs
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import pages_dataset

    edges = drop_self_loops(extract_edges(pages_dataset(sf_dir), ids="doc"))
    return top_pairs(coupling_scores(edges), k=20)


def q_document_frequency(sf_dir):
    """(term, df) corpus document frequencies, df ≥ 5 (inverted-index
    statistics, text/analysis.py:document_frequency); twin unnests
    distinct per-doc terms."""
    from networkit_ray.text.analysis import document_frequency

    return document_frequency(
        _docs(sf_dir, columns=["doc_id", "text"]), min_df=5
    ).sort("term")


BM25_TERMS = ["hash", "join", "scan", "merge"]


def q_bm25_topk(sf_dir):
    """Top-20 BM25 scores for a fixed 4-term query
    (text/analysis.py:bm25_topk); twin mirrors the arithmetic
    operation-for-operation."""
    from networkit_ray.text.analysis import bm25_topk

    return bm25_topk(_docs(sf_dir, columns=["doc_id", "text"]), BM25_TERMS, k=20)


def q_gopher_filter(sf_dir):
    """Composite Gopher document-quality filter with a per-rule failure
    bitmask (text/analysis.py:gopher_filter); twin recomputes every rule in
    DuckDB list/regexp algebra."""
    from networkit_ray.text.analysis import gopher_filter

    return gopher_filter(_docs(sf_dir, columns=["doc_id", "text"])).sort("doc_id")


def q_redirect_resolution(sf_dir):
    """Hop-capped (8) redirect-chain canonicalization by pointer doubling —
    3 exchange joins instead of 8 chain-following passes
    (web/redirects.py:resolve_chains); twin chains 8 CASE steps."""
    import pyarrow as _pa
    import ray.data as _rd

    from networkit_ray.web.redirects import resolve_chains, synthetic_redirects

    redirects, _ = synthetic_redirects(sf_dir)
    universe = _rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda t: _pa.table({"v": t["doc_id"].cast(_pa.int64())}),
        batch_format="pyarrow",
    )
    return resolve_chains(universe, redirects, max_hops=8).sort("src_doc")


def q_anchor_texts(sf_dir):
    """Anchor-text link table (src, dst, anchor) with per-page first-wins
    target dedup (web/extract.py:AnchorTextExtractor); twin replays the
    fixture's link arithmetic with ROW_NUMBER first-wins."""
    from networkit_ray.web.extract import extract_anchors
    from networkit_ray.web.htmlgen import pages_dataset

    return extract_anchors(pages_dataset(sf_dir), ids="doc").sort(["src", "dst"])


def q_anchor_histogram(sf_dir):
    """(anchor, n_links) global anchor-text histogram — per-batch combiner
    plus one task-exchange groupby over the anchor string."""
    from networkit_ray.common.exchange import exchange_unique
    from networkit_ray.web.extract import extract_anchors
    from networkit_ray.web.htmlgen import pages_dataset

    import numpy as _np
    import pyarrow as _pa

    anchors = extract_anchors(pages_dataset(sf_dir), ids="doc")

    def partial(t: _pa.Table) -> _pa.Table:
        tt = _pa.table(
            {
                "anchor": t["anchor"],
                "n_links": _pa.array(_np.ones(t.num_rows, _np.int64)),
            }
        )
        g = tt.group_by(["anchor"]).aggregate([("n_links", "sum")])
        return g.rename_columns(["anchor", "n_links"])

    out = exchange_unique(
        anchors.map_batches(partial, batch_format="pyarrow"),
        ["anchor"],
        agg=[("n_links", "sum")],
        schema=_pa.schema([("anchor", _pa.string()), ("n_links", _pa.int64())]),
    )
    return out.sort("anchor")


# ------- documents / text
def q_exact_dedup(sf_dir):
    from networkit_ray.dedup.exact import exact_dedup_keepers

    return exact_dedup_keepers(_docs(sf_dir, ["doc_id", "text"]))


def q_segment_dedup(sf_dir):
    """CCNet-style global first-wins segment dedup (dedup/lines.py):
    duplicate 8-word windows keep only their smallest-(doc_id, seg_no)
    copy; documents reassembled from surviving segments."""
    from networkit_ray.dedup.lines import segment_dedup

    return segment_dedup(_docs(sf_dir, ["doc_id", "text"]), mode="words", seg_len=8)


def q_substring_dedup(sf_dir):
    """ExactSubstr-style duplicated-substring removal (dedup/substring.py;
    Lee et al. 2022 semantics as sliding-window first-wins + token
    masking): a token survives iff some covering ≥8-token window is the
    corpus-wide first occurrence of its content (or the doc is shorter
    than the window); oracle-exact — the twin rebuilds the same windows
    with string_split + STRING_AGG and replays the first-wins + coverage
    rule in SQL."""
    from networkit_ray.dedup.substring import substring_dedup

    return substring_dedup(
        _docs(sf_dir, ["doc_id", "text"]), min_len=8
    ).sort("doc_id")


def q_redact_pii(sf_dir):
    """PII redaction (text/redact.py — warm-regex actor pool) over a
    deterministic contact corpus derived from customer by integer
    arithmetic (the fixture documents contain no PII, so the corpus is
    synthesized identically on both sides); oracle-exact — the twin
    builds the same corpus with SQL concatenation and replays the
    ordered email→phone→ipv4 redaction with RE2 ``regexp_replace('g')``
    (the default patterns use only re/RE2-identical constructs)."""
    import pyarrow.compute as pc
    import ray.data

    from networkit_ray.text.redact import redact_pii

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def mk(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)

        def s(arr):
            return pc.cast(pa.array(arr), pa.string())

        text = pc.binary_join_element_wise(
            "Contact ", t["c_name"], " at user", s(k), "@site", s(k % 50),
            ".example or +1-", s(100 + k % 900), "-", s(1000 + (k * 7) % 9000),
            " from ", s(k % 256), ".", s((k * 3) % 256), ".",
            s((k * 7) % 256), ".", s((k * 13) % 256), " done", "",
        )
        return pa.table({"doc_id": pa.array(k), "text": text})

    corpus = cust.map_batches(mk, batch_format="pyarrow")
    return redact_pii(corpus).sort("doc_id")


def q_token_counts(sf_dir):
    from networkit_ray.text.analysis import token_counts

    return token_counts(_docs(sf_dir, ["doc_id", "text"]))


def q_tfidf_top_terms(sf_dir):
    from networkit_ray.text.analysis import tfidf_top_terms
    from networkit_ray.web.htmlgen import num_documents

    out = tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), num_documents(sf_dir), k=3)
    return _round_col(out, "score", 8).sort(["doc_id", "term"])


def q_token_percentiles(sf_dir):
    from networkit_ray.text.analysis import token_count_percentiles

    return token_count_percentiles(_docs(sf_dir, ["lang", "text"])).sort("lang")


def q_quality_scores(sf_dir):
    from networkit_ray.text.analysis import quality_scores

    return quality_scores(_docs(sf_dir, ["doc_id", "text"]))


def q_repetition_scores(sf_dir):
    """Gopher-style within-document repetition filters (duplicate word /
    duplicate 3-gram fractions) — text/analysis.py:repetition_scores."""
    from networkit_ray.text.analysis import repetition_scores

    return repetition_scores(_docs(sf_dir, ["doc_id", "text"]))


def q_fingerprint_md5(sf_dir):
    from networkit_ray.text.analysis import fingerprints

    return fingerprints(_docs(sf_dir, ["doc_id", "text"])).select_columns(["doc_id", "md5"])


def q_lang_histogram(sf_dir):
    from networkit_ray.text.analysis import lang_histogram

    return lang_histogram(_docs(sf_dir, ["lang"]))


def q_langid(sf_dir):
    from networkit_ray.text.analysis import langid

    return langid(_docs(sf_dir, ["doc_id", "text"]))


def q_minhash_near_dups(sf_dir):
    """MinHash+LSH near-dups with the md5 token hasher and splitmix64
    permutation draw, so shingle hashes, all 64 signature lanes, the
    16×4 banding, the bucket cap and the exact-Jaccard verify are all
    replayed by the SQL twin (_minhash_sql); the siphash/PCG64 defaults
    keep their pytest oracles."""
    from networkit_ray.dedup.minhash import near_dup_pairs

    return _round_col(
        near_dup_pairs(
            _docs(sf_dir, ["doc_id", "text"]),
            threshold=0.8,
            hasher="md5",
            perm_gen="hash",
        ),
        "jaccard",
        6,
    )


def q_simhash_near_dups(sf_dir):
    """64-bit SimHash near-dups with the md5 token hasher (DuckDB's
    md5_number_upper), so lanes, fingerprints, the 4×16-bit Charikar
    banding and the Hamming verify all have an exact SQL twin
    (_simhash_sql); the siphash default keeps its pytest oracles."""
    from networkit_ray.dedup.simhash import simhash_near_dups

    return simhash_near_dups(
        _docs(sf_dir, ["doc_id", "text"]), max_hamming=3, hasher="md5"
    )


def q_jaccard_near_dups(sf_dir):
    from networkit_ray.dedup.jaccard import jaccard_near_dups

    return _round_col(jaccard_near_dups(_docs(sf_dir, ["doc_id", "text"]), threshold=0.8), "jaccard", 6)


def q_embedding_near_dups(sf_dir):
    import ray.data

    from networkit_ray.dedup.embed import embedding_near_dups

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.take(1)[0]["embedding"])
    # testdata cluster cosines sit around 0.3-0.5 (max ~0.5 at sf0.01), so
    # 0.4 is the regime where near-dup pairs actually exist; band shape is
    # auto-tuned to ≥0.99 recall at this threshold (32 bands × 4 planes).
    # plane_gen="hash" (splitmix64 + Box-Muller) makes the banding SQL-
    # replayable — oracle-exact; the PCG64 default keeps its recall tests.
    return _round_col(
        embedding_near_dups(emb, dim, threshold=0.4, plane_gen="hash"), "cos", 6
    )


def q_embedding_near_dups_exact(sf_dir):
    import ray.data

    from networkit_ray.dedup.embed import embedding_near_dups_exact

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return _round_col(embedding_near_dups_exact(emb, threshold=0.4), "cos", 6)


def q_ann_topk(sf_dir):
    import ray.data

    from networkit_ray.ann.search import brute_force_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(emb, [0, 1, 2, 3, 4], k=5)


def q_ann_lsh_topk(sf_dir):
    """Hyperplane-LSH probed top-k with the splitmix64+Box-Muller plane
    draw (plane_gen="hash"), so bucket keys, the ≤2-bit-flip probe set and
    the exact ranking of the probed subset all have a SQL twin; the PCG64
    default plane draw keeps its recall-vs-brute-force tests."""
    import ray.data

    from networkit_ray.ann.search import lsh_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(emb, [0, 1, 2, 3, 4], k=5, plane_gen="hash")


def q_ann_ivf_topk(sf_dir):
    import ray.data

    from networkit_ray.ann.search import ivf_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, [0, 1, 2, 3, 4], k=5)


def q_multimodal_decode(sf_dir):
    import pyarrow.compute as pc

    from networkit_ray.multimodal.decode import decode_media, synth_media

    # REAL decode: synth_media emits genuine P6 PPM payloads; the actor
    # pool parses headers + pixel buffers and extracts content features.
    # noise_gen="hash" (splitmix64 counter bytes) lets the SQL twin replay
    # the synth→encode→decode→feature pipeline analytically
    # (_multimodal_sql); the PCG64 default keeps its decode tests.
    dec = decode_media(synth_media(200, kind="image", noise_gen="hash"), real=True)

    def scalarize(t: pa.Table) -> pa.Table:
        feats = t["features"].combine_chunks()
        fsum = np.array([float(np.sum(f)) for f in feats.to_pylist()])
        from networkit_ray.common.hashing import round_half_away

        return pa.table(
            {
                "id": t["id"],
                "height": t["height"],
                "width": t["width"],
                "channels": t["channels"],
                "feat_sum": pa.array(round_half_away(fsum, 6)),
            }
        )

    return dec.map_batches(scalarize, batch_format="pyarrow")


def q_rmat_edges(sf_dir):
    from networkit_ray.sources.synth import rmat_edges

    edges, n = rmat_edges(10, 8)
    return edges


def q_hyperbolic_edges(sf_dir):
    """generators/HyperbolicGenerator.cpp cold (T=0) threshold variant;
    oracle-exact — the splitmix64 coordinate draws and the cosh-distance
    threshold are replayed in SQL (_hyperbolic_sql); replica-exact /
    power-law tests in tests/test_generators2.py."""
    from networkit_ray.sources.synth import hyperbolic_edges

    edges, _n = hyperbolic_edges(512, 6.0, 0.85, seed=42)
    return edges.sort(["src", "dst"])


def q_barabasi_albert(sf_dir):
    """generators/BarabasiAlbertGenerator.cpp Batagelj form (hash draws);
    bit-exact SQL twin replays the hash positions + pointer chase
    (_ba_sql); sequential-replica tests in tests/test_generators2.py."""
    from networkit_ray.sources.synth import barabasi_albert_edges

    edges, _n = barabasi_albert_edges(1024, 4, seed=42)
    return edges.sort(["src", "dst"])


def q_er_edges(sf_dir):
    """generators/ErdosRenyiGenerator.cpp analog (G(n,m) counter hash);
    bit-exact SQL twin replays the splitmix64 hash in DuckDB (_er_sql)."""
    from networkit_ray.sources.synth import erdos_renyi_edges

    edges, _n = erdos_renyi_edges(1024, m=4096)
    return edges.sort(["src", "dst"])


def q_watts_strogatz_edges(sf_dir):
    """generators/WattsStrogatzGenerator.cpp analog (hash rewiring);
    bit-exact SQL twin replays the splitmix64 rewiring in DuckDB (_ws_sql)."""
    from networkit_ray.sources.synth import watts_strogatz_edges

    edges, _n = watts_strogatz_edges(1024, 4, 0.1)
    return edges.sort(["src", "dst"])


def q_chung_lu_edges(sf_dir):
    """generators/ChungLuGenerator.cpp analog (expected-degree draws via
    broadcast CDF); oracle-exact — bit-exact splitmix64 + recursive-CTE
    prefix-sum SQL twin (_chung_lu_sql) + property tests in
    tests/test_sources.py."""
    import numpy as np

    from networkit_ray.sources.synth import chung_lu_edges

    n = 1024
    w = 20.0 / np.sqrt(np.arange(n) + 1.0)  # power-law-ish expected degrees
    edges, _n = chung_lu_edges(n, w)
    return edges.sort(["src", "dst"])


def _weighted_derived(sf_dir):
    """Derived graph with deterministic w = (src+dst)%7+1 (both sides)."""
    edges, n = _derived(sf_dir)

    def add_w(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = ((src + dst) % 7 + 1).astype(np.float64)
        return t.append_column("w", pa.array(w))

    return edges.map_batches(add_w, batch_format="pyarrow"), n


def q_weighted_degree(sf_dir):
    from networkit_ray.graph.build import weighted_degree_table

    weighted, _ = _weighted_derived(sf_dir)
    return weighted_degree_table(weighted)


def q_sssp_distances(sf_dir):
    from networkit_ray.graph.bfs import sssp_distances

    weighted, n = _weighted_derived(sf_dir)
    dists, _ = sssp_distances(weighted, n, source=0)
    return _round_col(dists, "dist", 8)


def q_bidirectional_sssp(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.bfs import bidirectional_sssp_distance

    weighted, n = _weighted_derived(sf_dir)
    d, _ = bidirectional_sssp_distance(weighted, n, 0, n // 2)
    return pa.table({"dist": pa.array(round_half_away([d], 8))})


def q_spanning_edge_centrality(sf_dir):
    """centrality/SpanningEdgeCentrality.cpp:68-105 runApproximation
    analog (k=48 JL sketch, counter-hash signs, one multi-RHS block-CG);
    oracle-exact — sketch RHS + CG trajectory replayed by an unrolled SQL
    CG (_sec_sql); pinv-oracle bounds in tests/test_spanning_edge.py."""
    from networkit_ray.graph.algebraic import spanning_edge_centrality

    sym, n = _sym(sf_dir)
    canon, _ = _canon(sf_dir)
    scored, _ = spanning_edge_centrality(sym, canon, n, k=48, seed=42)
    return _round_col(scored, "sec", 6).sort(["src", "dst"])


def q_electrical_closeness(sf_dir):
    """centrality/ApproxElectricalCloseness.cpp analog: diag(L⁺) from the
    same k=48 JL sketch solve as spanning_edge_centrality, closeness
    (n−1)/(n·diag + tr); oracle-exact — the same unrolled SQL CG replay (_ec_sql);
    pinv-oracle bounds in tests/test_spanning_edge.py::TestElectricalCloseness."""
    from networkit_ray.graph.algebraic import electrical_closeness

    sym, n = _sym(sf_dir)
    out, _ = electrical_closeness(sym, n, k=48, seed=42)
    out = out.drop_columns(["diag"])
    return _round_col(out, "electrical_closeness", 6).sort("v")


def q_pivot_mds(sf_dir):
    """viz/PivotMDS.cpp analog (deterministic evenly-spaced pivots, exact
    k×k eigensolve); oracle-exact — the twin re-derives the Gram matrix in
    SQL and runs its own unrolled cyclic-Jacobi 8×8 eigensolve
    (_pivot_mds_sql); also verified against a numpy replication of the
    reference algorithm in tests/test_layout.py."""
    from networkit_ray.graph.layout import pivot_mds

    sym, n = _sym(sf_dir)
    coords = pivot_mds(sym, n, num_pivots=8)
    return _round_col(_round_col(coords, "x", 6), "y", 6).sort("v")


def q_commute_time(sf_dir):
    """distance/CommuteTimeDistance.cpp:154-189 analog; oracle-exact — the
    block-CG trajectory (alpha/beta guards, stop rule) is replayed by an
    unrolled SQL CG (_commute_time_sql); pinv-oracle exactness in
    tests/test_algebraic.py.  Pairs are the 6 smallest vertex
    ids of the giant component, paired consecutively."""
    import ray.data

    from networkit_ray.graph.algebraic import commute_time_distance

    sym, n = _sym(sf_dir)
    labels, _ = _cc_labels(sf_dir)
    # giant component + its 6 smallest vertices, fully distributed: a
    # groupby-count → sort → limit(1) picks the giant label (count desc,
    # label asc tie-break), then a filter → sort → limit(6) pulls only 6
    # rows to the driver — no vertex-sized to_pandas()
    giant = int(
        labels.groupby("label")
        .count()
        .sort(["count()", "label"], descending=[True, False])
        .limit(1)
        .take_all()[0]["label"]
    )
    vs = [
        r["v"]
        for r in labels.map_batches(
            lambda t: t.filter(pa.compute.equal(t["label"], giant)),
            batch_format="pyarrow",
        ).sort("v").limit(6).take_all()
    ]
    pairs = [(int(vs[i]), int(vs[i + 1])) for i in range(0, 6, 2)]
    t, _ = commute_time_distance(sym, n, pairs, tol=1e-12)
    return _round_col(ray.data.from_arrow(t), "ctd", 6)


def q_stress_layout(sf_dir):
    """MaxentStress's sparse-stress half (pivot-anchored majorization);
    oracle-exact — splitmix init + unrolled pivot-BFS + 20 majorization
    updates replayed in SQL (_stress_sql); stress-descent / ring-geometry
    tests in tests/test_layout.py."""
    from networkit_ray.graph.layout import stress_layout

    sym, n = _sym(sf_dir)
    out, _ = stress_layout(sym, n, num_pivots=8, iterations=20, seed=42)
    out = _round_col(out, "x", 6)
    return _round_col(out, "y", 6).sort("v")


def q_cut_clustering(sf_dir):
    """Flake–Tarjan cut clustering on the supplier ring graph (α = 0.8:
    between the unit ring weights and the chord density); oracle-exact —
    the twin runs its own multi-source integer Edmonds–Karp plus the
    (degree DESC, id ASC) assignment fold (_cutcluster_sql); EK-replica
    tests in tests/test_flow.py."""
    from networkit_ray.graph.flow import cut_clustering
    from networkit_ray.sources.derive import supplier_ring_edges

    sym, s = supplier_ring_edges(sf_dir)
    sym_w = sym.map_batches(
        lambda t: t.append_column("w", pa.array(np.ones(len(t), np.float64))),
        batch_format="pyarrow",
    ).materialize()
    return cut_clustering(sym_w, s, 0.8).sort("v")


def q_max_flow(sf_dir):
    """flow/EdmondsKarp.cpp analog on the symmetrized weighted graph
    (capacity (src+dst)%7+1, symmetric so both directions agree);
    oracle-exact — the flow VALUE is unique and the source side (residual
    reachability from s) is the unique inclusion-minimal min cut, so the
    twin (_maxflow_sql) runs its own SQL Edmonds–Karp rather than
    replaying the engine's paths.  The engine's augmentation count is
    path-rule-dependent diagnostics (still in ``info``; min-cut/max-flow
    invariants asserted against a numpy oracle in tests/test_flow.py)."""
    from ray.data.aggregate import Sum as RaySum

    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.flow import max_flow

    sym, n = _sym(sf_dir)

    def add_w(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = ((src + dst) % 7 + 1).astype(np.float64)
        return t.append_column("w", pa.array(w))

    wsym = sym.map_batches(add_w, batch_format="pyarrow").materialize()
    # target = min-weighted-degree vertex (min id tie-break, never the
    # source): min cut ≈ its weighted degree, keeping augmentations small
    # distributed pick: sort((wd, v)) → limit(1) pulls ONE row, not the
    # whole vertex-sized weighted-degree table
    t_v = int(
        wsym.map_batches(
            lambda t: pa.table({"v": t["src"], "wd": t["w"]}),
            batch_format="pyarrow",
        )
        .groupby("v")
        .aggregate(RaySum("wd", alias_name="wd"))
        .map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["v"], 0)),
            batch_format="pyarrow",
        )
        .sort(["wd", "v"])
        .limit(1)
        .take_all()[0]["v"]
    )
    f, side, _info = max_flow(wsym, n, 0, t_v)
    n_side = int(side.sum("in_source_set"))
    return pa.table(
        {
            "max_flow": pa.array(round_half_away([f], 6)),
            "source_set_size": pa.array([n_side], pa.int64()),
        }
    )


def q_spsp(sf_dir):
    from networkit_ray.graph.bfs import spsp

    edges, n = _derived(sf_dir)
    pairs = [(i, (i * 37 + 11) % n) for i in range(6)]
    return spsp(edges, n, pairs)


def q_katz(sf_dir):
    from networkit_ray.graph.centrality import katz

    edges, n = _derived(sf_dir)
    scores, _ = katz(edges, n, alpha=0.05, beta=1.0, tol=0.0, max_iterations=20)
    return _round_col(scores, "score", 8)


def q_eigenvector(sf_dir):
    from networkit_ray.graph.centrality import eigenvector

    sym, n = _sym(sf_dir)
    scores, _ = eigenvector(sym, n, max_iterations=20)
    return _round_col(scores, "score", 8)


def q_bfs_distances(sf_dir):
    from networkit_ray.graph.bfs import bfs_distances

    edges, n = _derived(sf_dir)
    d, _ = bfs_distances(edges, n, 0)
    return d


def q_reverse_bfs(sf_dir):
    from networkit_ray.graph.bfs import bfs_distances
    from networkit_ray.graph.build import transpose

    edges, n = _derived(sf_dir)
    d, _ = bfs_distances(transpose(edges), n, 0)
    return d


def q_map_equation(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.quality import map_equation

    canon, n = _canon(sf_dir)
    v = map_equation(canon, _mod_labels(n, 10))
    return pa.table({"map_eq": pa.array(round_half_away([v], 8))})


def q_sample_edges(sf_dir):
    from networkit_ray.graph.sampling import sample_edges

    edges, _ = _derived(sf_dir)
    return sample_edges(edges, 0.3, seed=42)


def q_random_edge(sf_dir):
    from networkit_ray.graph.sampling import random_edge

    edges, _ = _derived(sf_dir)
    return random_edge(edges, seed=42)


def q_approx_global_clustering(sf_dir):
    """Wedge-sampled global clustering coefficient with the splitmix64
    sampler (statistically equivalent to the PCG64 default, which stays
    covered by error-bound tests); oracle-exact — _agcc_sql replays the
    integer wedge CDF, position draws, and rank arithmetic."""
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.sampling import approx_global_clustering

    sym, n = _sym(sf_dir)
    gcc, info = approx_global_clustering(
        sym, n, n_samples=4000, seed=42, sampler="hash"
    )
    return pa.table(
        {
            "approx_gcc": pa.array(round_half_away([gcc], 6)),
            "samples": pa.array([info["samples"]], pa.int64()),
        }
    )


def q_effective_diameter(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.diameter import effective_diameter

    sym, n = _sym(sf_dir)
    eff, info = effective_diameter(sym, n, ratio=0.9)
    # 4 decimals: the SQL twin reproduces the FM curve to ~1e-12 relative,
    # so 4-dp rounding leaves no realistic knife-edge on the interpolation
    return pa.table(
        {
            "effective_diameter": pa.array(round_half_away([eff], 4)),
            "iterations": pa.array([info["iterations"]], pa.int64()),
        }
    )


def q_hop_plot(sf_dir):
    from networkit_ray.graph.diameter import hop_plot

    sym, n = _sym(sf_dir)
    # 2 decimals: n_pairs is O(n^2)-magnitude, where 4-dp rounding would sit
    # inside cross-system float-summation noise; 2 dp is exact vs the twin
    return _round_col(hop_plot(sym, n), "n_pairs", 2)


def q_hop_histogram(sf_dir):
    from networkit_ray.graph.diameter import hop_histogram_sampled

    sym, n = _sym(sf_dir)
    return hop_histogram_sampled(sym, n, sample=16, seed=42)


def q_betweenness(sf_dir):
    """centrality/EstimateBetweenness.cpp analog with the deterministic
    multiplicative-hash pivot rule (closeness._pivots, seed 7) in place of
    the PCG64 draw — oracle-exact (_betweenness_sql with the hash-rank
    pivot CTE); the seeded-draw default path stays covered by
    tests/test_betweenness.py."""
    from networkit_ray.graph.betweenness import estimate_betweenness
    from networkit_ray.graph.closeness import _pivots

    edges, n = _derived(sf_dir)
    bc, _ = estimate_betweenness(edges, n, pivots=_pivots(n, min(16, n), 7))
    return _round_col(bc, "betweenness", 6)


def q_betweenness_pivots(sf_dir):
    """Brandes betweenness from 16 deterministic evenly-spaced pivots
    (centrality/EstimateBetweenness.cpp semantics with an explicit pivot
    set instead of the seeded draw) — the pivot rule (v % (n//16) == 0,
    first 16) is SQL-expressible, so this variant carries the exact
    unrolled forward-BFS + backward-dependency oracle twin."""
    from networkit_ray.graph.betweenness import estimate_betweenness

    edges, n = _derived(sf_dir)
    step = max(n // 16, 1)
    # clamp to ids < n (mirrors the twin's WHERE v % step == 0 LIMIT 16,
    # which yields fewer pivots — and a different scale — when n < 16)
    pivots = (np.arange(16) * step)[: max(min(16, n), 1)]
    pivots = pivots[pivots < n]
    bc, _ = estimate_betweenness(edges, n, pivots=pivots)
    return _round_col(bc, "betweenness", 6)


def q_dyn_betweenness(sf_dir):
    """centrality/DynApproxBetweenness.cpp analog: retained per-pivot
    Brandes state repaired after an edge-insert batch; oracle-exact —
    the repaired result equals a from-scratch Brandes on base ∪ inserts
    (repair == full-recompute equality also proven in
    tests/test_betweenness.py), and with hash-ranked pivots + the 8
    smallest held-out (src, dst) edges both sides are SQL-expressible
    (_betweenness_sql with the multiplicative-hash pivot rule)."""
    from networkit_ray.graph.betweenness import (
        dyn_betweenness,
        dyn_betweenness_update,
    )
    from networkit_ray.graph.closeness import _pivots

    edges, n = _derived(sf_dir)

    def split(keep_held):
        def f(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            held = (s * 31 + d) % 97 == 0
            return t.filter(pa.array(held if keep_held else ~held))

        return f

    base = edges.map_batches(split(False), batch_format="pyarrow").materialize()
    ins = (
        edges.map_batches(split(True), batch_format="pyarrow")
        .sort(["src", "dst"])
        .limit(8)
        .materialize()
    )
    _, state, _ = dyn_betweenness(base, n, pivots=_pivots(n, min(16, n), 42))
    bc, _, _ = dyn_betweenness_update(state, ins)
    return _round_col(bc, "betweenness", 6).sort("v")


def q_adaptive_betweenness(sf_dir):
    """Kadabra-style adaptively sampled betweenness (Hoeffding budget +
    stability early stop), run with the hash-rank pivot sampler so the
    ENTIRE adaptive schedule — per-round pivot draws, the ln(2n/δ)/(2ε²)
    budget, the ε/2 stability stop, the n/k rescale — is replayed by the
    exact SQL twin (_adaptive_betweenness_sql).  The PCG64 default sampler
    stays covered by eps-vs-exact tests in tests/test_betweenness.py."""
    from networkit_ray.graph.betweenness import adaptive_betweenness

    edges, n = _derived(sf_dir)
    bc, _ = adaptive_betweenness(
        edges, n, eps=0.35, delta=0.1, batch=16, seed=7, sampler="hash"
    )
    return _round_col(bc, "betweenness", 6).sort("v")


def q_core_decomposition(sf_dir):
    from networkit_ray.graph.core import core_decomposition

    sym, n = _sym(sf_dir)
    cores, _ = core_decomposition(sym, n)
    return cores


def q_approx_closeness(sf_dir):
    from networkit_ray.graph.closeness import approx_harmonic_closeness

    sym, n = _sym(sf_dir)
    out, _ = approx_harmonic_closeness(sym, n, sample=8)
    out = _round_col(out, "harmonic", 8)
    return _round_col(out, "closeness", 8)


def q_global_clustering(sf_dir):
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.graph.triangles import triangle_count, undirected_degrees

    canon, n = _canon(sf_dir)
    tri = triangle_count(canon, n)
    # wedge count stays distributed: per-batch deg*(deg-1)/2 + Dataset sum
    # (never pull the O(n) degree table to the driver)
    wedges = float(
        undirected_degrees(canon)
        .map_batches(
            lambda t: pa.table(
                {"_w": pa.compute.multiply(
                    t["deg"], pa.compute.subtract(t["deg"], 1))}
            ),
            batch_format="pyarrow",
        )
        .sum("_w")
        / 2.0
    )
    gcc = 3.0 * tri / wedges if wedges else 0.0
    return pa.table({"global_cc": pa.array(round_half_away([gcc], 8))})


# ------- events
def q_tumbling_window(sf_dir):
    import ray.data

    from networkit_ray.pipelines.events import tumbling_window

    return tumbling_window(ray.data.read_parquet(f"{sf_dir}/events.parquet"))


def q_sliding_window(sf_dir):
    import ray.data

    from networkit_ray.pipelines.events import sliding_window

    return sliding_window(ray.data.read_parquet(f"{sf_dir}/events.parquet"))


def q_asof_click_to_view(sf_dir):
    import ray.data

    from networkit_ray.pipelines.events import asof_click_to_view

    return asof_click_to_view(ray.data.read_parquet(f"{sf_dir}/events.parquet"))


def q_sessionize(sf_dir):
    import ray.data

    from networkit_ray.pipelines.events import sessionize

    return sessionize(ray.data.read_parquet(f"{sf_dir}/events.parquet"))


def q_event_type_histogram(sf_dir):
    import ray.data

    from networkit_ray.pipelines.events import event_type_histogram

    return event_type_histogram(ray.data.read_parquet(f"{sf_dir}/events.parquet"))


def q_approx_distinct_users(sf_dir):
    """FM-sketch streaming COUNT(DISTINCT user_id) GROUP BY event_type;
    bit-exact SQL twin replays the sketch in DuckDB (_fm_distinct_sql);
    relative-error and determinism tests in tests/test_events_sketch.py."""
    import ray.data

    from networkit_ray.pipelines.events import approx_distinct_users

    out = approx_distinct_users(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    )
    return _round_col(out, "approx_distinct", 6).sort("event_type")


# ---------------------------------------------------------------- contract
def entry() -> Any:
    """Flagship north-star slice at sf0.001: pages → extract (actor pool) →
    edge table → PageRank → top-20 vertex table."""
    from networkit_ray.graph.build import drop_self_loops
    from networkit_ray.graph.pagerank import pagerank
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import num_documents, pages_dataset

    sf_dir = "/root/testdata/sf0.001"
    n = num_documents(sf_dir)
    pages = pages_dataset(sf_dir)
    edges = drop_self_loops(extract_edges(pages, ids="doc"))
    scores, info = pagerank(edges, n, tol=1e-6, norm="l1")
    return scores.sort("score", descending=True).limit(20).to_pandas()


def _queries_raw() -> dict[str, Callable[[str], Any]]:
    return {
        "edge_table": q_edge_table,
        "edge_table_sym": q_edge_table_sym,
        "degree_table": q_degree_table,
        "in_degree_table": q_in_degree_table,
        "max_degree": q_max_degree,
        "graph_stats": q_graph_stats,
        "transpose": q_transpose,
        "subgraph": q_subgraph,
        "compact_ids": q_compact_ids,
        "pagerank": q_pagerank,
        "pagerank_topk": q_pagerank_topk,
        "connected_components": q_connected_components,
        "cc_sizes": q_cc_sizes,
        "num_components": q_num_components,
        "plp_communities": q_plp_communities,
        "scc": q_scc,
        "wcc": q_wcc,
        "louvain": q_louvain,
        "louvain_modularity": q_louvain_modularity,
        "modularity": q_modularity,
        "coverage": q_coverage,
        "edge_cut": q_edge_cut,
        "conductance": q_conductance,
        "nmi": q_nmi,
        "ari": q_ari,
        "cover_f1": q_cover_f1,
        "overlapping_nmi": q_overlapping_nmi,
        "hashing_overlapper": q_hashing_overlapper,
        "cover_hub_dominance": q_cover_hub_dominance,
        "jaccard_measure": q_jaccard_measure,
        "node_rand": q_node_rand,
        "graph_rand": q_graph_rand,
        "partition_fragmentation": q_partition_fragmentation,
        "expansion": q_expansion,
        "triangle_count": q_triangle_count,
        "triangles_per_vertex": q_triangles_per_vertex,
        "lcc": q_lcc,
        "assortativity": q_assortativity,
        "partition_intersection": q_partition_intersection,
        "greedy_coloring": q_greedy_coloring,
        "k_truss": q_k_truss,
        "clique_counts": q_clique_counts,
        "maximal_cliques": q_maximal_cliques,
        "group_degree": q_group_degree,
        "group_closeness": q_group_closeness,
        "group_harmonic_closeness": q_group_harmonic_closeness,
        "ged_walk": q_ged_walk,
        "sgns_embeddings": q_sgns_embeddings,
        "node2vec_walks": q_node2vec_walks,
        "incremental_cc": q_incremental_cc,
        "warm_pagerank": q_warm_pagerank,
        "warm_katz": q_warm_katz,
        "lfm_cover": q_lfm_cover,
        "bidirectional_sssp": q_bidirectional_sssp,
        "leiden_refine": q_leiden_refine,
        "ego_splitting": q_ego_splitting,
        "diameter": q_diameter,
        "harmonic_closeness_exact": q_harmonic_closeness_exact,
        "local_max_matching": q_local_max_matching,
        "suitor_matching": q_suitor_matching,
        "path_growing_matching": q_path_growing_matching,
        "seir": q_seir,
        "edge_switch_degrees": q_edge_switch_degrees,
        "jaccard_edge_scores": q_jaccard_edge_scores,
        "hub_dominance": q_hub_dominance,
        "sfigality": q_sfigality,
        "laplacian_centrality": q_laplacian_centrality,
        "local_partition_coverage": q_local_partition_coverage,
        "permanence": q_permanence,
        "intrapartition_density": q_intrapartition_density,
        "luby_mis": q_luby_mis,
        "reciprocity": q_reciprocity,
        "degree_histogram": q_degree_histogram,
        "stable_partition_nodes": q_stable_partition_nodes,
        "link_prediction": q_link_prediction,
        "edge_triangle_scores": q_edge_triangle_scores,
        "sparsify_triangles": q_sparsify_triangles,
        "local_degree_scores": q_local_degree_scores,
        "simmelian_overlap": q_simmelian_overlap,
        "local_similarity": q_local_similarity,
        "multiscale_scores": q_multiscale_scores,
        "quadrangle_scores": q_quadrangle_scores,
        "geometric_mean_scores": q_geometric_mean_scores,
        "prefix_jaccard_scores": q_prefix_jaccard_scores,
        "blended_scores": q_blended_scores,
        "score_as_weight": q_score_as_weight,
        "normalized_triangle_scores": q_normalized_triangle_scores,
        "linearized_triangle_scores": q_linearized_triangle_scores,
        "top_harmonic_closeness": q_top_harmonic_closeness,
        "k_path_centrality": q_k_path_centrality,
        "volume": q_volume,
        "apsp": q_apsp,
        "dyn_apsp": q_dyn_apsp,
        "dyn_top_harmonic": q_dyn_top_harmonic,
        "reverse_bfs": q_reverse_bfs,
        "same_community": q_same_community,
        "degree_preserving_shuffle": q_degree_preserving_shuffle,
        "link_roc": q_link_roc,
        "token_shards": q_token_shards,
        "contamination": q_contamination,
        "lm_cross_entropy": q_lm_cross_entropy,
        "doc_sample": q_doc_sample,
        "map_equation": q_map_equation,
        "neighborhood_function": q_neighborhood_function,
        "forest_fire_scores": q_forest_fire_scores,
        "jaccard_distance": q_jaccard_distance,
        "adamic_adar_distance": q_adamic_adar_distance,
        "chance_corrected_triangles": q_chance_corrected_triangles,
        "random_edge_scores": q_random_edge_scores,
        "graph_difference": q_graph_difference,
        "reachable_nodes": q_reachable_nodes,
        "apply_events_roundtrip": q_apply_events_roundtrip,
        "dgs_roundtrip": q_dgs_roundtrip,
        "bloom_prefilter": q_bloom_prefilter,
        "curveball_degrees": q_curveball_degrees,
        "simple_paths": q_simple_paths,
        "gce_community": q_gce_community,
        "clustering_generator": q_clustering_generator,
        "lfm_community": q_lfm_community,
        "biconnected_components": q_biconnected,
        "lp_degree_ordered": q_lp_degree_ordered,
        "clique_detect": q_clique_detect,
        "scd_ground_truth": q_scd_ground_truth,
        "agglomerative_communities": q_agglomerative,
        "normalize_text": q_normalize_text,
        "kmeans_clusters": q_kmeans_clusters,
        "incremental_bfs": q_incremental_bfs,
        "binary_edgelist_roundtrip": q_binary_edgelist_roundtrip,
        "partitioned_sink_roundtrip": q_partitioned_sink_roundtrip,
        "graphtool_roundtrip": q_graphtool_roundtrip,
        "thrill_roundtrip": q_thrill_roundtrip,
        "dibap_roundtrip": q_dibap_roundtrip,
        "binary_partition_roundtrip": q_binary_partition_roundtrip,
        "tce_community": q_tce_community,
        "random_bfs_community": q_random_bfs_community,
        "combined_scd": q_combined_scd,
        "two_phase_l": q_two_phase_l,
        "localt_community": q_localt_community,
        "lte_community": q_lte_community,
        "bidirectional_bfs": q_bidirectional_bfs,
        "set_conductance": q_set_conductance,
        "scan_clustering": q_scan_clustering,
        "eccentricity": q_eccentricity,
        "random_walks": q_random_walks,
        "spanning_forest": q_spanning_forest,
        "algebraic_distances": q_algebraic_distances,
        "graph_profile": q_graph_profile,
        "personalized_pagerank": q_personalized_pagerank,
        "pagerank_nibble": q_pagerank_nibble,
        "weighted_degree": q_weighted_degree,
        "katz": q_katz,
        "eigenvector": q_eigenvector,
        "bfs_distances": q_bfs_distances,
        "spsp": q_spsp,
        "max_flow": q_max_flow,
        "cut_clustering": q_cut_clustering,
        "stress_layout": q_stress_layout,
        "commute_time": q_commute_time,
        "pivot_mds": q_pivot_mds,
        "spanning_edge_centrality": q_spanning_edge_centrality,
        "electrical_closeness": q_electrical_closeness,
        "sssp_distances": q_sssp_distances,
        "global_clustering": q_global_clustering,
        "core_decomposition": q_core_decomposition,
        "betweenness": q_betweenness,
        "betweenness_pivots": q_betweenness_pivots,
        "dyn_betweenness": q_dyn_betweenness,
        "adaptive_betweenness": q_adaptive_betweenness,
        "effective_diameter": q_effective_diameter,
        "hop_plot": q_hop_plot,
        "hop_histogram": q_hop_histogram,
        "sample_edges": q_sample_edges,
        "random_edge": q_random_edge,
        "approx_global_clustering": q_approx_global_clustering,
        "approx_closeness": q_approx_closeness,
        "web_text_roundtrip": q_web_text_roundtrip,
        "web_edges": q_web_edges,
        "warc_roundtrip": q_warc_roundtrip,
        "robots_allowed": q_robots_allowed,
        "host_stats": q_host_stats,
        "host_capped_sample": q_host_capped_sample,
        "web_pagerank": q_web_pagerank,
        "truncated_pagerank": q_truncated_pagerank,
        "host_edges": q_host_edges,
        "host_pagerank": q_host_pagerank,
        "anchor_texts": q_anchor_texts,
        "anchor_histogram": q_anchor_histogram,
        "web_hits": q_web_hits,
        "web_salsa": q_web_salsa,
        "web_bowtie": q_web_bowtie,
        "host_spam_mass": q_host_spam_mass,
        "powerlaw_alpha_hosts": q_powerlaw_alpha_hosts,
        "cocitation_topk": q_cocitation_topk,
        "coupling_topk": q_coupling_topk,
        "redirect_resolution": q_redirect_resolution,
        "gopher_filter": q_gopher_filter,
        "document_frequency": q_document_frequency,
        "bm25_topk": q_bm25_topk,
        "host_trustrank": q_host_trustrank,
        "anchor_summary": q_anchor_summary,
        "exact_dedup": q_exact_dedup,
        "segment_dedup": q_segment_dedup,
        "substring_dedup": q_substring_dedup,
        "redact_pii": q_redact_pii,
        "token_counts": q_token_counts,
        "token_percentiles": q_token_percentiles,
        "tfidf_top_terms": q_tfidf_top_terms,
        "quality_scores": q_quality_scores,
        "repetition_scores": q_repetition_scores,
        "fingerprint_md5": q_fingerprint_md5,
        "lang_histogram": q_lang_histogram,
        "langid": q_langid,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "jaccard_near_dups": q_jaccard_near_dups,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_exact": q_embedding_near_dups_exact,
        "ann_topk": q_ann_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "multimodal_decode": q_multimodal_decode,
        "rmat_edges": q_rmat_edges,
        "er_edges": q_er_edges,
        "barabasi_albert": q_barabasi_albert,
        "hyperbolic_edges": q_hyperbolic_edges,
        "chung_lu_edges": q_chung_lu_edges,
        "watts_strogatz_edges": q_watts_strogatz_edges,
        "ring_lattice": q_ring_lattice,
        "sbm_edges": q_sbm_edges,
        "havel_hakimi_degrees": q_havel_hakimi_degrees,
        "dorogovtsev_mendes": q_dorogovtsev_mendes,
        "lfr_edges": q_lfr_edges,
        "lfr_edges_default": q_lfr_edges_default,
        "lfr_mixing": q_lfr_mixing,
        "sgns_embeddings_default": q_sgns_embeddings_default,
        "lfm_cover_full": q_lfm_cover_full,
        "tumbling_window": q_tumbling_window,
        "sliding_window": q_sliding_window,
        "asof_click_to_view": q_asof_click_to_view,
        "sessionize": q_sessionize,
        "event_type_histogram": q_event_type_histogram,
        "approx_distinct_users": q_approx_distinct_users,
    }


# Queries that already received an all-green row in a driver CORRECTNESS
# artifact (union of CORRECTNESS_r01..r03.json).  The driver's per-round
# window covers only the FIRST 50 entries of queries(), so ordering is
# evidence budget: front-load queries the driver has never checked
# (oracle-backed first), keep a small canary set of core kernels, and push
# already-validated queries to the back.  Update this set each round from
# the new CORRECTNESS artifact.
_DRIVER_VALIDATED = {
    # round 4 (CORRECTNESS_r04.json, 50/50 green)
    "adamic_adar_distance", "apsp", "blended_scores",
    "chance_corrected_triangles", "contamination",
    "degree_preserving_shuffle", "doc_sample", "dyn_apsp",
    "dyn_top_harmonic", "edge_triangle_scores", "ego_splitting",
    "forest_fire_scores", "geometric_mean_scores", "jaccard_distance",
    "k_path_centrality", "leiden_refine", "lfm_cover",
    "linearized_triangle_scores", "link_prediction", "link_roc",
    "lm_cross_entropy", "local_degree_scores", "local_similarity",
    "map_equation", "multiscale_scores", "neighborhood_function",
    "normalized_triangle_scores", "path_growing_matching",
    "prefix_jaccard_scores", "quadrangle_scores", "random_edge_scores",
    "reverse_bfs", "same_community", "score_as_weight", "simmelian_overlap",
    "sparsify_triangles", "stable_partition_nodes", "token_shards",
    "top_harmonic_closeness", "volume", "warm_katz", "warm_pagerank",
    # round 3 (CORRECTNESS_r03.json, 50/50 green)
    "anchor_histogram", "anchor_summary", "anchor_texts",
    "betweenness_pivots", "bidirectional_sssp", "bm25_topk",
    "cocitation_topk", "coupling_topk", "degree_histogram", "diameter",
    "document_frequency", "edge_switch_degrees", "gopher_filter",
    "harmonic_closeness_exact", "host_capped_sample", "host_edges",
    "host_pagerank", "host_spam_mass", "host_stats", "host_trustrank",
    "hub_dominance", "intrapartition_density", "jaccard_edge_scores",
    "laplacian_centrality", "local_max_matching", "local_partition_coverage",
    "luby_mis", "permanence", "powerlaw_alpha_hosts", "reciprocity",
    "redirect_resolution", "repetition_scores", "robots_allowed",
    "segment_dedup", "seir", "sfigality", "suitor_matching",
    "truncated_pagerank", "warc_roundtrip", "web_bowtie", "web_hits",
    "web_salsa",
    # rounds 1-2
    "ann_lsh_topk", "ann_topk", "approx_closeness", "ari", "assortativity",
    "bfs_distances", "cc_sizes", "clique_counts", "compact_ids",
    "conductance", "connected_components", "core_decomposition", "cover_f1",
    "cover_hub_dominance", "coverage", "degree_table", "edge_cut",
    "edge_table", "edge_table_sym", "eigenvector", "embedding_near_dups",
    "event_type_histogram", "exact_dedup", "expansion", "fingerprint_md5",
    "ged_walk", "global_clustering", "graph_rand", "graph_stats",
    "greedy_coloring", "group_closeness", "group_degree",
    "group_harmonic_closeness", "hashing_overlapper", "in_degree_table",
    "incremental_cc", "jaccard_measure", "k_truss", "katz", "lang_histogram",
    "langid", "lcc", "louvain", "louvain_modularity", "max_degree",
    "maximal_cliques", "minhash_near_dups", "modularity",
    "multimodal_decode", "nmi", "simhash_near_dups",
    "node2vec_walks", "node_rand", "num_components", "overlapping_nmi",
    "pagerank", "pagerank_topk", "partition_fragmentation",
    "partition_intersection", "plp_communities", "quality_scores",
    "rmat_edges", "scc", "sessionize", "sgns_embeddings", "subgraph",
    "token_counts", "transpose", "triangle_count", "triangles_per_vertex",
    "tumbling_window", "wcc", "web_edges", "web_pagerank",
    "web_text_roundtrip", "weighted_degree",
}


def queries() -> dict[str, Callable[[str], Any]]:
    """All pipelines, ordered for the driver's 50-query CORRECTNESS window:
    kernel canaries first, then never-driver-validated oracle-backed
    queries, then never-validated rows-only queries, then the validated
    back catalog."""
    raw = _queries_raw()
    canaries = [
        "edge_table", "degree_table", "pagerank", "connected_components",
        "plp_communities", "triangle_count", "modularity", "exact_dedup",
    ]
    with_oracle = set(oracle_sql())
    never = [k for k in raw if k not in _DRIVER_VALIDATED and k not in canaries]
    # The round-3 web/link-graph tier is the graft's thematic core — make
    # sure it gets driver validation ahead of the generic long tail.
    web_priority = [
        "web_hits", "web_salsa", "web_bowtie", "host_edges",
        "host_pagerank", "host_trustrank", "host_spam_mass",
        "powerlaw_alpha_hosts", "cocitation_topk", "coupling_topk",
        "redirect_resolution", "gopher_filter", "document_frequency",
        "bm25_topk", "truncated_pagerank", "anchor_texts", "anchor_summary",
        "anchor_histogram", "host_stats", "host_capped_sample",
        "repetition_scores",
        # round-3 second block: Common-Crawl-native ingestion, CCNet-style
        # corpus dedup, and the exact-Brandes-twin betweenness — marquee
        # additions that should receive driver validation this round.
        "warc_roundtrip", "segment_dedup", "betweenness_pivots",
        "robots_allowed",
        # round-5 marquee additions: ExactSubstr-style substring dedup
        # and PII redaction — front-load them into the driver window
        "substring_dedup", "redact_pii",
    ]
    never = [k for k in web_priority if k in never] + [
        k for k in never if k not in web_priority
    ]
    never_oracle = [k for k in never if k in with_oracle]
    never_rows = [k for k in never if k not in with_oracle]
    rest = [
        k for k in raw
        if k in _DRIVER_VALIDATED and k not in canaries and k not in never
    ]
    order = canaries + never_oracle + never_rows + rest
    assert set(order) == set(raw) and len(order) == len(raw)
    return {k: raw[k] for k in order}


# ---------------------------------------------------------------- oracles
def _pagerank_sql(edges_sql: str, iters: int) -> str:
    """Chained fixed-iteration power-iteration CTE (exact twin of the engine
    run with tol=0, max_iterations=iters, divide-by-sum normalization)."""
    n_sql = "(SELECT COUNT(*) FROM customer)"
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "nodes AS MATERIALIZED ({nodes})",
        f"s0 AS MATERIALIZED (SELECT v, 1.0/{{n}} AS score FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT nodes.v, 0.15/{{n}} + 0.85*COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT e.dst AS v, SUM(p.score/od.d) AS inc "
            f"FROM e JOIN s{k-1} p ON p.v = e.src JOIN od ON od.src = e.src "
            f"GROUP BY e.dst) m ON m.v = nodes.v)"
        )
    body = ",\n".join(parts)
    return (
        body
        + f"\nSELECT v, ROUND(score / (SELECT SUM(score) FROM s{iters}), 8) AS score FROM s{iters}"
    )


def _warm_pagerank_sql(base_iters: int, warm_iters: int) -> str:
    """Exact twin of q_warm_pagerank: ``base_iters`` fixed power
    iterations over the base graph ((src+dst)%7 != 0 edges of {EDGES}),
    divide-by-sum normalization, the warm_start_pagerank seed rescale to
    the unnormalized fixpoint scale s* = (1−d)/(1−d(1−dang)) (dang = seed
    mass on FULL-graph dangling vertices, pagerank.py:441-453), then
    ``warm_iters`` fixed iterations over the full graph and a final
    divide-by-sum."""
    n_sql = "(SELECT COUNT(*) FROM customer)"
    parts = [
        "WITH ef AS MATERIALIZED ({EDGES})",
        "eb AS MATERIALIZED (SELECT src, dst FROM ef WHERE (src + dst) % 7 <> 0)",
        "odb AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM eb GROUP BY src)",
        "odf AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM ef GROUP BY src)",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        f"b0 AS MATERIALIZED (SELECT v, 1.0/{n_sql} AS score FROM nodes)",
    ]
    for k in range(1, base_iters + 1):
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT nodes.v, 0.15/{n_sql} + 0.85*COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT eb.dst AS v, SUM(p.score/odb.d) AS inc "
            f"FROM eb JOIN b{k-1} p ON p.v = eb.src JOIN odb ON odb.src = eb.src "
            f"GROUP BY eb.dst) m ON m.v = nodes.v)"
        )
    parts += [
        f"prev AS MATERIALIZED (SELECT v, score / (SELECT SUM(score) FROM b{base_iters}) "
        f"AS score FROM b{base_iters})",
        "dang AS (SELECT COALESCE(SUM(p.score), 0) AS dm FROM prev p "
        "LEFT JOIN odf ON odf.src = p.v WHERE odf.d IS NULL)",
        "w0 AS MATERIALIZED (SELECT v, score * (0.15 / (1.0 - 0.85*(1.0 - "
        "(SELECT dm FROM dang)))) AS score FROM prev)",
    ]
    for k in range(1, warm_iters + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT nodes.v, 0.15/{n_sql} + 0.85*COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT ef.dst AS v, SUM(p.score/odf.d) AS inc "
            f"FROM ef JOIN w{k-1} p ON p.v = ef.src JOIN odf ON odf.src = ef.src "
            f"GROUP BY ef.dst) m ON m.v = nodes.v)"
        )
    return ",\n".join(parts) + (
        f"\nSELECT v, ROUND(score / (SELECT SUM(score) FROM w{warm_iters}), 8) AS score "
        f"FROM w{warm_iters} ORDER BY v"
    )


def _warm_katz_sql(base_iters: int, warm_iters: int, alpha: float, beta: float) -> str:
    """Exact twin of q_warm_katz: ``base_iters`` affine iterations
    x ← β + αAᵀx over the base graph from 1/n (raw fixpoint scale, no end
    normalization — katz(return_raw=True)), the raw vector seeds
    ``warm_iters`` iterations over the full graph, L2 end-normalization
    (centrality.py:_iterate normalize_end)."""
    parts = [
        "WITH ef AS MATERIALIZED ({EDGES})",
        "eb AS MATERIALIZED (SELECT src, dst FROM ef WHERE (src + dst) % 7 <> 0)",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "b0 AS MATERIALIZED (SELECT v, 1.0/(SELECT COUNT(*) FROM nodes) AS score FROM nodes)",
    ]
    for k in range(1, base_iters + 1):
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT nodes.v, {beta} + {alpha}*COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT eb.dst AS v, SUM(p.score) AS inc "
            f"FROM eb JOIN b{k-1} p ON p.v = eb.src GROUP BY eb.dst) m ON m.v = nodes.v)"
        )
    parts.append(f"w0 AS MATERIALIZED (SELECT v, score FROM b{base_iters})")
    for k in range(1, warm_iters + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT nodes.v, {beta} + {alpha}*COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT ef.dst AS v, SUM(p.score) AS inc "
            f"FROM ef JOIN w{k-1} p ON p.v = ef.src GROUP BY ef.dst) m ON m.v = nodes.v)"
        )
    return ",\n".join(parts) + (
        f"\nSELECT v, ROUND(score / (SELECT SQRT(SUM(score*score)) FROM w{warm_iters}), 8) "
        f"AS score FROM w{warm_iters} ORDER BY v"
    )


def _gedwalk_sql(k: int, levels: int, pool: int) -> str:
    """Exact twin of graph/gedwalk.py:ged_walk.  Exactness argument: the
    masked/unmasked walk-count DPs are INTEGER-valued (exact in float64 in
    any summation order), α = 1/(1 + maxInDeg + maxOutDeg) is a single
    division, α^ℓ is the same libm pow on both sides, and each round's
    score is the same explicit 5-term left-to-right sum, so the greedy
    argmax (ties → smallest id) replays bit-for-bit."""
    parts = [
        "WITH e AS MATERIALIZED ({EDGES})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "al AS (SELECT 1.0/(1.0 + (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM e GROUP BY dst)) "
        "+ (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM e GROUP BY src))) AS a)",
        "cand AS MATERIALIZED (SELECT v FROM ("
        "SELECT v, COUNT(*) AS deg FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e) GROUP BY v"
        f") ORDER BY deg DESC, v ASC LIMIT {pool})",
        "w0 AS MATERIALIZED (SELECT v, CAST(1 AS DOUBLE) AS o FROM nodes)",
    ]
    for lv in range(1, levels + 1):
        parts.append(
            f"w{lv} AS MATERIALIZED (SELECT e.src AS v, SUM(p.o) AS o "
            f"FROM e JOIN w{lv-1} p ON p.v = e.dst GROUP BY e.src)"
        )
        parts.append(f"wt{lv} AS (SELECT COALESCE(SUM(o), 0) AS t FROM w{lv})")
    score_terms = " + ".join(
        f"POWER(al.a, {lv})*((SELECT t FROM wt{lv}) - COALESCE(s{lv}.s, 0))"
        for lv in range(1, levels + 1)
    )
    for r in range(1, k + 1):
        not_picked = " AND ".join(
            f"{{col}} <> (SELECT v FROM pick{j})" for j in range(1, r)
        )
        live_f = (" WHERE " + not_picked.format(col="c.v")) if r > 1 else ""
        mask0 = "n.v = c.v" + "".join(
            f" OR n.v = (SELECT v FROM pick{j})" for j in range(1, r)
        )
        step_f = ("" if r == 1 else " AND " + not_picked.format(col="e.src"))
        parts.append(
            f"m{r}_0 AS MATERIALIZED (SELECT c.v AS cand, n.v, "
            f"CASE WHEN {mask0} THEN CAST(0 AS DOUBLE) ELSE 1.0 END AS o "
            f"FROM cand c CROSS JOIN nodes n{live_f})"
        )
        for lv in range(1, levels + 1):
            parts.append(
                f"m{r}_{lv} AS MATERIALIZED (SELECT p.cand, e.src AS v, SUM(p.o) AS o "
                f"FROM e JOIN m{r}_{lv-1} p ON p.v = e.dst "
                f"WHERE e.src <> p.cand{step_f} GROUP BY p.cand, e.src)"
            )
            parts.append(
                f"ms{r}_{lv} AS (SELECT cand, SUM(o) AS s FROM m{r}_{lv} GROUP BY cand)"
            )
        joins = " ".join(
            f"LEFT JOIN ms{r}_{lv} s{lv} ON s{lv}.cand = c.v"
            for lv in range(1, levels + 1)
        )
        parts.append(
            f"sc{r} AS MATERIALIZED (SELECT c.v AS cand, {score_terms} AS score "
            f"FROM cand c CROSS JOIN al {joins}{live_f})"
        )
        parts.append(
            f"pick{r} AS MATERIALIZED (SELECT cand AS v, score FROM sc{r} "
            f"ORDER BY score DESC, cand ASC LIMIT 1)"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, v, ROUND(score, 6) AS score FROM pick{r}"
        for r in range(1, k + 1)
    )
    return ",\n".join(parts) + f"\n{sel}\nORDER BY rank"


def _gce_sql(
    seeds: tuple, radius: int, max_size: int, clique_init: int | None = None
) -> str:
    """Exact twin of graph/scd.py:_gce_group (GCE objective-M expansion).
    Exactness argument: int_w/idg/cut/deg are all integers, q and cur_q
    are each ONE float division of exact integers (identical on both
    sides), dq = q − cur_q a single subtraction; Python's strict
    `dq > best_dq` over ascending candidates = max dq, smallest v on
    exact ties; denom ≤ 0 → q = +inf (beats all finite), and the
    inf − inf = NaN case is skipped on both sides (Python: NaN > x is
    False; SQL: explicit isnan filter).  Rounds past the stop are no-ops
    (same candidates, same no-pick), so the fixed unroll is value-exact.
    ``clique_init`` (CombinedSCD, scd.py:_gce_set_group): start from
    {seed} ∪ max-clique-of-N(seed) instead of {seed}, enumerated by
    ordered extension up to that size; a per-round size guard enforces
    the ``len(com) < max_size`` loop condition for multi-vertex starts."""
    seed_vals = ", ".join(f"({s})" for s in seeds)
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM se GROUP BY src)",
        f"seeds(s) AS (SELECT CAST(col0 AS BIGINT) FROM (VALUES {seed_vals}))",
        "rg0 AS (SELECT s, s AS v FROM seeds)",
    ]
    for k in range(1, radius + 1):
        parts.append(
            f"rg{k} AS MATERIALIZED (SELECT s, v FROM rg{k-1} UNION "
            f"SELECT r.s, e.dst FROM rg{k-1} r JOIN se e ON e.src = r.v)"
        )
    parts += [
        f"re AS MATERIALIZED (SELECT m1.s, e.src AS a, e.dst AS b FROM se e "
        f"JOIN rg{radius} m1 ON m1.v = e.src "
        f"JOIN rg{radius} m2 ON m2.s = m1.s AND m2.v = e.dst WHERE e.src < e.dst)",
        "radj AS MATERIALIZED (SELECT s, a AS u, b AS w FROM re "
        "UNION ALL SELECT s, b, a FROM re)",
    ]
    if clique_init is None:
        parts.append("com0 AS MATERIALIZED (SELECT s, s AS v FROM seeds)")
    else:
        parts += [
            "nbq AS MATERIALIZED (SELECT sd.s, e.dst AS v FROM seeds sd "
            "JOIN se e ON e.src = sd.s)",
            "neq AS MATERIALIZED (SELECT n1.s, e.src AS a, e.dst AS b FROM se e "
            "JOIN nbq n1 ON n1.v = e.src JOIN nbq n2 ON n2.s = n1.s AND n2.v = e.dst "
            "WHERE e.src < e.dst)",
            "q1 AS (SELECT s, [v] AS ms, v AS mx FROM nbq)",
        ]
        for k in range(2, clique_init + 1):
            parts.append(
                f"q{k} AS MATERIALIZED (SELECT p.s, list_append(p.ms, e.b) AS ms, "
                f"e.b AS mx FROM q{k-1} p JOIN neq e ON e.s = p.s AND e.a = p.mx "
                f"WHERE NOT EXISTS (SELECT 1 FROM unnest(p.ms) AS u(m) "
                f"WHERE u.m < p.mx AND NOT EXISTS ("
                f"SELECT 1 FROM neq x WHERE x.s = p.s AND x.a = u.m AND x.b = e.b)))"
            )
        all_q = " UNION ALL ".join(
            f"SELECT s, ms FROM q{k}" for k in range(1, clique_init + 1)
        )
        parts += [
            f"qcand AS ({all_q})",
            "qbest AS (SELECT s, ms FROM (SELECT s, ms, ROW_NUMBER() OVER "
            "(PARTITION BY s ORDER BY len(ms) DESC, ms ASC) AS rn FROM qcand) "
            "WHERE rn = 1)",
            # init = {seed} ∪ best clique, filtered to vertices with a
            # region edge (scd.py:671 `v in adj`); a clique member always
            # has its seed edge in the region, so only an edgeless seed
            # drops — and then the fallback keeps the smallest init member
            # (= the seed), which the no-candidate rounds preserve.
            "com0 AS MATERIALIZED (SELECT DISTINCT s, v FROM ("
            "SELECT s AS s, s AS v FROM seeds "
            "UNION ALL SELECT s, unnest(ms) AS v FROM qbest))",
        ]
    for r in range(1, max_size):
        p = r - 1
        parts += [
            f"iw{p} AS (SELECT sd.s, CAST(COALESCE(x.c, 0) AS DOUBLE) AS iw "
            f"FROM seeds sd LEFT JOIN (SELECT re.s, COUNT(*) AS c FROM re "
            f"JOIN com{p} c1 ON c1.s = re.s AND c1.v = re.a "
            f"JOIN com{p} c2 ON c2.s = re.s AND c2.v = re.b GROUP BY re.s) x "
            f"ON x.s = sd.s)",
            f"cut{p} AS (SELECT c.s, SUM(COALESCE(deg.d, 0)) - 2.0*ANY_VALUE(iw.iw) AS cut, "
            f"ANY_VALUE(iw.iw) AS iw FROM com{p} c "
            f"LEFT JOIN deg ON deg.v = c.v JOIN iw{p} iw ON iw.s = c.s GROUP BY c.s)",
            f"cand{r} AS (SELECT sh.s, sh.v, "
            f"CASE WHEN ct.cut + sh.d - 2.0*sh.idg > 0 "
            f"THEN (ct.iw + sh.idg)/(ct.cut + sh.d - 2.0*sh.idg) "
            f"ELSE 'infinity'::DOUBLE END - "
            f"CASE WHEN ct.cut > 0 THEN ct.iw/ct.cut "
            f"ELSE 'infinity'::DOUBLE END AS dq "
            f"FROM (SELECT ra.s, ra.u AS v, CAST(COUNT(*) AS DOUBLE) AS idg, "
            f"ANY_VALUE(COALESCE(dg.d, 0)) AS d "
            f"FROM radj ra JOIN com{p} c ON c.s = ra.s AND c.v = ra.w "
            f"LEFT JOIN deg dg ON dg.v = ra.u "
            f"WHERE NOT EXISTS (SELECT 1 FROM com{p} c2 WHERE c2.s = ra.s AND c2.v = ra.u) "
            f"GROUP BY ra.s, ra.u) sh JOIN cut{p} ct ON ct.s = sh.s)",
            f"com{r} AS MATERIALIZED (SELECT * FROM com{p} UNION ALL "
            f"SELECT s, v FROM (SELECT s, v, ROW_NUMBER() OVER "
            f"(PARTITION BY s ORDER BY dq DESC, v ASC) AS rn FROM cand{r} "
            f"WHERE dq > 0 AND NOT isnan(dq) "
            f"AND (SELECT COUNT(*) FROM com{p} c3 WHERE c3.s = cand{r}.s) "
            f"< {max_size}) WHERE rn = 1)",
        ]
    return ",\n".join(parts) + (
        f"\nSELECT s AS seed, v FROM com{max_size - 1} ORDER BY seed, v"
    )


def _localt_sql(seeds: tuple, radius: int, max_size: int) -> str:
    """Exact twin of graph/scd.py:_localt_group (LocalT triangle-score
    expansion).  All quantities are INTEGERS (triangle counts, score =
    max(0, i·(i−e))), so the replay is bit-exact; the running-max loop
    over the ascending shell equals ORDER BY score DESC, ext ASC, v ASC
    among candidates with score >= current community score (equal-score
    adds accepted, per the engine docstring); no-pick rounds are no-ops,
    so the fixed ``max_size − 1`` unroll is value-exact."""
    seed_vals = ", ".join(f"({s})" for s in seeds)
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        f"seeds(s) AS (SELECT CAST(col0 AS BIGINT) FROM (VALUES {seed_vals}))",
        "rg0 AS (SELECT s, s AS v FROM seeds)",
    ]
    for k in range(1, radius + 1):
        parts.append(
            f"rg{k} AS MATERIALIZED (SELECT s, v FROM rg{k-1} UNION "
            f"SELECT r.s, e.dst FROM rg{k-1} r JOIN se e ON e.src = r.v)"
        )
    parts += [
        f"re AS MATERIALIZED (SELECT m1.s, e.src AS a, e.dst AS b FROM se e "
        f"JOIN rg{radius} m1 ON m1.v = e.src "
        f"JOIN rg{radius} m2 ON m2.s = m1.s AND m2.v = e.dst WHERE e.src < e.dst)",
        "radj AS MATERIALIZED (SELECT s, a AS u, b AS w FROM re "
        "UNION ALL SELECT s, b, a FROM re)",
        "tri AS MATERIALIZED (SELECT e1.s, e1.a, e1.b, e2.b AS c "
        "FROM re e1 JOIN re e2 ON e2.s = e1.s AND e2.a = e1.b "
        "JOIN re e3 ON e3.s = e1.s AND e3.a = e1.a AND e3.b = e2.b)",
        "tri3 AS MATERIALIZED (SELECT s, a AS v, b AS x, c AS y FROM tri "
        "UNION ALL SELECT s, b, a, c FROM tri UNION ALL SELECT s, c, a, b FROM tri)",
        "com0 AS MATERIALIZED (SELECT s, s AS v FROM seeds)",
    ]
    for r in range(1, max_size):
        p = r - 1
        parts += [
            # community totals: int = all-3-in, ext = exactly-1-in
            f"tot{p} AS (SELECT sd.s, "
            f"COALESCE(SUM(CASE WHEN t.k = 3 THEN 1 END), 0) AS it, "
            f"COALESCE(SUM(CASE WHEN t.k = 1 THEN 1 END), 0) AS et "
            f"FROM seeds sd LEFT JOIN ("
            f"SELECT tri.s, (CASE WHEN ca.v IS NOT NULL THEN 1 ELSE 0 END "
            f"+ CASE WHEN cb.v IS NOT NULL THEN 1 ELSE 0 END "
            f"+ CASE WHEN cc.v IS NOT NULL THEN 1 ELSE 0 END) AS k FROM tri "
            f"LEFT JOIN com{p} ca ON ca.s = tri.s AND ca.v = tri.a "
            f"LEFT JOIN com{p} cb ON cb.s = tri.s AND cb.v = tri.b "
            f"LEFT JOIN com{p} cc ON cc.s = tri.s AND cc.v = tri.c) t "
            f"ON t.s = sd.s GROUP BY sd.s)",
            f"cand{r} AS (SELECT sh.s, sh.v, "
            f"GREATEST(0, (tt.it + COALESCE(tv.bi, 0)) * "
            f"((tt.it + COALESCE(tv.bi, 0)) - (tt.et + COALESCE(tv.bo, 0) - COALESCE(tv.se, 0)))) AS ns, "
            f"tt.et + COALESCE(tv.bo, 0) - COALESCE(tv.se, 0) AS ne, "
            f"GREATEST(0, tt.it * (tt.it - tt.et)) AS s0 "
            f"FROM (SELECT DISTINCT ra.s, ra.u AS v FROM radj ra "
            f"JOIN com{p} c ON c.s = ra.s AND c.v = ra.w "
            f"WHERE NOT EXISTS (SELECT 1 FROM com{p} c2 WHERE c2.s = ra.s AND c2.v = ra.u)) sh "
            f"JOIN tot{p} tt ON tt.s = sh.s "
            f"LEFT JOIN (SELECT t3.s, t3.v, "
            f"SUM(CASE WHEN t3.k = 2 THEN 1 END) AS bi, "
            f"SUM(CASE WHEN t3.k = 1 THEN 1 END) AS se, "
            f"SUM(CASE WHEN t3.k = 0 THEN 1 END) AS bo FROM ("
            f"SELECT tri3.s, tri3.v, (CASE WHEN cx.v IS NOT NULL THEN 1 ELSE 0 END "
            f"+ CASE WHEN cy.v IS NOT NULL THEN 1 ELSE 0 END) AS k FROM tri3 "
            f"LEFT JOIN com{p} cx ON cx.s = tri3.s AND cx.v = tri3.x "
            f"LEFT JOIN com{p} cy ON cy.s = tri3.s AND cy.v = tri3.y) t3 "
            f"GROUP BY t3.s, t3.v) tv ON tv.s = sh.s AND tv.v = sh.v)",
            f"com{r} AS MATERIALIZED (SELECT * FROM com{p} UNION ALL "
            f"SELECT s, v FROM (SELECT s, v, ROW_NUMBER() OVER "
            f"(PARTITION BY s ORDER BY ns DESC, ne ASC, v ASC) AS rn "
            f"FROM cand{r} WHERE ns >= s0) WHERE rn = 1)",
        ]
    return ",\n".join(parts) + (
        f"\nSELECT s AS seed, v FROM com{max_size - 1} ORDER BY seed, v"
    )


def _agcc_sql(n_samples: int, seed: int) -> str:
    """Exact twin of graph/sampling.py:approx_global_clustering with
    sampler="hash".  Exactness argument: wedge weights d(d−1)/2 are
    INTEGERS, so the engine's block-local cumsum + float offsets equal
    the SQL window SUM bit-for-bit at any blocking; each position is one
    float multiply of a splitmix64 uniform by the integer total; rank
    draws are integer mod arithmetic keyed by the position's sorted
    index; neighbor ranks are the (src, dst)-sorted row numbers; the
    estimate is one integer division."""
    base = (seed * 0x9E3779B97F4A7C15) % _M64
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "degt AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM se GROUP BY src)",
        "cum AS MATERIALIZED (SELECT v, d, SUM(d*(d-1)//2) OVER "
        "(ORDER BY v ROWS UNBOUNDED PRECEDING) AS c FROM degt)",
        "tot AS (SELECT CAST(SUM(d*(d-1)//2) AS DOUBLE) AS t FROM degt)",
        f"ids AS (SELECT CAST(range AS BIGINT) AS i FROM range({n_samples}))",
        f"pu0 AS (SELECT i, CAST((CAST(i AS HUGEINT)*3 + {base}) % {_M64} AS UBIGINT) AS xu FROM ids)",
    ]
    parts += _sm64_stages("ph", "pu0", "xu", "i")
    parts += [
        "pos AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY u, i) - 1 AS sid, u "
        "FROM (SELECT i, CAST(h AS DOUBLE) / 18446744073709551616.0 "
        "* (SELECT t FROM tot) AS u FROM phc))",
        "sel AS MATERIALIZED (SELECT p.sid, MIN(c.v) AS sv FROM pos p "
        "JOIN cum c ON CAST(c.c AS DOUBLE) > p.u GROUP BY p.sid)",
        f"r1h0 AS (SELECT sid, CAST((CAST(sid AS HUGEINT)*3 + 1 + {base}) % {_M64} AS UBIGINT) AS xa FROM sel)",
    ]
    parts += _sm64_stages("r1", "r1h0", "xa", "sid")
    parts.append(
        f"r2h0 AS (SELECT sid, CAST((CAST(sid AS HUGEINT)*3 + 2 + {base}) % {_M64} AS UBIGINT) AS xb FROM sel)"
    )
    parts += _sm64_stages("r2", "r2h0", "xb", "sid")
    parts += [
        "jj AS MATERIALIZED (SELECT s.sid, s.sv, dg.d, "
        "CAST(r1c.h >> 2 AS BIGINT) % dg.d AS j1r, "
        "CAST(r2c.h >> 2 AS BIGINT) % (dg.d - 1) AS j2r "
        "FROM sel s JOIN degt dg ON dg.v = s.sv "
        "JOIN r1c ON r1c.sid = s.sid JOIN r2c ON r2c.sid = s.sid)",
        "jx AS (SELECT sid, sv, j1r AS j1, "
        "CASE WHEN j2r >= j1r THEN j2r + 1 ELSE j2r END AS j2 FROM jj)",
        "rk AS MATERIALIZED (SELECT src, dst, ROW_NUMBER() OVER "
        "(PARTITION BY src ORDER BY dst) - 1 AS rnk FROM se "
        "WHERE src IN (SELECT sv FROM sel))",
        "pairs AS (SELECT LEAST(a.dst, b.dst) AS ps, GREATEST(a.dst, b.dst) AS pd "
        "FROM jx JOIN rk a ON a.src = jx.sv AND a.rnk = jx.j1 "
        "JOIN rk b ON b.src = jx.sv AND b.rnk = jx.j2)",
        "closed AS (SELECT COUNT(*) AS c FROM pairs "
        "WHERE EXISTS (SELECT 1 FROM se WHERE se.src = pairs.ps AND se.dst = pairs.pd "
        "AND se.src < se.dst))",
    ]
    return ",\n".join(parts) + (
        f"\nSELECT ROUND(CAST((SELECT c FROM closed) AS DOUBLE) / {n_samples}, 6) "
        f"AS approx_gcc, CAST({n_samples} AS BIGINT) AS samples"
    )


def _maxflow_sql(aug_rounds: int = 45, depth: int = 24) -> str:
    """Exact twin of q_max_flow's canonical outputs.  The max-flow VALUE
    is unique, and the source side (vertices reachable from s in the
    final residual graph) is the unique inclusion-minimal min cut — both
    independent of augmenting-path order — so the oracle runs its OWN
    Edmonds–Karp (min-id shortest-path parents) instead of replaying the
    engine's: per round, a recursive-CTE residual BFS from s, a parent
    walk back from t, an integer bottleneck push.  Capacities are
    integers, so flows stay integers and every comparison is exact.
    ``aug_rounds`` only needs to exceed the flow value (min bottleneck
    is 1; exhausted rounds are no-ops), ``depth`` the longest augmenting
    path."""
    parts = [
        "WITH RECURSIVE ce AS MATERIALIZED (SELECT src AS u, dst AS v, "
        "CAST((src + dst) % 7 + 1 AS BIGINT) AS cap FROM ({SYM}))",
        "tv AS MATERIALIZED (SELECT u AS t FROM ("
        "SELECT u, SUM(CAST(cap AS DOUBLE)) AS wd FROM ce GROUP BY u) "
        "WHERE u <> 0 ORDER BY wd, u LIMIT 1)",
        "f0 AS MATERIALIZED (SELECT u, v, CAST(0 AS BIGINT) AS fl FROM ce)",
    ]
    for a in range(aug_rounds):
        parts += [
            f"r{a} AS MATERIALIZED (SELECT c.u, c.v, "
            f"c.cap - fa.fl + fb.fl AS r FROM ce c "
            f"JOIN f{a} fa ON fa.u = c.u AND fa.v = c.v "
            f"JOIN f{a} fb ON fb.u = c.v AND fb.v = c.u)",
            f"dr{a}(v, d) AS (SELECT CAST(0 AS BIGINT), 0 UNION "
            f"SELECT e.v, dr{a}.d + 1 FROM dr{a} "
            f"JOIN r{a} e ON e.u = dr{a}.v AND e.r > 0 WHERE dr{a}.d < {depth})",
            f"di{a} AS MATERIALIZED (SELECT v, MIN(d) AS d FROM dr{a} GROUP BY v)",
            f"pa{a} AS MATERIALIZED (SELECT dv.v, MIN(e.u) AS p "
            f"FROM r{a} e JOIN di{a} du ON du.v = e.u "
            f"JOIN di{a} dv ON dv.v = e.v AND dv.d = du.d + 1 "
            f"WHERE e.r > 0 GROUP BY dv.v)",
            f"wk{a}(v) AS (SELECT t FROM tv WHERE EXISTS "
            f"(SELECT 1 FROM di{a} WHERE di{a}.v = tv.t) UNION "
            f"SELECT pa{a}.p FROM wk{a} JOIN pa{a} ON pa{a}.v = wk{a}.v "
            f"WHERE wk{a}.v <> 0)",
            f"pe{a} AS MATERIALIZED (SELECT pa.p AS u, w.v FROM wk{a} w "
            f"JOIN pa{a} pa ON pa.v = w.v WHERE w.v <> 0)",
            f"bb{a} AS (SELECT MIN(e.r) AS b FROM pe{a} p "
            f"JOIN r{a} e ON e.u = p.u AND e.v = p.v)",
            f"f{a + 1} AS MATERIALIZED (SELECT f.u, f.v, f.fl + "
            f"(CASE WHEN EXISTS (SELECT 1 FROM pe{a} p WHERE p.u = f.u AND p.v = f.v) "
            f"THEN COALESCE((SELECT b FROM bb{a}), 0) ELSE 0 END) AS fl FROM f{a} f)",
        ]
    A = aug_rounds
    parts += [
        f"rf AS MATERIALIZED (SELECT c.u, c.v, c.cap - fa.fl + fb.fl AS r FROM ce c "
        f"JOIN f{A} fa ON fa.u = c.u AND fa.v = c.v "
        f"JOIN f{A} fb ON fb.u = c.v AND fb.v = c.u)",
        "ss(v) AS (SELECT CAST(0 AS BIGINT) UNION "
        "SELECT e.v FROM ss JOIN rf e ON e.u = ss.v AND e.r > 0)",
    ]
    # guard (round-4 advice): if t is still residual-reachable from s
    # after aug_rounds the flow is not maximal (also catches a too-small
    # BFS depth) — error instead of silently under-reporting
    return ",\n".join(parts) + (
        f"\nSELECT ROUND(CAST((SELECT COALESCE(SUM(fl), 0) FROM f{A} WHERE u = 0) "
        f"- (SELECT COALESCE(SUM(fl), 0) FROM f{A} WHERE v = 0) AS DOUBLE), 6) "
        f"AS max_flow, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM ss) AS source_set_size "
        f"WHERE (SELECT CASE WHEN EXISTS (SELECT 1 FROM ss WHERE v = (SELECT t FROM tv)) "
        f"THEN error('max_flow oracle: aug_rounds={aug_rounds}/depth={depth} "
        f"unroll exhausted (augmenting path remains)') ELSE 0 END) = 0"
    )


def _cutcluster_sql(aug_rounds=26, depth=12, slots=100) -> str:
    """Exact twin of q_cut_clustering (community/CutClustering.cpp analog,
    graph/flow.py cut_clustering).  Two facts make a replay unnecessary:
    (1) each Flake-Tarjan flow starts from a FRESH residual graph, so the
    per-source min u-t cut is independent of the assignment state and all
    sources run as ONE multi-source unrolled Edmonds-Karp (min-id
    shortest-path parents, s-keyed CTEs); (2) the engine's source side is
    the residual-reachable set = the unique inclusion-minimal min cut, so
    the oracle's own EK converges to the same side.  Capacities scale x5
    to integers (ring 5, sink alpha 0.8 -> 4) - scaling preserves every
    residual>0 pattern and the unique min-cut sides, and keeps all SQL
    arithmetic exact.  The (degree DESC, id ASC) assignment pass is an
    unrolled fold over ``slots`` seed positions (no-op once every vertex
    is labelled).  ``aug_rounds`` need only exceed the max per-source
    augmentation count (23 on the sf fixtures), ``slots`` the supplier
    count (100 at sf0.01)."""
    parts = [
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier)",
        "re AS MATERIALIZED (SELECT src, dst FROM ({RING}))",
        "sv AS MATERIALIZED (SELECT CAST(s_suppkey AS BIGINT) AS v FROM supplier)",
        "ae AS MATERIALIZED (SELECT src AS u, dst AS v, CAST(5 AS BIGINT) AS cap FROM re "
        "UNION ALL SELECT v, (SELECT n FROM nn), CAST(4 AS BIGINT) FROM sv "
        "UNION ALL SELECT (SELECT n FROM nn), v, CAST(4 AS BIGINT) FROM sv)",
        "cce AS MATERIALIZED (SELECT s.v AS s, e.u, e.v, e.cap FROM sv s CROSS JOIN ae e)",
        "cf0 AS MATERIALIZED (SELECT s, u, v, CAST(0 AS BIGINT) AS fl FROM cce)",
    ]
    for a in range(aug_rounds):
        parts += [
            f"cr{a} AS MATERIALIZED (SELECT c.s, c.u, c.v, c.cap - fa.fl + fb.fl AS r "
            f"FROM cce c JOIN cf{a} fa ON fa.s = c.s AND fa.u = c.u AND fa.v = c.v "
            f"JOIN cf{a} fb ON fb.s = c.s AND fb.u = c.v AND fb.v = c.u)",
            f"cd{a}(s, v, d) AS (SELECT v, v, 0 FROM sv UNION "
            f"SELECT dr.s, e.v, dr.d + 1 FROM cd{a} dr "
            f"JOIN cr{a} e ON e.s = dr.s AND e.u = dr.v AND e.r > 0 WHERE dr.d < {depth})",
            f"ci{a} AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM cd{a} GROUP BY s, v)",
            f"cp{a} AS MATERIALIZED (SELECT dv.s, dv.v, MIN(e.u) AS p "
            f"FROM cr{a} e JOIN ci{a} du ON du.s = e.s AND du.v = e.u "
            f"JOIN ci{a} dv ON dv.s = e.s AND dv.v = e.v AND dv.d = du.d + 1 "
            f"WHERE e.r > 0 GROUP BY dv.s, dv.v)",
            f"cw{a}(s, v) AS (SELECT s, v FROM ci{a} WHERE v = (SELECT n FROM nn) UNION "
            f"SELECT w.s, pa.p FROM cw{a} w JOIN cp{a} pa ON pa.s = w.s AND pa.v = w.v "
            f"WHERE w.v <> w.s)",
            f"cq{a} AS MATERIALIZED (SELECT w.s, pa.p AS u, w.v FROM cw{a} w "
            f"JOIN cp{a} pa ON pa.s = w.s AND pa.v = w.v WHERE w.v <> w.s)",
            f"cb{a} AS MATERIALIZED (SELECT p.s, MIN(e.r) AS b FROM cq{a} p "
            f"JOIN cr{a} e ON e.s = p.s AND e.u = p.u AND e.v = p.v GROUP BY p.s)",
            f"cf{a + 1} AS MATERIALIZED (SELECT f.s, f.u, f.v, f.fl + "
            f"(CASE WHEN EXISTS (SELECT 1 FROM cq{a} p WHERE p.s = f.s AND p.u = f.u AND p.v = f.v) "
            f"THEN COALESCE((SELECT b FROM cb{a} bb WHERE bb.s = f.s), 0) ELSE 0 END) AS fl "
            f"FROM cf{a} f)",
        ]
    A = aug_rounds
    parts += [
        f"crf AS MATERIALIZED (SELECT c.s, c.u, c.v, c.cap - fa.fl + fb.fl AS r "
        f"FROM cce c JOIN cf{A} fa ON fa.s = c.s AND fa.u = c.u AND fa.v = c.v "
        f"JOIN cf{A} fb ON fb.s = c.s AND fb.u = c.v AND fb.v = c.u)",
        "css(s, v) AS (SELECT v, v FROM sv UNION "
        "SELECT ss.s, e.v FROM css ss JOIN crf e ON e.s = ss.s AND e.u = ss.v AND e.r > 0)",
        "cside AS MATERIALIZED (SELECT s, v FROM css WHERE v <> (SELECT n FROM nn))",
        "cdeg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS dg FROM re GROUP BY src)",
        "cord AS MATERIALIZED (SELECT v, ROW_NUMBER() OVER (ORDER BY dg DESC, v ASC) AS rk "
        "FROM (SELECT s.v, COALESCE(d.dg, 0) AS dg FROM sv s LEFT JOIN cdeg d ON d.v = s.v))",
        "as0 AS MATERIALIZED (SELECT v, CAST(-1 AS BIGINT) AS lab FROM sv)",
    ]
    for k in range(1, slots + 1):
        parts.append(
            f"as{k} AS MATERIALIZED (SELECT a.v, CASE WHEN "
            f"(SELECT a2.lab FROM as{k - 1} a2 JOIN cord o ON o.v = a2.v AND o.rk = {k}) = -1 "
            f"AND EXISTS (SELECT 1 FROM cside sd JOIN cord o2 ON o2.rk = {k} AND sd.s = o2.v "
            f"WHERE sd.v = a.v) "
            f"THEN (SELECT v FROM cord WHERE rk = {k}) ELSE a.lab END AS lab FROM as{k - 1} a)"
        )
    # guards (round-4 advice): the unrolls are fixture-pinned — fail
    # loudly instead of silently diverging when (a) the residual graph
    # still has an s→t path after aug_rounds EK rounds (flow not maximal,
    # also catches a too-small BFS ``depth``), or (b) a vertex is still
    # unlabelled after ``slots`` assignment folds (every vertex labels
    # itself by its own rank slot, so -1 after all slots ⇒ slots < n)
    return (
        "WITH RECURSIVE " + ",\n".join(parts)
        + f"\nSELECT v, lab AS label FROM as{slots} "
        f"WHERE (SELECT CASE WHEN EXISTS (SELECT 1 FROM css WHERE v = (SELECT n FROM nn)) "
        f"THEN error('cut_clustering oracle: aug_rounds={aug_rounds}/depth={depth} "
        f"unroll exhausted (residual s-t path remains)') "
        f"WHEN EXISTS (SELECT 1 FROM as{slots} WHERE lab = -1) "
        f"THEN error('cut_clustering oracle: slots={slots} unroll exhausted "
        f"(unlabelled vertices remain)') ELSE 0 END) = 0 ORDER BY v"
    )


def _sgns_sql(n_walkers=128, length=8, dim=8, window=2, neg=3, epochs=3,
              lr="0.05", seed=42, parts_n=16) -> str:
    """Exact twin of q_sgns_embeddings (graph/embedding.py, lattice mode).
    Replays the whole training: the certified random-walks replay, the
    windowed pair construction with CONSTRUCTION-TIME batch-local indices
    (block order: off asc, fwd before rev, (walker, earlier-step) within),
    the walker-hash partition ids (exchange._key_hash + hashing.vpart),
    per-epoch splitmix negatives keyed on (idx·neg + k + (seed+1000·ep)·FNV),
    sigmoid scores and per-pair gradient contributions quantized to the
    2^-24 lattice (floor(x·2^24 + 0.5)/2^24 — fl-identical both sides), and
    one exactly-summed update per epoch (lattice sums are exact in f64, so
    SQL GROUP BY equals np.add.at at any order).  Embedding state is
    bit-exact throughout; only the sigmoid's exp can differ by an ulp
    between numpy and DuckDB, absorbed by the quantization except on a
    measure-~1e-10 boundary set.  The certification is therefore
    PLATFORM-PINNED (round-4 advice): hash-exactness is guaranteed on a
    fixed numpy/libm/DuckDB build (this container) and probabilistically
    robust — not deterministic like the integer twins — across builds; a
    libm change that lands a score on the quantization boundary shows up
    as an oracle mismatch, not silent corruption."""
    _K = 0x9E3779B97F4A7C15
    _GOLD_S = "11400714819323198485"
    _MIX_S = "13787848793156543929"
    _FNV = 0x100000001B3
    n = "(SELECT COUNT(*) FROM customer)"
    rng_base = (seed * _K) % _M64
    Q = "16777216.0"
    p = [
        "wse AS MATERIALIZED ({SYM})",
        "wnodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        f"wpiv AS MATERIALIZED (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS BIGINT) AS walker "
        f"FROM (SELECT v FROM wnodes "
        f"ORDER BY (CAST(v + {seed} AS HUGEINT) * CAST('{_GOLD_S}' AS HUGEINT)) "
        f"% CAST('{_M64}' AS HUGEINT) LIMIT {n_walkers}))",
        "wadj AS MATERIALIZED (SELECT src AS v, list(dst ORDER BY dst) AS ns, "
        "CAST(COUNT(*) AS BIGINT) AS d FROM wse GROUP BY src)",
        "ws0 AS MATERIALIZED (SELECT walker, v FROM wpiv)",
    ]
    for k in range(1, length + 1):
        p.append(
            f"ws{k} AS MATERIALIZED (SELECT s.walker, "
            f"CASE WHEN a.d IS NULL THEN s.v "
            f"ELSE a.ns[CAST(((CAST(s.walker + 1 AS HUGEINT) * CAST('{_GOLD_S}' AS HUGEINT) "
            f"+ CAST({k} AS HUGEINT) * CAST('{_MIX_S}' AS HUGEINT)) "
            f"% CAST('{_M64}' AS HUGEINT)) % a.d AS BIGINT) + 1] END AS v "
            f"FROM ws{k-1} s LEFT JOIN wadj a ON a.v = s.v)"
        )
    walk_union = " UNION ALL ".join(
        f"SELECT walker, CAST({k} AS BIGINT) AS step, v FROM ws{k}"
        for k in range(length + 1)
    )
    p.append(f"wk AS MATERIALIZED ({walk_union})")
    # partition id per walker: vpart(key_hash(walker)) = ((walker*K mod 2^64)*K mod 2^64) >> 33 % 16
    h1 = _mul64_sql("walker", _K)
    h2 = _mul64_sql(h1, _K)
    p.append(
        f"wbp AS MATERIALIZED (SELECT DISTINCT walker, "
        f"CAST(({h2} >> 33) % {parts_n} AS BIGINT) AS part FROM wk)"
    )
    # pairs: blocks (off asc; fwd then rev), within block ordered by (walker, earlier step)
    blocks = []
    for off in range(1, window + 1):
        blocks.append(
            f"SELECT a.walker, a.step, a.v AS center, b.v AS context, {2*(off-1)} AS blk "
            f"FROM wk a JOIN wk b ON b.walker = a.walker AND b.step = a.step + {off}"
        )
        blocks.append(
            f"SELECT a.walker, a.step, b.v AS center, a.v AS context, {2*(off-1)+1} AS blk "
            f"FROM wk a JOIN wk b ON b.walker = a.walker AND b.step = a.step + {off}"
        )
    p.append("pr0 AS MATERIALIZED (" + " UNION ALL ".join(blocks) + ")")
    p.append(
        "prs AS MATERIALIZED (SELECT bp.part, pr.center, pr.context, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY bp.part ORDER BY pr.blk, pr.walker, pr.step) - 1 AS BIGINT) AS idx "
        "FROM pr0 pr JOIN wbp bp ON bp.walker = pr.walker)"
    )
    # init embeddings: idx0 = v*dim + j (in) / n*dim + v*dim + j (out); h = sm64(idx0 + rng_base)
    p.append(
        f"emi0 AS (SELECT t.tag, n.v, j.j, "
        f"CAST(((t.tag * {n} + n.v) * {dim} + j.j + {rng_base}) % {_M64} AS UBIGINT) AS a0 "
        f"FROM (SELECT 0 AS tag UNION ALL SELECT 1) t "
        f"CROSS JOIN wnodes n CROSS JOIN (SELECT UNNEST(range({dim})) AS j) j)"
    )
    p += _sm64_stages("emh", "emi0", "a0", "tag, v, j")
    p.append(
        f"emv AS MATERIALIZED (SELECT tag, v, j, "
        f"(CAST(h AS DOUBLE) / 18446744073709551616.0 - 0.5) / {float(dim)} AS val FROM emhc)"
    )
    in_cols = ", ".join(
        f"MAX(CASE WHEN j = {j} THEN val END) AS e{j}" for j in range(dim)
    )
    p.append(f"wi0 AS MATERIALIZED (SELECT v, {in_cols} FROM emv WHERE tag = 0 GROUP BY v)")
    p.append(f"wo0 AS MATERIALIZED (SELECT v, {in_cols} FROM emv WHERE tag = 1 GROUP BY v)")

    for ep in range(epochs):
        base_ep = ((seed + 1000 * ep) * _FNV) % _M64
        # negatives: k in 0..neg-1, arg = idx*neg + k + base
        p.append(
            f"ng{ep}0 AS (SELECT part, center, idx, k.k, "
            f"CAST((idx * {neg} + k.k + {base_ep}) % {_M64} AS UBIGINT) AS a0 "
            f"FROM prs CROSS JOIN (SELECT UNNEST(range({neg})) AS k) k)"
        )
        p += _sm64_stages(f"ng{ep}h", f"ng{ep}0", "a0", "part, center, idx, k")
        p.append(
            f"tg{ep} AS MATERIALIZED ("
            f"SELECT center, context AS tgt, 1.0 AS label FROM prs "
            f"UNION ALL SELECT center, CAST(h % CAST({n} AS UBIGINT) AS BIGINT) AS tgt, 0.0 AS label "
            f"FROM ng{ep}hc)"
        )
        dot = " + ".join(f"i.e{j} * o.e{j}" for j in range(dim))
        p.append(
            f"sc{ep} AS MATERIALIZED (SELECT t.center, t.tgt, "
            f"t.label - FLOOR((1.0 / (1.0 + EXP(-({dot})))) * {Q} + 0.5) / {Q} AS coef "
            f"FROM tg{ep} t JOIN wi{ep} i ON i.v = t.center JOIN wo{ep} o ON o.v = t.tgt)"
        )
        gi_cols = ", ".join(
            f"SUM(FLOOR((s.coef * o.e{j}) * {Q} + 0.5) / {Q}) AS g{j}" for j in range(dim)
        )
        go_cols = ", ".join(
            f"SUM(FLOOR((s.coef * i.e{j}) * {Q} + 0.5) / {Q}) AS g{j}" for j in range(dim)
        )
        p.append(
            f"gi{ep} AS MATERIALIZED (SELECT s.center AS v, {gi_cols} "
            f"FROM sc{ep} s JOIN wo{ep} o ON o.v = s.tgt GROUP BY s.center)"
        )
        p.append(
            f"go{ep} AS MATERIALIZED (SELECT s.tgt AS v, {go_cols} "
            f"FROM sc{ep} s JOIN wi{ep} i ON i.v = s.center GROUP BY s.tgt)"
        )
        up_i = ", ".join(
            f"w.e{j} + {lr} * COALESCE(g.g{j}, 0.0) AS e{j}" for j in range(dim)
        )
        p.append(
            f"wi{ep+1} AS MATERIALIZED (SELECT w.v, {up_i} FROM wi{ep} w "
            f"LEFT JOIN gi{ep} g ON g.v = w.v)"
        )
        p.append(
            f"wo{ep+1} AS MATERIALIZED (SELECT w.v, {up_i} FROM wo{ep} w "
            f"LEFT JOIN go{ep} g ON g.v = w.v)"
        )
    out_cols = ", ".join(f"ROUND(e{j}, 6) AS e{j}" for j in range(dim))
    return (
        "WITH " + ",\n".join(p)
        + f"\nSELECT v, {out_cols} FROM wi{epochs} ORDER BY v"
    )


def _lfr_parts(
    mu=0.15, gamma=-2.0, min_deg=4, max_deg=20, gamma_size=-1.0,
    min_comm=20, max_comm=60, seed=42,
    size_blocks=3, assign_rounds=8, hh_steps=56,
) -> list:
    """CTE parts ending in lfedges (src, dst) + lfasg (v, deg, ideg, c) +
    lfncomm (k).  All draws counter-hashed; CDF thresholds are embedded
    from the same numpy computation the engine runs."""
    from networkit_ray.sources.lfr import _plaw_cdf  # engine-identical thresholds

    _K = 0x9E3779B97F4A7C15

    cdf_d = _plaw_cdf(gamma, min_deg, max_deg)
    cdf_s = _plaw_cdf(gamma_size, min_comm, max_comm)
    vals_d = ", ".join(f"({x!r})" for x in cdf_d)
    vals_s = ", ".join(f"({x!r})" for x in cdf_s)
    TWO64F = "18446744073709551616.0"
    p = [
        "lfn AS MATERIALIZED (SELECT LEAST(GREATEST(CAST(COUNT(*) AS BIGINT), 200), 600) AS n FROM customer)",
        f"lfcd(t) AS (SELECT CAST(col0 AS DOUBLE) FROM (VALUES {vals_d}))",
        f"lfcs(t) AS (SELECT CAST(col0 AS DOUBLE) FROM (VALUES {vals_s}))",
        "lfv AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS v FROM range(600) "
        "WHERE range < (SELECT n FROM lfn))",
    ]
    # A. degrees
    p += _sm64_stages("lfdg", "lfv", f"v + {seed * 0x85EBCA77}", "v")
    p.append(
        f"lfdeg AS MATERIALIZED (SELECT v, {min_deg} + "
        f"(SELECT COUNT(*) FROM lfcd WHERE t < u) AS deg FROM "
        f"(SELECT v, CAST(h AS DOUBLE) / {TWO64F} AS u FROM lfdgc))"
    )
    # B. internal degrees (stochastic rounding, hash coin)
    p += _sm64_stages("lfco", "lfdeg", f"v + {seed * 0xB5297A4D}", "v, deg")
    p.append(
        f"lfnd AS MATERIALIZED (SELECT v, deg, "
        f"CAST(FLOOR((1.0 - {mu}) * deg) AS BIGINT) + "
        f"(CASE WHEN CAST(h AS DOUBLE) / {TWO64F} < "
        f"((1.0 - {mu}) * deg) - FLOOR((1.0 - {mu}) * deg) THEN 1 ELSE 0 END) AS ideg "
        f"FROM lfcoc)"
    )
    # C. community sizes: blocks of draws, keep prefix with running_before < n
    # block size mirrors sources/lfr.py:438 exactly — computed from the
    # min_comm/max_comm ARGUMENTS (round-4 advice: the old hardcoded
    # n//40+2 silently diverged for non-default community sizes), and the
    # i-range is sized to the worst case under lfn's 600-vertex clamp so
    # it can never truncate the block
    avg_comm = (min_comm + max_comm) // 2
    blk = f"GREATEST(4, (SELECT n FROM lfn) // {avg_comm} + 2)"
    blk_cap = max(4, 600 // avg_comm + 2)
    p.append(
        f"lfsz0 AS (SELECT b.b, i.i FROM (SELECT UNNEST(range({size_blocks})) AS b) b "
        f"CROSS JOIN (SELECT CAST(range AS BIGINT) AS i FROM range({blk_cap})) i "
        f"WHERE i.i < {blk})"
    )
    p += _sm64_stages(
        "lfszh", "lfsz0", f"i + (b + {seed + 7}) * 2654435761", "b, i"
    )
    p.append(
        f"lfszd AS MATERIALIZED (SELECT b, i, {min_comm} + "
        f"(SELECT COUNT(*) FROM lfcs WHERE t < u) AS s FROM "
        f"(SELECT b, i, CAST(h AS DOUBLE) / {TWO64F} AS u FROM lfszhc))"
    )
    p.append(
        "lfszk AS MATERIALIZED (SELECT pos, s FROM ("
        "SELECT ROW_NUMBER() OVER (ORDER BY b, i) - 1 AS pos, s, "
        "COALESCE(SUM(s) OVER (ORDER BY b, i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before "
        "FROM lfszd) WHERE before < (SELECT n FROM lfn))"
    )
    p.append("lfszt AS (SELECT CAST(SUM(s) AS BIGINT) AS tot FROM lfszk)")
    p.append(
        "lfszadj AS MATERIALIZED (SELECT pos, s + CASE WHEN "
        "ROW_NUMBER() OVER (ORDER BY s ASC, pos ASC) = 1 "
        "THEN (SELECT n FROM lfn) - (SELECT tot FROM lfszt) ELSE 0 END AS s "
        "FROM lfszk)"
    )
    p.append("lfncomm AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM lfszadj)")
    # community rank: argsort(-sizes, stable) -> ci
    p.append(
        "lfcomm AS MATERIALIZED (SELECT CAST(ROW_NUMBER() OVER (ORDER BY s DESC, pos ASC) - 1 AS BIGINT) AS ci, "
        "s AS size FROM lfszadj)"
    )
    # D. assignment rounds
    p.append("lfcap0 AS MATERIALIZED (SELECT ci, size AS cap FROM lfcomm)")
    p.append("lfpd0 AS MATERIALIZED (SELECT v, deg, ideg FROM lfnd)")
    kept_names = []
    for t in range(assign_rounds):
        p.append(
            f"lfcc{t} AS MATERIALIZED (SELECT c.ci, c.cap, cm.size, "
            f"SUM(c.cap) OVER (ORDER BY c.ci) AS cum FROM lfcap{t} c "
            f"JOIN lfcomm cm ON cm.ci = c.ci)"
        )
        p += _sm64_stages(
            f"lfah{t}", f"lfpd{t}",
            f"v + {t * 0xC2B2AE35 + seed * 0x27D4EB2F}", "v, deg, ideg",
        )
        p.append(
            f"lfdr{t} AS MATERIALIZED (SELECT v, deg, ideg, h, "
            f"CASE WHEN eff > 0 THEN "
            f"(SELECT COUNT(*) FROM lfcc{t} w WHERE w.cum <= "
            f"CAST(h % CAST(GREATEST(eff, 1) AS UBIGINT) AS BIGINT)) ELSE -1 END AS c, "
            f"CAST(h % 9223372036854775808 AS BIGINT) AS hs FROM ("
            f"SELECT v, deg, ideg, h, "
            f"CASE WHEN fcap > 0 THEN fcap ELSE (SELECT MAX(cum) FROM lfcc{t}) END AS eff "
            f"FROM (SELECT v, deg, ideg, h, "
            f"COALESCE((SELECT w.cum FROM lfcc{t} w WHERE w.ci = "
            f"(SELECT COUNT(*) FROM lfcc{t} x WHERE x.size >= q.ideg + 1) - 1), 0) AS fcap "
            f"FROM lfah{t}c q)))"
        )
        p.append(
            f"lfkp{t} AS MATERIALIZED (SELECT v, deg, ideg, c FROM ("
            f"SELECT d.*, ROW_NUMBER() OVER (PARTITION BY d.c ORDER BY d.hs, d.v) AS rn, "
            f"cp.cap FROM lfdr{t} d LEFT JOIN lfcap{t} cp ON cp.ci = d.c) "
            f"WHERE c >= 0 AND rn <= cap)"
        )
        kept_names.append(f"lfkp{t}")
        p.append(
            f"lfcap{t + 1} AS MATERIALIZED (SELECT c.ci, c.cap - "
            f"COALESCE((SELECT COUNT(*) FROM lfkp{t} k WHERE k.c = c.ci), 0) AS cap "
            f"FROM lfcap{t} c)"
        )
        p.append(
            f"lfpd{t + 1} AS MATERIALIZED (SELECT p.v, p.deg, p.ideg FROM lfpd{t} p "
            f"WHERE p.v NOT IN (SELECT v FROM lfkp{t}))"
        )
    # guard: the assignment unroll is fixture-pinned (engine loops up to
    # 40 rounds) — if any vertex is still unassigned after the last
    # unrolled round the oracle must FAIL, not silently diverge
    p.append(
        "lfasg AS MATERIALIZED (SELECT * FROM ("
        + " UNION ALL ".join(f"SELECT * FROM {k}" for k in kept_names)
        + f") WHERE (SELECT CASE WHEN (SELECT COUNT(*) FROM lfpd{assign_rounds}) <> 0 "
        f"THEN error('lfr oracle: assign_rounds={assign_rounds} unroll exhausted "
        f"(unassigned vertices remain)') ELSE 0 END) = 0)"
    )
    # E. intra: per-community HH on (ideg clamped, parity-fixed)
    p.append(
        "lfmem AS MATERIALIZED (SELECT a.c AS ci, a.v, a.ideg, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY a.c ORDER BY a.v) - 1 AS BIGINT) AS i, "
        "COUNT(*) OVER (PARTITION BY a.c) AS size FROM lfasg a)"
    )
    p.append(
        "lfd0a AS MATERIALIZED (SELECT ci, v, i, LEAST(ideg, size - 1) AS def FROM lfmem)"
    )
    p.append(
        "lfdf0 AS MATERIALIZED (SELECT ci, v, i, def - CASE WHEN "
        "(SELECT SUM(def) FROM lfd0a x WHERE x.ci = lfd0a.ci) % 2 = 1 AND "
        "ROW_NUMBER() OVER (PARTITION BY ci ORDER BY def DESC, i ASC) = 1 "
        "THEN 1 ELSE 0 END AS def FROM lfd0a)"
    )
    ed_names = []
    for s in range(1, hh_steps + 1):
        pv = f"lfdf{s - 1}"
        p.append(
            f"lfrk{s} AS MATERIALIZED (SELECT ci, v, i, def, "
            f"ROW_NUMBER() OVER (PARTITION BY ci ORDER BY def DESC, i ASC) AS rn FROM {pv})"
        )
        p.append(
            f"lfpk{s} AS MATERIALIZED (SELECT ci, i AS ui, v AS uv, def AS d "
            f"FROM lfrk{s} WHERE rn = 1 AND def > 0)"
        )
        p.append(
            f"lftg{s} AS MATERIALIZED (SELECT r.ci, r.i, r.v FROM lfrk{s} r "
            f"JOIN lfpk{s} k ON k.ci = r.ci "
            f"WHERE r.rn BETWEEN 2 AND k.d + 1 AND r.def > 0)"
        )
        p.append(
            f"lfed{s} AS MATERIALIZED (SELECT LEAST(k.uv, t.v) AS src, "
            f"GREATEST(k.uv, t.v) AS dst FROM lfpk{s} k JOIN lftg{s} t ON t.ci = k.ci)"
        )
        ed_names.append(f"lfed{s}")
        p.append(
            f"lfdf{s} AS MATERIALIZED (SELECT d.ci, d.v, d.i, "
            f"CASE WHEN k.ui IS NOT NULL AND d.i = k.ui THEN 0 "
            f"WHEN tg.i IS NOT NULL THEN d.def - 1 ELSE d.def END AS def "
            f"FROM {pv} d LEFT JOIN lfpk{s} k ON k.ci = d.ci "
            f"LEFT JOIN lftg{s} tg ON tg.ci = d.ci AND tg.i = d.i)"
        )
    # F. inter: stub pairing in 64 buckets
    p.append(
        f"lfst0 AS (SELECT a.v, a.c, j.j FROM lfasg a "
        f"CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range({max_deg})) j "
        f"WHERE j.j < GREATEST(a.deg - a.ideg, 0))"
    )
    vK = _mul64_sql("v", _K)
    p += _sm64_stages(
        "lfsh", "lfst0", f"(CAST({vK} AS HUGEINT) + j + {seed * 0x165667B1}) % {_M64}",
        "v, c, j",
    )
    p.append(
        "lfstb AS MATERIALIZED (SELECT v, c, CAST(h % 64 AS BIGINT) AS bucket, "
        "CAST(h >> 8 AS BIGINT) AS hs FROM lfshc)"
    )
    p.append(
        "lfpr AS MATERIALIZED (SELECT bucket, v, c, "
        "ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY hs, v) - 1 AS rn, "
        "COUNT(*) OVER (PARTITION BY bucket) AS cnt FROM lfstb)"
    )
    p.append(
        "lfie AS MATERIALIZED (SELECT LEAST(a.v, b.v) AS src, GREATEST(a.v, b.v) AS dst "
        "FROM lfpr a JOIN lfpr b ON b.bucket = a.bucket AND b.rn = a.rn + 1 "
        "WHERE a.rn % 2 = 0 AND a.rn + 1 < a.cnt - (a.cnt % 2) + 1 "
        "AND a.rn < a.cnt - (a.cnt % 2) "
        "AND a.v <> b.v AND a.c <> b.c)"
    )
    # guard: hh_steps is fixture-pinned — a community needing more
    # Havel-Hakimi picks than the unroll covers must fail loudly
    p.append(
        "lfedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        + " UNION ALL ".join(f"SELECT src, dst FROM {e}" for e in ed_names)
        + " UNION ALL SELECT src, dst FROM lfie) "
        + f"WHERE (SELECT CASE WHEN (SELECT COALESCE(SUM(def), 0) FROM lfdf{hh_steps}) <> 0 "
        f"THEN error('lfr oracle: hh_steps={hh_steps} unroll exhausted "
        f"(residual intra-degree deficit)') ELSE 0 END) = 0)"
    )
    return p


def _lfr_edges_sql():
    p = _lfr_parts()
    return "WITH " + ",\n".join(p) + "\nSELECT src, dst FROM lfedges ORDER BY src, dst"


def _lfr_mixing_sql():
    p = _lfr_parts()
    p.append(
        "lfmx AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, "
        "CAST(SUM(CASE WHEN la.c <> lb.c THEN 1 ELSE 0 END) AS DOUBLE) AS s "
        "FROM lfedges e JOIN lfasg la ON la.v = e.src JOIN lfasg lb ON lb.v = e.dst)"
    )
    return (
        "WITH " + ",\n".join(p)
        + "\nSELECT (SELECT n FROM lfn) AS n, m, (SELECT k FROM lfncomm) AS n_communities, "
        "ROUND(s / GREATEST(1, m), 6) AS realized_mu FROM lfmx"
    )


def _louvain_parts(rounds=(32, 12, 6), min_gain=2e-3) -> tuple[list, str]:
    """CTE parts replaying louvain() (graph/louvain.py) exactly; returns
    (parts, final_label_cte) where the final CTE is (v, l) in original
    vertex ids.  Shared by the louvain / louvain_modularity /
    leiden_refine twins.

    The engine's parity-gated synchronous local moving, best-Q̂ monitor
    (patience 3 / idle-parity 2 stops), coarsening (sorted-distinct dense
    relabel) and min-gain-gated prolongation are replayed per level.  On
    these inputs every engine quantity is integer-valued (unit weights →
    coarse weights are edge-count sums; volumes/degrees integer floats),
    so the only float arithmetic is the gain / Q̂ divisions — replicated
    operand-for-operand (DuckDB DOUBLE ops are the same IEEE-754
    correctly-rounded ops numpy uses → bit-identical), and the per-round
    stop fold (st CTEs) replays the stale/idle logic so trailing
    unrolled rounds are ignored.  ``rounds`` bounds the per-level unroll
    (engine max_rounds=32; coarse levels stop far earlier) and 3 levels
    exceed the fixtures' hierarchy depth (level-1 gain < min_gain at
    sf0.01, level-2 at sf0.001) — like _maxflow_sql's aug_rounds, the
    bounds only need to cover the fixture and the certification sweep
    pins them."""
    K = "11400714819323198485"  # 0x9E3779B97F4A7C15
    TWO64 = "18446744073709551616"
    TWO63 = "9223372036854775808"
    L = len(rounds)
    p = []
    p.append(
        "nodes0 AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)"
    )
    p.append("eall0 AS MATERIALIZED (SELECT src, dst, 1.0 AS w FROM ({SYM}))")
    for l in range(L):
        R = rounds[l]
        if l > 0:
            pl = l - 1
            p.append(
                f"ce{l} AS MATERIALIZED (SELECT ls.l AS s2, ld.l AS d2, SUM(e.w) AS w "
                f"FROM eall{pl} e JOIN labB{pl} ls ON ls.v = e.src "
                f"JOIN labB{pl} ld ON ld.v = e.dst GROUP BY ls.l, ld.l)"
            )
            p.append(
                f"map{l} AS MATERIALIZED (SELECT lbl, ROW_NUMBER() OVER (ORDER BY lbl) - 1 AS idx "
                f"FROM (SELECT DISTINCT s2 AS lbl FROM ce{l} UNION SELECT DISTINCT d2 FROM ce{l}))"
            )
            p.append(
                f"eall{l} AS MATERIALIZED (SELECT ms.idx AS src, md.idx AS dst, c.w AS w "
                f"FROM ce{l} c JOIN map{l} ms ON ms.lbl = c.s2 JOIN map{l} md ON md.lbl = c.d2)"
            )
            p.append(f"nodes{l} AS MATERIALIZED (SELECT idx AS v FROM map{l})")
        p.append(f"e{l} AS MATERIALIZED (SELECT * FROM eall{l} WHERE src <> dst)")
        p.append(
            f"sw{l} AS MATERIALIZED (SELECT src AS v, SUM(w) AS w FROM eall{l} "
            f"WHERE src = dst GROUP BY src)"
        )
        p.append(f"mm{l} AS MATERIALIZED (SELECT SUM(w) / 2.0 AS m FROM eall{l})")
        p.append(
            f"dw{l} AS MATERIALIZED (SELECT n.v, COALESCE(s.w, 0.0) + COALESCE(x.w, 0.0) AS degw "
            f"FROM nodes{l} n LEFT JOIN sw{l} s ON s.v = n.v "
            f"LEFT JOIN (SELECT src AS v, SUM(w) AS w FROM e{l} GROUP BY src) x ON x.v = n.v)"
        )
        p.append(f"lab{l}_0 AS MATERIALIZED (SELECT v, v AS l FROM nodes{l})")
        p.append(f"vol{l}_0 AS MATERIALIZED (SELECT v, degw AS vol FROM dw{l})")
        p.append(
            f"st{l}_0 AS MATERIALIZED (SELECT CAST('-infinity' AS DOUBLE) AS bq, "
            f"0 AS br, 0 AS stale, 0 AS idle, 0 AS stopped, 0 AS tm)"
        )
        for t in range(R):
            p.append(
                f"h{l}_{t} AS MATERIALIZED (SELECT d, c, SUM(ww) AS ww FROM ("
                f"SELECT e.dst AS d, ls.l AS c, e.w AS ww FROM e{l} e "
                f"JOIN lab{l}_{t} ls ON ls.v = e.src "
                f"UNION ALL SELECT v, l, 0.0 FROM lab{l}_{t}) GROUP BY d, c)"
            )
            p.append(
                f"ow{l}_{t} AS MATERIALIZED (SELECT h.d AS v, h.ww AS own FROM h{l}_{t} h "
                f"JOIN lab{l}_{t} lb ON lb.v = h.d AND lb.l = h.c)"
            )
            p.append(
                f"gn{l}_{t} AS MATERIALIZED (SELECT h.d, h.c, "
                f"CASE WHEN h.c = lb.l THEN 0.0 ELSE "
                f"((h.ww - ow.own) / mm.m) - "
                f"((dg.degw * (vc.vol - (va.vol - dg.degw))) / ((2.0 * mm.m) * mm.m)) "
                f"END AS gain "
                f"FROM h{l}_{t} h "
                f"JOIN lab{l}_{t} lb ON lb.v = h.d "
                f"JOIN ow{l}_{t} ow ON ow.v = h.d "
                f"JOIN dw{l} dg ON dg.v = h.d "
                f"JOIN vol{l}_{t} vc ON vc.v = h.c "
                f"JOIN vol{l}_{t} va ON va.v = lb.l "
                f"CROSS JOIN mm{l} mm)"
            )
            p.append(
                f"bs{l}_{t} AS MATERIALIZED (SELECT d AS v, c AS bc, gain AS bg FROM ("
                f"SELECT d, c, gain, ROW_NUMBER() OVER (PARTITION BY d ORDER BY gain DESC, c ASC) AS rn "
                f"FROM gn{l}_{t}) WHERE rn = 1)"
            )
            cmp_ = ">=" if (t & 1) == 1 else "<"
            p.append(
                f"mv{l}_{t} AS MATERIALIZED (SELECT b.v, lb.l AS old, b.bc AS new, dg.degw "
                f"FROM bs{l}_{t} b JOIN lab{l}_{t} lb ON lb.v = b.v JOIN dw{l} dg ON dg.v = b.v "
                f"WHERE b.bg > 1e-12 AND b.bc <> lb.l "
                f"AND (CAST(b.v AS HUGEINT) * {K}) % {TWO64} {cmp_} {TWO63})"
            )
            p.append(
                f"q{l}_{t} AS MATERIALIZED (SELECT "
                f"((SELECT SUM(own) FROM ow{l}_{t}) / (2.0 * mm.m)) - "
                f"((SELECT SUM(vol * vol) FROM vol{l}_{t}) / ((4.0 * mm.m) * mm.m)) AS q, "
                f"(SELECT COUNT(*) FROM mv{l}_{t}) AS mc FROM mm{l} mm)"
            )
            p.append(
                f"lab{l}_{t + 1} AS MATERIALIZED (SELECT lb.v, COALESCE(m.new, lb.l) AS l "
                f"FROM lab{l}_{t} lb LEFT JOIN mv{l}_{t} m ON m.v = lb.v)"
            )
            p.append(
                f"vol{l}_{t + 1} AS MATERIALIZED (SELECT vo.v, vo.vol "
                f"- COALESCE(o.s, 0.0) + COALESCE(nn.s, 0.0) AS vol FROM vol{l}_{t} vo "
                f"LEFT JOIN (SELECT old AS v, SUM(degw) AS s FROM mv{l}_{t} GROUP BY old) o ON o.v = vo.v "
                f"LEFT JOIN (SELECT new AS v, SUM(degw) AS s FROM mv{l}_{t} GROUP BY new) nn ON nn.v = vo.v)"
            )
            p.append(
                f"st{l}_{t + 1} AS MATERIALIZED (SELECT "
                f"CASE WHEN s.stopped = 1 THEN s.bq "
                f"WHEN q.q > s.bq + 1e-12 THEN q.q ELSE s.bq END AS bq, "
                f"CASE WHEN s.stopped = 1 THEN s.br "
                f"WHEN (q.mc = 0 AND s.idle + 1 >= 2) OR q.q > s.bq + 1e-12 THEN {t} "
                f"ELSE s.br END AS br, "
                f"CASE WHEN s.stopped = 1 THEN s.stale "
                f"WHEN q.q > s.bq + 1e-12 THEN 0 ELSE s.stale + 1 END AS stale, "
                f"CASE WHEN s.stopped = 1 THEN s.idle "
                f"WHEN q.mc = 0 THEN s.idle + 1 ELSE 0 END AS idle, "
                f"CASE WHEN s.stopped = 1 THEN 1 "
                f"WHEN q.mc = 0 AND s.idle + 1 >= 2 THEN 1 "
                f"WHEN (CASE WHEN q.q > s.bq + 1e-12 THEN 0 ELSE s.stale + 1 END) >= 3 THEN 1 "
                f"ELSE 0 END AS stopped, "
                f"CASE WHEN s.stopped = 1 THEN s.tm ELSE s.tm + q.mc END AS tm "
                f"FROM st{l}_{t} s CROSS JOIN q{l}_{t} q)"
            )
        branches = " UNION ALL ".join(
            f"SELECT v, l FROM lab{l}_{t} WHERE (SELECT br FROM st{l}_{R}) = {t}"
            for t in range(R)
        )
        p.append(f"labB{l} AS MATERIALIZED ({branches})")
        p.append(
            f"lv{l} AS MATERIALIZED (SELECT s.bq - (SELECT q FROM q{l}_0) AS gain, s.tm AS tm, "
            f"(SELECT COUNT(*) FROM nodes{l}) AS n FROM st{l}_{R} s)"
        )
    for l in range(1, L):
        prev_use = " AND ".join(
            [f"(SELECT tm FROM lv{k}) > 0" for k in range(l)]
            + [
                f"(SELECT n FROM lv{k + 1}) < (SELECT n FROM lv{k})"
                for k in range(l - 1)
            ]
            + [f"(SELECT gain FROM lv{k}) >= {min_gain}" for k in range(1, l)]
        )
        p.append(
            f"g{l} AS (SELECT CASE WHEN {prev_use} "
            f"AND (SELECT n FROM lv{l}) < (SELECT n FROM lv{l - 1}) "
            f"AND NOT ((SELECT gain FROM lv{l}) < {min_gain}) THEN 1 ELSE 0 END AS u)"
        )
    p.append("rp1 AS MATERIALIZED (SELECT idx, lbl AS orig FROM map1)")
    for l in range(2, L):
        p.append(
            f"rp{l} AS MATERIALIZED (SELECT m.idx, r.orig FROM map{l} m "
            f"JOIN rp{l - 1} r ON r.idx = m.lbl)"
        )
    for l in range(1, L):
        p.append(
            f"t{l} AS MATERIALIZED (SELECT ru.orig AS frm, rl.orig AS tgt "
            f"FROM labB{l} lb JOIN rp{l} ru ON ru.idx = lb.v JOIN rp{l} rl ON rl.idx = lb.l)"
        )
    p.append("f0 AS MATERIALIZED (SELECT v, l FROM labB0)")
    for l in range(1, L):
        p.append(
            f"f{l} AS MATERIALIZED (SELECT f.v, "
            f"CASE WHEN (SELECT u FROM g{l}) = 1 THEN COALESCE(t.tgt, f.l) ELSE f.l END AS l "
            f"FROM f{l - 1} f LEFT JOIN t{l} t ON t.frm = f.l)"
        )
    return p, f"f{L - 1}"


def _louvain_sql() -> str:
    """Exact twin of q_louvain — see _louvain_parts."""
    parts, fin = _louvain_parts()
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT v, CAST(l AS BIGINT) AS label FROM {fin} ORDER BY v"
    )


def _louvain_modularity_sql() -> str:
    """Exact twin of q_louvain_modularity: the louvain replay's labels fed
    through the same modularity formula the `modularity` twin uses
    (intra/m − Σ(vol/2m)², canonical edges, ROUND 8)."""
    parts, fin = _louvain_parts()
    parts += [
        "qce AS MATERIALIZED ({CANON})",
        "qm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM qce)",
        f"qintra AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM qce "
        f"JOIN {fin} l1 ON l1.v = qce.src JOIN {fin} l2 ON l2.v = qce.dst "
        f"WHERE l1.l = l2.l)",
        "qdeg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS deg FROM "
        "(SELECT src AS v FROM qce UNION ALL SELECT dst FROM qce) GROUP BY v)",
        f"qvols AS (SELECT l.l AS label, SUM(d.deg) AS vol FROM qdeg d "
        f"JOIN {fin} l ON l.v = d.v GROUP BY l.l)",
    ]
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT ROUND((SELECT c FROM qintra) / (SELECT m FROM qm) "
        "- SUM(POWER(vol / (2 * (SELECT m FROM qm)), 2)), 8) AS modularity FROM qvols"
    )


def _leiden_refine_sql(max_rounds: int = 16) -> str:
    """Exact twin of q_leiden_refine (graph/louvain.py refine_communities
    on the louvain() labels).  Per-parent singleton-init local moving is
    replayed GLOBALLY: membership only spreads along intra-parent edges,
    and within a parent the engine's local dense ids are order-isomorphic
    to original ids (sorted-unique searchsorted), so original-id labels
    reproduce its (gain desc, community asc) tie-breaks.  The engine
    breaks each parent's loop at its first zero-move round — before the
    parity gate could admit later moves — so a per-parent frozen set
    accumulates and filters later applications.  All quantities are
    integers except the gain divisions (same IEEE replication as
    _louvain_parts)."""
    parts, fin = _louvain_parts()
    parts += [
        f"rl AS MATERIALIZED (SELECT v AS lv, l AS lc FROM {fin})",
        "ri AS MATERIALIZED (SELECT e.src, e.dst, l1.lc AS pc FROM ({SYM}) e "
        "JOIN rl l1 ON l1.lv = e.src JOIN rl l2 ON l2.lv = e.dst "
        "WHERE l1.lc = l2.lc)",
        "rverts AS MATERIALIZED (SELECT DISTINCT pc, src AS v FROM ri)",
        "rdeg AS MATERIALIZED (SELECT pc, src AS v, CAST(COUNT(*) AS DOUBLE) AS degw "
        "FROM ri GROUP BY pc, src)",
        "rm AS MATERIALIZED (SELECT pc, COUNT(*) / 2.0 AS m FROM ri GROUP BY pc)",
        "rlab0 AS MATERIALIZED (SELECT pc, v, v AS l FROM rverts)",
        "rfz0 AS MATERIALIZED (SELECT pc FROM rverts WHERE 1 = 0)",
    ]
    for t in range(max_rounds):
        parts += [
            f"rvol{t} AS MATERIALIZED (SELECT lb.pc, lb.l AS c, SUM(dg.degw) AS vol "
            f"FROM rlab{t} lb JOIN rdeg dg ON dg.pc = lb.pc AND dg.v = lb.v "
            f"GROUP BY lb.pc, lb.l)",
            f"rh{t} AS MATERIALIZED (SELECT e.pc, e.src AS u, lb.l AS c, "
            f"CAST(COUNT(*) AS DOUBLE) AS hw FROM ri e "
            f"JOIN rlab{t} lb ON lb.pc = e.pc AND lb.v = e.dst "
            f"GROUP BY e.pc, e.src, lb.l)",
            f"rg{t} AS MATERIALIZED (SELECT h.pc, h.u, h.c, "
            f"((h.hw - COALESCE(oc.hw, 0.0)) / m.m) - "
            f"((dg.degw * ((vb.vol - CASE WHEN h.c = lb.l THEN dg.degw ELSE 0.0 END) "
            f"- (va.vol - dg.degw))) / ((2.0 * m.m) * m.m)) AS gain "
            f"FROM rh{t} h "
            f"JOIN rlab{t} lb ON lb.pc = h.pc AND lb.v = h.u "
            f"JOIN rdeg dg ON dg.pc = h.pc AND dg.v = h.u "
            f"JOIN rm m ON m.pc = h.pc "
            f"JOIN rvol{t} vb ON vb.pc = h.pc AND vb.c = h.c "
            f"JOIN rvol{t} va ON va.pc = h.pc AND va.c = lb.l "
            f"LEFT JOIN rh{t} oc ON oc.pc = h.pc AND oc.u = h.u AND oc.c = lb.l)",
            f"rb{t} AS MATERIALIZED (SELECT pc, u, c AS bc, gain AS bg FROM ("
            f"SELECT pc, u, c, gain, ROW_NUMBER() OVER "
            f"(PARTITION BY pc, u ORDER BY gain DESC, c ASC) AS rn FROM rg{t}) "
            f"WHERE rn = 1)",
            f"rmv{t} AS MATERIALIZED (SELECT b.pc, b.u AS v, b.bc AS new "
            f"FROM rb{t} b JOIN rlab{t} lb ON lb.pc = b.pc AND lb.v = b.u "
            f"WHERE b.bg > 1e-12 AND (b.u + {t}) % 2 = 0 AND b.bc <> lb.l "
            f"AND b.pc NOT IN (SELECT pc FROM rfz{t}))",
            f"rfz{t + 1} AS MATERIALIZED (SELECT pc FROM rfz{t} UNION "
            f"SELECT p.pc FROM (SELECT DISTINCT pc FROM rverts) p "
            f"WHERE p.pc NOT IN (SELECT pc FROM rfz{t}) "
            f"AND NOT EXISTS (SELECT 1 FROM rmv{t} m WHERE m.pc = p.pc))",
            f"rlab{t + 1} AS MATERIALIZED (SELECT lb.pc, lb.v, "
            f"COALESCE(m.new, lb.l) AS l FROM rlab{t} lb "
            f"LEFT JOIN rmv{t} m ON m.pc = lb.pc AND m.v = lb.v)",
        ]
    R = max_rounds
    parts += [
        f"rrep AS MATERIALIZED (SELECT pc, l, MIN(v) AS rep FROM rlab{R} GROUP BY pc, l)",
        f"rout AS (SELECT lb.v, rr.rep AS label FROM rlab{R} lb "
        f"JOIN rrep rr ON rr.pc = lb.pc AND rr.l = lb.l)",
    ]
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT v, CAST(label AS BIGINT) AS label FROM ("
        "SELECT v, label FROM rout UNION ALL "
        "SELECT n.v, n.v AS label FROM nodes0 n "
        "WHERE n.v NOT IN (SELECT v FROM rverts)) ORDER BY v"
    )


def _egosplit_sql() -> str:
    """Exact twin of q_ego_splitting (community/EgoSplitting.cpp analog,
    graph/egosplit.py).  Every quantity is an int64, so the replay is
    bit-exact: ego-net edges are the triangle rows through each ego,
    per-ego connected components via a recursive min-label closure keyed
    by ego (rep = min member id — the engine's union-find rep), persona
    key = ego·2³² + rep, persona edges from each canonical edge's two
    endpoint personas, persona components again via min-label closure
    (community = min packed key — invariant under the engine's id
    compaction), membership = persona owner, plus singleton personas
    (no persona edge) as their own community."""
    return """
WITH RECURSIVE
ce AS MATERIALIZED ({CANON}),
se AS MATERIALIZED ({SYM}),
ee AS MATERIALIZED (
  SELECT w1.src AS ego, e.src AS a, e.dst AS b
  FROM ce e
  JOIN se w1 ON w1.dst = e.src
  JOIN se w2 ON w2.src = w1.src AND w2.dst = e.dst
),
eb AS MATERIALIZED (SELECT ego, a, b FROM ee UNION ALL SELECT ego, b, a FROM ee),
mem AS MATERIALIZED (SELECT src AS ego, dst AS v FROM se),
r(ego, v, l) AS (
  SELECT ego, v, v FROM mem
  UNION
  SELECT eb.ego, eb.b, r.l FROM r JOIN eb ON eb.ego = r.ego AND eb.a = r.v
),
rep AS MATERIALIZED (SELECT ego, v AS nbr, MIN(l) AS rep FROM r GROUP BY ego, v),
pe AS MATERIALIZED (
  SELECT LEAST(e.src * 4294967296 + rs.rep, e.dst * 4294967296 + rd.rep) AS u,
         GREATEST(e.src * 4294967296 + rs.rep, e.dst * 4294967296 + rd.rep) AS v
  FROM ce e
  JOIN rep rs ON rs.ego = e.src AND rs.nbr = e.dst
  JOIN rep rd ON rd.ego = e.dst AND rd.nbr = e.src
),
pse AS MATERIALIZED (SELECT u, v FROM pe UNION SELECT v AS u, u AS v FROM pe),
pr2(v, l) AS (
  SELECT u, u FROM pse
  UNION
  SELECT pse.v, pr2.l FROM pr2 JOIN pse ON pse.u = pr2.v
),
pcm AS MATERIALIZED (SELECT v AS p, MIN(l) AS community FROM pr2 GROUP BY v),
members AS (SELECT DISTINCT p // 4294967296 AS v, community FROM pcm),
lonely AS (
  SELECT DISTINCT ego * 4294967296 + rep AS packed FROM rep
  WHERE ego * 4294967296 + rep NOT IN (SELECT u FROM pse)
)
SELECT CAST(v AS BIGINT) AS v, CAST(community AS BIGINT) AS community FROM (
  SELECT v, community FROM members
  UNION
  SELECT packed // 4294967296 AS v, packed AS community FROM lonely
) ORDER BY v, community
"""


def _scd_popadd_sql(
    seeds: tuple, radius: int, max_size: int, variant: str, alpha: float = 1.0
) -> str:
    """Shared exact twin for the pop/add SCD expanders (graph/scd.py
    _tce_group / _lte_group).  Both engines loop: pop the highest-priority
    ACTIVE shell node (ties → smallest id), add it iff its acceptance test
    passes (higher-priority failures are permanently discarded until a
    later add re-activates them), and re-activate the new member's
    non-member neighbors.  Between adds every score is a pure function of
    the member set, so one SQL round per ADD replays the whole pop
    sequence: add = best-priority PASSING active node, discarded = active
    nodes with strictly higher priority, and a no-add round drains the
    active set (all pops fail), freezing later rounds.

    variant='tce': priority = Σ_{x∈com∩N(v)} (1+tri(v,x))/(min(dv,dx)·dv),
    test = conductance improvement with GLOBAL degrees and REGION cut
    edges (num_cut has the closed form rdeg(seed) + Σ_{v≠seed} d(v) −
    2·internal region edges).  variant='lte': priority = internal
    similarity Σ sim(v,x∈com), sim = (2+tri)/(√(1+da)·√(1+db)), test =
    E/X − (α·se − si)/(2·si) > 0 (X=0 → pass; si≤0 → fail).  Scores are
    float sums of deterministic rationals; SQL summation order differs
    from the engine's set-iteration order by ~1 ulp — inside the driver's
    1e-9 acceptance unless two shell nodes are exactly tied AND the tie
    decides the pop order (not observed on the sf fixtures)."""
    seed_vals = ", ".join(f"({s})" for s in seeds)
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "degt AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM se GROUP BY src)",
        f"seeds(s) AS (SELECT CAST(col0 AS BIGINT) FROM (VALUES {seed_vals}))",
        "rg0 AS (SELECT s, s AS v FROM seeds)",
    ]
    for k in range(1, radius + 1):
        parts.append(
            f"rg{k} AS MATERIALIZED (SELECT s, v FROM rg{k-1} UNION "
            f"SELECT r.s, e.dst FROM rg{k-1} r JOIN se e ON e.src = r.v)"
        )
    parts += [
        f"re AS MATERIALIZED (SELECT m1.s, e.src AS a, e.dst AS b FROM se e "
        f"JOIN rg{radius} m1 ON m1.v = e.src "
        f"JOIN rg{radius} m2 ON m2.s = m1.s AND m2.v = e.dst WHERE e.src < e.dst)",
        "radj AS MATERIALIZED (SELECT s, a AS u, b AS w FROM re "
        "UNION ALL SELECT s, b, a FROM re)",
        # region common-neighbour counts for every region-adjacent pair
        "cnt AS MATERIALIZED (SELECT e.s, e.u, e.w, COALESCE(t.c, 0) AS tri "
        "FROM radj e LEFT JOIN (SELECT a.s, a.u AS u, b.u AS w, COUNT(*) AS c "
        "FROM radj a JOIN radj b ON b.s = a.s AND b.w = a.w AND b.u <> a.u "
        "GROUP BY a.s, a.u, b.u) t ON t.s = e.s AND t.u = e.u AND t.w = e.w)",
    ]
    if variant == "tce":
        parts += [
            # directional contribution of member w to shell u
            "ctab AS MATERIALIZED (SELECT c.s, c.u, c.w, "
            "(1.0 + c.tri) / (LEAST(du.d, dw.d) * du.d) AS c "
            "FROM cnt c JOIN degt du ON du.v = c.u JOIN degt dw ON dw.v = c.w)",
            "srd AS (SELECT s, COUNT(*) AS rd FROM radj WHERE u = s GROUP BY s)",
            "sgd AS (SELECT s, d.d AS gd FROM seeds JOIN degt d ON d.v = s)",
        ]
    else:
        parts.append(
            "simt AS MATERIALIZED (SELECT c.s, c.u, c.w, "
            "(2.0 + c.tri) / (sqrt(1.0 + du.d) * sqrt(1.0 + dw.d)) AS sim "
            "FROM cnt c JOIN degt du ON du.v = c.u JOIN degt dw ON dw.v = c.w)"
        )
    parts += [
        "com0 AS MATERIALIZED (SELECT s, s AS v FROM seeds)",
        "act0 AS MATERIALIZED (SELECT s, w AS v FROM radj WHERE u = s)",
    ]
    for r in range(1, max_size):
        p = r - 1
        if variant == "tce":
            parts += [
                f"sc{r} AS MATERIALIZED (SELECT a.s, a.v, "
                f"COALESCE(SUM(CASE WHEN c.v IS NOT NULL THEN ct.c END), 0) AS sc, "
                f"COUNT(CASE WHEN c.v IS NOT NULL THEN 1 END) AS ce, "
                f"MIN(du.d) AS dv "
                f"FROM act{p} a JOIN ctab ct ON ct.s = a.s AND ct.u = a.v "
                f"JOIN degt du ON du.v = a.v "
                f"LEFT JOIN com{p} c ON c.s = a.s AND c.v = ct.w GROUP BY a.s, a.v)",
                f"agg{r} AS (SELECT vol.s, vol.vol, "
                f"vol.vol - sgd.gd + srd.rd - 2 * COALESCE(ie.ie, 0) AS ncut "
                f"FROM (SELECT c.s, CAST(SUM(d.d) AS DOUBLE) AS vol FROM com{p} c "
                f"JOIN degt d ON d.v = c.v GROUP BY c.s) vol "
                f"JOIN srd ON srd.s = vol.s JOIN sgd ON sgd.s = vol.s "
                f"LEFT JOIN (SELECT c1.s, COUNT(*) AS ie FROM re e "
                f"JOIN com{p} c1 ON c1.s = e.s AND c1.v = e.a "
                f"JOIN com{p} c2 ON c2.s = e.s AND c2.v = e.b GROUP BY c1.s) ie "
                f"ON ie.s = vol.s)",
                f"add{r} AS MATERIALIZED (SELECT s, v, sc FROM ("
                f"SELECT x.s, x.v, x.sc, ROW_NUMBER() OVER "
                f"(PARTITION BY x.s ORDER BY x.sc DESC, x.v ASC) AS rn "
                f"FROM sc{r} x JOIN agg{r} g ON g.s = x.s "
                f"WHERE g.vol > 0 AND "
                f"(g.ncut + x.dv - 2.0 * x.ce) / (g.vol + x.dv) < g.ncut / g.vol"
                f") WHERE rn = 1)",
            ]
        else:
            parts += [
                f"sc{r} AS MATERIALIZED (SELECT a.s, a.v, "
                f"COALESCE(SUM(CASE WHEN c.v IS NOT NULL THEN st.sim END), 0) AS sc, "
                f"COALESCE(SUM(CASE WHEN c.v IS NULL THEN st.sim END), 0) AS se "
                f"FROM act{p} a JOIN simt st ON st.s = a.s AND st.u = a.v "
                f"LEFT JOIN com{p} c ON c.s = a.s AND c.v = st.w GROUP BY a.s, a.v)",
                f"agg{r} AS (SELECT sd.s, "
                f"COALESCE(SUM(CASE WHEN ci.v IS NOT NULL AND co.v IS NOT NULL "
                f"THEN st.sim END), 0) AS x, "
                f"COALESCE(SUM(CASE WHEN ci.v IS NOT NULL AND co.v IS NULL "
                f"THEN st.sim END), 0) AS e "
                f"FROM seeds sd LEFT JOIN simt st ON st.s = sd.s "
                f"LEFT JOIN com{p} ci ON ci.s = st.s AND ci.v = st.u "
                f"LEFT JOIN com{p} co ON co.s = st.s AND co.v = st.w GROUP BY sd.s)",
                f"add{r} AS MATERIALIZED (SELECT s, v, sc FROM ("
                f"SELECT x.s, x.v, x.sc, ROW_NUMBER() OVER "
                f"(PARTITION BY x.s ORDER BY x.sc DESC, x.v ASC) AS rn "
                f"FROM sc{r} x JOIN agg{r} g ON g.s = x.s "
                f"WHERE x.sc > 0 AND (g.x <= 0 OR "
                f"g.e / g.x - ({repr(alpha)} * x.se - x.sc) / (2.0 * x.sc) > 0)"
                f") WHERE rn = 1)",
            ]
        parts += [
            f"com{r} AS MATERIALIZED (SELECT * FROM com{p} "
            f"UNION ALL SELECT s, v FROM add{r})",
            f"act{r} AS MATERIALIZED (SELECT DISTINCT s, v FROM ("
            f"SELECT a.s, a.v FROM sc{r} a JOIN add{r} d ON d.s = a.s "
            f"WHERE a.v <> d.v AND (a.sc < d.sc OR (a.sc = d.sc AND a.v > d.v)) "
            f"UNION ALL SELECT d.s, ra.w AS v FROM add{r} d "
            f"JOIN radj ra ON ra.s = d.s AND ra.u = d.v "
            f"WHERE NOT EXISTS (SELECT 1 FROM com{r} c WHERE c.s = d.s AND c.v = ra.w)))",
        ]
    return ",\n".join(parts) + (
        f"\nSELECT s AS seed, v FROM com{max_size - 1} ORDER BY seed, v"
    )


def _lfm_expand_parts(
    prefix: str,
    seeds_cte: str,
    radius: int,
    add_rounds: int,
    size_cap: int,
    purge_depth: int = 4,
) -> tuple[list, str]:
    """Prefixed CTE parts for one batch of LFM alpha=1 expansions from
    ``seeds_cte`` (column s) — the _lfm_sql body factored out so the
    cover twin can run several seed batches in one statement; returns
    (parts, final_community_cte).  ``se``/``deg`` are shared unprefixed
    CTEs the caller provides."""
    P = prefix
    parts = [f"{P}rg0 AS (SELECT s, s AS v FROM {seeds_cte})"]
    for k in range(1, radius + 1):
        parts.append(
            f"{P}rg{k} AS MATERIALIZED (SELECT s, v FROM {P}rg{k-1} UNION "
            f"SELECT r.s, e.dst FROM {P}rg{k-1} r JOIN se e ON e.src = r.v)"
        )
    parts += [
        f"{P}re AS MATERIALIZED (SELECT m1.s, e.src AS a, e.dst AS b FROM se e "
        f"JOIN {P}rg{radius} m1 ON m1.v = e.src "
        f"JOIN {P}rg{radius} m2 ON m2.s = m1.s AND m2.v = e.dst WHERE e.src < e.dst)",
        f"{P}radj AS MATERIALIZED (SELECT s, a AS u, b AS w FROM {P}re "
        f"UNION ALL SELECT s, b, a FROM {P}re)",
        f"{P}lc0_0 AS MATERIALIZED (SELECT s, s AS v FROM {seeds_cte})",
    ]

    def fit(iw: str, cut: str) -> str:
        return (
            f"CASE WHEN 2.0*({iw}) + ({cut}) > 0 "
            f"THEN 2.0*({iw})/(2.0*({iw}) + ({cut})) ELSE 0.0 END"
        )

    def stats(name: str, com: str) -> str:
        return (
            f"{name} AS (SELECT sd.s, CAST(COALESCE(x.c, 0) AS DOUBLE) AS iw, "
            f"CAST(COALESCE(y.sd2, 0) - 2*COALESCE(x.c, 0) AS DOUBLE) AS cut, "
            f"COALESCE(y.n, 0) AS n FROM {seeds_cte} sd "
            f"LEFT JOIN (SELECT re.s, COUNT(*) AS c FROM {P}re re "
            f"JOIN {com} c1 ON c1.s = re.s AND c1.v = re.a "
            f"JOIN {com} c2 ON c2.s = re.s AND c2.v = re.b GROUP BY re.s) x ON x.s = sd.s "
            f"LEFT JOIN (SELECT c.s, SUM(COALESCE(deg.d, 0)) AS sd2, COUNT(*) AS n "
            f"FROM {com} c LEFT JOIN deg ON deg.v = c.v GROUP BY c.s) y ON y.s = sd.s)"
        )

    prev = f"{P}lc0_0"
    for r in range(1, add_rounds + 1):
        st = f"{P}lst{r}"
        parts.append(stats(st, prev))
        nq = fit("st.iw + sh.idg", "st.cut - sh.idg + sh.d - sh.idg")
        cq = fit("st.iw", "st.cut")
        cur = f"{P}lc{r}_0"
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL "
            f"SELECT s, v FROM (SELECT sh.s, sh.v, ROW_NUMBER() OVER "
            f"(PARTITION BY sh.s ORDER BY ({nq}) - ({cq}) DESC, sh.v ASC) AS rn "
            f"FROM (SELECT ra.s, ra.u AS v, CAST(COUNT(*) AS DOUBLE) AS idg, "
            f"ANY_VALUE(COALESCE(dg.d, 0)) AS d FROM {P}radj ra "
            f"JOIN {prev} c ON c.s = ra.s AND c.v = ra.w "
            f"LEFT JOIN deg dg ON dg.v = ra.u "
            f"WHERE NOT EXISTS (SELECT 1 FROM {prev} c2 WHERE c2.s = ra.s AND c2.v = ra.u) "
            f"GROUP BY ra.s, ra.u) sh JOIN {st} st ON st.s = sh.s "
            f"WHERE ({nq}) - ({cq}) > 0 "
            f"AND (SELECT COUNT(*) FROM {prev} c3 WHERE c3.s = sh.s) < {size_cap}) "
            f"WHERE rn = 1)"
        )
        prev = cur
        for j in range(1, purge_depth + 1):
            st = f"{P}lst{r}_{j}"
            parts.append(stats(st, prev))
            rq = fit("st.iw - mx.idg", "st.cut + mx.idg - (mx.d - mx.idg)")
            cq = fit("st.iw", "st.cut")
            cur = f"{P}lc{r}_{j}"
            parts.append(
                f"{cur} AS MATERIALIZED (SELECT c.s, c.v FROM {prev} c "
                f"LEFT JOIN (SELECT s, v FROM (SELECT mx.s, mx.v, ROW_NUMBER() OVER "
                f"(PARTITION BY mx.s ORDER BY ({cq}) - ({rq}) ASC, mx.v ASC) AS rn "
                f"FROM (SELECT m.s, m.v, "
                f"CAST(COALESCE((SELECT COUNT(*) FROM {P}radj ra2 "
                f"JOIN {prev} cc ON cc.s = ra2.s AND cc.v = ra2.w "
                f"WHERE ra2.s = m.s AND ra2.u = m.v), 0) AS DOUBLE) AS idg, "
                f"COALESCE((SELECT ANY_VALUE(d) FROM deg WHERE deg.v = m.v), 0) AS d "
                f"FROM {prev} m WHERE m.v <> m.s) mx JOIN {st} st ON st.s = mx.s "
                f"WHERE ({cq}) - ({rq}) < 0) WHERE rn = 1) w "
                f"ON w.s = c.s AND w.v = c.v WHERE w.v IS NULL)"
            )
            prev = cur
    return parts, prev


def _lfm_sql(seeds: tuple, radius: int, max_size: int, purge_depth: int = 4) -> str:
    """Exact twin of graph/scd.py:_lfm_group with alpha = 1.0 (fitness
    f = 2·iw/(2·iw + cut), one float division of exact integers).  Each
    unrolled add round is followed by ``purge_depth`` unrolled purge
    steps (remove the most-improving non-seed member, ties → smallest
    id); like the BFS ``levels`` bounds elsewhere, ``purge_depth`` only
    needs to exceed the deepest purge chain the data produces — extra
    steps are no-ops.  Adds require dq > 0 strictly, purges dq < 0
    strictly, so stop rounds are idempotent and the fixed unroll is
    value-exact.  Add rounds carry 7 extra iterations beyond
    max_size − 1 because each purge removal frees capacity for another
    add (the engine's while-loop re-checks |com| < max_size after every
    cycle); the per-round size guard keeps extras no-ops."""
    seed_vals = ", ".join(f"({s})" for s in seeds)
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM se GROUP BY src)",
        f"seeds(s) AS (SELECT CAST(col0 AS BIGINT) FROM (VALUES {seed_vals}))",
    ]
    body, fin = _lfm_expand_parts(
        "", "seeds", radius, max_size + 7, max_size, purge_depth
    )
    return ",\n".join(parts + body) + (
        f"\nSELECT s AS seed, v FROM {fin} ORDER BY seed, v"
    )


def _lfm_cover_sql(
    outer: int = 4,
    radius: int = 3,
    add_rounds: int = 30,
    purge_depth: int = 4,
    spr: int = 16,
    seed: int = 42,
) -> str:
    """Exact twin of q_lfm_cover (graph/scd.py lfm_cover on the supplier
    ring graph).  Per outer round: the ``spr`` unassigned nodes of
    smallest SIGNED splitmix64(v + round·FNV + seed) rank (the engine
    casts the hash to int64 before sorting) expand in one batch via
    _lfm_expand_parts, covered nodes leave the unassigned set, and the
    next round's ranks re-hash with the round counter.  ``outer`` /
    ``add_rounds`` / ``purge_depth`` bound the fixtures (3 rounds, 26
    adds, purge chains ≤ 3 at sf0.01); the size guard 10⁹ equals the
    engine's unbounded max_size.  Extra rounds see an empty seed set and
    are no-ops."""
    FNV = 0x100000001B3
    parts = [
        "WITH se AS MATERIALIZED ({RING})",
        "deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM se GROUP BY src)",
        "un0 AS MATERIALIZED (SELECT CAST(s_suppkey AS BIGINT) AS v FROM supplier)",
    ]
    fins = []
    for r in range(outer):
        c = r * FNV + seed
        parts += _sm64_stages(f"cvh{r}", f"un{r}", f"v + {c}", "v")
        parts.append(
            f"csd{r} AS MATERIALIZED (SELECT v AS s FROM ("
            f"SELECT v, CASE WHEN h >= 9223372036854775808 "
            f"THEN CAST(h AS HUGEINT) - 18446744073709551616 "
            f"ELSE CAST(h AS HUGEINT) END AS hs FROM cvh{r}c ORDER BY hs, v LIMIT {spr}))"
        )
        body, fin = _lfm_expand_parts(
            f"cv{r}", f"csd{r}", radius, add_rounds, 1000000000, purge_depth
        )
        parts += body
        fins.append(fin)
        parts.append(
            f"un{r + 1} AS MATERIALIZED (SELECT v FROM un{r} "
            f"WHERE v NOT IN (SELECT v FROM {fin}))"
        )
    union = " UNION ALL ".join(f"SELECT s AS c, v FROM {f}" for f in fins)
    # guard (round-4 advice): the engine loops until every node is
    # covered (max_rounds=200); if vertices remain uncovered after the
    # unrolled ``outer`` rounds the oracle must fail, not diverge
    return ",\n".join(parts) + (
        f"\nSELECT c, v FROM ({union}) "
        f"WHERE (SELECT CASE WHEN (SELECT COUNT(*) FROM un{outer}) <> 0 "
        f"THEN error('lfm_cover oracle: outer={outer} unroll exhausted "
        f"(uncovered vertices remain)') ELSE 0 END) = 0 ORDER BY c, v"
    )


def _twophasel_sql(seeds: tuple, radius: int, max_size: int) -> str:
    """Exact twin of graph/scd.py:_l_group (TwoPhaseL).  All inputs are
    integers (internal edges, cut, boundary counts); lin = 2·iw/|C|,
    lex = cut/boundary, L = lin/lex are each single IEEE divisions so
    both sides compute identical doubles; phase 1's running-max over the
    ascending shell (eligible iff nlin > lin AND L > current best)
    equals ORDER BY L DESC, v ASC with those filters; phase 2 removes
    the k-th smallest member of the phase-1 snapshot unless removal
    strictly reduces lin AND raises lex; a purged seed falls back to the
    trivial {seed} row.  No-pick rounds are no-ops, so the fixed unrolls
    are value-exact."""
    seed_vals = ", ".join(f"({s})" for s in seeds)
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM se GROUP BY src)",
        f"seeds(s) AS (SELECT CAST(col0 AS BIGINT) FROM (VALUES {seed_vals}))",
        "rg0 AS (SELECT s, s AS v FROM seeds)",
    ]
    for k in range(1, radius + 1):
        parts.append(
            f"rg{k} AS MATERIALIZED (SELECT s, v FROM rg{k-1} UNION "
            f"SELECT r.s, e.dst FROM rg{k-1} r JOIN se e ON e.src = r.v)"
        )
    parts += [
        f"re AS MATERIALIZED (SELECT m1.s, e.src AS a, e.dst AS b FROM se e "
        f"JOIN rg{radius} m1 ON m1.v = e.src "
        f"JOIN rg{radius} m2 ON m2.s = m1.s AND m2.v = e.dst WHERE e.src < e.dst)",
        "radj AS MATERIALIZED (SELECT s, a AS u, b AS w FROM re "
        "UNION ALL SELECT s, b, a FROM re)",
        "rdeg AS MATERIALIZED (SELECT s, u AS v, CAST(COUNT(*) AS BIGINT) AS rd "
        "FROM radj GROUP BY s, u)",
        "p0 AS MATERIALIZED (SELECT s, s AS v FROM seeds)",
    ]

    def stats_cte(name: str, com: str) -> str:
        """Per-seed (iw, cut, boundary, n) over community table ``com``."""
        return (
            f"{name} AS (SELECT sd.s, "
            f"CAST(COALESCE(x.iw, 0) AS DOUBLE) AS iw, "
            f"CAST(COALESCE(y.sd2, 0) - 2*COALESCE(x.iw, 0) AS DOUBLE) AS cut, "
            f"COALESCE(y.bnd, 0) AS bnd, COALESCE(y.n, 0) AS n "
            f"FROM seeds sd "
            f"LEFT JOIN (SELECT re.s, COUNT(*) AS iw FROM re "
            f"JOIN {com} c1 ON c1.s = re.s AND c1.v = re.a "
            f"JOIN {com} c2 ON c2.s = re.s AND c2.v = re.b GROUP BY re.s) x ON x.s = sd.s "
            f"LEFT JOIN (SELECT c.s, SUM(COALESCE(deg.d, 0)) AS sd2, COUNT(*) AS n, "
            f"SUM(CASE WHEN COALESCE(rdeg.rd, 0) - COALESCE(ic.k, 0) > 0 THEN 1 ELSE 0 END) AS bnd "
            f"FROM {com} c LEFT JOIN deg ON deg.v = c.v "
            f"LEFT JOIN rdeg ON rdeg.s = c.s AND rdeg.v = c.v "
            f"LEFT JOIN (SELECT ra.s, ra.u AS v, COUNT(*) AS k FROM radj ra "
            f"JOIN {com} cc ON cc.s = ra.s AND cc.v = ra.w GROUP BY ra.s, ra.u) ic "
            f"ON ic.s = c.s AND ic.v = c.v GROUP BY c.s) y ON y.s = sd.s)"
        )

    # phase 1: greedy adds
    for r in range(1, max_size):
        p = r - 1
        parts += [
            stats_cte(f"st{p}", f"p{p}"),
            # per-candidate v: idg, and nboundary of com ∪ {v}
            f"cb{r} AS (SELECT sh.s, sh.v, sh.idg, sh.rd, "
            # members of com still boundary after adding v, plus v itself
            f"(SELECT COUNT(*) FROM p{p} c JOIN rdeg rx ON rx.s = c.s AND rx.v = c.v "
            f"LEFT JOIN (SELECT ra.s, ra.u AS v, COUNT(*) AS k FROM radj ra "
            f"JOIN p{p} cc ON cc.s = ra.s AND cc.v = ra.w GROUP BY ra.s, ra.u) ic "
            f"ON ic.s = c.s AND ic.v = c.v "
            f"WHERE c.s = sh.s AND rx.rd - COALESCE(ic.k, 0) - "
            f"(CASE WHEN EXISTS (SELECT 1 FROM radj a2 WHERE a2.s = sh.s "
            f"AND a2.u = c.v AND a2.w = sh.v) THEN 1 ELSE 0 END) > 0) "
            f"+ (CASE WHEN sh.rd - sh.idg > 0 THEN 1 ELSE 0 END) AS nbnd "
            f"FROM (SELECT ra.s, ra.u AS v, CAST(COUNT(*) AS BIGINT) AS idg, "
            f"ANY_VALUE(rd.rd) AS rd FROM radj ra "
            f"JOIN p{p} c ON c.s = ra.s AND c.v = ra.w "
            f"JOIN rdeg rd ON rd.s = ra.s AND rd.v = ra.u "
            f"WHERE NOT EXISTS (SELECT 1 FROM p{p} c2 WHERE c2.s = ra.s AND c2.v = ra.u) "
            f"GROUP BY ra.s, ra.u) sh)",
            f"sc{r} AS (SELECT cb.s, cb.v, "
            f"2.0*(st.iw + cb.idg)/(st.n + 1) AS nlin, "
            f"2.0*st.iw/st.n AS lin, "
            f"CASE WHEN st.bnd > 0 THEN "
            f"(CASE WHEN st.cut/st.bnd > 0 THEN (2.0*st.iw/st.n)/(st.cut/st.bnd) ELSE 0.0 END) "
            f"ELSE 0.0 END AS curl, "
            f"(SELECT COALESCE(SUM(dd.d), 0) FROM p{p} c4 JOIN deg dd ON dd.v = c4.v "
            f"WHERE c4.s = cb.s) + "
            f"(SELECT COALESCE(ANY_VALUE(dd2.d), 0) FROM deg dd2 WHERE dd2.v = cb.v) "
            f"- 2.0*(st.iw + cb.idg) AS ncut, cb.nbnd "
            f"FROM cb{r} cb JOIN st{p} st ON st.s = cb.s)",
            f"p{r} AS MATERIALIZED (SELECT * FROM p{p} UNION ALL "
            f"SELECT s, v FROM (SELECT s, v, ROW_NUMBER() OVER (PARTITION BY s "
            f"ORDER BY (CASE WHEN nbnd > 0 AND ncut/nbnd > 0 "
            f"THEN nlin/(ncut/nbnd) ELSE 0.0 END) DESC, v ASC) AS rn "
            f"FROM sc{r} WHERE nlin > lin AND "
            f"(CASE WHEN nbnd > 0 AND ncut/nbnd > 0 THEN nlin/(ncut/nbnd) ELSE 0.0 END) > curl "
            f"AND (SELECT COUNT(*) FROM p{p} c5 WHERE c5.s = sc{r}.s) < {max_size}) "
            f"WHERE rn = 1)",
        ]
    parts.append(
        f"snap AS MATERIALIZED (SELECT s, v, ROW_NUMBER() OVER "
        f"(PARTITION BY s ORDER BY v) AS k FROM p{max_size - 1})"
    )
    # phase 2: snapshot removals, round k removes the k-th smallest unless
    # removal strictly reduces lin AND raises lex
    parts.append(f"r0 AS MATERIALIZED (SELECT s, v FROM p{max_size - 1})")
    for k in range(1, max_size + 1):
        p = k - 1
        parts += [
            stats_cte(f"ra{p}", f"r{p}"),
            # stats of r{p} − {y} where y = k-th snapshot member (if present)
            f"rb{k} AS (SELECT sn.s, sn.v AS y, "
            f"ra.iw - COALESCE(iy.k, 0) AS iw2, "
            f"ra.cut + 2.0*COALESCE(iy.k, 0) - COALESCE(dy.d, 0) AS cut2, "
            f"ra.n - 1 AS n2, ra.iw, ra.cut, ra.bnd, ra.n, "
            f"(SELECT COUNT(*) FROM r{p} c JOIN rdeg rx ON rx.s = c.s AND rx.v = c.v "
            f"LEFT JOIN (SELECT ra2.s, ra2.u AS v, COUNT(*) AS kk FROM radj ra2 "
            f"JOIN r{p} cc ON cc.s = ra2.s AND cc.v = ra2.w GROUP BY ra2.s, ra2.u) ic "
            f"ON ic.s = c.s AND ic.v = c.v "
            f"WHERE c.s = sn.s AND c.v <> sn.v AND rx.rd - COALESCE(ic.kk, 0) + "
            f"(CASE WHEN EXISTS (SELECT 1 FROM radj a2 WHERE a2.s = sn.s "
            f"AND a2.u = c.v AND a2.w = sn.v) THEN 1 ELSE 0 END) > 0) AS bnd2x "
            f"FROM snap sn JOIN ra{p} ra ON ra.s = sn.s "
            f"JOIN r{p} cur ON cur.s = sn.s AND cur.v = sn.v "
            f"LEFT JOIN (SELECT ra3.s, ra3.u AS v, COUNT(*) AS k FROM radj ra3 "
            f"JOIN r{p} cc2 ON cc2.s = ra3.s AND cc2.v = ra3.w "
            f"GROUP BY ra3.s, ra3.u) iy ON iy.s = sn.s AND iy.v = sn.v "
            f"LEFT JOIN deg dy ON dy.v = sn.v "
            f"WHERE sn.k = {k} AND ra.n > 1)",
            f"r{k} AS MATERIALIZED (SELECT c.s, c.v FROM r{p} c "
            f"LEFT JOIN rb{k} rb ON rb.s = c.s WHERE rb.s IS NULL OR c.v <> rb.y "
            f"OR (2.0*rb.iw/rb.n > 2.0*rb.iw2/rb.n2 AND "
            f"(CASE WHEN rb.bnd > 0 THEN rb.cut/rb.bnd ELSE 'infinity'::DOUBLE END) < "
            f"(CASE WHEN rb.bnd2x > 0 THEN rb.cut2/rb.bnd2x ELSE 'infinity'::DOUBLE END)))",
        ]
    return ",\n".join(parts) + (
        f"\nSELECT seed, v FROM ("
        f"SELECT c.s AS seed, c.v FROM r{max_size} c "
        f"WHERE EXISTS (SELECT 1 FROM r{max_size} c2 WHERE c2.s = c.s AND c2.v = c.s) "
        f"UNION ALL SELECT sd.s, sd.s FROM seeds sd "
        f"WHERE NOT EXISTS (SELECT 1 FROM r{max_size} c3 WHERE c3.s = sd.s AND c3.v = sd.s)"
        f") ORDER BY seed, v"
    )


def _cliquedetect_sql(seeds: tuple, max_size: int) -> str:
    """Exact twin of graph/scd.py:_clique_group (CliqueDetect): the
    community of s is {s} ∪ C with C the maximum clique of the subgraph
    induced on N(s), lexicographically smallest member list on size ties
    — a canonical object, so the oracle enumerates cliques by ordered
    extension (no Bron–Kerbosch replay) and takes
    ORDER BY size DESC, members ASC."""
    seed_vals = ", ".join(f"({s})" for s in seeds)
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        f"seeds(s) AS (SELECT CAST(col0 AS BIGINT) FROM (VALUES {seed_vals}))",
        "nb AS MATERIALIZED (SELECT sd.s, e.dst AS v FROM seeds sd "
        "JOIN se e ON e.src = sd.s)",
        "ne AS MATERIALIZED (SELECT n1.s, e.src AS a, e.dst AS b FROM se e "
        "JOIN nb n1 ON n1.v = e.src JOIN nb n2 ON n2.s = n1.s AND n2.v = e.dst "
        "WHERE e.src < e.dst)",
        "c1 AS (SELECT s, [v] AS ms, v AS mx FROM nb)",
    ]
    for k in range(2, max_size + 1):
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT p.s, list_append(p.ms, e.b) AS ms, e.b AS mx "
            f"FROM c{k-1} p JOIN ne e ON e.s = p.s AND e.a = p.mx "
            f"WHERE NOT EXISTS (SELECT 1 FROM unnest(p.ms) AS u(m) "
            f"WHERE u.m < p.mx AND NOT EXISTS ("
            f"SELECT 1 FROM ne x WHERE x.s = p.s AND x.a = u.m AND x.b = e.b)))"
        )
    all_c = " UNION ALL ".join(
        f"SELECT s, ms FROM c{k}" for k in range(1, max_size + 1)
    )
    parts += [
        f"cand AS ({all_c})",
        "best AS (SELECT s, ms FROM (SELECT s, ms, ROW_NUMBER() OVER "
        "(PARTITION BY s ORDER BY len(ms) DESC, ms ASC) AS rn FROM cand) "
        "WHERE rn = 1)",
    ]
    return ",\n".join(parts) + (
        "\nSELECT seed, v FROM ("
        "SELECT s AS seed, s AS v FROM seeds "
        "UNION ALL SELECT s AS seed, unnest(ms) AS v FROM best) "
        "ORDER BY seed, v"
    )


def _biconnected_sql(levels: int) -> str:
    """Exact twin of graph/biconnected.py:biconnected_components — the
    whole Tarjan–Vishkin pipeline replayed in integer SQL: hash-min CC
    roots (= per-component min id, the closure MIN), multi-root BFS
    levels, parent = min neighbor one level up, subtree sizes from the
    recursive ancestor chain, the engine's exact preorder (roots in id
    order; children of a parent in id order, offset by elder siblings'
    subtree sizes), low/high as subtree min/max over one-non-tree-edge
    reach, aux edges R1 (non-tree, no ancestor relation) + R2 (escaping
    subtree), aux-component min labels, and the carrier rule
    (child endpoint of a tree edge, else the preorder-deeper endpoint).
    Every quantity is an int64, so the replay is bit-exact.
    ``levels`` bounds BFS depth/tree height (empty levels are no-ops)."""
    parts = [
        "WITH RECURSIVE se AS MATERIALIZED ({SYM})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "ccr(v, l) AS (SELECT v, v FROM nodes UNION "
        "SELECT e.dst, ccr.l FROM ccr JOIN se e ON e.src = ccr.v)",
        "roots AS MATERIALIZED (SELECT v FROM (SELECT v, MIN(l) AS label FROM ccr GROUP BY v) WHERE v = label)",
        f"dr(v, d) AS (SELECT v, 0 FROM roots UNION "
        f"SELECT e.dst, dr.d + 1 FROM dr JOIN se e ON e.src = dr.v WHERE dr.d < {levels})",
        "dist AS MATERIALIZED (SELECT v, MIN(d) AS d FROM dr GROUP BY v)",
        "par AS MATERIALIZED (SELECT d1.v, MIN(e.src) AS p, d1.d AS lvl "
        "FROM dist d1 JOIN se e ON e.dst = d1.v "
        "JOIN dist d0 ON d0.v = e.src AND d0.d + 1 = d1.d GROUP BY d1.v, d1.d)",
        "anc(u, a) AS (SELECT v, p FROM par UNION "
        "SELECT anc.u, par.p FROM anc JOIN par ON par.v = anc.a)",
        "nd AS MATERIALIZED (SELECT n.v, 1 + COALESCE(c.k, 0) AS nd FROM nodes n "
        "LEFT JOIN (SELECT a, COUNT(*) AS k FROM anc GROUP BY a) c ON c.a = n.v)",
        "pre0 AS MATERIALIZED (SELECT r.v, COALESCE((SELECT SUM(nd.nd) FROM roots r2 "
        "JOIN nd ON nd.v = r2.v WHERE r2.v < r.v), 0) AS pre FROM roots r)",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"pre{k} AS MATERIALIZED (SELECT c.v, pp.pre + 1 + COALESCE(("
            f"SELECT SUM(nd2.nd) FROM par s JOIN nd nd2 ON nd2.v = s.v "
            f"WHERE s.p = c.p AND s.lvl = {k} AND s.v < c.v), 0) AS pre "
            f"FROM par c JOIN pre{k-1} pp ON pp.v = c.p WHERE c.lvl = {k})"
        )
    all_pre = " UNION ALL ".join(f"SELECT * FROM pre{k}" for k in range(levels + 1))
    parts += [
        f"pre AS MATERIALIZED ({all_pre})",
        "nt AS (SELECT e.src AS s, e.dst AS v FROM se e "
        "LEFT JOIN par p1 ON p1.v = e.dst LEFT JOIN par p2 ON p2.v = e.src "
        "WHERE COALESCE(p1.p, -1) <> e.src AND COALESCE(p2.p, -1) <> e.dst)",
        "reach AS (SELECT nt.v, MIN(pr.pre) AS mn, MAX(pr.pre) AS mx "
        "FROM nt JOIN pre pr ON pr.v = nt.s GROUP BY nt.v)",
        "low0 AS MATERIALIZED (SELECT n.v, "
        "LEAST(pr.pre, COALESCE(r.mn, pr.pre)) AS lo, "
        "GREATEST(pr.pre, COALESCE(r.mx, pr.pre)) AS hi "
        "FROM nodes n JOIN pre pr ON pr.v = n.v LEFT JOIN reach r ON r.v = n.v)",
        "sub AS (SELECT v AS u, v AS a FROM nodes UNION ALL SELECT u, a FROM anc)",
        "lh AS MATERIALIZED (SELECT s.a AS v, MIN(l.lo) AS lo, MAX(l.hi) AS hi "
        "FROM sub s JOIN low0 l ON l.v = s.u GROUP BY s.a)",
        "r2e AS (SELECT p.v AS a, p.p AS b FROM par p "
        "JOIN lh ON lh.v = p.v JOIN pre pu ON pu.v = p.p JOIN nd ndu ON ndu.v = p.p "
        "WHERE p.p NOT IN (SELECT v FROM roots) "
        "AND (lh.lo < pu.pre OR lh.hi >= pu.pre + ndu.nd))",
        "r1e AS (SELECT e.src AS a, e.dst AS b FROM se e "
        "JOIN pre qa ON qa.v = e.src JOIN pre qb ON qb.v = e.dst "
        "JOIN nd na ON na.v = e.src JOIN nd nb ON nb.v = e.dst "
        "LEFT JOIN par p1 ON p1.v = e.dst LEFT JOIN par p2 ON p2.v = e.src "
        "WHERE e.src < e.dst "
        "AND COALESCE(p1.p, -1) <> e.src AND COALESCE(p2.p, -1) <> e.dst "
        "AND NOT (qa.pre <= qb.pre AND qb.pre < qa.pre + na.nd) "
        "AND NOT (qb.pre <= qa.pre AND qa.pre < qb.pre + nb.nd))",
        "aux AS MATERIALIZED (SELECT a, b FROM r1e UNION ALL SELECT b, a FROM r1e "
        "UNION ALL SELECT a, b FROM r2e UNION ALL SELECT b, a FROM r2e)",
        "auxr(v, l) AS (SELECT a, a FROM aux UNION "
        "SELECT aux.b, auxr.l FROM auxr JOIN aux ON aux.a = auxr.v)",
        "comp AS MATERIALIZED (SELECT v, MIN(l) AS c FROM auxr GROUP BY v)",
    ]
    return ",\n".join(parts) + (
        "\nSELECT e.src, e.dst, COALESCE(cm.c, carrier) AS comp FROM ("
        "SELECT e.src, e.dst, "
        "CASE WHEN COALESCE(p1.p, -1) = e.src THEN e.dst "
        "WHEN COALESCE(p2.p, -1) = e.dst THEN e.src "
        "WHEN qa.pre <= qb.pre AND qb.pre < qa.pre + na.nd THEN e.dst "
        "ELSE e.src END AS carrier "
        "FROM se e "
        "JOIN pre qa ON qa.v = e.src JOIN pre qb ON qb.v = e.dst "
        "JOIN nd na ON na.v = e.src "
        "LEFT JOIN par p1 ON p1.v = e.dst LEFT JOIN par p2 ON p2.v = e.src "
        "WHERE e.src < e.dst) e "
        "LEFT JOIN comp cm ON cm.v = e.carrier "
        "ORDER BY e.src, e.dst"
    )


def _maxclique_sql(max_size: int) -> str:
    """Exact twin of q_maximal_cliques' (size, num_cliques) histogram.
    Maximal cliques are a canonical graph object, so the oracle need not
    replay the engine's distributed Bron-Kerbosch: it enumerates ALL
    cliques by ordered extension (members ascending; each new vertex must
    join every member) up to ``max_size`` — levels beyond the true
    maximum are empty — then keeps the non-extendable ones (no vertex
    adjacent to every member)."""
    parts = [
        "WITH ce AS MATERIALIZED ({CANON})",
        "sym AS MATERIALIZED (SELECT src, dst FROM ce UNION ALL SELECT dst, src FROM ce)",
        "c2 AS MATERIALIZED (SELECT [src, dst] AS ms, dst AS mx FROM ce)",
    ]
    for k in range(3, max_size + 1):
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT list_append(p.ms, e.dst) AS ms, e.dst AS mx "
            f"FROM c{k-1} p JOIN ce e ON e.src = p.mx "
            f"WHERE NOT EXISTS (SELECT 1 FROM unnest(p.ms) AS u(m) "
            f"WHERE u.m < p.mx AND NOT EXISTS ("
            f"SELECT 1 FROM ce a WHERE a.src = u.m AND a.dst = e.dst)))"
        )
    all_c = " UNION ALL ".join(f"SELECT ms FROM c{k}" for k in range(2, max_size + 1))
    parts.append(f"cand AS MATERIALIZED ({all_c})")
    parts.append(
        "ext AS (SELECT ms FROM ("
        "SELECT mb.ms, s.dst AS x, COUNT(*) AS hits "
        "FROM (SELECT ms, unnest(ms) AS m FROM cand) mb "
        "JOIN sym s ON s.src = mb.m "
        "WHERE NOT list_contains(mb.ms, s.dst) "
        "GROUP BY mb.ms, s.dst) "
        "WHERE hits = len(ms))"
    )
    return ",\n".join(parts) + (
        "\nSELECT CAST(len(ms) AS BIGINT) AS size, COUNT(*) AS num_cliques "
        "FROM cand WHERE ms NOT IN (SELECT ms FROM ext) "
        "GROUP BY size ORDER BY size"
    )


def _langid_sql() -> str:
    """Exact twin of text/analysis.py:LangId: tokenize lower(text) with the
    same regex, count per-occurrence stopword hits per language, argmax with
    the (count desc, lang desc) tie-break of ``max(scores.items(),
    key=(cnt, lang))``, 'und' when no table hits (or no tokens)."""
    from networkit_ray.text.analysis import _STOPWORDS

    vals = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_STOPWORDS)
        for w in sorted(_STOPWORDS[lang])
    )
    return f"""
        WITH sw(lang, w) AS (VALUES {vals}),
        toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-zà-öø-ÿœ'']+')) AS tk
          FROM documents
        ),
        hits AS (
          SELECT t.doc_id, sw.lang, COUNT(*) AS cnt
          FROM toks t JOIN sw ON sw.w = t.tk
          GROUP BY t.doc_id, sw.lang
        ),
        best AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY cnt DESC, lang DESC) AS rn
          FROM hits
        )
        SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
        FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
        ORDER BY d.doc_id
    """


def _plp_sql(iters: int) -> str:
    """Chained fixed-iteration synchronous PLP twin (engine run with
    update_threshold=0, max_iterations=iters, singleton init): every
    vertex adopts the most frequent neighbor label, ties -> smallest
    label; a vertex with no neighbors keeps its label.  The engine's
    early stop fires only at a zero-update fixpoint, so the full unroll
    is value-identical whether or not it converges early."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT src, dst FROM ({SYM}))",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "l0 AS MATERIALIZED (SELECT v, v AS label FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT nodes.v, COALESCE(u.label, p.label) AS label "
            f"FROM nodes JOIN l{k-1} p ON p.v = nodes.v LEFT JOIN ("
            f"SELECT dst AS v, label FROM ("
            f"SELECT e.dst, q.label, ROW_NUMBER() OVER (PARTITION BY e.dst "
            f"ORDER BY COUNT(*) DESC, q.label ASC) AS rn "
            f"FROM e JOIN l{k-1} q ON q.v = e.src GROUP BY e.dst, q.label) "
            f"WHERE rn = 1) u ON u.v = nodes.v)"
        )
    return ",\n".join(parts) + f"\nSELECT v, label FROM l{iters}"


_M64 = 18446744073709551616  # 2^64


def _mul64_sql(expr: str, const: int) -> str:
    """(expr * const) mod 2^64 with 32-bit-split HUGEINT products (DuckDB
    has no wrapping 64-bit multiply; every intermediate fits HUGEINT)."""
    lo, hi = const & 0xFFFFFFFF, const >> 32
    return (
        f"CAST((CAST({expr} AS HUGEINT)*{lo} + "
        f"((CAST({expr} AS HUGEINT)*{hi}) % 4294967296) * 4294967296) % {_M64} AS UBIGINT)"
    )


def _rmat_sql(scale: int, edge_factor: int, a=0.57, b=0.19, c=0.19, seed=42) -> str:
    """Bit-exact twin of sources/synth.py:rmat_edges — the splitmix64
    counter hash is replayed in SQL (staged CTEs per recursion level;
    UBIGINT→DOUBLE cast rounds to nearest on both sides, and the float
    thresholds are emitted with repr() so both parse to the same double)."""
    n = 1 << scale
    m = n * edge_factor
    t_ab, t_abc = a + b, a + b + c
    base = (seed * 0x100000001B3) % _M64
    parts = [
        f"WITH l0 AS (SELECT CAST(range AS BIGINT) AS idx, "
        f"CAST(0 AS BIGINT) AS src, CAST(0 AS BIGINT) AS dst FROM range({m}))"
    ]
    for k in range(scale):
        parts.append(
            f"z{k}a AS (SELECT idx, src, dst, "
            f"CAST((CAST({base} AS HUGEINT) + CAST(idx AS HUGEINT)*{scale} + {k} "
            f"+ 11400714819323198485) % {_M64} AS UBIGINT) AS z FROM l{k})"
        )
        parts.append(
            f"z{k}b AS (SELECT idx, src, dst, "
            f"{_mul64_sql('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM z{k}a)"
        )
        parts.append(
            f"z{k}c AS (SELECT idx, src, dst, "
            f"{_mul64_sql('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM z{k}b)"
        )
        parts.append(
            f"l{k+1} AS (SELECT idx, "
            f"src*2 + CASE WHEN u >= {t_ab!r} THEN 1 ELSE 0 END AS src, "
            f"dst*2 + CASE WHEN u >= {t_abc!r} OR (u >= {a!r} AND u < {t_ab!r}) THEN 1 ELSE 0 END AS dst "
            f"FROM (SELECT idx, src, dst, "
            f"CAST(xor(z, z >> 31) AS DOUBLE) / 18446744073709551616.0 AS u FROM z{k}c))"
        )
    return ",\n".join(parts) + f"\nSELECT src, dst FROM l{scale}"


def _er_sql(n: int, m: int, seed=42) -> str:
    """Bit-exact twin of sources/synth.py:erdos_renyi_edges (G(n,m)
    counter hash, canonical undirected, duplicate pairs deduplicated)."""
    base = (seed * 0x100000001B3) % _M64
    return f"""
        WITH i0 AS (SELECT CAST(range AS BIGINT) AS idx FROM range({m})),
        a1 AS (SELECT idx,
            CAST((CAST({base} AS HUGEINT) + CAST(idx AS HUGEINT)*2 + 11400714819323198485) % {_M64} AS UBIGINT) AS zu,
            CAST((CAST({base} AS HUGEINT) + CAST(idx AS HUGEINT)*2 + 1 + 11400714819323198485) % {_M64} AS UBIGINT) AS zv
            FROM i0),
        a2 AS (SELECT idx, {_mul64_sql('xor(zu, zu >> 30)', 0xBF58476D1CE4E5B9)} AS zu,
                           {_mul64_sql('xor(zv, zv >> 30)', 0xBF58476D1CE4E5B9)} AS zv FROM a1),
        a3 AS (SELECT idx, {_mul64_sql('xor(zu, zu >> 27)', 0x94D049BB133111EB)} AS zu,
                           {_mul64_sql('xor(zv, zv >> 27)', 0x94D049BB133111EB)} AS zv FROM a2),
        a4 AS (SELECT idx, CAST(xor(zu, zu >> 31) % {n} AS BIGINT) AS u,
                           CAST(xor(zv, zv >> 31) % {n - 1} AS BIGINT) AS vr FROM a3),
        pairs AS (SELECT u, vr + CASE WHEN vr >= u THEN 1 ELSE 0 END AS v FROM a4)
        SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst FROM pairs
    """


def _anf_sql_body(rounds: int) -> str:
    """Shared CTE body for the ANF (Flajolet-Martin bitmask) twins: the
    splitmix64 per-(v, k) init, ``rounds`` unrolled OR-propagation rounds
    (DuckDB ``bit_or``), per-round FM estimates (2^mean-least-zero-bit /
    phi) and the engine's stop round (first round with no sketch change).
    Trailing zeros of x != 0 via bit_count(xor(x, x-1)) - 1."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT src, dst FROM ({SYM}))",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "ks AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS k FROM range(64))",
        f"h1 AS (SELECT v, k, CAST((CAST(v + 42 + k*2654435769 AS HUGEINT) "
        f"+ 11400714819323198485) % {_M64} AS UBIGINT) AS z FROM nodes CROSS JOIN ks)",
        f"h2 AS (SELECT v, k, {_mul64_sql('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM h1)",
        f"h3 AS (SELECT v, k, {_mul64_sql('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM h2)",
        "h4 AS (SELECT v, k, xor(z, z >> 31) AS h FROM h3)",
        "s0 AS MATERIALIZED (SELECT v, k, CASE "
        " WHEN h = 0 THEN CAST(9223372036854775808 AS UBIGINT) "
        " WHEN bit_count(xor(h, h - 1)) - 1 = 63 THEN CAST(9223372036854775808 AS UBIGINT) "
        " ELSE CAST(1 AS UBIGINT) << (bit_count(xor(h, h - 1)) - 1) END AS b FROM h4)",
    ]
    est = (
        "SELECT {t} AS hop, SUM(POWER(2.0, m)) / 0.77351 AS n_pairs FROM ("
        "SELECT v, AVG(CASE WHEN inv = 0 THEN CAST('-infinity' AS DOUBLE) "
        "ELSE CAST(bit_count(xor(inv, inv - 1)) - 1 AS DOUBLE) END) AS m FROM ("
        "SELECT v, k, CAST(18446744073709551615 AS UBIGINT) - b AS inv FROM s{t}) GROUP BY v)"
    )
    for t in range(1, rounds + 1):
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT s.v, s.k, s.b | COALESCE(m.b, 0) AS b "
            f"FROM s{t-1} s LEFT JOIN ("
            f"SELECT e.dst AS v, p.k, bit_or(p.b) AS b "
            f"FROM e JOIN s{t-1} p ON p.v = e.src GROUP BY e.dst, p.k"
            f") m ON m.v = s.v AND m.k = s.k)"
        )
        parts.append(
            f"ch{t} AS (SELECT EXISTS(SELECT 1 FROM s{t} a JOIN s{t-1} b2 "
            f"ON b2.v = a.v AND b2.k = a.k WHERE a.b <> b2.b) AS c)"
        )
    curve_rows = " UNION ALL ".join(
        "(" + est.format(t=t) + ")" for t in range(rounds + 1)
    )
    ch_rows = " UNION ALL ".join(
        f"(SELECT {t} AS hop, c FROM ch{t})" for t in range(1, rounds + 1)
    )
    parts.append(f"curve_all AS ({curve_rows})")
    parts.append(f"chs AS ({ch_rows})")
    parts.append(
        "stop AS (SELECT COALESCE(MIN(hop), 999999) AS t_stop FROM chs WHERE NOT c)"
    )
    return ",\n".join(parts)


def _hop_plot_sql(rounds: int) -> str:
    return _anf_sql_body(rounds) + (
        "\nSELECT hop, ROUND(n_pairs, 2) AS n_pairs FROM curve_all, stop "
        "WHERE hop <= t_stop ORDER BY hop"
    )


def _effective_diameter_sql(rounds: int, ratio: float = 0.9) -> str:
    return _anf_sql_body(rounds) + f"""
        , curve AS (SELECT hop, n_pairs FROM curve_all, stop WHERE hop <= t_stop),
        tgt AS (SELECT {ratio!r} * n_pairs AS target FROM curve
                WHERE hop = (SELECT MAX(hop) FROM curve)),
        hit AS (SELECT MIN(hop) AS t0 FROM curve, tgt WHERE n_pairs >= target)
        SELECT ROUND(CASE WHEN hit.t0 = 0 OR cur.n_pairs = prev.n_pairs
                          THEN CAST(hit.t0 AS DOUBLE)
                          ELSE (hit.t0 - 1) + (tgt.target - prev.n_pairs)
                               / (cur.n_pairs - prev.n_pairs) END, 4)
               AS effective_diameter,
               CAST(stop.t_stop AS BIGINT) AS iterations
        FROM hit CROSS JOIN tgt CROSS JOIN stop
        LEFT JOIN curve cur ON cur.hop = hit.t0
        LEFT JOIN curve prev ON prev.hop = hit.t0 - 1
    """


def _forest_sql(rounds: int) -> str:
    """Exact Boruvka twin of graph/forest.py:spanning_forest — per
    unrolled round: min-label closure (recursive CTE) gives component
    labels of the forest so far, every cross-component canonical edge is
    keyed src*n+dst, each component keeps its minimum key, the distinct
    winners join the forest.  Converged rounds are no-ops, so any unroll
    >= ceil(log2(n)) component-halving rounds is value-identical."""
    n = "(SELECT COUNT(*) FROM customer)"
    parts = [
        "WITH RECURSIVE canon AS MATERIALIZED (SELECT src, dst FROM ({CANON}))",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "f0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS src, CAST(NULL AS BIGINT) AS dst WHERE FALSE)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"se{t} AS (SELECT src, dst FROM f{t-1} UNION ALL SELECT dst, src FROM f{t-1})"
        )
        parts.append(
            f"r{t}(v, l) AS (SELECT v, v FROM nodes UNION "
            f"SELECT se{t}.dst, r{t}.l FROM r{t} JOIN se{t} ON se{t}.src = r{t}.v)"
        )
        parts.append(
            f"lab{t} AS MATERIALIZED (SELECT v, MIN(l) AS l FROM r{t} GROUP BY v)"
        )
        parts.append(
            f"cand{t} AS MATERIALIZED (SELECT a.l AS c, canon.src * {n} + canon.dst AS key "
            f"FROM canon JOIN lab{t} a ON a.v = canon.src JOIN lab{t} b ON b.v = canon.dst "
            f"WHERE a.l <> b.l "
            f"UNION ALL "
            f"SELECT b.l AS c, canon.src * {n} + canon.dst AS key "
            f"FROM canon JOIN lab{t} a ON a.v = canon.src JOIN lab{t} b ON b.v = canon.dst "
            f"WHERE a.l <> b.l)"
        )
        parts.append(
            f"pick{t} AS (SELECT DISTINCT MIN(key) AS key FROM cand{t} GROUP BY c)"
        )
        parts.append(
            f"f{t} AS MATERIALIZED (SELECT src, dst FROM f{t-1} UNION "
            f"SELECT CAST(key // {n} AS BIGINT), CAST(key % {n} AS BIGINT) FROM pick{t})"
        )
    return ",\n".join(parts) + f"\nSELECT src, dst FROM f{rounds}"


def _sm64_stages(tag: str, src_cte: str, arg_expr: str, keep: str) -> list[str]:
    """3 staged CTEs computing splitmix64(arg_expr) as column ``h``
    (carrying the ``keep`` columns through)."""
    return [
        f"{tag}a AS (SELECT {keep}, CAST((CAST({arg_expr} AS HUGEINT) "
        f"+ 11400714819323198485) % {_M64} AS UBIGINT) AS z FROM {src_cte})",
        f"{tag}b AS (SELECT {keep}, {_mul64_sql('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM {tag}a)",
        f"{tag}c AS (SELECT {keep}, xor({_mul64_sql('xor(z, z >> 27)', 0x94D049BB133111EB)}, "
        f"{_mul64_sql('xor(z, z >> 27)', 0x94D049BB133111EB)} >> 31) AS h FROM {tag}b)",
    ]


def _ff_key_sql(f: str, v: str, r: int, t_expr: str, b: int) -> str:
    """((f*P1 + v)*P2 + r)*P3 + t*2 + b + base mod 2^64 — the forest-fire
    keyed counter (graph/sparsification.py:_ff_key) pre-splitmix."""
    P1, P2, P3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    base = (42 * 0x100000001B3) % _M64
    s1 = f"CAST((CAST({_mul64_sql(f, P1)} AS HUGEINT) + {v}) % {_M64} AS UBIGINT)"
    s2 = f"CAST((CAST({_mul64_sql(s1, P2)} AS HUGEINT) + {r}) % {_M64} AS UBIGINT)"
    return (
        f"CAST((CAST({_mul64_sql(s2, P3)} AS HUGEINT) + ({t_expr})*2 + {b} + {base}) "
        f"% {_M64} AS UBIGINT)"
    )


def _ff_sql(rounds: int, pf: float = 0.7, cap: int = 16) -> str:
    """Exact twin of graph/sparsification.py:forest_fire_scores — per
    unrolled round: frontier x adjacency anti-joined against the
    per-fire visited set; per (fire, v) the burn count k is the prefix of
    16 keyed uniform draws <= pf and the burn targets are the k smallest
    keyed-hash neighbors (ROW_NUMBER); scores are per-edge burn counts
    normalized by the max.  The fire dies within 16 rounds on the sf
    battery; empty rounds are no-ops in both systems."""
    nf = "(SELECT GREATEST(1, COUNT(*) // 50) FROM customer)"
    n = "(SELECT COUNT(*) FROM customer)"
    base = (42 * 0x100000001B3) % _M64
    parts = [
        "WITH canon AS MATERIALIZED (SELECT src, dst FROM ({CANON}))",
        "bi AS MATERIALIZED (SELECT src AS u, dst AS nbr FROM canon UNION ALL SELECT dst, src FROM canon)",
        f"fires AS MATERIALIZED (SELECT CAST(ROW_NUMBER() OVER () - 1 AS BIGINT) AS f FROM customer "
        f"QUALIFY ROW_NUMBER() OVER () <= {nf})",
        f"fs0 AS (SELECT f, CAST((CAST(f AS HUGEINT) + {base}) % {_M64} AS UBIGINT) AS xs FROM fires)",
    ]
    parts += _sm64_stages("fh", "fs0", "xs", "f")
    parts += [
        f"fr0 AS MATERIALIZED (SELECT f, CAST(h % CAST({n} AS UBIGINT) AS BIGINT) AS v FROM fhc)",
        "vis0 AS MATERIALIZED (SELECT f, v FROM fr0)",
        f"js AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS j FROM range({cap}))",
    ]
    burn_selects = []
    for r in range(rounds):
        parts.append(
            f"cand{r} AS MATERIALIZED (SELECT fr.f, fr.v, bi.nbr FROM fr{r} fr "
            f"JOIN bi ON bi.u = fr.v WHERE NOT EXISTS ("
            f"SELECT 1 FROM vis{r} w WHERE w.f = fr.f AND w.v = bi.nbr))"
        )
        parts.append(
            f"ck{r} AS (SELECT f, v, nbr, {_ff_key_sql('f', 'v', r, 'nbr', 1)} AS xk FROM cand{r})"
        )
        parts += _sm64_stages(f"ch{r}", f"ck{r}", "xk", "f, v, nbr")
        parts.append(
            f"rk{r} AS (SELECT f, v, nbr, ROW_NUMBER() OVER (PARTITION BY f, v ORDER BY h) - 1 AS rnk FROM ch{r}c)"
        )
        parts.append(
            f"gq{r} AS (SELECT g.f, g.v, js.j, {_ff_key_sql('g.f', 'g.v', r, 'js.j', 0)} AS xk "
            f"FROM (SELECT DISTINCT f, v FROM cand{r}) g CROSS JOIN js)"
        )
        parts += _sm64_stages(f"qh{r}", f"gq{r}", "xk", "f, v, j")
        parts.append(
            f"kk{r} AS (SELECT f, v, COALESCE(MIN(CASE WHEN CAST(h AS DOUBLE) / 18446744073709551616.0 > {pf!r} "
            f"THEN j END), {cap}) AS k FROM qh{r}c GROUP BY f, v)"
        )
        parts.append(
            f"burn{r} AS MATERIALIZED (SELECT rk.f, rk.v, rk.nbr FROM rk{r} rk "
            f"JOIN kk{r} kk ON kk.f = rk.f AND kk.v = rk.v WHERE rk.rnk < kk.k)"
        )
        parts.append(
            f"fr{r+1} AS MATERIALIZED (SELECT DISTINCT f, nbr AS v FROM burn{r})"
        )
        parts.append(
            f"vis{r+1} AS MATERIALIZED (SELECT * FROM vis{r} UNION ALL SELECT * FROM fr{r+1})"
        )
        burn_selects.append(
            f"SELECT LEAST(v, nbr) AS src, GREATEST(v, nbr) AS dst FROM burn{r}"
        )
    burns = " UNION ALL ".join(burn_selects)
    return ",\n".join(parts) + """
        , allb AS (""" + burns + """),
        counts AS (SELECT src, dst, COUNT(*) AS burnt FROM allb GROUP BY src, dst),
        mx AS (SELECT MAX(burnt) AS m FROM counts)
        SELECT src, dst, ROUND(CAST(burnt AS DOUBLE) / mx.m, 8) AS ff_score
        FROM counts, mx
    """


def _kpath_sql(k: int = 5) -> str:
    """Exact twin of graph/walks.py:k_path_centrality — ``k`` unrolled
    self-avoiding walk steps: walker w starts at splitmix64-derived
    position with hash length 1..k; each step joins the frontier to the
    adjacency, excludes visited endpoints (v0..vk columns), and picks the
    neighbor minimizing the keyed hash (ROW_NUMBER over h); dead walkers
    simply produce no row.  score = visits * k / num_walks at 8 dp."""
    GOLD, MIX, P3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    base = (42 * 0x100000001B3) % _M64
    vcols = [f"v{i}" for i in range(k + 1)]
    parts = [
        "WITH bi AS MATERIALIZED (SELECT src AS u, dst AS nbr FROM ({SYM}))",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "ws AS MATERIALIZED (SELECT CAST(ROW_NUMBER() OVER () - 1 AS BIGINT) AS w FROM customer "
        "QUALIFY ROW_NUMBER() OVER () <= (SELECT n // 2 FROM nn))",
        f"g0 AS (SELECT w, CAST((CAST({_mul64_sql('w', GOLD)} AS HUGEINT) + {base}) % {_M64} AS UBIGINT) AS xs, "
        f"CAST((CAST({_mul64_sql('w', GOLD)} AS HUGEINT) + {MIX} + {base}) % {_M64} AS UBIGINT) AS xl FROM ws)",
    ]
    parts += _sm64_stages("hs", "g0", "xs", "w, xl")
    parts += ["g1 AS (SELECT w, xl, h AS hstart FROM hsc)"]
    parts += _sm64_stages("hl", "g1", "xl", "w, hstart")
    parts += [
        "inits AS MATERIALIZED (SELECT w, CAST(hstart % CAST((SELECT n FROM nn) AS UBIGINT) AS BIGINT) AS cur, "
        f"CAST(h % {k} AS BIGINT) + 1 AS l FROM hlc)",
        "wk0 AS MATERIALIZED (SELECT w, cur, l, cur AS v0, "
        + ", ".join(f"CAST(-1 AS BIGINT) AS v{i}" for i in range(1, k + 1))
        + " FROM inits)",
    ]
    for j in range(k):
        cj = ((j + 1) * MIX) % _M64
        notin = " AND ".join(f"e.nbr <> a.v{i}" for i in range(k + 1))
        keep = "w, cur, l, " + ", ".join(vcols) + ", nbr"
        parts.append(
            f"c{j}0 AS (SELECT a.w, a.cur, a.l, "
            + ", ".join(f"a.v{i}" for i in range(k + 1))
            + f", e.nbr, CAST((CAST({_mul64_sql('a.w + 1', GOLD)} AS HUGEINT) + {cj} "
            f"+ CAST({_mul64_sql('e.nbr', P3)} AS HUGEINT) + {base}) % {_M64} AS UBIGINT) AS xh "
            f"FROM wk{j} a JOIN bi e ON e.u = a.cur WHERE a.l > {j} AND {notin})"
        )
        parts += _sm64_stages(f"c{j}h", f"c{j}0", "xh", keep)
        newv = ", ".join(
            (f"nbr AS v{i}") if i == j + 1 else f"v{i}" for i in range(k + 1)
        )
        parts.append(
            f"wk{j+1} AS MATERIALIZED (SELECT w, nbr AS cur, l, {newv} FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY w ORDER BY h) AS rn FROM c{j}hc"
            f") WHERE rn = 1)"
        )
    visits = " UNION ALL ".join(f"SELECT cur AS v FROM wk{j}" for j in range(1, k + 1))
    return ",\n".join(parts) + f"""
        , visits AS ({visits}),
        counts AS (SELECT v, COUNT(*) AS cnt FROM visits GROUP BY v)
        SELECT nodes.v, ROUND(COALESCE(counts.cnt, 0) * {k}.0 / (SELECT n // 2 FROM nn), 8) AS score
        FROM nodes LEFT JOIN counts ON counts.v = nodes.v ORDER BY nodes.v
    """


def _ba_sql(n: int, k: int, seed: int = 42, chase_rounds: int = 16) -> str:
    """Bit-exact twin of sources/synth.py:barabasi_albert_edges
    (Batagelj–Brandes hash-position form): r_i = splitmix64(i + base) mod
    (s_len + 2i); odd endpoint-array positions forward to attachment
    r_{(x-s_len-1)/2}, resolved here by ``chase_rounds`` unrolled lookup
    rounds (max observed chain depth 8 at the query's (1024, 4));
    even positions resolve to node (x-s_len)/2/k + k, seed positions to
    the init-path value."""
    base = (seed * 0x100000001B3) % _M64
    seed_vals = []
    for v in range(k):
        seed_vals.append(v)
        seed_vals.append(v)
    seed_arr = seed_vals[1:-1]  # 0,1,1,2,...,k-1
    s_len = len(seed_arr)
    m = (n - k) * k
    seed_rows = ", ".join(f"({p}, {v})" for p, v in enumerate(seed_arr))
    parts = [
        f"WITH i0 AS (SELECT CAST(range AS BIGINT) AS i FROM range({m}))",
        f"h1 AS (SELECT i, CAST((CAST(i AS HUGEINT) + {base} + 11400714819323198485) % {_M64} AS UBIGINT) AS z FROM i0)",
        f"h2 AS (SELECT i, {_mul64_sql('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM h1)",
        f"h3 AS (SELECT i, {_mul64_sql('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM h2)",
        f"ri AS MATERIALIZED (SELECT i, CAST(xor(z, z >> 31) % CAST({s_len} + 2*i AS UBIGINT) AS BIGINT) AS r FROM h3)",
        "x0 AS (SELECT i, r AS x FROM ri)",
    ]
    for t in range(1, chase_rounds + 1):
        parts.append(
            f"x{t} AS MATERIALIZED (SELECT a.i, "
            f"CASE WHEN a.x >= {s_len} AND (a.x - {s_len}) % 2 = 1 THEN b.r ELSE a.x END AS x "
            f"FROM x{t-1} a LEFT JOIN ri b ON b.i = (a.x - {s_len} - 1) // 2)"
        )
    parts.append(f"seedarr(pos, val) AS (VALUES {seed_rows})")
    parts.append(
        f"att AS (SELECT a.i // {k} + {k} AS src, "
        f"CASE WHEN a.x < {s_len} THEN s.val "
        f"ELSE ((a.x - {s_len}) // 2) // {k} + {k} END AS dst "
        f"FROM x{chase_rounds} a LEFT JOIN seedarr s ON s.pos = a.x)"
    )
    parts.append(
        f"init AS (SELECT CAST(range + 1 AS BIGINT) AS src, CAST(range AS BIGINT) AS dst FROM range({k - 1}))"
    )
    return ",\n".join(parts) + (
        "\nSELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst "
        "FROM (SELECT * FROM init UNION ALL SELECT * FROM att) WHERE src <> dst"
    )


def _lpdo_sql(iters: int, tiers: int = 4) -> str:
    """Exact LPDegreeOrdered twin: per unrolled iteration, ``tiers``
    sub-steps apply the argmax-min-label update only to vertices in the
    tier (tier = capped floor(log2(deg)), computed with pure integer
    CASE ranges — no float log).  The engine stops only at a zero-update
    full-iteration fixpoint, so any unroll >= its iteration count (6-7
    on the sf battery; 25 here) is value-identical."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT src, dst FROM ({SYM}))",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "tiers AS MATERIALIZED (SELECT nodes.v, CASE WHEN COALESCE(d.deg, 0) >= 8 THEN 3 "
        "WHEN COALESCE(d.deg, 0) >= 4 THEN 2 WHEN COALESCE(d.deg, 0) >= 2 THEN 1 ELSE 0 END AS tier "
        "FROM nodes LEFT JOIN (SELECT src AS v, COUNT(*) AS deg FROM e GROUP BY src) d ON d.v = nodes.v)",
        "t0 AS MATERIALIZED (SELECT v, v AS label FROM nodes)",
    ]
    s = 0
    for _ in range(1, iters + 1):
        for tier in range(tiers):
            s += 1
            parts.append(
                f"t{s} AS MATERIALIZED (SELECT n.v, "
                f"CASE WHEN tv.tier = {tier} AND u.label IS NOT NULL THEN u.label "
                f"ELSE p.label END AS label "
                f"FROM nodes n JOIN t{s-1} p ON p.v = n.v JOIN tiers tv ON tv.v = n.v "
                f"LEFT JOIN ("
                f"SELECT dst AS v, label FROM ("
                f"SELECT e.dst, q.label, ROW_NUMBER() OVER (PARTITION BY e.dst "
                f"ORDER BY COUNT(*) DESC, q.label ASC) AS rn "
                f"FROM e JOIN t{s-1} q ON q.v = e.src GROUP BY e.dst, q.label) "
                f"WHERE rn = 1) u ON u.v = n.v)"
            )
    return ",\n".join(parts) + f"\nSELECT v, label FROM t{s}"


def _fm_distinct_sql(r: int = 64, seed: int = 42) -> str:
    """Exact twin of pipelines/events.py:approx_distinct_users — the FM
    distinct-user sketch replayed in SQL: splitmix64(u*GOLD + seed*r + k)
    per (user, row), bit at the capped least-zero-bit position, bit_or
    union per (event_type, row), 2^mean-least-zero-bit / phi.  The
    wrapped decrement (inv + 2^64-1 mod 2^64) avoids UBIGINT underflow
    under DuckDB's eager CASE-branch evaluation."""
    m1, mc = _M64 - 1, _M64
    umax = _M64 - 1
    gold = 0x9E3779B97F4A7C15
    return f"""
        WITH ev AS (SELECT DISTINCT CAST(user_id AS UBIGINT) AS u, event_type FROM events),
        ks AS (SELECT CAST(range AS BIGINT) AS k FROM range({r})),
        x0 AS (SELECT event_type, k,
            CAST((CAST({_mul64_sql('u', gold)} AS HUGEINT) + {seed * r} + k) % {_M64} AS UBIGINT) AS x
            FROM ev CROSS JOIN ks),
        h1 AS (SELECT event_type, k, CAST((CAST(x AS HUGEINT) + 11400714819323198485) % {_M64} AS UBIGINT) AS z FROM x0),
        h2 AS (SELECT event_type, k, {_mul64_sql('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM h1),
        h3 AS (SELECT event_type, k, {_mul64_sql('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM h2),
        h4 AS (SELECT event_type, k, xor(z, z >> 31) AS h FROM h3),
        inv1 AS (SELECT event_type, k, CAST({umax} AS UBIGINT) - h AS inv FROM h4),
        rho AS (SELECT event_type, k, LEAST(CASE WHEN inv = 0 THEN 64
            ELSE bit_count(xor(inv, CAST((CAST(inv AS HUGEINT) + {m1}) % {mc} AS UBIGINT))) - 1 END, 63) AS p
            FROM inv1),
        bits AS (SELECT event_type, k, CASE WHEN p = 63 THEN CAST(9223372036854775808 AS UBIGINT)
            ELSE CAST(1 AS UBIGINT) << p END AS b FROM rho),
        masks AS (SELECT event_type, k, bit_or(b) AS m FROM bits GROUP BY event_type, k),
        inv2 AS (SELECT event_type, k, CAST({umax} AS UBIGINT) - m AS inv FROM masks),
        lz AS (SELECT event_type, k, CASE WHEN inv = 0 THEN 64
            ELSE bit_count(xor(inv, CAST((CAST(inv AS HUGEINT) + {m1}) % {mc} AS UBIGINT))) - 1 END AS p
            FROM inv2)
        SELECT event_type, ROUND(POWER(2.0, AVG(CAST(p AS DOUBLE))) / 0.77351, 6) AS approx_distinct
        FROM lz GROUP BY event_type ORDER BY event_type
    """


def _coloring_sql(rounds: int) -> str:
    """Exact Jones-Plassmann twin: per unrolled round, a vertex whose
    priority p(v) = ((v+1)*GOLD) mod 2^64 is the strict max among its
    still-uncolored neighbors takes the mex of its colored neighborhood
    (mex via a 0..255 number series anti-joined against neighbor colors).
    ``rounds`` = the engine's max_rounds (64); both sides finish the sf
    battery well inside it (sf0.001 needs <48, sf0.01 <48)."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT src, dst FROM ({SYM}))",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        f"pri AS MATERIALIZED (SELECT v, {_mul64_sql('v + 1', 0x9E3779B97F4A7C15)} AS p FROM nodes)",
        "nums AS MATERIALIZED (SELECT CAST(ROW_NUMBER() OVER () - 1 AS BIGINT) AS k FROM customer LIMIT 256)",
        "c0 AS MATERIALIZED (SELECT v, CAST(NULL AS BIGINT) AS color FROM nodes WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"u{r} AS MATERIALIZED (SELECT nodes.v, pri.p FROM nodes JOIN pri ON pri.v = nodes.v "
            f"WHERE NOT EXISTS (SELECT 1 FROM c{r-1} c WHERE c.v = nodes.v))"
        )
        parts.append(
            f"elig{r} AS MATERIALIZED (SELECT u.v FROM u{r} u WHERE NOT EXISTS ("
            f"SELECT 1 FROM e JOIN u{r} uu ON uu.v = e.dst "
            f"WHERE e.src = u.v AND uu.p > u.p))"
        )
        parts.append(
            f"newc{r} AS MATERIALIZED (SELECT el.v, "
            f"(SELECT MIN(nums.k) FROM nums WHERE NOT EXISTS ("
            f"SELECT 1 FROM e JOIN c{r-1} cc ON cc.v = e.dst "
            f"WHERE e.src = el.v AND cc.color = nums.k)) AS color "
            f"FROM elig{r} el)"
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT * FROM c{r-1} UNION ALL SELECT * FROM newc{r})"
        )
    return ",\n".join(parts) + f"\nSELECT v, color FROM c{rounds}"


def _chung_lu_sql(n: int = 1024, seed: int = 42) -> str:
    """Bit-exact twin of sources/synth.py:chung_lu_edges for the
    q_chung_lu_edges weights (w_k = 20/sqrt(k+1)): the weight prefix sum
    is replayed with a recursive CTE (sequential accumulation ==
    np.cumsum bit-for-bit; a window SUM would round differently), the m
    per-edge endpoint draws replay splitmix64(base + 2i[+1])/2^64, and
    searchsorted(side='right') is COUNT(cdf.c <= u)."""
    w = 20.0 / np.sqrt(np.arange(n) + 1.0)
    m = int(round(w.sum() / 2))  # engine formula (pairwise np.sum)
    base = (seed * 0x100000001B3) % _M64
    parts = [
        f"""WITH RECURSIVE acc(v, cs) AS (
  SELECT 0::BIGINT, 20.0/sqrt(1.0)
  UNION ALL
  SELECT v + 1, cs + 20.0/sqrt(CAST(v + 2 AS DOUBLE)) FROM acc WHERE v < {n - 1}
)""",
        f"cdf AS MATERIALIZED (SELECT v, cs / (SELECT cs FROM acc WHERE v = {n - 1}) AS c FROM acc)",
        f"ids AS (SELECT CAST(range AS BIGINT) AS i FROM range({m}))",
        f"du0 AS (SELECT i, CAST(({base}::HUGEINT + CAST(i AS HUGEINT)*2) % {_M64} AS UBIGINT) AS xu FROM ids)",
    ]
    parts += _sm64_stages("hu", "du0", "xu", "i")
    parts += [
        "uu AS (SELECT i, CAST(h AS DOUBLE) / 18446744073709551616.0 AS u FROM huc)",
        f"dv0 AS (SELECT i, CAST(({base}::HUGEINT + CAST(i AS HUGEINT)*2 + 1) % {_M64} AS UBIGINT) AS xv FROM ids)",
    ]
    parts += _sm64_stages("hv", "dv0", "xv", "i")
    parts += [
        "vv AS (SELECT i, CAST(h AS DOUBLE) / 18446744073709551616.0 AS u FROM hvc)",
        "su AS (SELECT uu.i, (SELECT COUNT(*) FROM cdf WHERE cdf.c <= uu.u) AS src FROM uu)",
        "sv AS (SELECT vv.i, (SELECT COUNT(*) FROM cdf WHERE cdf.c <= vv.u) AS dst FROM vv)",
        "pairs AS (SELECT su.src, sv.dst FROM su JOIN sv ON su.i = sv.i WHERE su.src != sv.dst)",
    ]
    return (
        ",\n".join(parts)
        + "\nSELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst "
        "FROM pairs ORDER BY src, dst"
    )


def _n2v_sql(length: int = 4, n_walkers: int = 32, p: float = 0.5,
             q: float = 2.0, seed: int = 42) -> str:
    """Bit-exact twin of graph/walks.py:node2vec_walks on the symmetrized
    derived graph.  Exactness argument: with p=0.5/q=2.0 every candidate
    weight is dyadic (2.0 / 1.0 / 0.5), so running and total weight sums
    are exact in ANY summation order — the window SUM matches numpy's
    cumsum bit-for-bit; the per-(walker, step) uniform replays
    splitmix64(walker*GOLD + (step+1)*MIX + seed)/2^64 and the pick is
    the first rank with gcum > u*total (strict), dead ends stay put."""
    GOLD, MIX = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9
    inv_p, inv_q = 1.0 / p, 1.0 / q
    parts = [
        "WITH sym AS MATERIALIZED ({SYM})",
        "re AS MATERIALIZED (SELECT src AS v, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS r, dst AS nxt FROM sym)",
        "ids AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        f"starts AS (SELECT v FROM ids ORDER BY {_mul64_sql(f'(v + {seed})', GOLD)} LIMIT {n_walkers})",
        "s0 AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY v) - 1 AS walker, CAST(-1 AS BIGINT) AS prev, v FROM starts)",
    ]
    for k in range(length):
        c = (((k + 1) * MIX) + seed) % _M64
        arg = f"CAST((CAST({_mul64_sql('walker', GOLD)} AS HUGEINT) + {c}) % {_M64} AS UBIGINT)"
        parts += [
            f"""cand{k} AS MATERIALIZED (
  SELECT s.walker, s.prev, s.v, re.r, re.nxt,
    CASE WHEN re.nxt IS NULL THEN 0.0
         WHEN re.nxt = s.prev THEN {inv_p!r}
         WHEN EXISTS (SELECT 1 FROM sym WHERE sym.src = s.prev AND sym.dst = re.nxt) THEN 1.0
         ELSE {inv_q!r} END AS wgt
  FROM s{k} s LEFT JOIN re ON re.v = s.v)""",
            f"uw{k} AS (SELECT walker, {arg} AS xs FROM s{k})",
        ]
        parts += _sm64_stages(f"uh{k}", f"uw{k}", "xs", "walker")
        parts += [
            f"u{k} AS (SELECT walker, CAST(h AS DOUBLE) / 18446744073709551616.0 AS u FROM uh{k}c)",
            f"""g{k} AS (
  SELECT walker, r, nxt,
    SUM(wgt) OVER (PARTITION BY walker ORDER BY r ROWS UNBOUNDED PRECEDING) AS gcum,
    SUM(wgt) OVER (PARTITION BY walker) AS total
  FROM cand{k})""",
            f"""pick{k} AS (
  SELECT g.walker, MIN(g.r) AS rpick FROM g{k} g JOIN u{k} u ON u.walker = g.walker
  WHERE g.total > 0 AND g.gcum > u.u * g.total GROUP BY g.walker)""",
            f"""s{k + 1} AS MATERIALIZED (
  SELECT s.walker, s.v AS prev, COALESCE(re.nxt, s.v) AS v
  FROM s{k} s LEFT JOIN pick{k} pk ON pk.walker = s.walker
  LEFT JOIN re ON re.v = s.v AND re.r = pk.rpick)""",
        ]
    sel = "\nUNION ALL\n".join(
        f"SELECT walker, {k} AS step, v FROM s{k}" for k in range(length + 1)
    )
    return ",\n".join(parts) + f"\n{sel}\nORDER BY walker, step"


def _ws_sql(n: int, k: int, p: float, seed=42) -> str:
    """Bit-exact twin of sources/synth.py:watts_strogatz_edges (ring
    lattice + splitmix64 hash rewiring, canonical undirected, dedup)."""
    half = k // 2
    base = (seed * 0x100000001B3) % _M64
    return f"""
        WITH i0 AS (SELECT CAST(range AS BIGINT) AS idx FROM range({n * half})),
        a1 AS (SELECT idx, idx // {half} AS v, (idx % {half}) + 1 AS j,
            CAST((CAST({base} AS HUGEINT) + CAST(idx AS HUGEINT)*2 + 11400714819323198485) % {_M64} AS UBIGINT) AS zu,
            CAST((CAST({base} AS HUGEINT) + CAST(idx AS HUGEINT)*2 + 1 + 11400714819323198485) % {_M64} AS UBIGINT) AS zv
            FROM i0),
        a2 AS (SELECT idx, v, j, {_mul64_sql('xor(zu, zu >> 30)', 0xBF58476D1CE4E5B9)} AS zu,
                                 {_mul64_sql('xor(zv, zv >> 30)', 0xBF58476D1CE4E5B9)} AS zv FROM a1),
        a3 AS (SELECT idx, v, j, {_mul64_sql('xor(zu, zu >> 27)', 0x94D049BB133111EB)} AS zu,
                                 {_mul64_sql('xor(zv, zv >> 27)', 0x94D049BB133111EB)} AS zv FROM a2),
        a4 AS (SELECT idx, v, j,
                      CAST(xor(zu, zu >> 31) AS DOUBLE) / 18446744073709551616.0 AS u1,
                      CAST(xor(zv, zv >> 31) % {n - 1} AS BIGINT) AS rnd0 FROM a3),
        a5 AS (SELECT v, (v + j) % {n} AS tgt,
                      rnd0 + CASE WHEN rnd0 >= v THEN 1 ELSE 0 END AS rnd, u1 FROM a4),
        picked AS (SELECT v, CASE WHEN u1 < {p!r} THEN rnd ELSE tgt END AS dst FROM a5)
        SELECT DISTINCT LEAST(v, dst) AS src, GREATEST(v, dst) AS dst
        FROM picked WHERE dst <> v
    """


def _betweenness_sql(levels: int, piv_sql: str | None = None) -> str:
    """Exact Brandes twin for 16 deterministic pivots: unrolled
    level-synchronous forward BFS (per-level frontier + visited tables,
    sigma = sum of predecessor sigmas) then unrolled backward dependency
    accumulation delta(v) += sigma_v/sigma_w * (1 + delta_w) over edges
    into the next level; bc(v) = n/16 * sum_s delta_s(v), s != v.
    ``levels`` only needs to exceed the max BFS depth from the pivots
    (5 at sf0.01; empty frontiers make extra levels no-ops).
    ``piv_sql`` overrides the pivot CTE body (default: the evenly-spaced
    v % (n//16) rule of q_betweenness_pivots)."""
    if piv_sql is None:
        piv_sql = (
            "SELECT v AS s FROM nodes, nn "
            "WHERE v % GREATEST(nn.n // 16, 1) = 0 ORDER BY v LIMIT 16"
        )
    parts = [
        "WITH e AS MATERIALIZED ({EDGES})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"piv AS MATERIALIZED ({piv_sql})",
        "f0 AS MATERIALIZED (SELECT s, s AS v, 0 AS dist, CAST(1 AS DOUBLE) AS sigma FROM piv)",
        "vis0 AS MATERIALIZED (SELECT * FROM f0)",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"f{k} AS MATERIALIZED (SELECT f.s, e.dst AS v, {k} AS dist, SUM(f.sigma) AS sigma "
            f"FROM f{k-1} f JOIN e ON e.src = f.v "
            f"WHERE NOT EXISTS (SELECT 1 FROM vis{k-1} w WHERE w.s = f.s AND w.v = e.dst) "
            f"GROUP BY f.s, e.dst)"
        )
        parts.append(
            f"vis{k} AS MATERIALIZED (SELECT * FROM vis{k-1} UNION ALL SELECT * FROM f{k})"
        )
    parts.append(
        f"d{levels} AS MATERIALIZED "
        f"(SELECT s, v, dist, sigma, CAST(0 AS DOUBLE) AS delta FROM vis{levels})"
    )
    for L in range(levels, 0, -1):
        parts.append(
            f"d{L-1} AS MATERIALIZED (SELECT d.s, d.v, d.dist, d.sigma, "
            f"d.delta + CASE WHEN d.dist = {L-1} THEN COALESCE(c.inc, 0) ELSE 0 END AS delta "
            f"FROM d{L} d LEFT JOIN ("
            f"SELECT a.s, a.v, SUM(a.sigma / b.sigma * (1 + b.delta)) AS inc "
            f"FROM d{L} a JOIN e ON e.src = a.v JOIN d{L} b ON b.s = a.s AND b.v = e.dst "
            f"WHERE a.dist = {L-1} AND b.dist = {L} GROUP BY a.s, a.v"
            f") c ON c.s = d.s AND c.v = d.v)"
        )
    return ",\n".join(parts) + (
        "\nSELECT nodes.v, ROUND(COALESCE(agg.b, 0) * nn.n / 16.0, 6) AS betweenness "
        "FROM nodes CROSS JOIN nn LEFT JOIN "
        "(SELECT v, SUM(delta) AS b FROM d0 WHERE v <> s GROUP BY v) agg ON agg.v = nodes.v"
    )


def _adaptive_betweenness_sql(
    levels: int,
    *,
    rmax: int = 4,
    batch: int = 16,
    eps: float = 0.35,
    delta_p: float = 0.1,
    seed: int = 7,
) -> str:
    """Exact twin of graph/betweenness.py:adaptive_betweenness with
    sampler='hash': replays the full adaptive schedule in SQL —

    - kmax = ceil(ln(2n/δ)/(2ε²)) (the Hoeffding + union budget);
    - round r (1-based) draws LEAST(batch, kmax − batch·(r−1)) pivots by
      the multiplicative-hash rank (v + seed + 7919·(r−1)) · golden64
      (closeness._pivots — bijective mod 2^64, so ranks are tie-free);
    - one round-tagged unrolled Brandes (forward level-synchronous BFS,
      backward dependency accumulation) over all rounds' pivots at once;
    - cum_r(v) = running per-round sum of dependencies (window SUM in
      round order = the engine's round-by-round float adds), est_r =
      cum_r · (1/(k_r·(n−1))) — the reciprocal-then-multiply form matches
      _bw_maxdiff bit-for-bit;
    - stop = first round r ≥ 2 with max_v |est_r − est_{r−1}| ≤ ε/2, else
      the last round; output = cum_stop · (n/k_stop), rounded to 6.

    ``rmax`` must be ≥ ceil(kmax/batch) for every n the query runs at
    (rounds past the budget draw 0 pivots: cum and k freeze, so a phantom
    stop there reproduces the final-round output exactly).
    """
    half_eps = repr(eps / 2.0)
    denom = repr(2.0 * eps * eps)
    parts = [
        "WITH e AS MATERIALIZED ({EDGES})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"km AS (SELECT CAST(CEIL(LN(2.0 * nn.n / {repr(delta_p)}) / {denom}) AS BIGINT)"
        " AS kmax, nn.n AS n FROM nn)",
        # per-round hash-rank pivot draws (r is 1-based in SQL)
        "piv AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT {r} AS r, v AS s FROM nodes CROSS JOIN km "
            f"QUALIFY ROW_NUMBER() OVER (ORDER BY "
            + _mul64_sql(f"(v + {seed + 7919 * (r - 1)})", 0x9E3779B97F4A7C15)
            + f") <= LEAST({batch}, km.kmax - {batch * (r - 1)})"
            for r in range(1, rmax + 1)
        )
        + ")",
        "f0 AS MATERIALIZED (SELECT r, s, s AS v, 0 AS dist, CAST(1 AS DOUBLE) AS sigma FROM piv)",
        "vis0 AS MATERIALIZED (SELECT * FROM f0)",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"f{k} AS MATERIALIZED (SELECT f.r, f.s, e.dst AS v, {k} AS dist, SUM(f.sigma) AS sigma "
            f"FROM f{k-1} f JOIN e ON e.src = f.v "
            f"WHERE NOT EXISTS (SELECT 1 FROM vis{k-1} w WHERE w.r = f.r AND w.s = f.s AND w.v = e.dst) "
            f"GROUP BY f.r, f.s, e.dst)"
        )
        parts.append(
            f"vis{k} AS MATERIALIZED (SELECT * FROM vis{k-1} UNION ALL SELECT * FROM f{k})"
        )
    parts.append(
        f"d{levels} AS MATERIALIZED "
        f"(SELECT r, s, v, dist, sigma, CAST(0 AS DOUBLE) AS delta FROM vis{levels})"
    )
    for L in range(levels, 0, -1):
        parts.append(
            f"d{L-1} AS MATERIALIZED (SELECT d.r, d.s, d.v, d.dist, d.sigma, "
            f"d.delta + CASE WHEN d.dist = {L-1} THEN COALESCE(c.inc, 0) ELSE 0 END AS delta "
            f"FROM d{L} d LEFT JOIN ("
            f"SELECT a.r, a.s, a.v, SUM(a.sigma / b.sigma * (1 + b.delta)) AS inc "
            f"FROM d{L} a JOIN e ON e.src = a.v "
            f"JOIN d{L} b ON b.r = a.r AND b.s = a.s AND b.v = e.dst "
            f"WHERE a.dist = {L-1} AND b.dist = {L} GROUP BY a.r, a.s, a.v"
            f") c ON c.r = d.r AND c.s = d.s AND c.v = d.v)"
        )
    parts += [
        # per-round dependency sums (δ(s) at s excluded, as _bw_accum does)
        "dl AS MATERIALIZED (SELECT r, v, SUM(delta) AS dsum FROM d0 WHERE v <> s GROUP BY r, v)",
        # dense (round × node) grid -> running cumulative in round order
        f"grid AS (SELECT r, v FROM (SELECT UNNEST(RANGE(1, {rmax + 1})) AS r) CROSS JOIN nodes)",
        "cum AS MATERIALIZED (SELECT grid.r, grid.v, "
        "SUM(COALESCE(dl.dsum, 0)) OVER (PARTITION BY grid.v ORDER BY grid.r) AS cum "
        "FROM grid LEFT JOIN dl ON dl.r = grid.r AND dl.v = grid.v)",
        f"kr AS (SELECT r, LEAST(CAST({batch} AS BIGINT) * r, km.kmax) AS k "
        f"FROM (SELECT UNNEST(RANGE(1, {rmax + 1})) AS r) CROSS JOIN km)",
        # est_r(v) = cum_r(v) * (1 / (k_r * (n-1))) — matches _bw_maxdiff
        "est AS MATERIALIZED (SELECT cum.r, cum.v, "
        "cum.cum * (1.0 / (kr.k * CAST(GREATEST(km.n - 1, 1) AS DOUBLE))) AS est "
        "FROM cum JOIN kr ON kr.r = cum.r CROSS JOIN km)",
        "diffs AS (SELECT a.r, MAX(ABS(a.est - b.est)) AS diff FROM est a "
        "JOIN est b ON b.v = a.v AND b.r = a.r - 1 GROUP BY a.r)",
        f"stop AS (SELECT COALESCE(MIN(r) FILTER (WHERE diff <= {half_eps}), {rmax}) AS r FROM diffs)",
    ]
    return ",\n".join(parts) + (
        "\nSELECT cum.v, ROUND(cum.cum * (CAST(km.n AS DOUBLE) / kr.k), 6) AS betweenness "
        "FROM cum JOIN stop ON cum.r = stop.r JOIN kr ON kr.r = stop.r CROSS JOIN km "
        "ORDER BY cum.v"
    )


_NVU_SQL = (
    "nvu AS MATERIALIZED (SELECT vec_id, pos, CAST(val AS DOUBLE) / nrm AS val FROM ("
    "  SELECT vec_id, generate_subscripts(embedding, 1) AS pos, UNNEST(embedding) AS val,"
    "  (CASE WHEN sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * y))) = 0"
    "   THEN 1.0 ELSE sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * y))) END) AS nrm"
    "  FROM embeddings))"
)


def _planes_cte(num_planes: int, dim: int, seed: int = 42) -> list[str]:
    """CTE chain replaying dedup/embed._planes_hash: splitmix64 counter
    draws (staged _sm64_stages) → Box-Muller gaussians.  Ends at
    ``planes(plane, pos, w)`` with pos 1-based (matching
    generate_subscripts)."""
    base = (seed * 0x100000001B3) % _M64
    inv64 = repr(2.0**-64)
    twopi = repr(2.0 * np.pi)
    return [
        f"pi0 AS (SELECT CAST(range AS BIGINT) AS i FROM range({num_planes * dim}))",
        *_sm64_stages("ph1", "pi0", f"(CAST({base} AS HUGEINT) + 2*i)", "i"),
        *_sm64_stages("ph2", "pi0", f"(CAST({base} AS HUGEINT) + 2*i + 1)", "i"),
        f"planes AS MATERIALIZED (SELECT a.i // {dim} AS plane, (a.i % {dim}) + 1 AS pos, "
        f"sqrt(-2.0 * ln((CAST(a.h AS DOUBLE) + 1.0) * {inv64})) * "
        f"cos({twopi} * (CAST(b.h AS DOUBLE) * {inv64})) AS w "
        f"FROM ph1c a JOIN ph2c b ON b.i = a.i)",
    ]


def _lsh_topk_sql(
    num_planes: int = 8,
    probe_bits: int = 2,
    k: int = 5,
    seed: int = 42,
    query_ids: str = "0, 1, 2, 3, 4",
) -> str:
    """Twin of q_ann_lsh_topk (plane_gen='hash'): hyperplane sign buckets,
    the union of every query bucket's ≤ probe_bits bit-flip neighborhood,
    exact cosine ranking of the probed vectors."""
    return (
        "WITH "
        + ",\n".join([_NVU_SQL, *_planes_cte(num_planes, 64, seed)])
        + f""",
        proj AS MATERIALIZED (SELECT u.vec_id, p.plane, SUM(u.val * p.w) AS s
               FROM nvu u JOIN planes p ON p.pos = u.pos GROUP BY u.vec_id, p.plane),
        keys AS MATERIALIZED (SELECT vec_id,
               SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END) AS key
               FROM proj GROUP BY vec_id),
        masks AS (SELECT CAST(range AS BIGINT) AS m FROM range({1 << num_planes})
                  WHERE bit_count(CAST(range AS BIGINT)) <= {probe_bits}),
        probe AS (SELECT DISTINCT xor(k.key, m.m) AS key FROM keys k
                  CROSS JOIN masks m WHERE k.vec_id IN ({query_ids})),
        cand AS (SELECT k.vec_id FROM keys k JOIN probe p ON p.key = k.key),
        pairs AS (SELECT qu.vec_id AS query_id, u.vec_id, SUM(qu.val * u.val) AS score
                  FROM nvu qu JOIN nvu u ON u.pos = qu.pos
                  JOIN cand c ON c.vec_id = u.vec_id
                  WHERE qu.vec_id IN ({query_ids})
                  GROUP BY qu.vec_id, u.vec_id),
        ranked AS (SELECT query_id, vec_id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, vec_id ASC) AS BIGINT) AS rank
                   FROM pairs)
        SELECT query_id, rank, vec_id, ROUND(score, 6) AS score
        FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""
    )


def _embed_near_dups_sql(
    num_bands: int = 32,
    planes_per_band: int = 4,
    threshold: float = 0.4,
    seed: int = 42,
) -> str:
    """Twin of q_embedding_near_dups (plane_gen='hash'): per-band sign
    keys over the shared plane matrix, within-bucket upper-triangle
    cosine ≥ threshold, distinct across bands (cos is band-independent,
    so DISTINCT == the engine's groupby(a, b).max).  Assumes no bucket
    exceeds the engine's max_bucket cap (true at every sf: bucket ≤ n)."""
    g = num_bands * planes_per_band
    return (
        "WITH "
        + ",\n".join([_NVU_SQL, *_planes_cte(g, 64, seed)])
        + f""",
        proj AS MATERIALIZED (SELECT u.vec_id, p.plane, SUM(u.val * p.w) AS s
               FROM nvu u JOIN planes p ON p.pos = u.pos GROUP BY u.vec_id, p.plane),
        keys AS MATERIALIZED (SELECT vec_id, plane // {planes_per_band} AS band,
               SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << (plane % {planes_per_band}))
                   ELSE 0 END) AS key
               FROM proj GROUP BY vec_id, plane // {planes_per_band}),
        cand AS (SELECT DISTINCT k1.vec_id AS a, k2.vec_id AS b
                 FROM keys k1 JOIN keys k2
                 ON k2.band = k1.band AND k2.key = k1.key AND k2.vec_id > k1.vec_id),
        cosd AS (SELECT c.a, c.b, SUM(ua.val * ub.val) AS cos
                 FROM cand c JOIN nvu ua ON ua.vec_id = c.a
                 JOIN nvu ub ON ub.vec_id = c.b AND ub.pos = ua.pos
                 GROUP BY c.a, c.b)
        SELECT a, b, ROUND(cos, 6) AS cos FROM cosd
        WHERE cos >= {repr(threshold)} ORDER BY a, b"""
    )


def _simhash_sql(max_hamming: int = 3, max_bucket: int = 200) -> str:
    """Exact twin of dedup/simhash.py with hasher='md5': token hash =
    md5_number_upper (little-endian first 8 digest bytes — identical to
    the engine's int.from_bytes(md5[:8], 'little')), 64 ±count lanes,
    sign-pattern fingerprint (empty docs → 0), 4×16-bit Charikar bands
    with the engine's per-bucket smallest-doc_id cap, Hamming ≤
    ``max_hamming`` on candidate pairs (band-independent, so DISTINCT ==
    the engine's groupby(a, b).min)."""
    return f"""
        WITH toks AS MATERIALIZED (
          SELECT doc_id, UNNEST(list_filter(
              string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS tok
          FROM documents),
        th AS MATERIALIZED (SELECT doc_id, md5_number_upper(tok) AS h FROM toks),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM th GROUP BY doc_id),
        lanes AS MATERIALIZED (
          SELECT t.doc_id, b.b,
                 SUM(CASE WHEN (t.h >> b.b) & 1 = 1 THEN 1 ELSE 0 END) AS ones
          FROM th t CROSS JOIN (SELECT UNNEST(RANGE(0, 64)) AS b) b
          GROUP BY t.doc_id, b.b),
        fp0 AS (
          SELECT l.doc_id, CAST(SUM(CASE WHEN 2 * l.ones - c.n > 0
                 THEN (CAST(1 AS UBIGINT) << l.b) ELSE 0 END) AS UBIGINT) AS f
          FROM lanes l JOIN cnt c USING (doc_id) GROUP BY l.doc_id),
        fp AS MATERIALIZED (
          SELECT d.doc_id, COALESCE(f.f, CAST(0 AS UBIGINT)) AS f
          FROM documents d LEFT JOIN fp0 f USING (doc_id)),
        bnd AS (
          SELECT doc_id, b.b AS band,
                 CAST((f >> (16 * b.b)) & 65535 AS BIGINT) AS key, f
          FROM fp CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS b) b),
        kept AS MATERIALIZED (
          SELECT doc_id, band, key, f FROM (
            SELECT doc_id, band, key, f,
                   ROW_NUMBER() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
            FROM bnd) WHERE rn <= {max_bucket}),
        cand AS (
          SELECT DISTINCT k1.doc_id AS a, k2.doc_id AS b,
                 bit_count(xor(k1.f, k2.f)) AS hamc
          FROM kept k1 JOIN kept k2
          ON k2.band = k1.band AND k2.key = k1.key AND k2.doc_id > k1.doc_id)
        SELECT a, b, CAST(hamc AS BIGINT) AS ham FROM cand
        WHERE hamc <= {max_hamming} ORDER BY a, b"""


def _mulcol64_sql(a: str, b: str) -> str:
    """(a * b) mod 2^64 for two UBIGINT column expressions (32-bit-split
    HUGEINT products; every intermediate < 2^96 fits HUGEINT)."""
    ah, al = f"(CAST({a} AS HUGEINT) >> 32)", f"(CAST({a} AS HUGEINT) & 4294967295)"
    bh, bl = f"(CAST({b} AS HUGEINT) >> 32)", f"(CAST({b} AS HUGEINT) & 4294967295)"
    return (
        f"CAST(({al}*{bl} + (({al}*{bh} + {ah}*{bl}) % 4294967296) * 4294967296) "
        f"% {_M64} AS UBIGINT)"
    )


def _minhash_sql(
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket: int = 200,
) -> str:
    """Exact twin of dedup/minhash.py:near_dup_pairs with hasher='md5' and
    perm_gen='hash': md5_number_upper token hashes, the k=3 rolling
    (acc·golden64)^next fold + splitmix64 shingle hashes, splitmix64-drawn
    affine permutations (a|1), per-lane MIN signatures, the
    (bh·golden64)^next band fold + splitmix64 band keys, the per-bucket
    smallest-doc_id cap, and the exact distinct-shingle Jaccard verify.
    Assumes every document has ≥ 3 tokens (true at every sf — the same
    contract the jaccard_near_dups twin documents)."""
    r = num_hashes // bands
    base = (seed * 0x100000001B3) % _M64
    G = 0x9E3779B97F4A7C15
    # k=3 shingle fold over consecutive token hashes
    f1 = _mul64_sql("a.h", G)
    f2 = _mul64_sql(f"xor({f1}, b.h)", G)
    fold = f"xor({f2}, c.h)"
    # 4-lane band fold over signature lanes s0..s3
    bfold = "s0"
    for j in range(1, r):
        bfold = f"xor({_mul64_sql(bfold, G)}, s{j})"
    lane_cols = ", ".join(
        f"MAX(CASE WHEN hh % {r} = {j} THEN m END) AS s{j}" for j in range(r)
    )
    parts = [
        "tarr AS MATERIALIZED (SELECT doc_id, list_filter("
        "string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> '') AS ws FROM documents)",
        "th AS MATERIALIZED (SELECT doc_id, p, md5_number_upper(tok) AS h FROM ("
        "SELECT doc_id, generate_subscripts(ws, 1) AS p, UNNEST(ws) AS tok FROM tarr))",
        f"w3p AS (SELECT a.doc_id, {fold} AS pre FROM th a "
        "JOIN th b ON b.doc_id = a.doc_id AND b.p = a.p + 1 "
        "JOIN th c ON c.doc_id = a.doc_id AND c.p = a.p + 2)",
        *_sm64_stages("w3s", "w3p", "CAST(pre AS HUGEINT)", "doc_id"),
        # permutations: a = splitmix(base+2h) | 1, b = splitmix(base+2h+1)
        f"prm0 AS (SELECT CAST(range AS BIGINT) AS hh FROM range({num_hashes}))",
        *_sm64_stages("pa", "prm0", f"(CAST({base} AS HUGEINT) + 2*hh)", "hh"),
        *_sm64_stages("pb", "prm0", f"(CAST({base} AS HUGEINT) + 2*hh + 1)", "hh"),
        "perms AS MATERIALIZED (SELECT a.hh, (a.h | 1) AS pa, b.h AS pb "
        "FROM pac a JOIN pbc b USING (hh))",
        # signature lane minima over (pa*sh + pb) mod 2^64
        "sig AS MATERIALIZED (SELECT s.doc_id, p.hh, MIN(CAST((CAST("
        + _mulcol64_sql("p.pa", "s.h")
        + f" AS HUGEINT) + p.pb) % {_M64} AS UBIGINT)) AS m "
        "FROM w3sc s CROSS JOIN perms p GROUP BY s.doc_id, p.hh)",
        f"sigb AS (SELECT doc_id, hh // {r} AS band, {lane_cols} "
        f"FROM sig GROUP BY doc_id, hh // {r})",
        f"bhp AS (SELECT doc_id, band, {bfold} AS pre FROM sigb)",
        *_sm64_stages("bh", "bhp", "CAST(pre AS HUGEINT)", "doc_id, band"),
        "kept AS MATERIALIZED (SELECT doc_id, band, h FROM ("
        "SELECT doc_id, band, h, ROW_NUMBER() OVER "
        "(PARTITION BY band, h ORDER BY doc_id) AS rn FROM bhc) "
        f"WHERE rn <= {max_bucket})",
        "cand AS MATERIALIZED (SELECT DISTINCT k1.doc_id AS a, k2.doc_id AS b "
        "FROM kept k1 JOIN kept k2 ON k2.band = k1.band AND k2.h = k1.h "
        "AND k2.doc_id > k1.doc_id)",
        # exact Jaccard over distinct shingle hashes
        "shd AS MATERIALIZED (SELECT DISTINCT doc_id, h AS sh FROM w3sc)",
        "ssz AS (SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY doc_id)",
        "inter AS (SELECT p.a, p.b, COUNT(*) AS i FROM cand p "
        "JOIN shd x ON x.doc_id = p.a JOIN shd y ON y.doc_id = p.b AND y.sh = x.sh "
        "GROUP BY p.a, p.b)",
        "jac AS (SELECT c.a, c.b, CAST(COALESCE(i.i, 0) AS DOUBLE) / "
        "(za.sz + zb.sz - COALESCE(i.i, 0)) AS jaccard "
        "FROM cand c JOIN ssz za ON za.doc_id = c.a JOIN ssz zb ON zb.doc_id = c.b "
        "LEFT JOIN inter i ON i.a = c.a AND i.b = c.b)",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT a, b, ROUND(jaccard, 6) AS jaccard FROM jac "
        f"WHERE jaccard >= {repr(threshold)} ORDER BY a, b"
    )


def _hyperbolic_sql(n: int, radius: float, alpha: float, seed: int = 42) -> str:
    """Twin of sources/synth.py:hyperbolic_edges (cold T=0 threshold
    variant): splitmix64 counter draws replayed exactly; θ and the
    inverse-CDF radial coordinate re-derived with DuckDB ln/sqrt/exp/cos
    (cosh/sinh/acosh composed from exp/ln — values agree with numpy's to
    ~1 ulp, and the only discrete decision, cosh d ≤ cosh R, would need a
    pair within ~1e-11 of the threshold to flip: none exist on the
    conformance sizes).  cosh(αR)−1 and cosh(R) are emitted as constants
    computed by the engine's own numpy expressions."""
    base = (seed * 0x100000001B3) % _M64
    C = repr(float(np.cosh(alpha * radius) - 1.0))
    thresh = repr(float(np.cosh(radius)))
    inv64 = "18446744073709551616.0"
    parts = [
        f"WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range({n}))",
        *_sm64_stages("ta", "ids", f"(CAST(i AS HUGEINT)*2 + {base})", "i"),
        *_sm64_stages("ua", "ids", f"(CAST(i AS HUGEINT)*2 + 1 + {base})", "i"),
        f"crd0 AS (SELECT t.i, CAST(t.h AS DOUBLE)/{inv64} AS tu, "
        f"CAST(u.h AS DOUBLE)/{inv64} AS uu FROM tac t JOIN uac u ON u.i = t.i)",
        f"crd1 AS (SELECT i, tu*2.0*pi() AS th, "
        f"ln(yv + sqrt(yv*yv - 1.0))/{repr(alpha)} AS r "
        f"FROM (SELECT i, tu, 1.0 + uu*{C} AS yv FROM crd0))",
        "crd AS MATERIALIZED (SELECT i, th, (exp(r) + exp(-r))/2.0 AS ch, "
        "(exp(r) - exp(-r))/2.0 AS sh FROM crd1)",
    ]
    return ",\n".join(parts) + (
        f"\nSELECT a.i AS src, b.i AS dst FROM crd a JOIN crd b ON b.i > a.i "
        f"WHERE a.ch*b.ch - a.sh*b.sh*cos(a.th - b.th) <= {thresh} "
        f"ORDER BY src, dst"
    )


def _cg_parts(T: int, tol: float, b0_cte: str | None) -> list[str]:
    """CTE chain replaying graph/algebraic.py:_block_cg on the Laplacian
    of the {SYM} edge table: per unrolled iteration, Ap = deg·p − Σ_N p,
    α = rr/pAp (0-guarded), x/r updates, β = rr'/rr (0-guarded), p update
    — the engine's exact arithmetic, with per-column scalars.  The stop
    rule (iterate while max_k rr_k > tol²) is replayed by selecting the
    first round whose max rr is ≤ tol² (``stop`` CTE; the engine's x at
    that point is the output).  ``b0_cte`` must define b0(k, v, bv) DENSE
    over the vertex universe ``nodes``.  Requires T ≥ the engine's actual
    iteration count (asserted by the stop CTE falling back to T).
    Scalar dot products are SQL SUMs vs the engine's per-partition
    partials — ~1 ulp per iteration, which CG's self-correction keeps far
    inside the driver tolerance at the rounded output."""
    tol2 = repr(tol * tol)
    parts = [
        "degt AS MATERIALIZED (SELECT nodes.v, CAST(COALESCE(d.deg, 0) AS DOUBLE) AS d "
        "FROM nodes LEFT JOIN (SELECT src AS v, COUNT(*) AS deg FROM se GROUP BY src) d "
        "ON d.v = nodes.v)",
        *([b0_cte] if b0_cte else []),
        "st0 AS MATERIALIZED (SELECT k, v, 0.0 AS x, bv AS r, bv AS p FROM b0)",
        "rr0 AS (SELECT k, SUM(r*r) AS rr FROM st0 GROUP BY k)",
    ]
    for i in range(1, T + 1):
        p = i - 1
        parts += [
            f"ap{i} AS (SELECT s.k, s.v, s.x, s.r, s.p, "
            f"dg.d * s.p - COALESCE(nb.sm, 0) AS ap "
            f"FROM st{p} s JOIN degt dg ON dg.v = s.v "
            f"LEFT JOIN (SELECT s2.k, e.dst AS v, SUM(s2.p) AS sm FROM st{p} s2 "
            f"JOIN se e ON e.src = s2.v GROUP BY s2.k, e.dst) nb "
            f"ON nb.k = s.k AND nb.v = s.v)",
            # al/rr MATERIALIZED: a non-materialized al{i} chains into the
            # previous round's rr{p} -> up{p} -> al{p} -> ... giving the
            # optimizer an exponentially expanding inline tree (measured:
            # T=10 took 200x T=6)
            f"al{i} AS MATERIALIZED (SELECT a.k, r.rr, CASE WHEN SUM(a.p*a.ap) > 0 "
            f"THEN r.rr / SUM(a.p*a.ap) ELSE 0.0 END AS alpha "
            f"FROM ap{i} a JOIN rr{p} r ON r.k = a.k GROUP BY a.k, r.rr)",
            f"up{i} AS (SELECT a.k, a.v, a.x + l.alpha*a.p AS x, "
            f"a.r - l.alpha*a.ap AS r, a.p FROM ap{i} a JOIN al{i} l ON l.k = a.k)",
            f"rr{i} AS MATERIALIZED (SELECT k, SUM(r*r) AS rr FROM up{i} GROUP BY k)",
            f"st{i} AS MATERIALIZED (SELECT u.k, u.v, u.x, u.r, "
            f"u.r + (CASE WHEN l.rr > 0 THEN n.rr / l.rr ELSE 0.0 END) * u.p AS p "
            f"FROM up{i} u JOIN al{i} l ON l.k = u.k JOIN rr{i} n ON n.k = u.k)",
        ]
    parts += [
        "rrall AS ("
        + " UNION ALL ".join(
            f"SELECT {i} AS it, MAX(rr) AS m FROM rr{i}" for i in range(0, T + 1)
        )
        + ")",
        f"stop AS (SELECT COALESCE(MIN(it), {T}) AS it FROM rrall WHERE m <= {tol2})",
        "xf AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT {i} AS it, k, v, x FROM st{i}" for i in range(0, T + 1)
        )
        + ")",
        "xs AS MATERIALIZED (SELECT xf.k, xf.v, xf.x FROM xf JOIN stop ON xf.it = stop.it)",
    ]
    return parts


def _commute_time_sql(T: int = 120, tol: float = 1e-12) -> str:
    """Twin of q_commute_time: pairs = the 6 smallest vertices of the
    giant component paired consecutively (both sf fixtures are CONNECTED
    — 1 component — so these are ids 0..5; the same assumption the query
    itself verifies via _cc_labels), b_k = e_s − e_t, unrolled CG replay,
    ctd = sqrt(|x_s − x_t| · vol)."""
    pairs = [(0, 1), (2, 3), (4, 5)]
    b0 = (
        "b0 AS MATERIALIZED (SELECT pr.k, nodes.v, "
        "CASE WHEN nodes.v = pr.s THEN 1.0 WHEN nodes.v = pr.t THEN -1.0 ELSE 0.0 END AS bv "
        "FROM nodes CROSS JOIN (VALUES "
        + ", ".join(f"({k}, {s}, {t})" for k, (s, t) in enumerate(pairs))
        + ") pr(k, s, t))"
    )
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        *_cg_parts(T, tol, b0),
        "vol AS (SELECT SUM(d) AS vol FROM degt)",
    ]
    return ",\n".join(parts) + (
        "\nSELECT pr.s AS src, pr.t AS dst, "
        "ROUND(sqrt(abs(xa.x - xb.x) * vol.vol), 6) AS ctd "
        "FROM (VALUES "
        + ", ".join(f"({k}, {s}, {t})" for k, (s, t) in enumerate(pairs))
        + ") pr(k, s, t) "
        "JOIN xs xa ON xa.k = pr.k AND xa.v = pr.s "
        "JOIN xs xb ON xb.k = pr.k AND xb.v = pr.t CROSS JOIN vol "
        "ORDER BY src, dst"
    )


def _sec_rhs_cte(k: int, seed: int) -> list[str]:
    """b(k, v) = Σ_e ±1/√k · B(e, v) with the sign-hash bit draw
    (algebraic.py:_sign_hash): bit i of splitmix64(u·golden64 + v + seed)
    over canonical (u < v) edges; +q at u, −q at v."""
    inv = repr(1.0 / np.sqrt(k))
    return [
        "ce AS MATERIALIZED (SELECT src AS a, dst AS b FROM se WHERE src < dst)",
        "sh0 AS (SELECT a, b, CAST((CAST("
        + _mul64_sql("a", 0x9E3779B97F4A7C15)
        + f" AS HUGEINT) + b + {seed}) % {_M64} AS UBIGINT) AS z0 FROM ce)",
        *_sm64_stages("sh", "sh0", "CAST(z0 AS HUGEINT)", "a, b"),
        f"sgn AS MATERIALIZED (SELECT s.a, s.b, kk.k, "
        f"CASE WHEN (s.h >> kk.k) & 1 = 1 THEN {inv} ELSE -{inv} END AS q "
        f"FROM shc s CROSS JOIN (SELECT UNNEST(RANGE(0, {k})) AS k) kk)",
        "bs AS (SELECT k, v, SUM(q) AS bv FROM ("
        "SELECT k, a AS v, q FROM sgn UNION ALL SELECT k, b AS v, -q FROM sgn"
        ") GROUP BY k, v)",
        f"b0 AS MATERIALIZED (SELECT kk0.k, nodes.v, COALESCE(bs.bv, 0.0) AS bv "
        f"FROM nodes CROSS JOIN (SELECT UNNEST(RANGE(0, {k})) AS k) kk0 "
        f"LEFT JOIN bs ON bs.k = kk0.k AND bs.v = nodes.v)",
    ]


def _sec_sql(k: int = 48, seed: int = 42, T: int = 120, tol: float = 1e-10) -> str:
    """Twin of q_spanning_edge_centrality: JL sketch RHS (sign-hash bits),
    one unrolled multi-RHS CG replay, sec(e) = Σ_i (x_i[u] − x_i[v])²."""
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        *_sec_rhs_cte(k, seed),
        *_cg_parts(T, tol, None),
    ]
    return ",\n".join(parts) + (
        "\nSELECT ce.a AS src, ce.b AS dst, "
        "ROUND(SUM((xa.x - xb.x) * (xa.x - xb.x)), 6) AS sec "
        "FROM ce JOIN xs xa ON xa.v = ce.a JOIN xs xb ON xb.k = xa.k AND xb.v = ce.b "
        "GROUP BY ce.a, ce.b ORDER BY src, dst"
    )


def _ec_sql(k: int = 48, seed: int = 42, T: int = 120, tol: float = 1e-10) -> str:
    """Twin of q_electrical_closeness: same sketch solve as _sec_sql;
    diag(L⁺)_v ≈ ‖x_v‖², closeness = (n−1)/(n·diag + tr)."""
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        *_sec_rhs_cte(k, seed),
        *_cg_parts(T, tol, None),
    ]
    return ",\n".join(parts) + (
        "\n, diag AS (SELECT v, SUM(x*x) AS dg FROM xs GROUP BY v),"
        " tr AS (SELECT SUM(dg) AS tr FROM diag)"
        "\nSELECT d.v, ROUND((nn.n - 1) / (nn.n * d.dg + tr.tr), 6) AS electrical_closeness "
        "FROM diag d CROSS JOIN nn CROSS JOIN tr ORDER BY d.v"
    )


def _agglomerative_sql(levels: int = 4, rounds: int = 4) -> str:
    """Exact twin of graph/agglomerative.py:agglomerative_communities —
    ``levels`` coarsening levels, each running the fixed-``rounds``
    handshake matching on modularity merge gains
    dq = (2·tw·w − wd(u)·wd(v)) / (2·tw).  Every quantity is an
    integer-valued double below 2^53 (w are merge-summed unit weights),
    so scores, best-partner picks (score DESC, partner ASC), mutual
    agreement, and the level-break conditions (diff==0, n−diff<2,
    diff/n ≤ 5e-3, tw≤0, n<2 — replayed as a cumulative ``ok`` flag that
    empties the applied-match set) are all bit-exact.  Contraction maps
    matched pairs to their min id, composes the vertex mapping, and
    re-groups edges (self-loops kept, as the engine's wdeg does)."""
    parts = [
        "WITH ce AS MATERIALIZED ({CANON})",
        "e0 AS MATERIALIZED (SELECT src AS u, dst AS v, CAST(1 AS DOUBLE) AS w FROM ce)",
        "map0 AS MATERIALIZED (SELECT DISTINCT x AS v, x AS rep FROM "
        "(SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0))",
        "go0 AS (SELECT TRUE AS g)",
    ]
    for L in range(1, levels + 1):
        p = L - 1
        parts += [
            f"tw{L} AS (SELECT COALESCE(SUM(w), 0) AS tw FROM e{p})",
            f"ns{L} AS MATERIALIZED (SELECT * FROM e{p} WHERE u <> v)",
            f"nc{L} AS (SELECT COUNT(DISTINCT x) AS nc FROM "
            f"(SELECT u AS x FROM ns{L} UNION ALL SELECT v FROM ns{L}))",
            f"wd{L} AS MATERIALIZED (SELECT x, SUM(w) AS wd FROM "
            f"(SELECT u AS x, w FROM e{p} UNION ALL SELECT v, w FROM e{p}) GROUP BY x)",
            f"lv{L}_0 AS MATERIALIZED (SELECT ns.u, ns.v, "
            f"(2.0*tw.tw*ns.w - du.wd*dv.wd)/(2.0*tw.tw) AS score "
            f"FROM ns{L} ns JOIN wd{L} du ON du.x = ns.u "
            f"JOIN wd{L} dv ON dv.x = ns.v CROSS JOIN tw{L} tw)",
        ]
        for r in range(1, rounds + 1):
            q = r - 1
            parts += [
                f"bp{L}_{r} AS MATERIALIZED (SELECT x, partner AS bp FROM ("
                f"SELECT x, partner, ROW_NUMBER() OVER (PARTITION BY x "
                f"ORDER BY score DESC, partner ASC) AS rn FROM ("
                f"SELECT u AS x, v AS partner, score FROM lv{L}_{q} "
                f"UNION ALL SELECT v, u, score FROM lv{L}_{q})) WHERE rn = 1)",
                f"ag{L}_{r} AS MATERIALIZED (SELECT b1.x AS u, b1.bp AS v "
                f"FROM bp{L}_{r} b1 JOIN bp{L}_{r} b2 "
                f"ON b2.x = b1.bp AND b2.bp = b1.x WHERE b1.x < b1.bp)",
                f"lv{L}_{r} AS MATERIALIZED (SELECT e.* FROM lv{L}_{q} e "
                f"WHERE NOT EXISTS (SELECT 1 FROM ag{L}_{r} a "
                f"WHERE a.u IN (e.u, e.v) OR a.v IN (e.u, e.v)))",
            ]
        parts += [
            f"mt{L} AS MATERIALIZED ("
            + " UNION ALL ".join(f"SELECT * FROM ag{L}_{r}" for r in range(1, rounds + 1))
            + ")",
            f"ok{L} AS (SELECT (go{p}.g AND tw.tw > 0 AND nc.nc >= 2 "
            f"AND df.d > 0 AND (nc.nc - df.d) >= 2 "
            f"AND CAST(df.d AS DOUBLE) / nc.nc > 0.005) AS g "
            f"FROM go{p}, tw{L} tw, nc{L} nc, "
            f"(SELECT COUNT(*) AS d FROM mt{L}) df)",
            f"go{L} AS (SELECT g FROM ok{L})",
            f"rep{L} AS MATERIALIZED (SELECT old, new FROM ("
            f"SELECT u AS old, LEAST(u, v) AS new FROM mt{L} "
            f"UNION ALL SELECT v, LEAST(u, v) FROM mt{L}) "
            f"CROSS JOIN ok{L} WHERE ok{L}.g)",
            f"map{L} AS MATERIALIZED (SELECT m.v, COALESCE(r.new, m.rep) AS rep "
            f"FROM map{p} m LEFT JOIN rep{L} r ON r.old = m.rep)",
            f"e{L} AS MATERIALIZED (SELECT LEAST(cu, cv) AS u, "
            f"GREATEST(cu, cv) AS v, SUM(w) AS w FROM ("
            f"SELECT COALESCE(ru.new, e.u) AS cu, COALESCE(rv.new, e.v) AS cv, e.w "
            f"FROM e{p} e LEFT JOIN rep{L} ru ON ru.old = e.u "
            f"LEFT JOIN rep{L} rv ON rv.old = e.v) GROUP BY LEAST(cu, cv), GREATEST(cu, cv))",
        ]
    return ",\n".join(parts) + (
        f"\nSELECT v, rep AS label FROM map{levels} ORDER BY v"
    )


def _pgm_sql(cap: int = 96, rounds: int = 100) -> str:
    """Exact twin of graph/matching.py:path_growing_matching on the
    vertex-id-capped induced subgraph: one SQL round per vertex REMOVAL.
    Round state: alive set, path head (NULL between paths), take parity
    (reset to 0 at every path start).  A round with a live head grows the
    path along the heaviest live edge (ties → smaller neighbor id) and
    alternates M1/M2; a head-less round starts at the highest-live-degree
    vertex (ties → smaller id) or discards it edge-less; rounds after the
    alive set drains are no-ops.  ``rounds`` must be ≥ the number of
    vertices with ≥1 subgraph edge (96-cap ⇒ ≤96).  Weights
    ((src+dst)%7+1) are integer-valued floats, so the final M1-vs-M2
    weight-sum comparison is exact in any summation order."""
    parts = [
        "WITH ce0 AS MATERIALIZED ({CANON})",
        f"ce AS MATERIALIZED (SELECT src AS a, dst AS b, "
        f"CAST((src + dst) % 7 + 1 AS DOUBLE) AS w FROM ce0 "
        f"WHERE src < {cap} AND dst < {cap})",
        "adj AS MATERIALIZED (SELECT a AS u, b AS x, w FROM ce "
        "UNION ALL SELECT b, a, w FROM ce)",
        "alive0 AS MATERIALIZED (SELECT DISTINCT u AS v FROM adj)",
        "hd0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS h, 0 AS tk)",
        "m0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS a, "
        "CAST(NULL AS BIGINT) AS b, CAST(NULL AS DOUBLE) AS w, "
        "CAST(NULL AS INT) AS tk WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts += [
            # current vertex: live head, else best (live-degree, -id) start
            f"cur{r} AS MATERIALIZED (SELECT COALESCE(hd.h, pick.v) AS c, "
            f"CASE WHEN hd.h IS NULL THEN 0 ELSE hd.tk END AS tk "
            f"FROM hd{p} hd LEFT JOIN (SELECT v FROM ("
            f"SELECT al.v, COALESCE(ld.d, 0) AS d FROM alive{p} al LEFT JOIN ("
            f"SELECT adj.u, COUNT(*) AS d FROM adj "
            f"JOIN alive{p} a2 ON a2.v = adj.x GROUP BY adj.u) ld ON ld.u = al.v) "
            f"ORDER BY d DESC, v ASC LIMIT 1) pick ON TRUE)",
            # heaviest live edge out of c (ties -> smaller neighbor id)
            f"nb{r} AS MATERIALIZED (SELECT adj.x, adj.w FROM adj "
            f"JOIN cur{r} c ON adj.u = c.c "
            f"JOIN alive{p} al ON al.v = adj.x "
            f"ORDER BY adj.w DESC, adj.x ASC LIMIT 1)",
            f"m{r} AS MATERIALIZED (SELECT * FROM m{p} UNION ALL "
            f"SELECT LEAST(c.c, n.x), GREATEST(c.c, n.x), n.w, c.tk "
            f"FROM cur{r} c JOIN nb{r} n ON c.c IS NOT NULL)",
            f"alive{r} AS MATERIALIZED (SELECT al.v FROM alive{p} al "
            f"JOIN cur{r} c ON TRUE WHERE c.c IS NULL OR al.v <> c.c)",
            f"hd{r} AS MATERIALIZED (SELECT "
            f"(SELECT n.x FROM nb{r} n) AS h, "
            f"CASE WHEN EXISTS (SELECT 1 FROM nb{r}) THEN 1 - c.tk ELSE c.tk END AS tk "
            f"FROM cur{r} c)",
        ]
    return ",\n".join(parts) + (
        f"""
        , ws AS (SELECT COALESCE(SUM(CASE WHEN tk = 0 THEN w END), 0) AS w0,
                 COALESCE(SUM(CASE WHEN tk = 1 THEN w END), 0) AS w1 FROM m{rounds})
        SELECT a AS src, b AS dst, w FROM m{rounds} CROSS JOIN ws
        WHERE tk = (CASE WHEN ws.w0 >= ws.w1 THEN 0 ELSE 1 END)
        ORDER BY src, dst"""
    )


def _pivot_mds_sql(
    num_pivots: int = 8, dim: int = 2, sweeps: int = 8, bfs_levels: int = 24
) -> str:
    """Twin of graph/layout.py:pivot_mds.  The only non-relational step is
    an 8×8 symmetric eigensolve; both np.linalg.eigh and cyclic Jacobi
    converge to the true eigenpairs to ~1e-15 (relative eigengaps on the
    sf fixtures are >=5e-3, so eigenvector error stays <=1e-12 — far under
    the ROUND-6 output), so the oracle runs its OWN eigensolver: ``sweeps``
    unrolled cyclic-Jacobi sweeps over a single-row LIST-typed state (the
    8×8 matrix and the accumulated rotation V as 64-lists), one CTE per
    rotation with compile-time (p, q) indices.  Double-centering, the
    Gram matrix, the top-``dim`` eigenvector pick, the argmax-|component|
    sign rule, and pos = C·V are all plain SQL."""
    K = num_pivots
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"piv AS MATERIALIZED (SELECT p, ROW_NUMBER() OVER (ORDER BY p) - 1 AS kk "
        f"FROM (SELECT DISTINCT (k.k * nn.n) // {K} AS p "
        f"FROM (SELECT UNNEST(RANGE(0, {K})) AS k) k CROSS JOIN nn))",
        "f0 AS MATERIALIZED (SELECT p AS s, p AS v, 0 AS dist FROM piv)",
        "vis0 AS MATERIALIZED (SELECT * FROM f0)",
    ]
    for k in range(1, bfs_levels + 1):
        parts += [
            f"f{k} AS MATERIALIZED (SELECT DISTINCT f.s, e.dst AS v, {k} AS dist "
            f"FROM f{k-1} f JOIN se e ON e.src = f.v "
            f"WHERE NOT EXISTS (SELECT 1 FROM vis{k-1} w WHERE w.s = f.s AND w.v = e.dst))",
            f"vis{k} AS MATERIALIZED (SELECT * FROM vis{k-1} UNION ALL SELECT * FROM f{k})",
        ]
    parts += [
        # D with -1 -> 0 (unreachable), dense (node x pivot)
        f"dm AS MATERIALIZED (SELECT nodes.v, piv.kk, "
        f"CAST(GREATEST(COALESCE(w.dist, 0), 0) AS DOUBLE) AS d "
        f"FROM nodes CROSS JOIN piv "
        f"LEFT JOIN vis{bfs_levels} w ON w.s = piv.p AND w.v = nodes.v)",
        "rmt AS (SELECT v, SUM(d) / " + str(K) + ".0 AS rm FROM dm GROUP BY v)",
        "cmt AS (SELECT kk, SUM(d) / CAST(nn.n AS DOUBLE) AS cm "
        "FROM dm CROSS JOIN nn GROUP BY kk, nn.n)",
        f"gmt AS (SELECT SUM(d) / (CAST(nn.n AS DOUBLE) * {K}) AS gm "
        f"FROM dm CROSS JOIN nn GROUP BY nn.n)",
        "ct AS MATERIALIZED (SELECT dm.v, dm.kk, dm.d - rmt.rm - cmt.cm + gmt.gm AS c "
        "FROM dm JOIN rmt ON rmt.v = dm.v JOIN cmt ON cmt.kk = dm.kk CROSS JOIN gmt)",
        "mg AS (SELECT a.kk AS i, b.kk AS j, SUM(a.c * b.c) AS a "
        "FROM ct a JOIN ct b ON b.v = a.v GROUP BY a.kk, b.kk)",
        # single-row LIST state: m = row-major 8x8 Gram, vm = identity
        f"j0 AS MATERIALIZED (SELECT LIST(a ORDER BY i * {K} + j) AS m, "
        f"list_transform(RANGE(0, {K*K}), f -> CASE WHEN f // {K} = f % {K} "
        f"THEN 1.0 ELSE 0.0 END) AS vm FROM mg)",
    ]
    step = 0
    for _ in range(sweeps):
        for P in range(K):
            for Q in range(P + 1, K):
                step += 1
                app, aqq, apq = f"m[{P*K+P+1}]", f"m[{Q*K+Q+1}]", f"m[{P*K+Q+1}]"
                mnew = (
                    f"list_transform(RANGE(0, {K*K}), f -> CASE "
                    f"WHEN f = {P*K+P} THEN c*c*app - 2.0*c*s*apq + s*s*aqq "
                    f"WHEN f = {Q*K+Q} THEN s*s*app + 2.0*c*s*apq + c*c*aqq "
                    f"WHEN f = {P*K+Q} OR f = {Q*K+P} THEN 0.0 "
                    f"WHEN f % {K} = {P} AND f // {K} <> {P} AND f // {K} <> {Q} "
                    f"THEN c*m[f+1] - s*m[f + {Q-P} + 1] "
                    f"WHEN f % {K} = {Q} AND f // {K} <> {P} AND f // {K} <> {Q} "
                    f"THEN s*m[f - {Q-P} + 1] + c*m[f+1] "
                    f"WHEN f // {K} = {P} AND f % {K} <> {P} AND f % {K} <> {Q} "
                    f"THEN c*m[f+1] - s*m[f + {(Q-P)*K} + 1] "
                    f"WHEN f // {K} = {Q} AND f % {K} <> {P} AND f % {K} <> {Q} "
                    f"THEN s*m[f - {(Q-P)*K} + 1] + c*m[f+1] "
                    f"ELSE m[f+1] END)"
                )
                vnew = (
                    f"list_transform(RANGE(0, {K*K}), f -> CASE "
                    f"WHEN f % {K} = {P} THEN c*vm[f+1] - s*vm[f + {Q-P} + 1] "
                    f"WHEN f % {K} = {Q} THEN s*vm[f - {Q-P} + 1] + c*vm[f+1] "
                    f"ELSE vm[f+1] END)"
                )
                parts.append(
                    f"j{step} AS MATERIALIZED (SELECT {mnew} AS m, {vnew} AS vm FROM ("
                    f"SELECT m, vm, app, aqq, apq, 1.0/sqrt(1.0 + t*t) AS c, "
                    f"t/sqrt(1.0 + t*t) AS s FROM ("
                    f"SELECT m, vm, app, aqq, apq, CASE WHEN apq = 0 THEN 0.0 ELSE "
                    f"(CASE WHEN tau >= 0 THEN 1.0 ELSE -1.0 END)"
                    f"/(abs(tau) + sqrt(1.0 + tau*tau)) END AS t FROM ("
                    f"SELECT m, vm, {app} AS app, {aqq} AS aqq, {apq} AS apq, "
                    f"CASE WHEN {apq} = 0 THEN 0.0 ELSE ({aqq} - {app})/(2.0*{apq}) END AS tau "
                    f"FROM j{step-1}))))"
                )
    parts += [
        # eigen order: top-dim by eigenvalue desc (gaps make ties impossible)
        f"ev AS (SELECT kk, m[kk * {K} + kk + 1] AS lam FROM j{step} "
        f"CROSS JOIN (SELECT UNNEST(RANGE(0, {K})) AS kk))",
        f"topd AS (SELECT kk, ROW_NUMBER() OVER (ORDER BY lam DESC, kk ASC) - 1 AS d "
        f"FROM ev QUALIFY ROW_NUMBER() OVER (ORDER BY lam DESC, kk ASC) <= {dim})",
        # eigenvector columns with the argmax-|component| sign rule
        f"vcol AS MATERIALIZED (SELECT t.d, i.i, vm[i.i * {K} + t.kk + 1] AS val "
        f"FROM j{step} CROSS JOIN topd t "
        f"CROSS JOIN (SELECT UNNEST(RANGE(0, {K})) AS i) i)",
        "sgn AS (SELECT d, CASE WHEN val < 0 THEN -1.0 ELSE 1.0 END AS sg FROM ("
        "SELECT d, val, ROW_NUMBER() OVER (PARTITION BY d "
        "ORDER BY abs(val) DESC, i ASC) AS rn FROM vcol) WHERE rn = 1)",
        "vfix AS MATERIALIZED (SELECT v.d, v.i, v.val * s.sg AS val "
        "FROM vcol v JOIN sgn s ON s.d = v.d)",
        "pos AS (SELECT ct.v, vf.d, SUM(ct.c * vf.val) AS coord "
        "FROM ct JOIN vfix vf ON vf.i = ct.kk GROUP BY ct.v, vf.d)",
    ]
    return ",\n".join(parts) + (
        "\nSELECT v, ROUND(MAX(CASE WHEN d = 0 THEN coord END), 6) AS x, "
        "ROUND(MAX(CASE WHEN d = 1 THEN coord END), 6) AS y "
        "FROM pos GROUP BY v ORDER BY v"
    )


def _stress_sql(
    num_pivots: int = 8,
    iterations: int = 20,
    seed: int = 42,
    bfs_levels: int = 24,
) -> str:
    """Twin of graph/layout.py:stress_layout — splitmix64 coordinate init
    (× √n), evenly-spaced pivots, unrolled level-synchronous BFS hop
    distances, and ``iterations`` majorization updates
    x_v ← Σ_p w·(x_p + d·unit(x_v − x_p)) / Σw with w = 1/max(d,1)² and
    the engine's exact guards (d > 0 mask, 1e-12 norm/denominator
    floors, coords kept when Σw = 0).  Every update is elementwise float
    arithmetic in the same expression shape; the k-pivot sums differ
    from numpy's pairwise order by ~1 ulp (inside the driver tolerance
    after ROUND 6)."""
    base = (seed * 0x9E3779B97F4A7C15) % _M64
    inv64 = "18446744073709551616.0"
    parts = [
        "WITH se AS MATERIALIZED ({SYM})",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"piv AS MATERIALIZED (SELECT DISTINCT (k.k * nn.n) // {num_pivots} AS p "
        f"FROM (SELECT UNNEST(RANGE(0, {num_pivots})) AS k) k CROSS JOIN nn)",
        # BFS hop distances from every pivot
        "f0 AS MATERIALIZED (SELECT p AS s, p AS v, 0 AS dist FROM piv)",
        "vis0 AS MATERIALIZED (SELECT * FROM f0)",
    ]
    for k in range(1, bfs_levels + 1):
        parts += [
            f"f{k} AS MATERIALIZED (SELECT DISTINCT f.s, e.dst AS v, {k} AS dist "
            f"FROM f{k-1} f JOIN se e ON e.src = f.v "
            f"WHERE NOT EXISTS (SELECT 1 FROM vis{k-1} w WHERE w.s = f.s AND w.v = e.dst))",
            f"vis{k} AS MATERIALIZED (SELECT * FROM vis{k-1} UNION ALL SELECT * FROM f{k})",
        ]
    parts += [
        # (v, s, d): hop distance, -1 when unreachable (engine convention)
        f"dm AS MATERIALIZED (SELECT nodes.v, piv.p AS s, "
        f"CAST(COALESCE(w.dist, -1) AS DOUBLE) AS d FROM nodes CROSS JOIN piv "
        f"LEFT JOIN vis{bfs_levels} w ON w.s = piv.p AND w.v = nodes.v)",
        *_sm64_stages("ix", "nodes", f"(CAST(v AS HUGEINT)*2 + {base})", "v"),
        *_sm64_stages("iy", "nodes", f"(CAST(v AS HUGEINT)*2 + 1 + {base})", "v"),
        "c0 AS MATERIALIZED (SELECT a.v, "
        f"CAST(a.h AS DOUBLE)/{inv64} * sqrt(CAST(nn.n AS DOUBLE)) AS x, "
        f"CAST(b.h AS DOUBLE)/{inv64} * sqrt(CAST(nn.n AS DOUBLE)) AS y "
        "FROM ixc a JOIN iyc b ON b.v = a.v CROSS JOIN nn)",
    ]
    for r in range(1, iterations + 1):
        p = r - 1
        parts += [
            f"t{r} AS (SELECT c.v, dm.d, "
            f"CASE WHEN dm.d > 0 THEN 1.0/(GREATEST(dm.d, 1.0)*GREATEST(dm.d, 1.0)) ELSE 0.0 END AS w, "
            f"pc.x AS px, pc.y AS py, c.x - pc.x AS dx, c.y - pc.y AS dy "
            f"FROM c{p} c JOIN dm ON dm.v = c.v JOIN c{p} pc ON pc.v = dm.s)",
            f"u{r} AS (SELECT v, d, w, px, py, dx, dy, "
            f"GREATEST(sqrt(dx*dx + dy*dy), 1e-12) AS nrm FROM t{r})",
            f"c{r} AS MATERIALIZED (SELECT c.v, "
            f"CASE WHEN g.ws > 0 THEN g.sx / GREATEST(g.ws, 1e-12) ELSE c.x END AS x, "
            f"CASE WHEN g.ws > 0 THEN g.sy / GREATEST(g.ws, 1e-12) ELSE c.y END AS y "
            f"FROM c{p} c JOIN (SELECT v, SUM(w) AS ws, "
            f"SUM(w * (px + d * (dx / nrm))) AS sx, "
            f"SUM(w * (py + d * (dy / nrm))) AS sy "
            f"FROM u{r} GROUP BY v) g ON g.v = c.v)",
        ]
    return ",\n".join(parts) + (
        f"\nSELECT v, ROUND(x, 6) AS x, ROUND(y, 6) AS y FROM c{iterations} ORDER BY v"
    )


def _multimodal_sql(n_items: int = 200) -> str:
    """Exact twin of q_multimodal_decode with noise_gen='hash': replays
    synth_media's pixel construction analytically (integer gradient ramps
    + splitmix64 counter noise bytes), then the decoded-image features —
    per-channel means and the 2×2 luma grid (regions [0, h//2), [h//2, h))
    — and the np.resize-to-8 wrap (f0 counted twice in feat_sum).  The
    PPM encode→decode roundtrip is lossless, so the decoded pixels equal
    the synthesized ones; channel means are exact integer-sum divisions,
    luma region means differ from numpy's pairwise sum by ~1 ulp (inside
    the driver tolerance after ROUND 6)."""
    FNV = 0x100000001B3
    parts = [
        f"WITH ids AS (SELECT CAST(range AS BIGINT) AS id FROM range({n_items}))",
        "dims AS (SELECT id, 16 + id % 16 AS ht, 16 + (id*7) % 16 AS wd FROM ids)",
        "px0 AS (SELECT d.id, d.ht, d.wd, yy.y, xx.x, "
        "(yy.y*255) // (d.ht - 1) AS r, (xx.x*255) // (d.wd - 1) AS g "
        "FROM dims d JOIN (SELECT CAST(range AS BIGINT) AS y FROM range(32)) yy ON yy.y < d.ht "
        "JOIN (SELECT CAST(range AS BIGINT) AS x FROM range(32)) xx ON xx.x < d.wd)",
        *_sm64_stages(
            "nz",
            "px0",
            f"(CAST(id + 1 AS HUGEINT) * {FNV} + y * wd + x)",
            "id, ht, wd, y, x, r, g",
        ),
        "px AS MATERIALIZED (SELECT id, ht, wd, y, x, r, g, "
        "CAST(h & 255 AS BIGINT) AS b FROM nzc)",
        "chan AS (SELECT id, (CAST(SUM(r) AS DOUBLE) / COUNT(*)) / 255.0 AS f0, "
        "(CAST(SUM(g) AS DOUBLE) / COUNT(*)) / 255.0 AS f1, "
        "(CAST(SUM(b) AS DOUBLE) / COUNT(*)) / 255.0 AS f2 FROM px GROUP BY id)",
        "lum AS (SELECT id, CASE WHEN y < ht // 2 THEN 0 ELSE 1 END AS gy, "
        "CASE WHEN x < wd // 2 THEN 0 ELSE 1 END AS gx, "
        "(SUM((r + g + b) / 3.0) / COUNT(*)) / 255.0 AS lm "
        "FROM px GROUP BY id, gy, gx)",
        "feats AS (SELECT c.id, c.f0, c.f1, c.f2, "
        "MAX(CASE WHEN l.gy = 0 AND l.gx = 0 THEN l.lm END) AS f3, "
        "MAX(CASE WHEN l.gy = 0 AND l.gx = 1 THEN l.lm END) AS f4, "
        "MAX(CASE WHEN l.gy = 1 AND l.gx = 0 THEN l.lm END) AS f5, "
        "MAX(CASE WHEN l.gy = 1 AND l.gx = 1 THEN l.lm END) AS f6 "
        "FROM chan c JOIN lum l USING (id) GROUP BY c.id, c.f0, c.f1, c.f2)",
    ]
    return ",\n".join(parts) + (
        "\nSELECT d.id, d.ht AS height, d.wd AS width, CAST(3 AS BIGINT) AS channels, "
        "ROUND(f.f0 + f.f1 + f.f2 + f.f3 + f.f4 + f.f5 + f.f6 + f.f0, 6) AS feat_sum "
        "FROM dims d JOIN feats f ON f.id = d.id ORDER BY d.id"
    )


def _kmeans_cte(n_centroids: int, lloyd_iters: int, seed: int = 42) -> str:
    """Shared CTE chain replaying ann/search.py:train_ivf_centroids —
    hash-seeded init ((vec_id·golden64 + seed) >> 32, stable ties by
    vec_id), then ``lloyd_iters`` spherical Lloyd rounds: assign =
    argmax cosine (ties to the lowest cid, np.argmax's rule), update =
    L2-normalized mean of the assigned normalized vectors, empty cells
    keep their previous centroid.  Float sums differ from numpy's pairwise
    order by ~1 ulp — far inside the driver's 1e-9 float tolerance (same
    acceptance as the ann_topk / HITS twins).  Ends at ``c{lloyd_iters}``
    = (cid, pos, y) unnested centroids; also defines ``nvu`` =
    (vec_id, pos, val) unnested L2-normalized vectors."""
    h = (
        "(CAST((CAST("
        + _mul64_sql("vec_id", 0x9E3779B97F4A7C15)
        + f" AS HUGEINT) + {seed}) % {_M64} AS UBIGINT) >> 32)"
    )
    parts = [
        "nvu AS MATERIALIZED (SELECT vec_id, pos, CAST(val AS DOUBLE) / nrm AS val FROM ("
        "  SELECT vec_id, generate_subscripts(embedding, 1) AS pos, UNNEST(embedding) AS val,"
        "  (CASE WHEN sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * y))) = 0"
        "   THEN 1.0 ELSE sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * y))) END) AS nrm"
        "  FROM embeddings))",
        f"seeds AS MATERIALIZED (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY {h}, vec_id) - 1 AS cid "
        f"FROM embeddings QUALIFY ROW_NUMBER() OVER (ORDER BY {h}, vec_id) <= {n_centroids})",
        "c0 AS MATERIALIZED (SELECT s.cid, u.pos, u.val AS y FROM seeds s "
        "JOIN nvu u ON u.vec_id = s.vec_id)",
    ]
    for r in range(1, lloyd_iters + 1):
        parts += [
            f"sc{r} AS MATERIALIZED (SELECT u.vec_id, c.cid, SUM(u.val * c.y) AS s "
            f"FROM nvu u JOIN c{r-1} c ON c.pos = u.pos GROUP BY u.vec_id, c.cid)",
            f"a{r} AS MATERIALIZED (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn "
            f"FROM sc{r}) WHERE rn = 1)",
            f"mn{r} AS MATERIALIZED (SELECT a.cid, u.pos, "
            f"SUM(u.val) / COUNT(*) AS m FROM a{r} a JOIN nvu u ON u.vec_id = a.vec_id "
            f"GROUP BY a.cid, u.pos)",
            f"nr{r} AS (SELECT cid, CASE WHEN sqrt(SUM(m * m)) = 0 THEN 1.0 "
            f"ELSE sqrt(SUM(m * m)) END AS nrm FROM mn{r} GROUP BY cid)",
            f"c{r} AS MATERIALIZED (SELECT p.cid, p.pos, "
            f"COALESCE(mn.m / nr.nrm, p.y) AS y FROM c{r-1} p "
            f"LEFT JOIN mn{r} mn ON mn.cid = p.cid AND mn.pos = p.pos "
            f"LEFT JOIN nr{r} nr ON nr.cid = p.cid)",
        ]
    return ",\n".join(parts)


def _kmeans_clusters_sql(n_centroids: int = 8, lloyd_iters: int = 3) -> str:
    """Twin of q_kmeans_clusters: training replay + one final assignment
    pass + per-cluster counts."""
    R = lloyd_iters
    return (
        "WITH "
        + _kmeans_cte(n_centroids, R)
        + f""",
        scf AS (SELECT u.vec_id, c.cid, SUM(u.val * c.y) AS s
                FROM nvu u JOIN c{R} c ON c.pos = u.pos GROUP BY u.vec_id, c.cid),
        af AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
               FROM scf) WHERE rn = 1)
        SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM af GROUP BY cid ORDER BY cluster"""
    )


def _ivf_topk_sql(
    n_centroids: int = 16,
    lloyd_iters: int = 3,
    nprobe: int = 4,
    k: int = 5,
    query_ids: str = "0, 1, 2, 3, 4",
) -> str:
    """Twin of q_ann_ivf_topk: same k-means training replay, queries probe
    their ``nprobe`` closest cells, vectors assigned to a probed cell are
    exact-cosine-ranked per query (score DESC, vec_id ASC), top ``k``."""
    R = lloyd_iters
    return (
        "WITH "
        + _kmeans_cte(n_centroids, R)
        + f""",
        scf AS (SELECT u.vec_id, c.cid, SUM(u.val * c.y) AS s
                FROM nvu u JOIN c{R} c ON c.pos = u.pos GROUP BY u.vec_id, c.cid),
        af AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
               FROM scf) WHERE rn = 1),
        qc AS (SELECT DISTINCT cid FROM (SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
               FROM scf WHERE vec_id IN ({query_ids})) WHERE rn <= {nprobe}),
        probed AS (SELECT af.vec_id FROM af JOIN qc ON qc.cid = af.cid),
        pairs AS (SELECT q.vec_id AS query_id, u.vec_id, SUM(qu.val * u.val) AS score
                  FROM (SELECT DISTINCT vec_id FROM nvu WHERE vec_id IN ({query_ids})) q
                  JOIN nvu qu ON qu.vec_id = q.vec_id
                  JOIN nvu u ON u.pos = qu.pos
                  JOIN probed p ON p.vec_id = u.vec_id
                  GROUP BY q.vec_id, u.vec_id),
        ranked AS (SELECT query_id, vec_id, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, vec_id ASC) AS BIGINT) AS rank
                   FROM pairs)
        SELECT query_id, rank, vec_id, ROUND(score, 6) AS score
        FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""
    )


def _kcore_sql(iters: int) -> str:
    """Iterated-h-index k-core twin (Montresor et al. locality iteration,
    the same operator the engine runs): c0 = degree, then
    c(v) <- H({min(c(u), c(v)) : u in N(v)}) unrolled ``iters`` times.
    The operator is monotone non-increasing with the core number as its
    fixpoint, and the engine stops only at a zero-change fixpoint, so any
    unroll >= the engine's round count is value-identical (32 covers the
    sf battery with a wide margin; sf0.01 converges in <10 rounds)."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT src, dst FROM ({SYM}))",
        "nodes AS MATERIALIZED (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
        "c0 AS MATERIALIZED (SELECT nodes.v, COALESCE(d.deg, 0) AS c FROM nodes "
        "LEFT JOIN (SELECT src AS v, COUNT(*) AS deg FROM e GROUP BY src) d ON d.v = nodes.v)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT nodes.v, COALESCE(h.h, 0) AS c "
            f"FROM nodes LEFT JOIN ("
            f"SELECT v, MAX(CASE WHEN val >= rnk THEN rnk ELSE 0 END) AS h FROM ("
            f"SELECT e.src AS v, LEAST(cu.c, cv.c) AS val, "
            f"ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY LEAST(cu.c, cv.c) DESC) AS rnk "
            f"FROM e JOIN c{k-1} cu ON cu.v = e.dst JOIN c{k-1} cv ON cv.v = e.src"
            f") GROUP BY v) h ON h.v = nodes.v)"
        )
    return ",\n".join(parts) + f"\nSELECT v, CAST(c AS BIGINT) AS core FROM c{iters}"


def _pagerank_w_sql(edges_sql: str, iters: int, v_as: str = "v") -> str:
    """Weighted power-iteration twin (engine run with weighted=True, tol=0):
    coefficient w(u,v)/wdeg(u), vertex universe = src ∪ dst of the edge
    table, ids may be VARCHAR (host names)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "od AS MATERIALIZED (SELECT src, CAST(SUM(w) AS DOUBLE) AS d FROM e GROUP BY src)",
        "nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "s0 AS MATERIALIZED (SELECT v, 1.0/nn.n AS score FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT nodes.v, 0.15/nn.n + 0.85*COALESCE(m.inc, 0) AS score "
            f"FROM nodes CROSS JOIN nn LEFT JOIN (SELECT e.dst AS v, SUM(p.score * e.w / od.d) AS inc "
            f"FROM e JOIN s{k-1} p ON p.v = e.src JOIN od ON od.src = e.src "
            f"GROUP BY e.dst) m ON m.v = nodes.v)"
        )
    body = ",\n".join(parts)
    return (
        body
        + f"\nSELECT v AS {v_as}, ROUND(score / (SELECT SUM(score) FROM s{iters}), 8) AS score FROM s{iters}"
    )


def _hits_sql(edges_sql: str, nodes_sql: str, iters: int) -> str:
    """HITS twin: auth_k = A^T hub_{k-1}, hub_k = A auth_k, each
    L2-normalized — exact vs the engine's fixed-iteration run."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        f"nodes AS MATERIALIZED ({nodes_sql})",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "h0 AS MATERIALIZED (SELECT v, 1.0/SQRT(nn.n) AS score FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"a{k}r AS MATERIALIZED (SELECT nodes.v, COALESCE(m.s, 0) AS score FROM nodes "
            f"LEFT JOIN (SELECT e.dst AS v, SUM(h.score) AS s FROM e "
            f"JOIN h{k-1} h ON h.v = e.src GROUP BY e.dst) m ON m.v = nodes.v)"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT v, score / SQRT((SELECT SUM(score*score) FROM a{k}r)) AS score FROM a{k}r)"
        )
        parts.append(
            f"h{k}r AS MATERIALIZED (SELECT nodes.v, COALESCE(m.s, 0) AS score FROM nodes "
            f"LEFT JOIN (SELECT e.src AS v, SUM(a.score) AS s FROM e "
            f"JOIN a{k} a ON a.v = e.dst GROUP BY e.src) m ON m.v = nodes.v)"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT v, score / SQRT((SELECT SUM(score*score) FROM h{k}r)) AS score FROM h{k}r)"
        )
    body = ",\n".join(parts)
    return (
        body
        + f"\nSELECT h.v, ROUND(h.score, 8) AS hub, ROUND(a.score, 8) AS auth "
        f"FROM h{iters} h JOIN a{iters} a USING (v) ORDER BY v"
    )


def _salsa_sql(edges_sql: str, nodes_sql: str, iters: int) -> str:
    """SALSA twin: degree-normalized alternating walk, L1-normalized each
    half-step — exact vs the engine's fixed-iteration run (hub_0 = 1/n)."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        f"nodes AS MATERIALIZED ({nodes_sql})",
        "od AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "ind AS MATERIALIZED (SELECT dst AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY dst)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "h0 AS MATERIALIZED (SELECT v, 1.0/nn.n AS score FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"a{k}r AS MATERIALIZED (SELECT nodes.v, COALESCE(m.s, 0) AS score FROM nodes "
            f"LEFT JOIN (SELECT e.dst AS v, SUM(h.score / od.d) AS s FROM e "
            f"JOIN h{k-1} h ON h.v = e.src JOIN od ON od.v = e.src GROUP BY e.dst) m "
            f"ON m.v = nodes.v)"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT v, score / (SELECT SUM(score) FROM a{k}r) AS score FROM a{k}r)"
        )
        parts.append(
            f"h{k}r AS MATERIALIZED (SELECT nodes.v, COALESCE(m.s, 0) AS score FROM nodes "
            f"LEFT JOIN (SELECT e.src AS v, SUM(a.score / ind.d) AS s FROM e "
            f"JOIN a{k} a ON a.v = e.dst JOIN ind ON ind.v = e.dst GROUP BY e.src) m "
            f"ON m.v = nodes.v)"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT v, score / (SELECT SUM(score) FROM h{k}r) AS score FROM h{k}r)"
        )
    body = ",\n".join(parts)
    return (
        body
        + f"\nSELECT h.v, ROUND(h.score, 8) AS hub, ROUND(a.score, 8) AS auth "
        f"FROM h{iters} h JOIN a{iters} a USING (v) ORDER BY v"
    )


def _redirect_sql(hops: int) -> str:
    """Chained hop-capped CASE resolution — exact twin of resolve_chains
    (doc % 7 == 3 redirects to (doc*3 + 11) % N)."""
    parts = [
        "WITH nd AS (SELECT COUNT(*) AS n FROM documents)",
        "r0 AS (SELECT CAST(doc_id AS BIGINT) AS v, CAST(doc_id AS BIGINT) AS cur FROM documents)",
    ]
    for k in range(1, hops + 1):
        parts.append(
            f"r{k} AS (SELECT v, CASE WHEN cur % 7 = 3 "
            f"THEN (cur * 3 + 11) % nd.n ELSE cur END AS cur FROM r{k-1}, nd)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS src_doc, cur AS final_doc, "
        f"CAST(cur % 7 <> 3 AS BIGINT) AS resolved FROM r{hops} ORDER BY v"
    )


def _sssp_sql(weighted_edges_sql: str, nodes_sql: str, iters: int, source: int = 0) -> str:
    """Chained min-plus relaxation CTE — exact twin of sssp_distances run to
    fixpoint, provided ``iters`` ≥ the longest shortest-path hop count
    (extra rounds are no-ops under LEAST).  1e18 plays ∞; -1.0 = unreachable."""
    parts = [
        f"WITH e AS MATERIALIZED ({weighted_edges_sql})",
        f"nodes AS MATERIALIZED ({nodes_sql})",
        f"d0 AS MATERIALIZED (SELECT v, CASE WHEN v = {source} THEN 0.0 ELSE 1e18 END AS d FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT nodes.v, LEAST(p.d, COALESCE(m.best, 1e18)) AS d "
            f"FROM nodes JOIN d{k-1} p ON p.v = nodes.v "
            f"LEFT JOIN (SELECT e.dst AS v, MIN(p2.d + e.w) AS best "
            f"FROM e JOIN d{k-1} p2 ON p2.v = e.src WHERE p2.d < 1e17 "
            f"GROUP BY e.dst) m ON m.v = nodes.v)"
        )
    body = ",\n".join(parts)
    return (
        body
        + f"\nSELECT v, ROUND(CASE WHEN d >= 1e17 THEN -1.0 ELSE d END, 8) AS dist FROM d{iters}"
    )


def _katz_sql(edges_sql: str, nodes_sql: str, iters: int, alpha: float, beta: float) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        f"nodes AS MATERIALIZED ({nodes_sql})",
        "s0 AS MATERIALIZED (SELECT v, 1.0/(SELECT COUNT(*) FROM nodes) AS score FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT nodes.v, {beta} + {alpha}*COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT e.dst AS v, SUM(p.score) AS inc "
            f"FROM e JOIN s{k-1} p ON p.v = e.src GROUP BY e.dst) m ON m.v = nodes.v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v, ROUND(score / (SELECT SQRT(SUM(score*score)) FROM s{iters}), 8) AS score FROM s{iters}"
    )


def _eigen_sql(edges_sql: str, nodes_sql: str, iters: int) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        f"nodes AS MATERIALIZED ({nodes_sql})",
        "s0 AS MATERIALIZED (SELECT v, 1.0/(SELECT COUNT(*) FROM nodes) AS score FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT nodes.v, COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT e.dst AS v, SUM(p.score) AS inc "
            f"FROM e JOIN s{k-1} p ON p.v = e.src GROUP BY e.dst) m ON m.v = nodes.v)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT v, score / (SELECT SQRT(SUM(score*score)) FROM r{k}) AS score FROM r{k})"
        )
    return ",\n".join(parts) + f"\nSELECT v, ROUND(score, 8) AS score FROM s{iters}"


def _onmi_sql() -> str:
    """OverlappingNMIDistance twin (MAX normalization) over the two
    deterministic mod-covers — McDaid adjusted conditional entropy with
    the h(a)+h(d) ≥ h(b)+h(c) gate, all from size/intersection aggregates."""
    N = "(SELECT n FROM nn)"

    def h(e: str) -> str:
        return f"(CASE WHEN ({e}) > 0 THEN -(({e})*1.0) * LOG2(({e})*1.0/{N}) ELSE 0 END)"

    def ent(e: str) -> str:
        return f"({h(e)} + {h(f'{N} - ({e})')})"

    ha, hb, hc, hd = h("cj.a"), h("cj.b"), h("cj.cc"), h("cj.d")
    hxy_sum = f"({ha} + {hb} + {hc} + {hd})"
    cond = f"{ha} + {hd} >= {hb} + {hc}"
    return f"""
        WITH cx AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 5 AS BIGINT) AS c FROM customer
                    UNION ALL SELECT c_custkey, 5 + c_custkey % 7 FROM customer WHERE c_custkey % 3 = 0),
        cy AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 6 AS BIGINT) AS s FROM customer
               UNION ALL SELECT c_custkey, 6 + c_custkey % 5 FROM customer WHERE c_custkey % 4 = 0),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM customer),
        sx AS (SELECT c, CAST(COUNT(*) AS DOUBLE) AS sz FROM cx GROUP BY c),
        sy AS (SELECT s, CAST(COUNT(*) AS DOUBLE) AS sz FROM cy GROUP BY s),
        cells AS (SELECT cx.c, cy.s, CAST(COUNT(*) AS DOUBLE) AS ol
                  FROM cx JOIN cy ON cy.v = cx.v GROUP BY cx.c, cy.s),
        cj AS (SELECT cells.c, cells.s, sx.sz AS szx, sy.sz AS szy,
                      {N} + cells.ol - sx.sz - sy.sz AS a,
                      sy.sz - cells.ol AS b,
                      sx.sz - cells.ol AS cc,
                      cells.ol AS d
               FROM cells JOIN sx ON sx.c = cells.c JOIN sy ON sy.s = cells.s),
        condx AS (SELECT c, MIN(v) AS v FROM (
            SELECT c, {ent("sz")} AS v FROM sx
            UNION ALL
            SELECT cj.c, CASE WHEN {cond} THEN {hxy_sum} - {ent("cj.szy")}
                              ELSE {ent("cj.szx")} END FROM cj
        ) GROUP BY c),
        condy AS (SELECT s, MIN(v) AS v FROM (
            SELECT s, {ent("sz")} AS v FROM sy
            UNION ALL
            SELECT cj.s, CASE WHEN {cond} THEN {hxy_sum} - {ent("cj.szx")}
                              ELSE {ent("cj.szy")} END FROM cj
        ) GROUP BY s),
        hx AS (SELECT SUM({ent("sz")}) AS h FROM sx),
        hy AS (SELECT SUM({ent("sz")}) AS h FROM sy),
        mi AS (SELECT 0.5 * ((SELECT h FROM hx) - (SELECT SUM(v) FROM condx)
                           + (SELECT h FROM hy) - (SELECT SUM(v) FROM condy)) AS mi)
        SELECT ROUND(1.0 - LEAST(GREATEST((SELECT mi FROM mi)
                     / GREATEST((SELECT h FROM hx), (SELECT h FROM hy)), 0.0), 1.0), 8)
               AS onmi_distance
    """


def _sm64_sql(expr: str) -> str:
    """SQL twin of sources/synth._splitmix64 over a HUGEINT expression.

    128-bit signed HUGEINT can overflow on a 64×64-bit product, so each
    multiply is decomposed into 32-bit halves and reduced mod 2⁶⁴; xors
    and shifts run on UBIGINT.  Returns a UBIGINT-typed expression.
    """
    m = 2**64

    def mulmod(a: str, c: int) -> str:
        bh, bl = c >> 32, c & 0xFFFFFFFF
        return (
            f"((({a}) * {bl} % {m} + (({a}) * {bh} % 4294967296) * 4294967296) % {m})"
        )

    s1 = f"CAST((({expr}) + 11400714819323198485) % {m} AS UBIGINT)"
    x1 = f"CAST(xor({s1}, {s1} >> 30) AS HUGEINT)"
    s2 = f"CAST({mulmod(x1, 0xBF58476D1CE4E5B9)} AS UBIGINT)"
    x2 = f"CAST(xor({s2}, {s2} >> 27) AS HUGEINT)"
    s3 = f"CAST({mulmod(x2, 0x94D049BB133111EB)} AS UBIGINT)"
    return f"xor({s3}, {s3} >> 31)"


def oracle_sql() -> dict[str, str]:
    from networkit_ray.sources.derive import (
        CANONICAL_EDGES_SQL,
        DERIVED_EDGES_SQL,
        SYMMETRIC_EDGES_SQL,
    )
    from networkit_ray.web.htmlgen import A_MULT, D_DOMAINS, LINK_OFFSET, WEB_EDGES_SQL

    n_customers = "(SELECT COUNT(*) FROM customer)"
    n_docs = "(SELECT COUNT(*) FROM documents)"
    pr = (_pagerank_sql(DERIVED_EDGES_SQL, PR_ITERS)
        .replace("{nodes}", "SELECT CAST(c_custkey AS BIGINT) AS v FROM customer")
        .replace("{n}", n_customers))
    web_pr = (
        _pagerank_sql(
            f"SELECT src, dst FROM ({WEB_EDGES_SQL}) WHERE src <> dst", PR_ITERS
        )
        .replace("{nodes}", "SELECT CAST(doc_id AS BIGINT) AS v FROM documents")
        .replace("{n}", n_docs)
    )

    # Truncated PageRank twin: teleport-free recursion, collected tail terms.
    _tpr_trunc, _tpr_iters = 3, 10
    _tpr_parts = [
        f"WITH e AS MATERIALIZED (SELECT src, dst FROM ({WEB_EDGES_SQL}) WHERE src <> dst)",
        "od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "nodes AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS v FROM documents)",
        f"s0 AS MATERIALIZED (SELECT v, 1.0/{n_docs} AS score FROM nodes)",
    ]
    for _k in range(1, _tpr_iters + 1):
        _tpr_parts.append(
            f"s{_k} AS MATERIALIZED (SELECT nodes.v, 0.85*COALESCE(m.inc, 0) AS score "
            f"FROM nodes LEFT JOIN (SELECT e.dst AS v, SUM(p.score/od.d) AS inc "
            f"FROM e JOIN s{_k-1} p ON p.v = e.src JOIN od ON od.src = e.src "
            f"GROUP BY e.dst) m ON m.v = nodes.v)"
        )
    _tpr_tail = " UNION ALL ".join(
        f"SELECT * FROM s{_k}" for _k in range(_tpr_trunc + 1, _tpr_iters + 1)
    )
    truncated_pr = (
        ",\n".join(_tpr_parts)
        + f"\nSELECT v, ROUND(0.15*SUM(score), 8) AS score FROM ({_tpr_tail}) GROUP BY v"
    )

    # Shared deterministic-pivot multi-source BFS CTE: pivots are the
    # `sample` smallest (v+seed)*GOLD mod 2^64 ranks — HUGEINT arithmetic
    # reproduces closeness._pivots' uint64 wraparound exactly; d-cap 64
    # far exceeds the sym derived graph's eccentricity (engine iterates to
    # fixpoint, so an undershoot would be a spurious oracle mismatch).
    def _pivot_bfs_sql(sample: int) -> str:
        return f"""
        WITH RECURSIVE se AS MATERIALIZED ({{SYM}}),
        nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
        piv AS (SELECT v FROM nodes
                ORDER BY (CAST(v + 42 AS HUGEINT) * CAST('11400714819323198485' AS HUGEINT))
                         % CAST('18446744073709551616' AS HUGEINT)
                LIMIT {sample}),
        r(s, v, d) AS (
            SELECT v, v, CAST(0 AS BIGINT) FROM piv
            UNION
            SELECT r.s, e.dst, r.d + 1 FROM r JOIN se e ON e.src = r.v WHERE r.d < 64
        ),
        md AS (SELECT s, v, MIN(d) AS d FROM r GROUP BY s, v)
        """

    closeness_sql = (
        _pivot_bfs_sql(8)
        + f"""
        , agg AS (SELECT v, SUM(CASE WHEN d > 0 THEN 1.0/d ELSE 0 END) AS h,
                         SUM(CASE WHEN d > 0 THEN d ELSE 0 END) AS t
                  FROM md GROUP BY v)
        SELECT nodes.v,
               ROUND(COALESCE(a.h, 0) * {n_customers} / 8.0, 8) AS harmonic,
               ROUND(CASE WHEN COALESCE(a.t, 0) > 0
                          THEN 8.0 * ({n_customers} - 1) / ({n_customers} * a.t)
                          ELSE 0 END, 8) AS closeness
        FROM nodes LEFT JOIN agg a ON a.v = nodes.v
        """
    ).replace("{SYM}", SYMMETRIC_EDGES_SQL)

    # APSP.cpp twin: full recursive BFS closure over the supplier ring
    # (reachable pairs only, self rows d = 0 included).
    apsp_sql = """
        WITH RECURSIVE base AS MATERIALIZED ({RING}),
        sup AS (SELECT CAST(s_suppkey AS BIGINT) AS v FROM supplier),
        r(s, v, d) AS (
            SELECT v, v, CAST(0 AS BIGINT) FROM sup
            UNION
            SELECT r.s, e.dst, r.d + 1 FROM r JOIN base e ON e.src = r.v
            WHERE r.d < 64
        )
        SELECT s, v, CAST(MIN(d) AS BIGINT) AS d FROM r GROUP BY s, v
        ORDER BY s, v
    """
    # NeighborhoodFunction.cpp twin: cumulative ordered-pair counts per hop.
    nf_sql = """
        WITH RECURSIVE base AS MATERIALIZED ({RING}),
        sup AS (SELECT CAST(s_suppkey AS BIGINT) AS v FROM supplier),
        r(s, v, d) AS (
            SELECT v, v, CAST(0 AS BIGINT) FROM sup
            UNION
            SELECT r.s, e.dst, r.d + 1 FROM r JOIN base e ON e.src = r.v
            WHERE r.d < 64
        ),
        md AS (SELECT s, v, MIN(d) AS d FROM r GROUP BY s, v),
        hs(h) AS (
            SELECT CAST(1 AS BIGINT)
            UNION
            SELECT h + 1 FROM hs WHERE h + 1 <= (SELECT MAX(d) FROM md)
        )
        SELECT hs.h, CAST((SELECT COUNT(*) FROM md WHERE md.d > 0 AND md.d <= hs.h)
                          AS BIGINT) AS nf
        FROM hs ORDER BY hs.h
    """

    # Volume.cpp twin: same pivots, ball sizes = rows with d ≤ r (d=0 self
    # rows included), averaged over the 8 pivots.
    volume_sql = (
        _pivot_bfs_sql(8)
        + """
        , rs AS (SELECT CAST(r AS BIGINT) AS r FROM (VALUES (1), (2), (3)) t(r))
        SELECT rs.r, CAST(COUNT(*) AS DOUBLE) / 8.0 AS volume
        FROM rs JOIN md ON md.d <= rs.r
        GROUP BY rs.r ORDER BY rs.r
        """
    ).replace("{SYM}", SYMMETRIC_EDGES_SQL)

    hop_hist_sql = (
        _pivot_bfs_sql(16)
        + """
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM md WHERE d >= 1 GROUP BY d ORDER BY d
        """
    ).replace("{SYM}", SYMMETRIC_EDGES_SQL)

    # Deterministic random-walk twin: same multiplicative draw
    # h = ((walker+1)*GOLD + (step+1)*MIX) mod 2^64, next = ns[h mod deg],
    # reproduced with HUGEINT arithmetic; walker w starts at the w-th
    # smallest pivot id (closeness._pivots ordering).
    def _walks_sql(n_walkers: int, length: int) -> str:
        gold, mix, m64 = (
            "11400714819323198485",
            "13787848793156543929",
            "18446744073709551616",
        )
        parts = [
            "WITH se AS MATERIALIZED ({SYM})",
            "nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
            f"""piv AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS BIGINT) AS walker
                FROM (SELECT v FROM nodes
                      ORDER BY (CAST(v + 42 AS HUGEINT) * CAST('{gold}' AS HUGEINT))
                               % CAST('{m64}' AS HUGEINT)
                      LIMIT {n_walkers}))""",
            """adj AS (SELECT src AS v, list(dst ORDER BY dst) AS ns,
                CAST(COUNT(*) AS BIGINT) AS d FROM se GROUP BY src)""",
            "s0 AS (SELECT walker, v FROM piv)",
        ]
        for k in range(1, length + 1):
            parts.append(
                f"""s{k} AS (SELECT s.walker,
                    CASE WHEN a.d IS NULL THEN s.v
                         ELSE a.ns[CAST(((CAST(s.walker + 1 AS HUGEINT) * CAST('{gold}' AS HUGEINT)
                                          + CAST({k} AS HUGEINT) * CAST('{mix}' AS HUGEINT))
                                         % CAST('{m64}' AS HUGEINT)) % a.d AS BIGINT) + 1]
                    END AS v
                    FROM s{k-1} s LEFT JOIN adj a ON a.v = s.v)"""
            )
        selects = [
            f"SELECT walker, CAST({k} AS BIGINT) AS step, v FROM s{k}"
            for k in range(length + 1)
        ]
        return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)

    walks_sql = _walks_sql(32, 4).replace("{SYM}", SYMMETRIC_EDGES_SQL)

    # Luby-MIS twin: replay the deterministic rounds (priorities are the
    # walks.py multiplicative draw — bijective per round, so no ties).
    # Rounds after the active set empties are no-ops, so a fixed 16-round
    # unroll equals the engine's run-to-fixpoint (asserted engine-side).
    def _mis_sql(rounds: int) -> str:
        gold, mix, m64 = (
            "11400714819323198485",
            "13787848793156543929",
            "18446744073709551616",
        )

        def prio(col: str, r: int) -> str:
            return (
                f"(CAST({col} + 1 AS HUGEINT) * CAST('{gold}' AS HUGEINT)"
                f" + CAST({r + 1} AS HUGEINT) * CAST('{mix}' AS HUGEINT))"
                f" % CAST('{m64}' AS HUGEINT)"
            )

        parts = [
            "WITH se AS MATERIALIZED ({SYM})",
            "nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
            "a0 AS (SELECT v FROM nodes)",
        ]
        for r in range(rounds):
            parts.append(
                f"""m{r} AS MATERIALIZED (SELECT a.v FROM a{r} a LEFT JOIN (
                    SELECT e.dst AS v, MIN({prio('e.src', r)}) AS nm
                    FROM se e
                    WHERE e.src IN (SELECT v FROM a{r}) AND e.dst IN (SELECT v FROM a{r})
                    GROUP BY e.dst) t ON t.v = a.v
                  WHERE t.nm IS NULL OR {prio('a.v', r)} < t.nm)"""
            )
            parts.append(
                f"""a{r + 1} AS MATERIALIZED (SELECT v FROM a{r}
                  WHERE v NOT IN (SELECT v FROM m{r})
                    AND v NOT IN (SELECT e.dst FROM se e
                                  WHERE e.src IN (SELECT v FROM m{r})
                                    AND e.src IN (SELECT v FROM a{r})
                                    AND e.dst IN (SELECT v FROM a{r})))"""
            )
        union = "\nUNION ALL\n".join(
            f"SELECT v FROM m{r}" for r in range(rounds)
        )
        return ",\n".join(parts) + f"\nSELECT v FROM ({union}) ORDER BY v"

    mis_sql = _mis_sql(16).replace("{SYM}", SYMMETRIC_EDGES_SQL)

    # Local-max-matching twin: replay rounds; priorities are bijective in
    # the packed edge id, so no ties exist and rounds after the active
    # edge set empties are no-ops (16-round unroll, asserted engine-side).
    def _matching_sql(rounds: int, e0_sql: str | None = None) -> str:
        gold, m64 = "11400714819323198485", "18446744073709551616"
        parts = [
            "WITH ce AS MATERIALIZED ({CANON})",
            "nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM customer)",
            e0_sql
            or f"""e0 AS (SELECT src, dst,
                (CAST(src AS HUGEINT) * (SELECT n FROM nn) + dst + 1)
                * CAST('{gold}' AS HUGEINT) % CAST('{m64}' AS HUGEINT) AS p
                FROM ce)""",
        ]
        for r in range(rounds):
            parts.append(
                f"""mv{r} AS MATERIALIZED (SELECT v, MIN(p) AS mp FROM (
                    SELECT src AS v, p FROM e{r}
                    UNION ALL SELECT dst, p FROM e{r}) GROUP BY v)"""
            )
            parts.append(
                f"""w{r} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r} e
                    JOIN mv{r} a ON a.v = e.src AND a.mp = e.p
                    JOIN mv{r} b ON b.v = e.dst AND b.mp = e.p)"""
            )
            parts.append(
                f"""e{r + 1} AS MATERIALIZED (SELECT e.* FROM e{r} e
                    WHERE e.src NOT IN (SELECT src FROM w{r} UNION ALL SELECT dst FROM w{r})
                      AND e.dst NOT IN (SELECT src FROM w{r} UNION ALL SELECT dst FROM w{r}))"""
            )
        union = "\nUNION ALL\n".join(f"SELECT src, dst FROM w{r}" for r in range(rounds))
        return ",\n".join(parts) + f"\nSELECT src, dst FROM ({union}) ORDER BY src, dst"

    matching_sql = _matching_sql(16).replace("{CANON}", CANONICAL_EDGES_SQL)

    # SEIR twin: unrolled synchronous steps with the identical edge-coin hash
    # (seir.py determinism contract).
    def _seir_sql() -> str:
        gold, mix, m64 = (
            "11400714819323198485",
            "13787848793156543929",
            "18446744073709551616",
        )
        p = SEIR_PARAMS
        thresh = int(p["trans_p"] * 2.0**64)
        et, it_, z, tmax = p["e_time"], p["i_time"], p["zero"], p["t_max"]
        parts = [
            "WITH se AS MATERIALIZED ({SYM})",
            "nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM customer)",
            f"""s0 AS (SELECT CAST(c_custkey AS BIGINT) AS v,
                 CASE WHEN c_custkey = {z} THEN 2 ELSE 0 END AS st,
                 CAST(0 AS BIGINT) AS ts FROM customer)""",
        ]
        for t in range(tmax):
            coin = (
                f"((CAST(e.src AS HUGEINT) * (SELECT n FROM nn) + e.dst + 1)"
                f" * CAST('{gold}' AS HUGEINT)"
                f" + CAST({t + 1} AS HUGEINT) * CAST('{mix}' AS HUGEINT))"
                f" % CAST('{m64}' AS HUGEINT)"
            )
            parts.append(
                f"""c{t} AS (SELECT DISTINCT e.dst AS v FROM se e
                    JOIN s{t} x ON x.v = e.src AND x.st = 2
                    WHERE {coin} <= CAST('{thresh}' AS HUGEINT))"""
            )
            parts.append(
                f"""s{t + 1} AS MATERIALIZED (SELECT s.v,
                    CASE WHEN s.st = 0 AND c.v IS NOT NULL THEN 1
                         WHEN s.st = 1 AND {t} - s.ts >= {et} THEN 2
                         WHEN s.st = 2 AND {t} - s.ts >= {it_} THEN 3
                         ELSE s.st END AS st,
                    CASE WHEN (s.st = 0 AND c.v IS NOT NULL)
                          OR (s.st = 1 AND {t} - s.ts >= {et})
                          OR (s.st = 2 AND {t} - s.ts >= {it_})
                         THEN {t} ELSE s.ts END AS ts
                    FROM s{t} s LEFT JOIN c{t} c ON c.v = s.v)"""
            )
            parts.append(
                f"""cen{t} AS (SELECT {t} AS t,
                    CAST(SUM(CASE WHEN st = 0 THEN 1 ELSE 0 END) AS BIGINT) AS s,
                    CAST(SUM(CASE WHEN st = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e,
                    CAST(SUM(CASE WHEN st = 2 THEN 1 ELSE 0 END) AS BIGINT) AS i,
                    CAST(SUM(CASE WHEN st = 3 THEN 1 ELSE 0 END) AS BIGINT) AS r
                    FROM s{t + 1})"""
            )
        union = "\nUNION ALL\n".join(f"SELECT * FROM cen{t}" for t in range(tmax))
        return ",\n".join(parts) + f"\nSELECT * FROM ({union}) ORDER BY t"

    seir_sql = _seir_sql().replace("{SYM}", SYMMETRIC_EDGES_SQL)

    # Suitor twin: same locally-dominant rounds under the weighted total
    # order (w desc, lo, hi) packed into one rank (matching.py suitor note).
    suitor_sql = _matching_sql(
        16,
        e0_sql="""e0 AS (SELECT src, dst,
            (7 - ((src + dst) % 7 + 1))
              * ((SELECT n FROM nn) * (SELECT n FROM nn) + 2)
              + CAST(src AS HUGEINT) * (SELECT n FROM nn) + dst + 1 AS p
            FROM ce)""",
    ).replace("{CANON}", CANONICAL_EDGES_SQL)

    # k-truss twin: unrolled support-peel rounds (support only falls, so
    # rounds past the fixpoint are no-ops; engine asserts rounds ≤ 12).
    def _ktruss_sql(k: int, rounds: int) -> str:
        parts = ["WITH e0 AS MATERIALIZED ({CANON})"]
        for r in range(rounds):
            parts.append(
                f"""t{r} AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                    FROM e{r} e1 JOIN e{r} e2 ON e2.src = e1.dst
                    JOIN e{r} e3 ON e3.src = e1.src AND e3.dst = e2.dst)"""
            )
            parts.append(
                f"""s{r} AS (SELECT src, dst, COUNT(*) AS sup FROM (
                    SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM t{r}
                    UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM t{r}
                    UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM t{r}
                  ) GROUP BY src, dst)"""
            )
            parts.append(
                f"""e{r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r} e
                    JOIN s{r} s ON s.src = e.src AND s.dst = e.dst
                    WHERE s.sup >= {k - 2})"""
            )
        return (
            ",\n".join(parts)
            + f"\nSELECT src, dst FROM e{rounds} ORDER BY src, dst"
        )

    ktruss_sql = _ktruss_sql(4, 16).replace("{CANON}", CANONICAL_EDGES_SQL)

    # GroupDegree greedy twin: k unrolled argmax-coverage rounds.  A selected
    # vertex's closed neighborhood is fully covered, so it vanishes from the
    # next round's gain table — no explicit exclusion (groupcent.py note).
    def _group_degree_sql(k: int) -> str:
        parts = [
            "WITH sym AS MATERIALIZED ({SYM})",
            "allv AS (SELECT ROW_NUMBER() OVER () - 1 AS v FROM customer)",
            """closed AS MATERIALIZED (
                SELECT src AS v, dst AS nbr FROM sym
                UNION ALL SELECT v, v FROM allv)""",
            "c0(nbr) AS (SELECT NULL::BIGINT WHERE FALSE)",
        ]
        for r in range(1, k + 1):
            parts.append(
                f"""g{r} AS (SELECT c.v, COUNT(*) AS gain FROM closed c
                    LEFT JOIN c{r - 1} cc ON cc.nbr = c.nbr
                    WHERE cc.nbr IS NULL GROUP BY c.v)"""
            )
            parts.append(
                f"p{r} AS (SELECT v, gain FROM g{r} ORDER BY gain DESC, v LIMIT 1)"
            )
            parts.append(
                f"""c{r} AS MATERIALIZED (SELECT nbr FROM c{r - 1}
                    UNION SELECT c.nbr FROM closed c JOIN p{r} USING (v))"""
            )
        sel = "\nUNION ALL ".join(
            f"SELECT {r} AS rank, v, gain FROM p{r}" for r in range(1, k + 1)
        )
        return ",\n".join(parts) + f"\nSELECT * FROM ({sel}) ORDER BY rank"

    group_degree_sql = (
        _group_degree_sql(4)
        .replace("{SYM}", SYMMETRIC_EDGES_SQL)
        .replace("{N}", n_customers)
    )

    # GroupCloseness greedy twin (groupcent.py normative semantics): pool =
    # top-degree candidates, multi-source BFS CTE, unreachable capped at n,
    # k unrolled argmin-farness rounds with ties to smallest candidate id.
    # d-cap 64 >> the sym derived graph's eccentricity (same note as
    # _pivot_bfs_sql).
    def _group_closeness_sql(k: int, pool: int) -> str:
        parts = [
            "WITH RECURSIVE se AS MATERIALIZED ({SYM})",
            "nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
            f"""cand AS MATERIALIZED (
                SELECT n.v FROM nodes n
                LEFT JOIN (SELECT src AS v, COUNT(*) AS deg FROM se GROUP BY src) dg
                  ON dg.v = n.v
                ORDER BY COALESCE(dg.deg, 0) DESC, n.v LIMIT {pool})""",
            """r(s, v, d) AS (
                SELECT v, v, CAST(0 AS BIGINT) FROM cand
                UNION
                SELECT r.s, e.dst, r.d + 1 FROM r JOIN se e ON e.src = r.v
                WHERE r.d < 64)""",
            "md AS (SELECT s, v, MIN(d) AS d FROM r GROUP BY s, v)",
            """dm AS MATERIALIZED (
                SELECT c.v AS s, n.v AS v, COALESCE(md.d, {N}) AS d
                FROM cand c CROSS JOIN nodes n
                LEFT JOIN md ON md.s = c.v AND md.v = n.v)""",
            "cur0 AS (SELECT v, CAST({N} AS BIGINT) AS d FROM nodes)",
        ]
        for r in range(1, k + 1):
            excl = ""
            if r > 1:
                sel = " UNION ".join(f"SELECT v FROM p{i}" for i in range(1, r))
                excl = f"WHERE dm.s NOT IN ({sel}) "
            parts.append(
                f"""t{r} AS (SELECT dm.s, SUM(LEAST(c.d, dm.d)) AS farness
                    FROM dm JOIN cur{r - 1} c ON c.v = dm.v {excl}GROUP BY dm.s)"""
            )
            parts.append(
                f"""p{r} AS (SELECT s AS v, CAST(farness AS BIGINT) AS farness
                    FROM t{r} ORDER BY farness, s LIMIT 1)"""
            )
            parts.append(
                f"""cur{r} AS MATERIALIZED (SELECT c.v, LEAST(c.d, dm.d) AS d
                    FROM cur{r - 1} c JOIN dm ON dm.v = c.v JOIN p{r} p ON dm.s = p.v)"""
            )
        sel = "\nUNION ALL ".join(
            f"SELECT {r} AS rank, v, farness FROM p{r}" for r in range(1, k + 1)
        )
        return ",\n".join(parts) + f"\nSELECT * FROM ({sel}) ORDER BY rank"

    group_closeness_sql = (
        _group_closeness_sql(3, 8)
        .replace("{SYM}", SYMMETRIC_EDGES_SQL)
        .replace("{N}", n_customers)
    )

    # GroupHarmonicCloseness twin: same unrolled greedy, objective
    # Σ 1/d (members and unreachable contribute 0), argmax with ties → v.
    def _group_harmonic_sql(k: int, pool: int) -> str:
        parts = [
            "WITH RECURSIVE se AS MATERIALIZED ({SYM})",
            "nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
            f"""cand AS MATERIALIZED (
                SELECT n.v FROM nodes n
                LEFT JOIN (SELECT src AS v, COUNT(*) AS deg FROM se GROUP BY src) dg
                  ON dg.v = n.v
                ORDER BY COALESCE(dg.deg, 0) DESC, n.v LIMIT {pool})""",
            """r(s, v, d) AS (
                SELECT v, v, CAST(0 AS BIGINT) FROM cand
                UNION
                SELECT r.s, e.dst, r.d + 1 FROM r JOIN se e ON e.src = r.v
                WHERE r.d < 64)""",
            "md AS (SELECT s, v, MIN(d) AS d FROM r GROUP BY s, v)",
            """dm AS MATERIALIZED (
                SELECT c.v AS s, n.v AS v, COALESCE(md.d, {N}) AS d
                FROM cand c CROSS JOIN nodes n
                LEFT JOIN md ON md.s = c.v AND md.v = n.v)""",
            "cur0 AS (SELECT v, CAST({N} AS BIGINT) AS d FROM nodes)",
        ]
        for r in range(1, k + 1):
            excl = ""
            if r > 1:
                sel = " UNION ".join(f"SELECT v FROM p{i}" for i in range(1, r))
                excl = f"WHERE dm.s NOT IN ({sel}) "
            parts.append(
                f"""t{r} AS (SELECT dm.s,
                    SUM(CASE WHEN LEAST(c.d, dm.d) > 0 AND LEAST(c.d, dm.d) < {{N}}
                             THEN 1.0 / LEAST(c.d, dm.d) ELSE 0 END) AS h
                    FROM dm JOIN cur{r - 1} c ON c.v = dm.v {excl}GROUP BY dm.s)"""
            )
            parts.append(
                f"""p{r} AS (SELECT s AS v, h FROM t{r} ORDER BY h DESC, s LIMIT 1)"""
            )
            parts.append(
                f"""cur{r} AS MATERIALIZED (SELECT c.v, LEAST(c.d, dm.d) AS d
                    FROM cur{r - 1} c JOIN dm ON dm.v = c.v JOIN p{r} p ON dm.s = p.v)"""
            )
        sel = "\nUNION ALL ".join(
            f"SELECT {r} AS rank, v, ROUND(h, 8) AS harmonic FROM p{r}"
            for r in range(1, k + 1)
        )
        return ",\n".join(parts) + f"\nSELECT * FROM ({sel}) ORDER BY rank"

    group_harmonic_sql = (
        _group_harmonic_sql(3, 8)
        .replace("{SYM}", SYMMETRIC_EDGES_SQL)
        .replace("{N}", n_customers)
    )

    # Exact diameter twin: full-APSP recursive BFS over the supplier ring
    # graph (|V| = S suppliers — small enough that all-sources expansion
    # is cheap; the customer graph would be 200× costlier).  d-cap 64 >
    # floor(S/2), the chordless-ring worst case at sf <= 0.01.
    from networkit_ray.sources.derive import SUPPLIER_RING_SQL

    diameter_sql = f"""
        WITH RECURSIVE base AS MATERIALIZED ({SUPPLIER_RING_SQL}),
        r(s, v, d) AS (
            SELECT src, src, CAST(0 AS BIGINT) FROM (SELECT DISTINCT src FROM base)
            UNION
            SELECT r.s, e.dst, r.d + 1 FROM r JOIN base e ON e.src = r.v
            WHERE r.d < 64
        )
        SELECT CAST(MAX(md) AS BIGINT) AS diameter
        FROM (SELECT s, v, MIN(d) AS md FROM r GROUP BY s, v)
    """


    # Algebraic-distance twin: same seeded multiplicative init and Jacobi
    # relaxation, T chained CTEs per system (algdist.py determinism note).
    def _algdist_sql(iters: int, systems: int) -> str:
        gold, m64 = "11400714819323198485", "18446744073709551616"
        parts = [
            "WITH se AS MATERIALIZED ({SYM})",
            "nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
            "dg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM se GROUP BY src)",
        ]
        for r in range(systems):
            parts.append(
                f"""x{r}_0 AS (SELECT v,
                    CAST((CAST(v + {1 + r} AS HUGEINT) * CAST('{gold}' AS HUGEINT))
                         % CAST('{m64}' AS HUGEINT) AS DOUBLE) / {m64}.0 AS x
                    FROM nodes)"""
            )
            for k in range(1, iters + 1):
                parts.append(
                    f"""x{r}_{k} AS MATERIALIZED (SELECT n.v,
                        CASE WHEN d.deg IS NULL THEN p.x
                             ELSE 0.5 * p.x + (0.5 * m.s) / d.deg END AS x
                        FROM nodes n
                        JOIN x{r}_{k-1} p ON p.v = n.v
                        LEFT JOIN dg d ON d.v = n.v
                        LEFT JOIN (SELECT e.dst AS v, SUM(p2.x) AS s
                                   FROM se e JOIN x{r}_{k-1} p2 ON p2.v = e.src
                                   GROUP BY e.dst) m ON m.v = n.v)"""
                )
        parts.append("ce AS (SELECT src, dst FROM se WHERE src < dst)")
        terms = " + ".join(
            f"ABS(a{r}.x - b{r}.x)" for r in range(systems)
        )
        joins = " ".join(
            f"JOIN x{r}_{iters} a{r} ON a{r}.v = ce.src "
            f"JOIN x{r}_{iters} b{r} ON b{r}.v = ce.dst"
            for r in range(systems)
        )
        return (
            ",\n".join(parts)
            + f"\nSELECT ce.src, ce.dst, ROUND({terms}, 8) AS ad FROM ce {joins}"
        )

    algdist_sql = _algdist_sql(10, 2).replace("{SYM}", SYMMETRIC_EDGES_SQL)

    # Personalized-PageRank twin: fixed-iteration power iteration with the
    # teleport vector on the seed set; (1.0 - 0.85) written as the engine
    # computes it so both sides use the identical float constant.
    def _ppr_sql(seeds: str, seed_frac: str, damp: float, iters: int) -> str:
        parts = [
            "WITH e AS MATERIALIZED ({EDGES})",
            "nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer)",
            "od AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src)",
            f"p0 AS (SELECT v, CASE WHEN v IN ({seeds}) THEN {seed_frac} ELSE 0.0 END AS x FROM nodes)",
        ]
        for k in range(1, iters + 1):
            parts.append(
                f"""p{k} AS MATERIALIZED (SELECT n.v,
                    (1.0 - {damp}) * (CASE WHEN n.v IN ({seeds}) THEN {seed_frac} ELSE 0.0 END)
                    + {damp} * COALESCE(m.inc, 0) AS x
                    FROM nodes n LEFT JOIN
                      (SELECT e.dst AS v, SUM(p.x / od.d) AS inc
                       FROM e JOIN p{k-1} p ON p.v = e.src JOIN od ON od.v = e.src
                       GROUP BY e.dst) m ON m.v = n.v)"""
            )
        return (
            ",\n".join(parts)
            + f"\nSELECT v, ROUND(x, 8) AS score FROM p{iters}"
        )

    ppr_sql = _ppr_sql("0, 1", "0.5", 0.85, PR_ITERS).replace(
        "{EDGES}", DERIVED_EDGES_SQL
    )

    # PageRankNibble twin: PPR on the sym graph → rank by ROUND(x/deg, 8)
    # (tie → v asc, capped at 256) → sweep conductance per prefix, argmin
    # with smallest-k tie-break.  cut/vol are integer-valued so the
    # conductance floats are bit-identical on both sides.
    nibble_ppr = _ppr_sql("0", "1.0", 0.85, PR_ITERS).replace(
        "{EDGES}", "{SYM}"
    )
    nibble_body = nibble_ppr.rsplit("\nSELECT", 1)[0]
    nibble_sql = (
        nibble_body
        + f""",
        sc AS (SELECT p.v, od.d AS deg, ROUND(p.x / od.d, 8) AS sd
               FROM p{PR_ITERS} p JOIN od ON od.v = p.v WHERE p.x > 0),
        rk AS (SELECT * FROM (
                 SELECT v, deg,
                        CAST(ROW_NUMBER() OVER (ORDER BY sd DESC, v ASC) - 1 AS BIGINT) AS r
                 FROM sc) WHERE r < 256),
        ce AS (SELECT src, dst FROM e WHERE src < dst),
        er AS (SELECT ra.r AS ru, rb.r AS rv FROM ce
               LEFT JOIN rk ra ON ra.v = ce.src
               LEFT JOIN rk rb ON rb.v = ce.dst),
        ks AS (SELECT r AS k FROM rk),
        cuts AS (SELECT ks.k,
            (SELECT COUNT(*) FROM er WHERE ru IS NOT NULL AND rv IS NOT NULL
                AND LEAST(ru, rv) <= ks.k)
          - (SELECT COUNT(*) FROM er WHERE ru IS NOT NULL AND rv IS NOT NULL
                AND GREATEST(ru, rv) <= ks.k)
          + (SELECT COUNT(*) FROM er WHERE (ru IS NULL) <> (rv IS NULL)
                AND COALESCE(ru, rv) <= ks.k) AS cut,
            (SELECT SUM(deg) FROM rk WHERE r <= ks.k) AS vol
          FROM ks),
        cond AS (SELECT k,
            CASE WHEN LEAST(vol, (SELECT COUNT(*) FROM e) - vol) > 0
                 THEN CAST(cut AS DOUBLE) / LEAST(vol, (SELECT COUNT(*) FROM e) - vol)
                 ELSE 1e308 END AS c
          FROM cuts),
        best AS (SELECT k FROM cond ORDER BY c ASC, k ASC LIMIT 1)
        SELECT v, r AS rank FROM rk WHERE r <= (SELECT k FROM best)
        """
    ).replace("{SYM}", SYMMETRIC_EDGES_SQL)

    cc_sql = f"""
        WITH RECURSIVE se AS ({SYMMETRIC_EDGES_SQL}),
        nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
        r(v, l) AS (
            SELECT v, v FROM nodes
            UNION
            SELECT e.dst, r.l FROM r JOIN se e ON e.src = r.v
        )
        SELECT v, MIN(l) AS label FROM r GROUP BY v
    """

    tri_corners = f"""
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM ({CANONICAL_EDGES_SQL}) e1
        JOIN ({CANONICAL_EDGES_SQL}) e2 ON e2.src = e1.dst
        JOIN ({CANONICAL_EDGES_SQL}) e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """
    deg_sql = f"""
        SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT src AS v FROM ({CANONICAL_EDGES_SQL})
            UNION ALL SELECT dst FROM ({CANONICAL_EDGES_SQL})
        ) GROUP BY v
    """
    tri_sql = f"""
        SELECT v, CAST(COUNT(*) AS BIGINT) AS tri FROM (
            SELECT a AS v FROM ({tri_corners})
            UNION ALL SELECT b FROM ({tri_corners})
            UNION ALL SELECT c FROM ({tri_corners})
        ) GROUP BY v
    """

    sql = {
        "edge_table": DERIVED_EDGES_SQL,
        "edge_table_sym": SYMMETRIC_EDGES_SQL,
        "degree_table": f"SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM ({DERIVED_EDGES_SQL}) GROUP BY src",
        "in_degree_table": f"SELECT dst AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM ({DERIVED_EDGES_SQL}) GROUP BY dst",
        "max_degree": f"SELECT MAX(deg) AS max_deg FROM (SELECT CAST(COUNT(*) AS BIGINT) AS deg FROM ({DERIVED_EDGES_SQL}) GROUP BY src)",
        "graph_stats": f"""
            SELECT {n_customers} AS n,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   ROUND(CAST(COUNT(*) AS DOUBLE) / ({n_customers} * ({n_customers} - 1)), 8) AS density,
                   CAST(COUNT(*) AS BIGINT) AS volume
            FROM ({DERIVED_EDGES_SQL})
        """,
        "transpose": f"SELECT dst AS src, src AS dst FROM ({DERIVED_EDGES_SQL})",
        "subgraph": f"SELECT src, dst FROM ({DERIVED_EDGES_SQL}) WHERE src < {n_customers} // 2 AND dst < {n_customers} // 2",
        "compact_ids": f"""
            SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS BIGINT) AS idx FROM (
                SELECT DISTINCT src AS v FROM ({DERIVED_EDGES_SQL})
                UNION SELECT DISTINCT dst FROM ({DERIVED_EDGES_SQL})
            )
        """,
        "pagerank": pr,
        "pagerank_topk": f"""
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, v ASC) AS BIGINT) AS rank, v, score
            FROM ({pr}) QUALIFY rank <= 10
        """,
        "connected_components": cc_sql,
        "scc": f"""
            WITH RECURSIVE e AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            r(s, d) AS (
                SELECT v, v FROM nodes
                UNION
                SELECT r.s, e.dst FROM r JOIN e ON e.src = r.d
            )
            -- r = forward reachability closure; SCC label = min mutually
            -- reachable id
            SELECT a.s AS v, MIN(a.d) AS label
            FROM r a JOIN r b ON b.s = a.d AND b.d = a.s
            GROUP BY a.s
        """,
        "wcc": cc_sql,
        "incremental_cc": cc_sql,
        "plp_communities": _plp_sql(25).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "core_decomposition": _kcore_sql(32).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "betweenness_pivots": _betweenness_sql(24).replace("{EDGES}", DERIVED_EDGES_SQL),
        # estimate_betweenness with the hash-rank pivot rule (seed 7)
        "betweenness": _betweenness_sql(
            24,
            piv_sql=(
                "SELECT v AS s FROM nodes ORDER BY "
                + _mul64_sql("(v + 7)", 0x9E3779B97F4A7C15)
                + " LIMIT 16"
            ),
        ).replace("{EDGES}", DERIVED_EDGES_SQL),
        # adaptive (Kadabra-style) betweenness with the hash-rank sampler:
        # budget, per-round draws, and the eps/2 stability stop all replayed
        "adaptive_betweenness": _adaptive_betweenness_sql(24).replace(
            "{EDGES}", DERIVED_EDGES_SQL
        ),
        "warm_pagerank": _warm_pagerank_sql(PR_ITERS, WARM_ITERS).replace(
            "{EDGES}", DERIVED_EDGES_SQL
        ),
        "warm_katz": _warm_katz_sql(20, WARM_ITERS, 0.05, 1.0).replace(
            "{EDGES}", DERIVED_EDGES_SQL
        ),
        "ged_walk": _gedwalk_sql(3, 5, 8).replace("{EDGES}", DERIVED_EDGES_SQL),
        "maximal_cliques": _maxclique_sql(16).replace("{CANON}", CANONICAL_EDGES_SQL),
        "biconnected_components": _biconnected_sql(24).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "gce_community": _gce_sql((0, 7), 3, 50).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "localt_community": _localt_sql((0, 7), 3, 40).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "clique_detect": _cliquedetect_sql((0, 7), 12).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "combined_scd": _gce_sql((0, 7), 3, 50, clique_init=12).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "two_phase_l": _twophasel_sql((0, 7), 3, 50).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "tce_community": _scd_popadd_sql((0, 7), 3, 50, "tce").replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "lte_community": _scd_popadd_sql((0, 7), 3, 50, "lte").replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "lfm_community": _lfm_sql((0, 7), 3, 50).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "max_flow": _maxflow_sql().replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "cut_clustering": _cutcluster_sql().replace("{RING}", SUPPLIER_RING_SQL),
        "lfm_cover": _lfm_cover_sql().replace("{RING}", SUPPLIER_RING_SQL),
        "sgns_embeddings": _sgns_sql().replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "lfr_edges": _lfr_edges_sql(),
        "lfr_mixing": _lfr_mixing_sql(),
        "ego_splitting": _egosplit_sql()
        .replace("{CANON}", CANONICAL_EDGES_SQL)
        .replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "louvain": _louvain_sql().replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "louvain_modularity": _louvain_modularity_sql()
        .replace("{CANON}", CANONICAL_EDGES_SQL)
        .replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "leiden_refine": _leiden_refine_sql().replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "approx_global_clustering": _agcc_sql(4000, 42).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        # dyn_betweenness repaired == from-scratch Brandes on base + the 8
        # smallest held-out edges, with the multiplicative-hash pivot rule
        # (closeness._pivots: 16 smallest (v+42)*GOLD ranks)
        "dyn_betweenness": _betweenness_sql(
            28,
            piv_sql=(
                "SELECT v AS s FROM nodes ORDER BY "
                + _mul64_sql("(v + 42)", 0x9E3779B97F4A7C15)
                + " LIMIT 16"
            ),
        ).replace(
            "{EDGES}",
            f"""
            SELECT src, dst FROM ({DERIVED_EDGES_SQL}) WHERE (src*31 + dst) % 97 <> 0
            UNION ALL
            SELECT src, dst FROM (
                SELECT src, dst FROM ({DERIVED_EDGES_SQL})
                WHERE (src*31 + dst) % 97 = 0 ORDER BY src, dst LIMIT 8)
            """,
        ),
        "rmat_edges": _rmat_sql(10, 8),
        "er_edges": _er_sql(1024, 4096),
        "watts_strogatz_edges": _ws_sql(1024, 4, 0.1),
        "chung_lu_edges": _chung_lu_sql(1024),
        "node2vec_walks": _n2v_sql().replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "greedy_coloring": _coloring_sql(64).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "hop_plot": _hop_plot_sql(24).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "effective_diameter": _effective_diameter_sql(24).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "approx_distinct_users": _fm_distinct_sql(),
        "lp_degree_ordered": _lpdo_sql(25).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "barabasi_albert": _ba_sql(1024, 4),
        "k_path_centrality": _kpath_sql(5).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "spanning_forest": _forest_sql(12).replace("{CANON}", CANONICAL_EDGES_SQL),
        "forest_fire_scores": _ff_sql(24).replace("{CANON}", CANONICAL_EDGES_SQL),
        "cc_sizes": f"SELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM ({cc_sql}) GROUP BY label",
        "num_components": f"SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS n_components FROM ({cc_sql})",
        "modularity": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 10 AS BIGINT) AS label FROM customer),
            m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM ce),
            intra AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM ce JOIN lab l1 ON l1.v = ce.src JOIN lab l2 ON l2.v = ce.dst WHERE l1.label = l2.label),
            deg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS deg FROM (SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v),
            vols AS (SELECT l.label, SUM(d.deg) AS vol FROM deg d JOIN lab l ON l.v = d.v GROUP BY l.label)
            SELECT ROUND((SELECT c FROM intra) / (SELECT m FROM m) - SUM(POWER(vol / (2 * (SELECT m FROM m)), 2)), 8) AS modularity
            FROM vols
        """,
        "coverage": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 10 AS BIGINT) AS label FROM customer)
            SELECT ROUND(
              CAST(SUM(CASE WHEN l1.label = l2.label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 8) AS coverage
            FROM ce JOIN lab l1 ON l1.v = ce.src JOIN lab l2 ON l2.v = ce.dst
        """,
        "edge_cut": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 10 AS BIGINT) AS label FROM customer)
            SELECT CAST(SUM(CASE WHEN l1.label <> l2.label THEN 1 ELSE 0 END) AS BIGINT) AS edge_cut
            FROM ce JOIN lab l1 ON l1.v = ce.src JOIN lab l2 ON l2.v = ce.dst
        """,
        "conductance": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 10 AS BIGINT) AS label FROM customer),
            m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM ce),
            el AS (SELECT l1.label AS ls, l2.label AS ld FROM ce JOIN lab l1 ON l1.v = ce.src JOIN lab l2 ON l2.v = ce.dst),
            cuts AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS cut FROM (
                SELECT ls AS label FROM el WHERE ls <> ld
                UNION ALL SELECT ld FROM el WHERE ls <> ld) GROUP BY label),
            deg AS (SELECT v, COUNT(*) AS deg FROM (SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v),
            vols AS (SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS vol FROM deg d JOIN lab l ON l.v = d.v GROUP BY l.label)
            SELECT v.label, COALESCE(c.cut, 0) AS cut, v.vol,
                   ROUND(CASE WHEN LEAST(CAST(v.vol AS DOUBLE), 2 * (SELECT m FROM m) - v.vol) > 0
                         THEN COALESCE(c.cut, 0) / LEAST(CAST(v.vol AS DOUBLE), 2 * (SELECT m FROM m) - v.vol)
                         ELSE 0.0 END, 8) AS conductance
            FROM vols v LEFT JOIN cuts c ON c.label = v.label ORDER BY v.label
        """,
        "nmi": f"""
            WITH lab AS (SELECT CAST(c_custkey % 10 AS BIGINT) AS l1, CAST(c_custkey % 7 AS BIGINT) AS l2 FROM customer),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
            cells AS (SELECT l1, l2, CAST(COUNT(*) AS DOUBLE) AS nij FROM lab GROUP BY l1, l2),
            am AS (SELECT l1, SUM(nij) AS a FROM cells GROUP BY l1),
            bm AS (SELECT l2, SUM(nij) AS b FROM cells GROUP BY l2),
            info AS (SELECT SUM((c.nij / (SELECT n FROM n)) * LN(c.nij * (SELECT n FROM n) / (am.a * bm.b))) AS i
                     FROM cells c JOIN am ON am.l1 = c.l1 JOIN bm ON bm.l2 = c.l2),
            h1 AS (SELECT -SUM((a / (SELECT n FROM n)) * LN(a / (SELECT n FROM n))) AS h FROM am),
            h2 AS (SELECT -SUM((b / (SELECT n FROM n)) * LN(b / (SELECT n FROM n))) AS h FROM bm)
            SELECT ROUND(2 * (SELECT i FROM info) / ((SELECT h FROM h1) + (SELECT h FROM h2)), 8) AS nmi
        """,
        "ari": f"""
            WITH lab AS (SELECT CAST(c_custkey % 10 AS BIGINT) AS l1, CAST(c_custkey % 7 AS BIGINT) AS l2 FROM customer),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
            cells AS (SELECT l1, l2, CAST(COUNT(*) AS DOUBLE) AS nij FROM lab GROUP BY l1, l2),
            s_ij AS (SELECT SUM(nij * (nij - 1) / 2) AS s FROM cells),
            s_a AS (SELECT SUM(a * (a - 1) / 2) AS s FROM (SELECT SUM(nij) AS a FROM cells GROUP BY l1)),
            s_b AS (SELECT SUM(b * (b - 1) / 2) AS s FROM (SELECT SUM(nij) AS b FROM cells GROUP BY l2)),
            c2n AS (SELECT n * (n - 1) / 2 AS c FROM n)
            SELECT ROUND(((SELECT s FROM s_ij) - (SELECT s FROM s_a) * (SELECT s FROM s_b) / (SELECT c FROM c2n))
                 / (0.5 * ((SELECT s FROM s_a) + (SELECT s FROM s_b)) - (SELECT s FROM s_a) * (SELECT s FROM s_b) / (SELECT c FROM c2n)), 8) AS ari
        """,
        # RegularRingLatticeGenerator twin: i ↔ (i+j) mod n, j = 1..3.
        "ring_lattice": """
            WITH nn AS (SELECT COUNT(*) AS n FROM customer),
            i AS (SELECT CAST(c_custkey AS BIGINT) AS i FROM customer),
            j AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(j))
            SELECT LEAST(i, (i + j) % (SELECT n FROM nn)) AS src,
                   GREATEST(i, (i + j) % (SELECT n FROM nn)) AS dst
            FROM i, j
            ORDER BY src, dst
        """,
        # StochasticBlockmodel twin: pair (u,v), u<v, kept when
        # splitmix64(u·n + v + 42·FNV) < p·2⁶⁴, p by block (u%10 vs v%10).
        "sbm_edges": f"""
            WITH nn AS (SELECT LEAST(COUNT(*), 2000) AS n FROM customer),
            ids AS (SELECT CAST(c_custkey AS BIGINT) AS i FROM customer
                    WHERE c_custkey < (SELECT n FROM nn)),
            pairs AS (
                SELECT a.i AS u, b.i AS v
                FROM ids a, ids b
                WHERE a.i < b.i),
            coin AS (
                SELECT u, v,
                       CAST({_sm64_sql("CAST(u AS HUGEINT) * (SELECT n FROM nn) + v + 46179488384862")} AS HUGEINT) AS h
                FROM pairs)
            SELECT u AS src, v AS dst FROM coin
            WHERE h < CASE WHEN u % 10 = v % 10
                           THEN {int(0.05 * 2**64)} ELSE {int(0.005 * 2**64)} END
            ORDER BY src, dst
        """,
        # HavelHakimiGenerator invariant twin: the realized degree table
        # equals the input sequence v%4+1 exactly.
        "havel_hakimi_degrees": """
            SELECT CAST(c_custkey AS BIGINT) AS v,
                   CAST(c_custkey % 4 + 1 AS BIGINT) AS deg
            FROM customer ORDER BY v
        """,
        # DorogovtsevMendes invariant twin: every node appears and
        # m = 3 + 2(n−3) exactly.
        "dorogovtsev_mendes": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(3 + 2 * (COUNT(*) - 3) AS BIGINT) AS n_edges
            FROM customer
        """,
        # CoverF1Similarity twin: best 2·ol/(|C_i|+|R_s|) per cover cluster.
        "cover_f1": """
            WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 5 AS BIGINT) AS c FROM customer
                       UNION ALL SELECT c_custkey, 5 + c_custkey % 7 FROM customer WHERE c_custkey % 3 = 0),
            r AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 6 AS BIGINT) AS s FROM customer
                  UNION ALL SELECT c_custkey, 6 + c_custkey % 5 FROM customer WHERE c_custkey % 4 = 0),
            cells AS (SELECT c.c, r.s, CAST(COUNT(*) AS DOUBLE) AS ol
                      FROM c JOIN r ON r.v = c.v GROUP BY c.c, r.s),
            a AS (SELECT c, CAST(COUNT(*) AS DOUBLE) AS a FROM c GROUP BY c),
            b AS (SELECT s, CAST(COUNT(*) AS DOUBLE) AS b FROM r GROUP BY s),
            best AS (SELECT cells.c, MAX(2 * ol / (a.a + b.b)) AS f1
                     FROM cells JOIN a ON a.c = cells.c JOIN b ON b.s = cells.s
                     GROUP BY cells.c)
            SELECT a.c, ROUND(COALESCE(best.f1, 0), 8) AS f1
            FROM a LEFT JOIN best ON best.c = a.c ORDER BY a.c
        """,
        # CoverHubDominance twin: max member internal degree / (|c|−1);
        # singletons 1.
        "cover_hub_dominance": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            bi AS (SELECT src AS u, dst AS nbr FROM ce
                   UNION ALL SELECT dst, src FROM ce),
            c AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 5 AS BIGINT) AS c FROM customer
                  UNION ALL SELECT c_custkey, 5 + c_custkey % 7 FROM customer WHERE c_custkey % 3 = 0),
            internal AS (SELECT cu.c, bi.u
                         FROM bi JOIN c cu ON cu.v = bi.u
                         WHERE EXISTS (SELECT 1 FROM c cn
                                       WHERE cn.v = bi.nbr AND cn.c = cu.c)),
            per AS (SELECT c, u, CAST(COUNT(*) AS DOUBLE) AS ideg
                    FROM internal GROUP BY c, u),
            md AS (SELECT c, MAX(ideg) AS maxdeg FROM per GROUP BY c),
            sizes AS (SELECT c, CAST(COUNT(*) AS DOUBLE) AS size FROM c GROUP BY c)
            SELECT s.c,
                   ROUND(CASE WHEN s.size > 1
                              THEN COALESCE(md.maxdeg, 0) / (s.size - 1)
                              ELSE 1.0 END, 8) AS dominance
            FROM sizes s LEFT JOIN md ON md.c = s.c ORDER BY s.c
        """,
        "overlapping_nmi": _onmi_sql(),
        # HashingOverlapper twin: splitmix64 of the combined key, dense
        # ranks ordered by hash value.
        "hashing_overlapper": f"""
            WITH lab AS (SELECT CAST(c_custkey AS BIGINT) AS v,
                                CAST(c_custkey % 6 AS BIGINT) AS l1,
                                CAST(c_custkey % 4 AS BIGINT) AS l2
                         FROM customer),
            hashed AS (SELECT v,
                CAST(CAST({_sm64_sql("CAST(xor(l1, 65535) * 65536 + xor(l2, 65535) AS HUGEINT)")} AS HUGEINT)
                     % 9223372036854775808 AS BIGINT) AS h
                FROM lab)
            SELECT v, CAST(DENSE_RANK() OVER (ORDER BY h) - 1 AS BIGINT) AS label
            FROM hashed ORDER BY v
        """,
        # JaccardMeasure twin: 1 − 2·s11/(n(n−1) − 2·s00) via c2 sums of the
        # partition-intersection cells and both marginals.
        "jaccard_measure": """
            WITH lab AS (SELECT CAST(c_custkey % 10 AS BIGINT) AS l1, CAST(c_custkey % 7 AS BIGINT) AS l2 FROM customer),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
            cells AS (SELECT l1, l2, CAST(COUNT(*) AS DOUBLE) AS nij FROM lab GROUP BY l1, l2),
            si AS (SELECT SUM(nij * (nij - 1) / 2) AS s FROM cells),
            sz AS (SELECT SUM(a * (a - 1) / 2) AS s FROM (SELECT SUM(nij) AS a FROM cells GROUP BY l1)),
            se AS (SELECT SUM(b * (b - 1) / 2) AS s FROM (SELECT SUM(nij) AS b FROM cells GROUP BY l2)),
            s00 AS (SELECT (SELECT n FROM n) * ((SELECT n FROM n) - 1) / 2
                         + (SELECT s FROM si) - (SELECT s FROM sz) - (SELECT s FROM se) AS s)
            SELECT ROUND(CASE WHEN (SELECT n FROM n) * ((SELECT n FROM n) - 1) - 2 * (SELECT s FROM s00) > 0
                THEN 1.0 - 2 * (SELECT s FROM si)
                     / ((SELECT n FROM n) * ((SELECT n FROM n) - 1) - 2 * (SELECT s FROM s00))
                ELSE 0.0 END, 8) AS jaccard_dissimilarity
        """,
        # NodeStructuralRandMeasure twin: 1 − 2A/(n(n−1)),
        # A = n(n−1)/2 + 2·Σc2(cells) − Σc2(zeta) − Σc2(eta).
        "node_rand": """
            WITH lab AS (SELECT CAST(c_custkey % 10 AS BIGINT) AS l1, CAST(c_custkey % 7 AS BIGINT) AS l2 FROM customer),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
            cells AS (SELECT l1, l2, CAST(COUNT(*) AS DOUBLE) AS nij FROM lab GROUP BY l1, l2),
            si AS (SELECT SUM(nij * (nij - 1) / 2) AS s FROM cells),
            sz AS (SELECT SUM(a * (a - 1) / 2) AS s FROM (SELECT SUM(nij) AS a FROM cells GROUP BY l1)),
            se AS (SELECT SUM(b * (b - 1) / 2) AS s FROM (SELECT SUM(nij) AS b FROM cells GROUP BY l2)),
            a AS (SELECT (SELECT n FROM n) * ((SELECT n FROM n) - 1) / 2
                       + 2 * (SELECT s FROM si) - (SELECT s FROM sz) - (SELECT s FROM se) AS a)
            SELECT ROUND(1.0 - 2 * (SELECT a FROM a)
                         / ((SELECT n FROM n) * ((SELECT n FROM n) - 1)), 8) AS node_rand
        """,
        # GraphStructuralRandMeasure twin: 1 − (e11 + e00)/m over undirected
        # (canonical) edges.
        "graph_rand": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v,
                           CAST(c_custkey % 10 AS BIGINT) AS l1,
                           CAST(c_custkey % 7 AS BIGINT) AS l2 FROM customer),
            el AS (SELECT a.l1 AS l1s, a.l2 AS l2s, b.l1 AS l1d, b.l2 AS l2d
                   FROM ce JOIN lab a ON a.v = ce.src JOIN lab b ON b.v = ce.dst)
            SELECT ROUND(1.0 - SUM(CASE WHEN l1s = l1d AND l2s = l2d THEN 1
                                        WHEN l1s <> l1d AND l2s <> l2d THEN 1
                                        ELSE 0 END) * 1.0 / COUNT(*), 8) AS graph_rand
            FROM el
        """,
        # PartitionFragmentation twin: per cluster of the %6 partition,
        # 1 − (largest CC piece)/(cluster size) using the hash-min CC labels.
        "partition_fragmentation": f"""
            WITH cc AS ({cc_sql}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v,
                           CAST(c_custkey % 6 AS BIGINT) AS label FROM customer),
            cells AS (SELECT lab.label, cc.label AS c, CAST(COUNT(*) AS DOUBLE) AS n
                      FROM lab JOIN cc ON cc.v = lab.v GROUP BY lab.label, cc.label),
            per AS (SELECT label, MAX(n) AS big, SUM(n) AS size FROM cells GROUP BY label)
            SELECT label, ROUND(1.0 - big / size, 8) AS fragmentation
            FROM per ORDER BY label
        """,
        # IsolatedInterpartitionExpansion twin: cut(C)/min(|C|, n−|C|) per
        # cluster, 0 for a whole-graph cluster.
        "expansion": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v,
                           CAST(c_custkey % 10 AS BIGINT) AS label FROM customer),
            nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
            el AS (SELECT l1.label AS ls, l2.label AS ld
                   FROM ce JOIN lab l1 ON l1.v = ce.src JOIN lab l2 ON l2.v = ce.dst),
            cuts AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS cut FROM (
                SELECT ls AS label FROM el WHERE ls <> ld
                UNION ALL SELECT ld FROM el WHERE ls <> ld) GROUP BY label),
            sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM lab GROUP BY label)
            SELECT s.label, COALESCE(c.cut, 0) AS cut, s.size,
                   ROUND(CASE WHEN LEAST(s.size * 1.0, (SELECT n FROM nn) - s.size) > 0
                         THEN COALESCE(c.cut, 0)
                              / LEAST(s.size * 1.0, (SELECT n FROM nn) - s.size)
                         ELSE 0.0 END, 8) AS expansion
            FROM sizes s LEFT JOIN cuts c ON c.label = s.label
            ORDER BY s.label
        """,
        "triangle_count": f"SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM ({tri_corners})",
        "triangles_per_vertex": tri_sql,
        "lcc": f"""
            SELECT d.v, d.deg, CAST(COALESCE(t.tri, 0) AS BIGINT) AS tri,
                   CASE WHEN d.deg >= 2
                        THEN ROUND(2.0 * COALESCE(t.tri, 0) / (d.deg * (d.deg - 1.0)), 8)
                        ELSE 0.0 END AS lcc
            FROM ({deg_sql}) d LEFT JOIN ({tri_sql}) t ON t.v = d.v
        """,
        "jaccard_edge_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            dg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS deg FROM (
                SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v)
            SELECT ce.src, ce.dst,
                   ROUND(CASE WHEN du.deg + dv.deg - 2 - COALESCE(cnt.tri, 0) > 0
                              THEN COALESCE(cnt.tri, 0) / (du.deg + dv.deg - 2 - COALESCE(cnt.tri, 0))
                              ELSE 1.0 END, 8) AS jaccard
            FROM ce JOIN dg du ON du.v = ce.src JOIN dg dv ON dv.v = ce.dst
            LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst
        """,
        # EdgeScoreBlender twin: 0.25·tri + 0.75·jaccard (unrounded inputs).
        "blended_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            dg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS deg FROM (
                SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v)
            SELECT ce.src, ce.dst,
                   ROUND(0.25 * COALESCE(cnt.tri, 0)
                       + 0.75 * CASE WHEN du.deg + dv.deg - 2 - COALESCE(cnt.tri, 0) > 0
                                     THEN COALESCE(cnt.tri, 0) / (du.deg + dv.deg - 2 - COALESCE(cnt.tri, 0))
                                     ELSE 1.0 END, 8) AS blend_score
            FROM ce JOIN dg du ON du.v = ce.src JOIN dg dv ON dv.v = ce.dst
            LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst
            ORDER BY ce.src, ce.dst
        """,
        # EdgeScoreAsWeight twin: w = 1 + 0.5·tri, then weighted degrees.
        "score_as_weight": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            w AS (SELECT ce.src, ce.dst,
                         1.0 + 0.5 * COALESCE(cnt.tri, 0) AS w
                  FROM ce LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst)
            SELECT v, ROUND(SUM(w), 8) AS wdeg FROM (
                SELECT src AS v, w FROM w UNION ALL SELECT dst, w FROM w)
            GROUP BY v ORDER BY v
        """,
        "hub_dominance": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            lab AS (SELECT v, v % 10 AS label FROM nodes),
            intra AS (SELECT ce.src, ce.dst, la.label FROM ce
                      JOIN lab la ON la.v = ce.src JOIN lab lb ON lb.v = ce.dst
                      WHERE la.label = lb.label),
            indeg AS (SELECT label, v, COUNT(*) AS d FROM (
                SELECT label, src AS v FROM intra
                UNION ALL SELECT label, dst FROM intra) GROUP BY label, v),
            md AS (SELECT label, MAX(d) AS maxd FROM indeg GROUP BY label),
            sz AS (SELECT label, CAST(COUNT(*) AS DOUBLE) AS size FROM lab GROUP BY label)
            SELECT sz.label,
                   ROUND(CASE WHEN sz.size > 1
                              THEN COALESCE(md.maxd, 0) / (sz.size - 1)
                              ELSE 1.0 END, 8) AS hub_dominance
            FROM sz LEFT JOIN md ON md.label = sz.label
            ORDER BY sz.label
        """,
        "intrapartition_density": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            lab AS (SELECT v, v % 10 AS label FROM nodes),
            intra AS (SELECT la.label, COUNT(*) AS m_in FROM ce
                      JOIN lab la ON la.v = ce.src JOIN lab lb ON lb.v = ce.dst
                      WHERE la.label = lb.label GROUP BY la.label),
            sz AS (SELECT label, CAST(COUNT(*) AS DOUBLE) AS size FROM lab GROUP BY label)
            SELECT sz.label,
                   ROUND(CASE WHEN sz.size > 1
                              THEN COALESCE(intra.m_in, 0) / (sz.size * (sz.size - 1) / 2)
                              ELSE 1.0 END, 8) AS density
            FROM sz LEFT JOIN intra ON intra.label = sz.label
            ORDER BY sz.label
        """,
        "k_truss": ktruss_sql,
        "group_degree": group_degree_sql,
        "group_closeness": group_closeness_sql,
        "group_harmonic_closeness": group_harmonic_sql,
        "diameter": diameter_sql,
        "harmonic_closeness_exact": f"""
            WITH RECURSIVE base AS MATERIALIZED ({{SUPPLIER_RING_SQL}}),
            sup AS (SELECT CAST(s_suppkey AS BIGINT) AS v FROM supplier),
            r(s, v, d) AS (
                SELECT v, v, CAST(0 AS BIGINT) FROM sup
                UNION
                SELECT r.s, e.dst, r.d + 1 FROM r JOIN base e ON e.src = r.v
                WHERE r.d < 64
            ),
            md AS (SELECT s, v, MIN(d) AS d FROM r GROUP BY s, v),
            h AS (SELECT v, SUM(1.0 / d) AS h, SUM(d) AS t
                  FROM md WHERE d > 0 GROUP BY v)
            SELECT sup.v, ROUND(COALESCE(h.h, 0), 8) AS harmonic,
                   ROUND(CASE WHEN COALESCE(h.t, 0) > 0
                         THEN ((SELECT COUNT(*) FROM supplier) - 1) * 1.0 / h.t
                         ELSE 0 END, 8) AS closeness
            FROM sup LEFT JOIN h ON h.v = sup.v
            ORDER BY sup.v
        """.replace("{SUPPLIER_RING_SQL}", SUPPLIER_RING_SQL),
        # Sfigality (centrality/Sfigality.cpp:18-29): fraction of neighbors
        # with strictly larger degree; 0.0 for isolated (engine convention).
        "sfigality": f"""
            WITH sym AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            allv AS (SELECT ROW_NUMBER() OVER () - 1 AS v FROM customer),
            deg AS (SELECT src AS v, COUNT(*) AS deg FROM sym GROUP BY src),
            hi AS (SELECT e.src AS v,
                          SUM(CASE WHEN du.deg < dv.deg THEN 1 ELSE 0 END) AS s
                   FROM sym e
                   JOIN deg du ON du.v = e.src
                   JOIN deg dv ON dv.v = e.dst
                   GROUP BY e.src)
            SELECT a.v,
                   ROUND(COALESCE(CAST(h.s AS DOUBLE) / d.deg, 0.0), 8) AS sfigality
            FROM allv a
            LEFT JOIN deg d ON d.v = a.v
            LEFT JOIN hi h ON h.v = a.v
            ORDER BY a.v
        """,
        # Unweighted Laplacian centrality (LaplacianCentrality.cpp:17-45):
        # LC(u) = d_u^2 + d_u + 2*sum_{v in N(u)} d_v (unnormalized).
        "laplacian_centrality": f"""
            WITH sym AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            allv AS (SELECT ROW_NUMBER() OVER () - 1 AS v FROM customer),
            deg AS (SELECT src AS v, COUNT(*) AS deg FROM sym GROUP BY src),
            nd AS (SELECT e.src AS v, SUM(dv.deg) AS s
                   FROM sym e JOIN deg dv ON dv.v = e.dst GROUP BY e.src)
            SELECT a.v,
                   CAST(COALESCE(d.deg * d.deg + d.deg + 2 * n.s, 0) AS DOUBLE) AS lc
            FROM allv a
            LEFT JOIN deg d ON d.v = a.v
            LEFT JOIN nd n ON n.v = a.v
            ORDER BY a.v
        """,
        # PermanenceCentrality.cpp:113-160 with the synthetic v%10 partition;
        # intra-community triangles enumerated a<b<c on the canonical table,
        # perm(isolated) = -1.0 (vertexmeasures.py convention).
        "permanence": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            sym AS (SELECT src, dst FROM ce UNION ALL SELECT dst, src FROM ce),
            allv AS (SELECT ROW_NUMBER() OVER () - 1 AS v FROM customer),
            deg AS (SELECT src AS v, COUNT(*) AS deg FROM sym GROUP BY src),
            str AS (SELECT src AS v, dst % 10 AS lv, COUNT(*) AS cnt
                    FROM sym GROUP BY src, dst % 10),
            agg AS (SELECT v,
                      SUM(CASE WHEN lv = v % 10 THEN cnt ELSE 0 END) AS i,
                      MAX(CASE WHEN lv <> v % 10 THEN cnt ELSE 0 END) AS emax
                    FROM str GROUP BY v),
            intra AS MATERIALIZED (
                SELECT src, dst FROM ce WHERE src % 10 = dst % 10),
            tr AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM intra e1
                   JOIN intra e2 ON e2.src = e1.dst
                   JOIN intra e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            tric AS (SELECT v, COUNT(*) AS tri FROM (
                       SELECT a AS v FROM tr
                       UNION ALL SELECT b FROM tr
                       UNION ALL SELECT c FROM tr) GROUP BY v)
            SELECT a.v,
                   ROUND(CASE WHEN COALESCE(d.deg, 0) = 0 THEN -1.0
                         ELSE CAST(COALESCE(g.i, 0) AS DOUBLE)
                              / GREATEST(COALESCE(g.emax, 0), 1) / d.deg
                              - (1.0 - CASE WHEN COALESCE(g.i, 0) >= 2
                                 THEN 2.0 * COALESCE(tc.tri, 0)
                                      / (g.i * (g.i - 1.0))
                                 ELSE 0.0 END)
                         END, 8) AS permanence
            FROM allv a
            LEFT JOIN deg d ON d.v = a.v
            LEFT JOIN agg g ON g.v = a.v
            LEFT JOIN tric tc ON tc.v = a.v
            ORDER BY a.v
        """,
        # LocalPartitionCoverage.cpp:13-28 with the synthetic v%10 partition:
        # fraction of incident edges whose other endpoint shares u's label.
        "local_partition_coverage": f"""
            WITH sym AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            allv AS (SELECT ROW_NUMBER() OVER () - 1 AS v FROM customer),
            deg AS (SELECT src AS v, COUNT(*) AS deg FROM sym GROUP BY src),
            same AS (SELECT e.src AS v,
                            SUM(CASE WHEN e.src % 10 = e.dst % 10 THEN 1 ELSE 0 END) AS s
                     FROM sym e GROUP BY e.src)
            SELECT a.v,
                   ROUND(COALESCE(CAST(sm.s AS DOUBLE) / d.deg, 0.0), 8) AS lpc
            FROM allv a
            LEFT JOIN deg d ON d.v = a.v
            LEFT JOIN same sm ON sm.v = a.v
            ORDER BY a.v
        """,
        # 4-cliques by id-order: a<b<c<d with all 6 canonical edges present
        "clique_counts": f"""
            WITH e AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            k3 AS (SELECT COUNT(*) AS c FROM e e1
                JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
                JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
            k4 AS (SELECT COUNT(*) AS c FROM e e1
                JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
                JOIN e e3 ON e3.src = e1.src AND e3.dst > e2.dst
                JOIN e e4 ON e4.src = e1.dst AND e4.dst = e2.dst
                JOIN e e5 ON e5.src = e1.dst AND e5.dst = e3.dst
                JOIN e e6 ON e6.src = e2.dst AND e6.dst = e3.dst)
            SELECT k3.c AS k3, k4.c AS k4 FROM k3, k4
        """,
        "local_max_matching": matching_sql,
        "suitor_matching": suitor_sql,
        # one unrolled round per vertex removal on the 96-cap subgraph
        "path_growing_matching": _pgm_sql(96, 100).replace(
            "{CANON}", CANONICAL_EDGES_SQL
        ),
        # 4 coarsening levels x 4 handshake rounds, bit-exact dq scores
        "agglomerative_communities": _agglomerative_sql(4, 4).replace(
            "{CANON}", CANONICAL_EDGES_SQL
        ),
        "seir": seir_sql,
        # Degree preservation is the edge-switching invariant: the switched
        # graph's degree table must EQUAL the original's (randomize.py).
        "edge_switch_degrees": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            ends AS (SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce)
            SELECT v, COUNT(*) AS deg FROM ends GROUP BY v ORDER BY v
        """,
        "luby_mis": mis_sql,
        "reciprocity": f"""
            WITH e AS MATERIALIZED ({DERIVED_EDGES_SQL})
            SELECT ROUND(
              (SELECT CAST(COUNT(*) AS DOUBLE) FROM e
               WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src))
              / (SELECT COUNT(*) FROM e), 8) AS reciprocity
        """,
        "degree_histogram": f"""
            SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
              SELECT CAST(COUNT(*) AS BIGINT) AS deg
              FROM ({DERIVED_EDGES_SQL}) GROUP BY src
            ) GROUP BY deg ORDER BY deg
        """,
        "assortativity": f"""
            WITH se AS ({SYMMETRIC_EDGES_SQL}),
            deg AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS deg FROM se GROUP BY src)
            SELECT ROUND(corr(d1.deg, d2.deg), 8) AS assortativity
            FROM se JOIN deg d1 ON d1.v = se.src JOIN deg d2 ON d2.v = se.dst
        """,
        "partition_intersection": f"""
            WITH pairs AS (
                SELECT CAST(c_custkey AS BIGINT) AS v,
                       CAST(c_custkey % 6 AS BIGINT) AS l1,
                       CAST(c_custkey % 4 AS BIGINT) AS l2
                FROM customer)
            SELECT v, CAST(DENSE_RANK() OVER (ORDER BY l1, l2) - 1 AS BIGINT) AS label FROM pairs
        """,
        "weighted_degree": f"""
            SELECT src AS v, CAST(SUM((src + dst) % 7 + 1) AS DOUBLE) AS wdeg
            FROM ({DERIVED_EDGES_SQL}) GROUP BY src
        """,
        "katz": _katz_sql(
            DERIVED_EDGES_SQL,
            "SELECT CAST(c_custkey AS BIGINT) AS v FROM customer",
            20, 0.05, 1.0,
        ),
        "eigenvector": _eigen_sql(
            SYMMETRIC_EDGES_SQL,
            "SELECT CAST(c_custkey AS BIGINT) AS v FROM customer",
            20,
        ),
        "sample_edges": f"""
            SELECT src, dst FROM ({DERIVED_EDGES_SQL})
            WHERE (src * 2654435761 + dst * 40503 + 42) % 2147483648
                  < CAST(0.3 * 2147483648 AS BIGINT)
        """,
        "random_edge": f"""
            SELECT src, dst FROM ({DERIVED_EDGES_SQL})
            ORDER BY (src * 2654435761 + dst * 40503 + 42) % 2147483648, src, dst
            LIMIT 1
        """,
        "sssp_distances": _sssp_sql(
            f"SELECT src, dst, CAST((src + dst) % 7 + 1 AS DOUBLE) AS w FROM ({DERIVED_EDGES_SQL})",
            "SELECT CAST(c_custkey AS BIGINT) AS v FROM customer",
            40,
        ),
        "bidirectional_sssp": (
            "SELECT dist FROM ("
            + _sssp_sql(
                f"SELECT src, dst, CAST((src + dst) % 7 + 1 AS DOUBLE) AS w FROM ({DERIVED_EDGES_SQL})",
                "SELECT CAST(c_custkey AS BIGINT) AS v FROM customer",
                40,
            )
            + f") WHERE v = {n_customers} // 2"
        ),
        "approx_closeness": closeness_sql,
        "volume": volume_sql,
        "apsp": apsp_sql.replace("{RING}", SUPPLIER_RING_SQL),
        # DynAPSP repair == full recompute, so the dyn twin IS the full
        # closure; the held-out/re-inserted edges never appear in SQL.
        "dyn_apsp": apsp_sql.replace("{RING}", SUPPLIER_RING_SQL),
        "dyn_top_harmonic": """
            WITH RECURSIVE base AS MATERIALIZED ({RING}),
            sup AS (SELECT CAST(s_suppkey AS BIGINT) AS v FROM supplier),
            r(s, v, d) AS (
                SELECT v, v, CAST(0 AS BIGINT) FROM sup
                UNION
                SELECT r.s, e.dst, r.d + 1 FROM r JOIN base e ON e.src = r.v
                WHERE r.d < 64
            ),
            md AS (SELECT s, v, MIN(d) AS d FROM r GROUP BY s, v),
            h AS (SELECT s, ROUND(SUM(1.0 / d), 9) AS harmonic
                  FROM md WHERE d > 0 GROUP BY s)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY harmonic DESC, s ASC)
                        AS BIGINT) AS "rank",
                   s AS v, harmonic
            FROM h ORDER BY harmonic DESC, s ASC LIMIT 10
        """.replace("{RING}", SUPPLIER_RING_SQL),
        "neighborhood_function": nf_sql.replace("{RING}", SUPPLIER_RING_SQL),
        "hop_histogram": hop_hist_sql,
        "stable_partition_nodes": f"""
            WITH se AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            lab AS (SELECT v, v % 10 AS label FROM nodes),
            lw AS (SELECT e.src AS v, lb.label AS nl, COUNT(*) AS w
                   FROM se e JOIN lab lb ON lb.v = e.dst GROUP BY e.src, lb.label),
            per AS (SELECT lw.v,
                           SUM(CASE WHEN lw.nl = lo.label THEN lw.w ELSE 0 END) AS own_w,
                           MAX(CASE WHEN lw.nl <> lo.label THEN lw.w ELSE 0 END) AS max_other
                    FROM lw JOIN lab lo ON lo.v = lw.v GROUP BY lw.v)
            SELECT n.v, COALESCE(p.own_w > 0 AND p.own_w > p.max_other, TRUE) AS stable
            FROM nodes n LEFT JOIN per p ON p.v = n.v
        """,
        "link_prediction": f"""
            WITH se AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM se GROUP BY src),
            w AS (SELECT e1.dst AS a, e2.dst AS b, e1.src AS mid
                  FROM se e1 JOIN se e2 ON e1.src = e2.src AND e1.dst < e2.dst),
            agg AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn, SUM(1.0/ln(d.deg)) AS aa,
                           SUM(1.0/d.deg) AS ra
                    FROM w JOIN deg d ON d.v = w.mid GROUP BY a, b),
            ne AS (SELECT agg.* FROM agg LEFT JOIN ({CANONICAL_EDGES_SQL}) c
                   ON c.src = agg.a AND c.dst = agg.b WHERE c.src IS NULL)
            SELECT ne.a AS u, ne.b AS v, cn,
                   ROUND(CAST(cn AS DOUBLE) / (da.deg + db.deg - cn), 8) AS jaccard,
                   ROUND(aa, 8) AS adamic_adar,
                   CAST(da.deg * db.deg AS BIGINT) AS pref_attach,
                   ROUND(ra, 8) AS resource_alloc
            FROM ne JOIN deg da ON da.v = ne.a JOIN deg db ON db.v = ne.b
        """,
        # DegreePreservingShuffle twin: hash-rank within degree class →
        # rank-th smallest member id; zero-degree nodes are their own class.
        "degree_preserving_shuffle": f"""
            WITH se AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            deg AS (SELECT n.v, CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg
                    FROM nodes n LEFT JOIN
                      (SELECT src AS v, COUNT(*) AS deg FROM se GROUP BY src) d
                      ON d.v = n.v),
            ranked AS (SELECT v, deg,
                              ROW_NUMBER() OVER (PARTITION BY deg
                                  ORDER BY (v * 2654435761 + 42) % 2147483648, v)
                                  AS rnk
                       FROM deg),
            srt AS (SELECT v AS tgt, deg,
                           ROW_NUMBER() OVER (PARTITION BY deg ORDER BY v) AS rnk
                    FROM deg)
            SELECT r.v, CAST(s.tgt AS BIGINT) AS new_id
            FROM ranked r JOIN srt s ON s.deg = r.deg AND s.rnk = r.rnk
            ORDER BY r.v
        """,
        # ROCMetric twin: CN predictor on the 70% train split vs the 30%
        # held-out test edges; window cumsums give the ROC points, LAG the
        # trapezoid AUC.
        "link_roc": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            test AS MATERIALIZED (SELECT * FROM ce
                WHERE (src * 2654435761 + dst * 40503 + 7) % 2147483648
                      < CAST(0.3 * 2147483648 AS BIGINT)),
            train AS MATERIALIZED (SELECT * FROM ce
                WHERE NOT ((src * 2654435761 + dst * 40503 + 7) % 2147483648
                           < CAST(0.3 * 2147483648 AS BIGINT))),
            ts AS (SELECT src, dst FROM train UNION ALL SELECT dst, src FROM train),
            w AS (SELECT e1.dst AS a, e2.dst AS b
                  FROM ts e1 JOIN ts e2 ON e1.src = e2.src AND e1.dst < e2.dst),
            agg AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn FROM w GROUP BY a, b),
            cand AS (SELECT agg.* FROM agg LEFT JOIN train t
                     ON t.src = agg.a AND t.dst = agg.b WHERE t.src IS NULL),
            lbl AS (SELECT CAST(cand.cn AS DOUBLE) AS thresh,
                           CASE WHEN te.src IS NOT NULL THEN 1 ELSE 0 END AS pos
                    FROM cand LEFT JOIN test te
                    ON te.src = cand.a AND te.dst = cand.b),
            hist AS (SELECT thresh, SUM(pos) AS p, SUM(1 - pos) AS ng
                     FROM lbl GROUP BY thresh),
            pts AS (SELECT thresh,
                           SUM(p) OVER win AS tp, SUM(ng) OVER win AS fp
                    FROM hist
                    WINDOW win AS (ORDER BY thresh DESC ROWS UNBOUNDED PRECEDING)),
            tot AS (SELECT GREATEST(MAX(tp), 1) AS pp, GREATEST(MAX(fp), 1) AS nn FROM pts),
            rates AS (SELECT thresh, tp, fp,
                             tp * 1.0 / (SELECT pp FROM tot) AS tpr,
                             fp * 1.0 / (SELECT nn FROM tot) AS fpr
                      FROM pts),
            steps AS (SELECT fpr, tpr,
                             COALESCE(LAG(fpr) OVER (ORDER BY thresh DESC), 0) AS pf,
                             COALESCE(LAG(tpr) OVER (ORDER BY thresh DESC), 0) AS pt
                      FROM rates),
            auc AS (SELECT SUM((fpr - pf) * (tpr + pt) / 2) AS a FROM steps)
            SELECT thresh, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   ROUND(tpr, 8) AS tpr, ROUND(fpr, 8) AS fpr,
                   ROUND((SELECT a FROM auc), 8) AS auc
            FROM rates ORDER BY thresh DESC
        """,
        # SameCommunityIndex twin over the link-prediction candidate pairs.
        "same_community": f"""
            WITH se AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            w AS (SELECT e1.dst AS a, e2.dst AS b
                  FROM se e1 JOIN se e2 ON e1.src = e2.src AND e1.dst < e2.dst),
            agg AS (SELECT a, b FROM w GROUP BY a, b),
            ne AS (SELECT agg.* FROM agg LEFT JOIN ({CANONICAL_EDGES_SQL}) c
                   ON c.src = agg.a AND c.dst = agg.b WHERE c.src IS NULL)
            SELECT a AS u, b AS v,
                   CAST(CASE WHEN a % 10 = b % 10 THEN 1 ELSE 0 END AS BIGINT)
                       AS same_community
            FROM ne ORDER BY u, v
        """,
        # SCAN twin (scan.py normative semantics): σ = (tri+2)/√((du+1)(dv+1)),
        # ε-cores, min-core-id clusters over the core–core ε-subgraph,
        # borders inherit min neighbor cluster label, outliers −1.
        "scan_clustering": f"""
            WITH RECURSIVE ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            sym AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM sym GROUP BY src),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            exx AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                    UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                    UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM exx GROUP BY src, dst),
            eedge AS MATERIALIZED (
                SELECT ce.src, ce.dst FROM ce
                LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst
                JOIN deg du ON du.v = ce.src JOIN deg dv ON dv.v = ce.dst
                WHERE (COALESCE(cnt.tri, 0) + 2.0)
                      / SQRT((du.deg + 1.0) * (dv.deg + 1.0)) >= {SCAN_PARAMS["eps"]}),
            esym AS (SELECT src, dst FROM eedge
                     UNION ALL SELECT dst, src FROM eedge),
            cores AS MATERIALIZED (
                SELECT src AS v FROM esym GROUP BY src
                HAVING COUNT(*) + 1 >= {SCAN_PARAMS["mu"]}),
            ccsym AS (SELECT e.src, e.dst FROM esym e
                      JOIN cores a ON a.v = e.src JOIN cores b ON b.v = e.dst),
            r(v, l) AS (
                SELECT v, v FROM cores
                UNION
                SELECT e.dst, r.l FROM r JOIN ccsym e ON e.src = r.v),
            clab AS (SELECT v, MIN(l) AS label FROM r GROUP BY v),
            border AS (
                SELECT s.dst AS v, MIN(cl.label) AS label
                FROM esym s JOIN cores c ON c.v = s.src
                JOIN clab cl ON cl.v = s.src
                WHERE s.dst NOT IN (SELECT v FROM cores)
                GROUP BY s.dst)
            SELECT n.v,
                   CAST(COALESCE(clab.label, border.label, -1) AS BIGINT) AS label
            FROM nodes n
            LEFT JOIN clab ON clab.v = n.v
            LEFT JOIN border ON border.v = n.v
            ORDER BY n.v
        """,
        # LocalDegreeScore twin (sparsification.py normative semantics):
        # neighbor rank by (deg DESC, nbr ASC), side 1.0 at rank 1 else
        # 1 − ln(rank)/ln(deg(u)), edge score = max over both sides.
        "local_degree_scores": f"""
            WITH sym AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg
                    FROM sym GROUP BY src),
            ranked AS (
                SELECT e.src, e.dst,
                       ROW_NUMBER() OVER (PARTITION BY e.src
                                          ORDER BY dv.deg DESC, e.dst) AS rnk,
                       du.deg AS degu
                FROM sym e JOIN deg du ON du.v = e.src
                           JOIN deg dv ON dv.v = e.dst),
            side AS (
                SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst,
                       CASE WHEN rnk = 1 THEN 1.0
                            ELSE 1.0 - LN(rnk) / LN(degu) END AS s
                FROM ranked)
            SELECT src, dst, ROUND(MAX(s), 8) AS ld_score
            FROM side GROUP BY src, dst ORDER BY src, dst
        """,
        # SimmelianOverlapScore twin: strength = per-edge triangle count,
        # strong set = top-10 neighbors by (strength DESC, nbr ASC),
        # overlap = |strong(u) ∩ strong(v)|.
        "simmelian_overlap": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            tri AS (SELECT ce.src, ce.dst,
                           CAST(COALESCE(cnt.tri, 0) AS BIGINT) AS tri
                    FROM ce LEFT JOIN cnt
                      ON cnt.src = ce.src AND cnt.dst = ce.dst),
            bi AS (SELECT src AS v, dst AS nbr, tri FROM tri
                   UNION ALL SELECT dst, src, tri FROM tri),
            rk AS (SELECT v, nbr,
                          ROW_NUMBER() OVER (PARTITION BY v
                                             ORDER BY tri DESC, nbr) AS rnk
                   FROM bi),
            tk AS (SELECT v, nbr FROM rk WHERE rnk <= 10),
            ov AS (SELECT e.src, e.dst, COUNT(*) AS overlap
                   FROM ce e JOIN tk a ON a.v = e.src
                             JOIN tk b ON b.v = e.dst AND b.nbr = a.nbr
                   GROUP BY e.src, e.dst)
            SELECT ce.src, ce.dst,
                   CAST(COALESCE(ov.overlap, 0) AS BIGINT) AS overlap
            FROM ce LEFT JOIN ov ON ov.src = ce.src AND ov.dst = ce.dst
            ORDER BY ce.src, ce.dst
        """,
        # LocalSimilarityScore twin: neighbors ranked by Jaccard DESC
        # (ties -> smaller id), side 1.0 at rank 1 else 1 - ln(rank)/ln(deg),
        # edge score = max over both sides.
        "local_similarity": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            dg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS deg FROM (
                SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v),
            jac AS (
                SELECT ce.src, ce.dst,
                       CASE WHEN du.deg + dv.deg - 2 - COALESCE(cnt.tri, 0) > 0
                            THEN COALESCE(cnt.tri, 0) / (du.deg + dv.deg - 2 - COALESCE(cnt.tri, 0))
                            ELSE 1.0 END AS j
                FROM ce JOIN dg du ON du.v = ce.src JOIN dg dv ON dv.v = ce.dst
                LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst),
            bi AS (SELECT src AS v, dst AS nbr, j FROM jac
                   UNION ALL SELECT dst, src, j FROM jac),
            rk AS (SELECT v, nbr,
                          ROW_NUMBER() OVER (PARTITION BY v
                                             ORDER BY j DESC, nbr) AS rnk,
                          COUNT(*) OVER (PARTITION BY v) AS degv
                   FROM bi),
            side AS (SELECT LEAST(v, nbr) AS src, GREATEST(v, nbr) AS dst,
                            CASE WHEN rnk = 1 THEN 1.0
                                 ELSE 1.0 - LN(rnk) / LN(degv) END AS s
                     FROM rk)
            SELECT src, dst, ROUND(MAX(s), 8) AS ls_score
            FROM side GROUP BY src, dst ORDER BY src, dst
        """,
        # MultiscaleScore twin: per-side 1 − (1 − w/Σw)^(deg−1) over the
        # weighted symmetric table (w = (src+dst)%7+1), max over sides.
        "multiscale_scores": f"""
            WITH sym AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            w AS (SELECT src, dst,
                         CAST((src + dst) % 7 + 1 AS DOUBLE) AS w FROM sym),
            agg AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS deg,
                           SUM(w) AS s
                    FROM w GROUP BY src),
            side AS (SELECT LEAST(w.src, w.dst) AS src,
                            GREATEST(w.src, w.dst) AS dst,
                            1.0 - POWER(1.0 - w.w / a.s, a.deg - 1.0) AS p
                     FROM w JOIN agg a ON a.v = w.src)
            SELECT src, dst, ROUND(MAX(p), 8) AS ms_score
            FROM side GROUP BY src, dst ORDER BY src, dst
        """,
        # ChanceCorrectedTriangleScore twin: tri·(n−2)/((deg u −1)(deg v −1))
        # when tri>0, else 1 for a degree-1 endpoint, else 0.
        "chance_corrected_triangles": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            deg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS deg FROM
                      (SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce)
                    GROUP BY v)
            SELECT ce.src, ce.dst,
                   ROUND(CASE
                     WHEN COALESCE(cnt.tri, 0) > 0 THEN
                       cnt.tri * ({n_customers} - 2)
                         / ((du.deg - 1.0) * (dv.deg - 1.0))
                     WHEN du.deg = 1 OR dv.deg = 1 THEN 1.0
                     ELSE 0.0 END, 8) AS cct_score
            FROM ce JOIN deg du ON du.v = ce.src
                    JOIN deg dv ON dv.v = ce.dst
                    LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst
            ORDER BY ce.src, ce.dst
        """,
        # ChibaNishizekiQuadrangleEdgeScore twin: direct 4-cycle join from
        # the canonical orientation (w ∈ N(v)\{u}; x ∈ N(w)∩N(u), x ≠ v).
        "quadrangle_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            sym AS MATERIALIZED (SELECT src, dst FROM ce
                                 UNION ALL SELECT dst, src FROM ce),
            q AS (SELECT ce.src AS u, ce.dst AS v, CAST(COUNT(*) AS BIGINT) AS c
                  FROM ce
                  JOIN sym w ON w.src = ce.dst AND w.dst <> ce.src
                  JOIN sym x ON x.src = w.dst AND x.dst <> ce.dst
                  JOIN sym ux ON ux.src = ce.src AND ux.dst = x.dst
                  GROUP BY ce.src, ce.dst)
            SELECT ce.src, ce.dst, CAST(COALESCE(q.c, 0) AS BIGINT) AS quad
            FROM ce LEFT JOIN q ON q.u = ce.src AND q.v = ce.dst
            ORDER BY ce.src, ce.dst
        """,
        # GeometricMeanScore twin over triangle counts:
        # tri_e / √(Σ_u tri · Σ_v tri), 0 when tri_e = 0.
        "geometric_mean_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            tri AS (SELECT ce.src, ce.dst,
                           CAST(COALESCE(cnt.tri, 0) AS DOUBLE) AS tri
                    FROM ce LEFT JOIN cnt
                      ON cnt.src = ce.src AND cnt.dst = ce.dst),
            ns AS (SELECT v, SUM(tri) AS s FROM (
                       SELECT src AS v, tri FROM tri
                       UNION ALL SELECT dst, tri FROM tri) GROUP BY v)
            SELECT t.src, t.dst,
                   ROUND(CASE WHEN t.tri > 0
                              THEN t.tri / SQRT(a.s * b.s) ELSE 0 END, 8)
                       AS gm_score
            FROM tri t JOIN ns a ON a.v = t.src JOIN ns b ON b.v = t.dst
            ORDER BY t.src, t.dst
        """,
        # EdgeScoreNormalizer twin (invert=true, [0,1]):
        # 1 − (tri − min)/(max − min).
        "normalized_triangle_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            tri AS (SELECT ce.src, ce.dst,
                           CAST(COALESCE(cnt.tri, 0) AS DOUBLE) AS tri
                    FROM ce LEFT JOIN cnt
                      ON cnt.src = ce.src AND cnt.dst = ce.dst),
            mm AS (SELECT MIN(tri) AS mn, MAX(tri) AS mx FROM tri)
            SELECT src, dst,
                   ROUND(1.0 - (tri - (SELECT mn FROM mm))
                         / ((SELECT mx FROM mm) - (SELECT mn FROM mm)), 8)
                       AS norm_score
            FROM tri ORDER BY src, dst
        """,
        # EdgeScoreLinearizer twin: global (score, src, dst) rank / (m−1).
        "linearized_triangle_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            tri AS (SELECT ce.src, ce.dst,
                           CAST(COALESCE(cnt.tri, 0) AS DOUBLE) AS tri
                    FROM ce LEFT JOIN cnt
                      ON cnt.src = ce.src AND cnt.dst = ce.dst),
            m AS (SELECT COUNT(*) AS m FROM tri)
            SELECT src, dst,
                   ROUND((ROW_NUMBER() OVER (ORDER BY tri, src, dst) - 1) * 1.0
                         / ((SELECT m FROM m) - 1), 8) AS lin_score
            FROM tri ORDER BY src, dst
        """,
        # JaccardDistance twin (distance/JaccardDistance.cpp convention):
        # 1 − tri/(deg(u)+deg(v)−tri).
        "jaccard_distance": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            deg AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS deg FROM
                      (SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce)
                    GROUP BY v)
            SELECT ce.src, ce.dst,
                   ROUND(1.0 - COALESCE(cnt.tri, 0) * 1.0
                         / (du.deg + dv.deg - COALESCE(cnt.tri, 0)), 8)
                       AS jaccard_distance
            FROM ce JOIN deg du ON du.v = ce.src
                    JOIN deg dv ON dv.v = ce.dst
                    LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst
            ORDER BY ce.src, ce.dst
        """,
        # AdamicAdarDistance twin: 1/Σ_{w∈Γ(u)∩Γ(v)} 1/ln(deg(w)), sentinel
        # −1 when the edge has no common neighbor.
        "adamic_adar_distance": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            bi AS (SELECT src AS u, dst AS nbr FROM ce
                   UNION ALL SELECT dst, src FROM ce),
            deg AS (SELECT u AS v, CAST(COUNT(*) AS DOUBLE) AS deg
                    FROM bi GROUP BY u),
            common AS (SELECT ce.src, ce.dst, a.nbr AS w
                       FROM ce JOIN bi a ON a.u = ce.src
                               JOIN bi b ON b.u = ce.dst AND b.nbr = a.nbr),
            s AS (SELECT src, dst, SUM(1.0 / LN(d.deg)) AS s
                  FROM common JOIN deg d ON d.v = common.w GROUP BY src, dst)
            SELECT ce.src, ce.dst,
                   ROUND(CASE WHEN COALESCE(s.s, 0) > 0 THEN 1.0 / s.s
                              ELSE -1.0 END, 8) AS aa_distance
            FROM ce LEFT JOIN s ON s.src = ce.src AND s.dst = ce.dst
            ORDER BY ce.src, ce.dst
        """,
        # RandomEdgeScore twin: the seeded hash-coin, exactly the engine's
        # ((src·2654435761 + dst·40503 + 42) mod 2³¹) / 2³¹.
        "random_edge_scores": f"""
            SELECT src, dst,
                   ROUND(((src * 2654435761 + dst * 40503 + 42) % 2147483648)
                         / 2147483648.0, 8) AS re_score
            FROM ({CANONICAL_EDGES_SQL}) ORDER BY src, dst
        """,
        # SCDGroundTruthComparison twin: best-of-each-metric vs the
        # continuous k=7 partition, found = v%5 groups.
        "scd_ground_truth": """
            WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
            p AS (SELECT n, n // 7 AS q, n % 7 AS r FROM c),
            f AS (SELECT CAST(c_custkey % 5 AS BIGINT) AS seed,
                         CAST(c_custkey AS BIGINT) AS v FROM customer),
            t AS (SELECT CAST(cu.c_custkey AS BIGINT) AS v,
                         CAST(CASE WHEN cu.c_custkey < p.r * (p.q + 1)
                              THEN cu.c_custkey // (p.q + 1)
                              ELSE p.r + (cu.c_custkey - p.r * (p.q + 1)) // p.q
                              END AS BIGINT) AS label
                  FROM customer cu, p),
            fs AS (SELECT seed, CAST(COUNT(*) AS DOUBLE) AS fsize FROM f GROUP BY seed),
            ts AS (SELECT label, CAST(COUNT(*) AS DOUBLE) AS tsize FROM t GROUP BY label),
            ov AS (SELECT f.seed, t.label, CAST(COUNT(*) AS DOUBLE) AS ov
                   FROM f JOIN t ON t.v = f.v GROUP BY f.seed, t.label),
            sc AS (SELECT ov.seed,
                          ov.ov / (fs.fsize + ts.tsize - ov.ov) AS jaccard,
                          CASE WHEN ov.ov > 0 THEN
                              2 * (ov.ov / fs.fsize) * (ov.ov / ts.tsize)
                              / (ov.ov / fs.fsize + ov.ov / ts.tsize)
                          ELSE 0 END AS f1,
                          ov.ov / fs.fsize AS precision,
                          ov.ov / ts.tsize AS recall
                   FROM ov JOIN fs ON fs.seed = ov.seed
                           JOIN ts ON ts.label = ov.label)
            SELECT seed, ROUND(MAX(jaccard), 8) AS jaccard,
                   ROUND(MAX(f1), 8) AS f1,
                   ROUND(MAX(precision), 8) AS precision,
                   ROUND(MAX(recall), 8) AS recall
            FROM sc GROUP BY seed ORDER BY seed
        """,
        # ClusteringGenerator twin (community/ClusteringGenerator.cpp:48-75):
        # k contiguous balanced blocks, first n%k blocks one node larger.
        "clustering_generator": """
            WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
            p AS (SELECT n, n // 7 AS q, n % 7 AS r FROM c)
            SELECT CAST(cu.c_custkey AS BIGINT) AS v,
                   CAST(CASE WHEN cu.c_custkey < p.r * (p.q + 1)
                        THEN cu.c_custkey // (p.q + 1)
                        ELSE p.r + (cu.c_custkey - p.r * (p.q + 1)) // p.q
                        END AS BIGINT) AS label
            FROM customer cu, p ORDER BY v
        """,
        # normalize_text twin: byte-identical LOWER + whitespace collapse
        # + TRIM (web-text cleaning prefix).
        "normalize_text": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')) AS norm
            FROM documents ORDER BY doc_id
        """,
        # SetConductance twin (scd/SetConductance.cpp): cut / min-side
        # volume of the v%5==0 set on the symmetrized graph (each edge
        # appears in both directions, so COUNT(*) is the total volume).
        "set_conductance": f"""
            WITH se AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            t AS (SELECT
                SUM(CASE WHEN src % 5 = 0 AND dst % 5 <> 0 THEN 1 ELSE 0 END) AS cut,
                SUM(CASE WHEN src % 5 = 0 THEN 1 ELSE 0 END) AS vol_s,
                COUNT(*) AS vol_all FROM se)
            SELECT ROUND(CASE WHEN LEAST(vol_s, vol_all - vol_s) > 0
                         THEN cut * 1.0 / LEAST(vol_s, vol_all - vol_s)
                         ELSE 1.0 END, 8) AS conductance FROM t
        """,
        # AllSimplePaths twin (reachability/AllSimplePaths.cpp): recursive
        # CTE path enumeration with list_contains simplicity filter.
        "simple_paths": f"""
            WITH RECURSIVE g1 AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            r(node, path, len) AS (
                SELECT CAST(0 AS BIGINT), [CAST(0 AS BIGINT)], 0
                UNION ALL
                SELECT e.dst, list_append(r.path, e.dst), r.len + 1
                FROM r JOIN g1 e ON e.src = r.node
                WHERE r.len < 5 AND r.node <> 1
                  AND NOT list_contains(r.path, e.dst)
            )
            SELECT len, CAST(COUNT(*) AS BIGINT) AS n_paths
            FROM r WHERE node = 1 GROUP BY len ORDER BY len
        """,
        # GlobalCurveball twin: the randomized graph preserves the degree
        # sequence EXACTLY, so its degree histogram equals the canonical
        # graph's pre-randomization histogram.
        "curveball_degrees": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            dg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v)
            SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM dg GROUP BY deg ORDER BY deg
        """,
        # GraphUpdater twin: applying the G1→G2 edit list to G1 must yield
        # exactly G2 (the perturbed graph), so the oracle IS G2.
        "apply_events_roundtrip": f"""
            WITH g1 AS MATERIALIZED ({DERIVED_EDGES_SQL})
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM g1 WHERE (src + dst) % 3 <> 0
                UNION ALL
                SELECT dst AS src, src AS dst FROM g1 WHERE src % 5 = 0
            ) ORDER BY src, dst
        """,
        # Partitioned-sink roundtrip twin: the derived edge table itself.
        "partitioned_sink_roundtrip": f"""
            SELECT src, dst FROM ({DERIVED_EDGES_SQL}) ORDER BY src, dst
        """,
        # Binary edge-list roundtrip twin: the derived edge table itself.
        "binary_edgelist_roundtrip": f"""
            SELECT src, dst FROM ({DERIVED_EDGES_SQL}) ORDER BY src, dst
        """,
        # graph-tool binary roundtrip twin: the directed edge table itself.
        "graphtool_roundtrip": f"""
            SELECT src, dst FROM ({DERIVED_EDGES_SQL}) ORDER BY src, dst
        """,
        # Thrill / DibaP roundtrip twins: the canonical (lo, hi) edge table.
        "thrill_roundtrip": f"""
            SELECT src, dst FROM ({CANONICAL_EDGES_SQL}) ORDER BY src, dst
        """,
        "dibap_roundtrip": f"""
            SELECT src, dst FROM ({CANONICAL_EDGES_SQL}) ORDER BY src, dst
        """,
        # Binary partition roundtrip twin: labels were the out-degrees.
        "binary_partition_roundtrip": f"""
            SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg
            FROM ({DERIVED_EDGES_SQL}) GROUP BY src ORDER BY v
        """,
        # RandomBFS twin: first 25 vertices by (hop distance from 0, id)
        # on the symmetrized graph.
        "random_bfs_community": f"""
            WITH RECURSIVE e AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            r(v, d) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.v WHERE r.d < 4096
            ),
            md AS (SELECT v, MIN(d) AS d FROM r GROUP BY v)
            SELECT CAST(0 AS BIGINT) AS seed, v FROM md
            ORDER BY d, v LIMIT 25
        """,
        # DynBFS twin: scratch BFS over the augmented (derived + selected
        # reversals) graph; warm-start must match exactly.
        "incremental_bfs": f"""
            WITH RECURSIVE e AS MATERIALIZED (
                SELECT src, dst FROM ({DERIVED_EDGES_SQL})
                UNION
                SELECT dst AS src, src AS dst FROM ({DERIVED_EDGES_SQL})
                WHERE src % 7 = 0
            ),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            r(v, d) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.v WHERE r.d < 4096
            )
            SELECT n.v, CAST(COALESCE(m.d, -1) AS BIGINT) AS dist
            FROM nodes n LEFT JOIN (SELECT v, MIN(d) AS d FROM r GROUP BY v) m ON m.v = n.v
            ORDER BY n.v
        """,
        # BidirectionalBFS twin: plain recursive BFS distance 0 -> 1.
        "bidirectional_bfs": f"""
            WITH RECURSIVE e AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            r(v, d) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.v WHERE r.d < 4096
            )
            SELECT CAST(COALESCE((SELECT MIN(d) FROM r WHERE v = 1), -1) AS BIGINT) AS dist
        """,
        # Bloom no-false-negative twin: every member tests positive.
        "bloom_prefilter": """
            SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_found FROM documents
        """,
        # DGS roundtrip twin: write->read->apply must reproduce G2.
        "dgs_roundtrip": f"""
            WITH g1 AS MATERIALIZED ({DERIVED_EDGES_SQL})
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM g1 WHERE (src + dst) % 3 <> 0
                UNION ALL
                SELECT dst AS src, src AS dst FROM g1 WHERE src % 5 = 0
            ) ORDER BY src, dst
        """,
        # ReachableNodes twin (reachability/ReachableNodes.cpp exact mode):
        # transitive closure via recursive CTE; UNION dedups, so COUNT(*)
        # per source = distinct reachable vertices (source included).
        "reachable_nodes": f"""
            WITH RECURSIVE g1 AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            nodes AS (SELECT DISTINCT nv FROM (
                SELECT src AS nv FROM g1 UNION ALL SELECT dst FROM g1)),
            r(s, t) AS (
                SELECT nv, nv FROM nodes
                UNION
                SELECT r.s, e.dst FROM r JOIN g1 e ON e.src = r.t
            )
            SELECT s AS v, CAST(COUNT(*) AS BIGINT) AS reachable
            FROM r GROUP BY s ORDER BY s
        """,
        # GraphDifference twin (dynamics/GraphDifference.cpp edit list);
        # perturbation mirrors q_graph_difference exactly.
        "graph_difference": f"""
            WITH g1 AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            g2 AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM g1 WHERE (src + dst) % 3 <> 0
                    UNION ALL
                    SELECT dst AS src, src AS dst FROM g1 WHERE src % 5 = 0
                )
            ),
            er AS (SELECT 'edge_removal' AS kind, g1.src AS u, g1.dst AS v
                   FROM g1 WHERE NOT EXISTS (
                       SELECT 1 FROM g2
                       WHERE g2.src = g1.src AND g2.dst = g1.dst)),
            ea AS (SELECT 'edge_addition' AS kind, g2.src AS u, g2.dst AS v
                   FROM g2 WHERE NOT EXISTS (
                       SELECT 1 FROM g1
                       WHERE g1.src = g2.src AND g1.dst = g2.dst)),
            n1 AS (SELECT DISTINCT nv FROM (
                       SELECT src AS nv FROM g1 UNION ALL SELECT dst FROM g1)),
            n2 AS (SELECT DISTINCT nv FROM (
                       SELECT src AS nv FROM g2 UNION ALL SELECT dst FROM g2)),
            nr AS (SELECT 'node_removal' AS kind, nv AS u, CAST(-1 AS BIGINT) AS v
                   FROM n1 WHERE nv NOT IN (SELECT nv FROM n2)),
            na AS (SELECT 'node_addition' AS kind, nv AS u, CAST(-1 AS BIGINT) AS v
                   FROM n2 WHERE nv NOT IN (SELECT nv FROM n1))
            SELECT kind, u, v FROM (
                SELECT * FROM er UNION ALL SELECT * FROM ea
                UNION ALL SELECT * FROM nr UNION ALL SELECT * FROM na)
            ORDER BY kind, u, v
        """,
        "edge_triangle_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst)
            SELECT ce.src, ce.dst, CAST(COALESCE(cnt.tri, 0) AS BIGINT) AS tri
            FROM ce LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst
        """,
        "sparsify_triangles": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst)
            SELECT ce.src, ce.dst, CAST(cnt.tri AS BIGINT) AS tri
            FROM ce JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst
            WHERE cnt.tri >= 1
        """,
        # exact twin of graph/sparsification.py:prefix_jaccard_scores:
        # neighbor rank = count of strictly-greater triangle strengths
        # (RANK()-1, ties share), matched neighbors become common at
        # max(rank_u, rank_v), J evaluated at every event rank level —
        # all counts are integers so cm/(cu+cv-cm) rounds identically.
        "prefix_jaccard_scores": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            tc AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
                   JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            ex AS (SELECT LEAST(a,b) AS src, GREATEST(a,b) AS dst FROM tc
                   UNION ALL SELECT LEAST(a,c), GREATEST(a,c) FROM tc
                   UNION ALL SELECT LEAST(b,c), GREATEST(b,c) FROM tc),
            cnt AS (SELECT src, dst, COUNT(*) AS tri FROM ex GROUP BY src, dst),
            tri AS MATERIALIZED (SELECT ce.src, ce.dst,
                   CAST(COALESCE(cnt.tri, 0) AS DOUBLE) AS attr
                   FROM ce LEFT JOIN cnt ON cnt.src = ce.src AND cnt.dst = ce.dst),
            bi AS (SELECT src AS v, dst AS nbr, attr FROM tri
                   UNION ALL SELECT dst, src, attr FROM tri),
            ranked AS MATERIALIZED (SELECT v, nbr,
                     RANK() OVER (PARTITION BY v ORDER BY attr DESC) - 1 AS rnk FROM bi),
            su AS MATERIALIZED (SELECT t.src, t.dst, r.nbr, r.rnk FROM tri t
                  JOIN ranked r ON r.v = t.src WHERE r.nbr <> t.dst),
            sv AS MATERIALIZED (SELECT t.src, t.dst, r.nbr, r.rnk FROM tri t
                  JOIN ranked r ON r.v = t.dst WHERE r.nbr <> t.src),
            matched AS MATERIALIZED (SELECT su.src, su.dst,
                     GREATEST(su.rnk, sv.rnk) AS mr
                     FROM su JOIN sv ON su.src = sv.src AND su.dst = sv.dst
                     AND su.nbr = sv.nbr),
            levels AS (SELECT src, dst, rnk AS r FROM su
                       UNION SELECT src, dst, rnk FROM sv
                       UNION SELECT src, dst, mr FROM matched),
            counts AS (
              SELECT l.src, l.dst, l.r,
                (SELECT COUNT(*) FROM su WHERE su.src = l.src AND su.dst = l.dst AND su.rnk <= l.r) AS cu,
                (SELECT COUNT(*) FROM sv WHERE sv.src = l.src AND sv.dst = l.dst AND sv.rnk <= l.r) AS cv,
                (SELECT COUNT(*) FROM matched m WHERE m.src = l.src AND m.dst = l.dst AND m.mr <= l.r) AS cm
              FROM levels l),
            best AS (SELECT src, dst,
                     MAX(CASE WHEN cu + cv - cm > 0
                         THEN CAST(cm AS DOUBLE) / (cu + cv - cm) ELSE 0.0 END) AS pj
                     FROM counts GROUP BY src, dst)
            SELECT t.src, t.dst, ROUND(COALESCE(b.pj, 0.0), 8) AS pj_score
            FROM tri t LEFT JOIN best b ON b.src = t.src AND b.dst = t.dst
            ORDER BY t.src, t.dst
        """,
        "random_walks": walks_sql,
        "algebraic_distances": algdist_sql,
        "personalized_pagerank": ppr_sql,
        "pagerank_nibble": nibble_sql,
        "graph_profile": f"""
            WITH prof_ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            prof_se AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            cdeg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT src AS v FROM prof_ce UNION ALL SELECT dst FROM prof_ce) GROUP BY v),
            sdeg AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS deg FROM prof_se GROUP BY src),
            tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM prof_ce e1
                    JOIN prof_ce e2 ON e2.src = e1.dst
                    JOIN prof_ce e3 ON e3.src = e1.src AND e3.dst = e2.dst)
            SELECT
              {n_customers} AS n,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM ({DERIVED_EDGES_SQL})) AS m,
              (SELECT ROUND(CAST(COUNT(*) AS DOUBLE) / ({n_customers} * ({n_customers} - 1)), 8)
               FROM ({DERIVED_EDGES_SQL})) AS density,
              (SELECT MAX(deg) FROM (SELECT CAST(COUNT(*) AS BIGINT) AS deg
               FROM ({DERIVED_EDGES_SQL}) GROUP BY src)) AS max_degree,
              -- outer CTE names are prof_-prefixed: an outer CTE named like one
              -- inside the embedded WITH RECURSIVE (se) makes DuckDB 1.0
              -- bind the inner recursion wrong (it never expands)
              (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM ({cc_sql})) AS n_components,
              (SELECT CAST(MAX(sz) AS BIGINT) FROM
               (SELECT COUNT(*) AS sz FROM ({cc_sql}) GROUP BY label)) AS largest_component,
              (SELECT t FROM tri) AS n_triangles,
              (SELECT ROUND(3.0 * (SELECT t FROM tri) /
                (SELECT SUM(deg * (deg - 1) // 2) FROM cdeg), 8)) AS global_cc,
              (SELECT ROUND(corr(d1.deg, d2.deg), 8)
               FROM prof_se JOIN sdeg d1 ON d1.v = prof_se.src JOIN sdeg d2 ON d2.v = prof_se.dst) AS assortativity
        """,
        "eccentricity": f"""
            WITH RECURSIVE se AS MATERIALIZED ({SYMMETRIC_EDGES_SQL}),
            r(v, d) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT e.dst, r.d + 1 FROM r JOIN se e ON e.src = r.v WHERE r.d < 4096
            ),
            md AS (SELECT v, MIN(d) AS d FROM r GROUP BY v),
            mx AS (SELECT MAX(d) AS ecc FROM md)
            SELECT CAST((SELECT MIN(v) FROM md WHERE d = (SELECT ecc FROM mx)) AS BIGINT) AS farthest,
                   CAST((SELECT ecc FROM mx) AS BIGINT) AS ecc
        """,
        # distance/SPSP.cpp semantics: per-(source,target) hop distance, -1
        # unreachable; multi-source frontier recursion.  Depth cap 128 ≫ the
        # measured source-0 eccentricity of the derived graph (4 at sf0.01,
        # 5 at sf0.1); the engine iterates to fixpoint, so the cap only
        # protects DuckDB from unbounded cyclic recursion.
        "spsp": f"""
            WITH RECURSIVE e AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            nn AS (SELECT COUNT(*) AS c FROM customer),
            pairs AS (
                SELECT CAST(i AS BIGINT) AS src,
                       CAST((i * 37 + 11) % (SELECT c FROM nn) AS BIGINT) AS dst
                FROM range(6) t(i)
            ),
            r(root, v, d) AS (
                SELECT CAST(i AS BIGINT), CAST(i AS BIGINT), CAST(0 AS BIGINT)
                FROM range(6) t(i)
                UNION
                SELECT r.root, e.dst, r.d + 1
                FROM r JOIN e ON e.src = r.v WHERE r.d < 128
            )
            SELECT p.src, p.dst, CAST(COALESCE(m.d, -1) AS BIGINT) AS dist
            FROM pairs p
            LEFT JOIN (SELECT root, v, MIN(d) AS d FROM r GROUP BY root, v) m
              ON m.root = p.src AND m.v = p.dst
            ORDER BY p.src
        """,
        "bfs_distances": f"""
            WITH RECURSIVE e AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            r(v, d) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                -- cap must exceed any plausible eccentricity of the derived graph;
                -- the engine iterates to fixpoint, so an undershoot here would
                -- be a spurious oracle mismatch, not an engine bug
                SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.v WHERE r.d < 4096
            )
            SELECT n.v, CAST(COALESCE(m.d, -1) AS BIGINT) AS dist
            FROM nodes n LEFT JOIN (SELECT v, MIN(d) AS d FROM r GROUP BY v) m ON m.v = n.v
        """,
        # ReverseBFS twin: the bfs CTE with the join direction flipped
        # (hops over INCOMING edges).
        "reverse_bfs": f"""
            WITH RECURSIVE e AS MATERIALIZED ({DERIVED_EDGES_SQL}),
            nodes AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
            r(v, d) AS (
                SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT e.src, r.d + 1 FROM r JOIN e ON e.dst = r.v WHERE r.d < 4096
            )
            SELECT n.v, CAST(COALESCE(m.d, -1) AS BIGINT) AS dist
            FROM nodes n LEFT JOIN (SELECT v, MIN(d) AS d FROM r GROUP BY v) m ON m.v = n.v
        """,
        # LouvainMapEquation twin: two-level map equation from per-cluster
        # cut/vol aggregates; plogp(w) = (w/2m)·ln(w/2m).
        "map_equation": f"""
            WITH ce AS ({CANONICAL_EDGES_SQL}),
            lab AS (SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_custkey % 10 AS BIGINT) AS label FROM customer),
            tv AS (SELECT 2.0 * COUNT(*) AS tv FROM ce),
            el AS (SELECT l1.label AS ls, l2.label AS ld FROM ce JOIN lab l1 ON l1.v = ce.src JOIN lab l2 ON l2.v = ce.dst),
            cuts AS (SELECT label, CAST(COUNT(*) AS DOUBLE) AS cut FROM (
                SELECT ls AS label FROM el WHERE ls <> ld
                UNION ALL SELECT ld FROM el WHERE ls <> ld) GROUP BY label),
            deg AS (SELECT v, COUNT(*) AS deg FROM (SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v),
            vols AS (SELECT l.label, CAST(SUM(d.deg) AS DOUBLE) AS vol FROM deg d JOIN lab l ON l.v = d.v GROUP BY l.label),
            cv AS (SELECT v.label, COALESCE(c.cut, 0) AS cut, v.vol
                   FROM vols v LEFT JOIN cuts c ON c.label = v.label),
            terms AS (SELECT
                SUM(CASE WHEN cut > 0 THEN (cut / (SELECT tv FROM tv)) * LN(cut / (SELECT tv FROM tv)) ELSE 0 END) AS s_cut,
                SUM(CASE WHEN cut + vol > 0 THEN ((cut + vol) / (SELECT tv FROM tv)) * LN((cut + vol) / (SELECT tv FROM tv)) ELSE 0 END) AS s_cv,
                SUM(CASE WHEN vol > 0 THEN (vol / (SELECT tv FROM tv)) * LN(vol / (SELECT tv FROM tv)) ELSE 0 END) AS s_vol,
                SUM(cut) AS total_cut
                FROM cv)
            SELECT ROUND(
                CASE WHEN total_cut > 0
                     THEN (total_cut / (SELECT tv FROM tv)) * LN(total_cut / (SELECT tv FROM tv))
                     ELSE 0 END
                - 2 * s_cut + s_cv - s_vol, 8) AS map_eq
            FROM terms
        """,
        "global_clustering": f"""
            WITH ce AS MATERIALIZED ({CANONICAL_EDGES_SQL}),
            deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT src AS v FROM ce UNION ALL SELECT dst FROM ce) GROUP BY v),
            tri AS (SELECT COUNT(*) AS t FROM ce e1
                    JOIN ce e2 ON e2.src = e1.dst
                    JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            wed AS (SELECT SUM(deg * (deg - 1) // 2) AS w FROM deg)
            SELECT ROUND(3.0 * (SELECT t FROM tri) / (SELECT w FROM wed), 8) AS global_cc
        """,
        "web_text_roundtrip": "SELECT doc_id, text FROM documents",
        "web_edges": WEB_EDGES_SQL,
        "warc_roundtrip": WEB_EDGES_SQL,
        "robots_allowed": f"""
            SELECT 'https://site' || printf('%04d', doc_id % {D_DOMAINS}) ||
                   '.example/p/' || printf('%06d', doc_id) AS url,
                   CASE WHEN (doc_id % {D_DOMAINS}) % 7 = 3 THEN FALSE
                        WHEN (doc_id % {D_DOMAINS}) % 7 = 5 THEN doc_id < 100
                        ELSE TRUE END AS allowed
            FROM documents
        """,
        # host parse twin: page_url(doc_id) = https://site{doc_id%50:04d}.example/...
        "host_stats": """
            SELECT 'site' || lpad(CAST(doc_id % 50 AS VARCHAR), 4, '0') || '.example' AS host,
                   CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars
            FROM documents GROUP BY host ORDER BY host
        """,
        # Domain-balancing twin: first 5 doc_ids per reconstructed host.
        "host_capped_sample": """
            SELECT doc_id,
                   'site' || lpad(CAST(doc_id % 50 AS VARCHAR), 4, '0') || '.example' AS host
            FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id % 50 ORDER BY doc_id) <= 5
            ORDER BY host, doc_id
        """,
        "web_pagerank": web_pr,
        "truncated_pagerank": truncated_pr,
        # Host graph twin: host(doc) = site{doc%50:04d}.example over the
        # distinct page-level edge set; w = inter-page link count.
        "host_edges": f"""
            SELECT 'site' || lpad(CAST(src % 50 AS VARCHAR), 4, '0') || '.example' AS src,
                   'site' || lpad(CAST(dst % 50 AS VARCHAR), 4, '0') || '.example' AS dst,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM ({WEB_EDGES_SQL}) GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "host_pagerank": (
            _pagerank_w_sql(
                f"""SELECT * FROM (
                    SELECT 'site' || lpad(CAST(src % 50 AS VARCHAR), 4, '0') || '.example' AS src,
                           'site' || lpad(CAST(dst % 50 AS VARCHAR), 4, '0') || '.example' AS dst,
                           COUNT(*) AS w
                    FROM ({WEB_EDGES_SQL}) GROUP BY 1, 2
                ) WHERE src <> dst""",
                PR_ITERS,
                v_as="host",
            )
            + " ORDER BY host"
        ),
        # TrustRank twin: weighted PPR, teleport uniform on the 4-host
        # whitelist, strong convention (dangling mass leaks, no final
        # normalization) — exact vs host_trustrank(iterations=PR_ITERS).
        "host_trustrank": (lambda _he_sql, _seeds, _frac: (
            ",\n".join(
                [
                    f"WITH e AS MATERIALIZED ({_he_sql})",
                    "nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e)",
                    "od AS MATERIALIZED (SELECT src AS v, CAST(SUM(w) AS DOUBLE) AS d FROM e GROUP BY src)",
                    f"p0 AS MATERIALIZED (SELECT v, CASE WHEN v IN ({_seeds}) THEN {_frac} ELSE 0.0 END AS x FROM nodes)",
                ]
                + [
                    f"p{k} AS MATERIALIZED (SELECT n.v, "
                    f"0.15 * (CASE WHEN n.v IN ({_seeds}) THEN {_frac} ELSE 0.0 END) "
                    f"+ 0.85 * COALESCE(m.inc, 0) AS x FROM nodes n LEFT JOIN "
                    f"(SELECT e.dst AS v, SUM(p.x * e.w / od.d) AS inc "
                    f"FROM e JOIN p{k-1} p ON p.v = e.src JOIN od ON od.v = e.src "
                    f"GROUP BY e.dst) m ON m.v = n.v)"
                    for k in range(1, PR_ITERS + 1)
                ]
            )
            + f"\nSELECT v AS host, ROUND(x, 8) AS score FROM p{PR_ITERS} ORDER BY host"
        ))(
            f"""SELECT * FROM (
                SELECT 'site' || lpad(CAST(src % 50 AS VARCHAR), 4, '0') || '.example' AS src,
                       'site' || lpad(CAST(dst % 50 AS VARCHAR), 4, '0') || '.example' AS dst,
                       COUNT(*) AS w
                FROM ({WEB_EDGES_SQL}) GROUP BY 1, 2
            ) WHERE src <> dst""",
            ", ".join(f"'site{i:04d}.example'" for i in range(4)),
            "0.25",
        ),
        "web_hits": _hits_sql(
            f"SELECT src, dst FROM ({WEB_EDGES_SQL}) WHERE src <> dst",
            "SELECT CAST(doc_id AS BIGINT) AS v FROM documents",
            HITS_ITERS,
        ),
        "web_salsa": _salsa_sql(
            f"SELECT src, dst FROM ({WEB_EDGES_SQL}) WHERE src <> dst",
            "SELECT CAST(doc_id AS BIGINT) AS v FROM documents",
            HITS_ITERS,
        ),
        # Bow-tie twin: one recursive transitive closure r(s, d) over the
        # thinned page graph derives the SCC labels (min mutually reachable
        # id), the largest-SCC core, and all four reachability sets.
        "web_bowtie": f"""
            WITH RECURSIVE e AS MATERIALIZED (
                SELECT src, dst FROM ({WEB_EDGES_SQL})
                WHERE src <> dst AND ((src * 31 + dst * 17) % 97) % 10 < 4
            ),
            nodes AS (SELECT CAST(doc_id AS BIGINT) AS v FROM documents),
            r(s, d) AS (
                SELECT v, v FROM nodes
                UNION
                SELECT r.s, e.dst FROM r JOIN e ON e.src = r.d
            ),
            scc AS (
                SELECT a.s AS v, MIN(a.d) AS label
                FROM r a JOIN r b ON b.s = a.d AND b.d = a.s GROUP BY a.s
            ),
            core_label AS (
                SELECT label FROM scc GROUP BY label
                ORDER BY COUNT(*) DESC, label LIMIT 1
            ),
            core AS (SELECT v FROM scc WHERE label = (SELECT label FROM core_label)),
            f AS (SELECT DISTINCT r.d AS v FROM r WHERE r.s IN (SELECT v FROM core)),
            b AS (SELECT DISTINCT r.s AS v FROM r WHERE r.d IN (SELECT v FROM core)),
            inn AS (SELECT v FROM b WHERE v NOT IN (SELECT v FROM f)),
            outt AS (SELECT v FROM f WHERE v NOT IN (SELECT v FROM b)),
            fi AS (SELECT DISTINCT r.d AS v FROM r WHERE r.s IN (SELECT v FROM inn)),
            bo AS (SELECT DISTINCT r.s AS v FROM r WHERE r.d IN (SELECT v FROM outt))
            SELECT n.v, CASE
                WHEN n.v IN (SELECT v FROM f) AND n.v IN (SELECT v FROM b) THEN 'CORE'
                WHEN n.v IN (SELECT v FROM b) THEN 'IN'
                WHEN n.v IN (SELECT v FROM f) THEN 'OUT'
                WHEN n.v IN (SELECT v FROM fi) AND n.v IN (SELECT v FROM bo) THEN 'TUBE'
                WHEN n.v IN (SELECT v FROM fi) OR n.v IN (SELECT v FROM bo) THEN 'TENDRIL'
                ELSE 'DISC' END AS region
            FROM nodes n ORDER BY n.v
        """,
        # Spam-mass twin: both rank CTEs emit scores rounded to 8 (the
        # engine rounds its inputs identically before the ratio), so the
        # division runs on bit-identical doubles on both sides.
        "host_spam_mass": (lambda _pr_sql, _tr_sql: f"""
            SELECT p.host,
                   ROUND(CASE WHEN p.score > 0
                         THEN (p.score - COALESCE(t.score, 0)) / p.score
                         ELSE 0.0 END, 8) AS spam_mass
            FROM ({_pr_sql}) p LEFT JOIN ({_tr_sql}) t ON t.host = p.host
            ORDER BY p.host
        """)(
            _pagerank_w_sql(
                f"""SELECT * FROM (
                    SELECT 'site' || lpad(CAST(src % 50 AS VARCHAR), 4, '0') || '.example' AS src,
                           'site' || lpad(CAST(dst % 50 AS VARCHAR), 4, '0') || '.example' AS dst,
                           COUNT(*) AS w
                    FROM ({WEB_EDGES_SQL}) GROUP BY 1, 2
                ) WHERE src <> dst""",
                PR_ITERS,
                v_as="host",
            ),
            (lambda _he_sql, _seeds, _frac: (
                ",\n".join(
                    [
                        f"WITH e AS MATERIALIZED ({_he_sql})",
                        "nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e)",
                        "od AS MATERIALIZED (SELECT src AS v, CAST(SUM(w) AS DOUBLE) AS d FROM e GROUP BY src)",
                        f"p0 AS MATERIALIZED (SELECT v, CASE WHEN v IN ({_seeds}) THEN {_frac} ELSE 0.0 END AS x FROM nodes)",
                    ]
                    + [
                        f"p{k} AS MATERIALIZED (SELECT n.v, "
                        f"0.15 * (CASE WHEN n.v IN ({_seeds}) THEN {_frac} ELSE 0.0 END) "
                        f"+ 0.85 * COALESCE(m.inc, 0) AS x FROM nodes n LEFT JOIN "
                        f"(SELECT e.dst AS v, SUM(p.x * e.w / od.d) AS inc "
                        f"FROM e JOIN p{k-1} p ON p.v = e.src JOIN od ON od.v = e.src "
                        f"GROUP BY e.dst) m ON m.v = n.v)"
                        for k in range(1, PR_ITERS + 1)
                    ]
                )
                + f"\nSELECT v AS host, ROUND(x, 8) AS score FROM p{PR_ITERS}"
            ))(
                f"""SELECT * FROM (
                    SELECT 'site' || lpad(CAST(src % 50 AS VARCHAR), 4, '0') || '.example' AS src,
                           'site' || lpad(CAST(dst % 50 AS VARCHAR), 4, '0') || '.example' AS dst,
                           COUNT(*) AS w
                    FROM ({WEB_EDGES_SQL}) GROUP BY 1, 2
                ) WHERE src <> dst""",
                ", ".join(f"'site{i:04d}.example'" for i in range(4)),
                "0.25",
            ),
        ),
        # Pair-score twins: plain self-joins (the engine's max_degree=256
        # cap never binds at fixture out-degrees ≤ 4, so counts are exact).
        "cocitation_topk": f"""
            WITH e AS MATERIALIZED (
                SELECT src, dst FROM ({WEB_EDGES_SQL}) WHERE src <> dst
            )
            SELECT e1.dst AS a, e2.dst AS b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
            GROUP BY 1, 2
            ORDER BY n_common DESC, a, b LIMIT 20
        """,
        "coupling_topk": f"""
            WITH e AS MATERIALIZED (
                SELECT src, dst FROM ({WEB_EDGES_SQL}) WHERE src <> dst
            )
            SELECT e1.src AS a, e2.src AS b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
            GROUP BY 1, 2
            ORDER BY n_common DESC, a, b LIMIT 20
        """,
        "redirect_resolution": _redirect_sql(8),
        # BM25 twin: identical operand order everywhere (idf·tf·(k1+1) /
        # (tf + k1·(1-b+b·dl/avgdl))), so rounded scores match exactly;
        # per-doc 4-term sums differ only by addition order (≪ round grid).
        "bm25_topk": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                                 x -> x <> '') AS ws
              FROM documents),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
                      FROM toks),
            q(term) AS (VALUES {", ".join(f"('{t}')" for t in BM25_TERMS)}),
            df AS (SELECT q.term,
                          (SELECT COUNT(*) FROM toks WHERE list_contains(toks.ws, q.term)) AS df
                   FROM q),
            tf AS (SELECT t.doc_id, q.term,
                          CAST(len(list_filter(t.ws, w -> w = q.term)) AS DOUBLE) AS tf,
                          CAST(len(t.ws) AS DOUBLE) AS dl
                   FROM toks t CROSS JOIN q),
            sc AS (SELECT tf.doc_id,
                          SUM(LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                              * tf.tf * (1.2 + 1)
                              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))) AS score
                   FROM tf JOIN df USING (term) CROSS JOIN stats
                   WHERE tf.tf > 0
                   GROUP BY tf.doc_id)
            SELECT doc_id, ROUND(score, 8) AS score FROM sc
            ORDER BY ROUND(score, 8) DESC, doc_id LIMIT 20
        """,
        "document_frequency": r"""
            WITH toks AS (
              SELECT doc_id,
                     UNNEST(list_distinct(list_filter(
                         string_split_regex(lower(text), '[^a-z0-9_]+'),
                         x -> x <> ''))) AS term
              FROM documents)
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM toks GROUP BY term HAVING COUNT(*) >= 5 ORDER BY term
        """,
        # Gopher-filter twin: every rule recomputed in list/regexp algebra;
        # ratio comparisons divide the same ints as the engine, so the
        # boundary behavior is bit-identical.
        "gopher_filter": r"""
            WITH feats AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[A-Za-z0-9_]+') AS words,
                     string_split(text, chr(10)) AS lines,
                     len(regexp_extract_all(text, '[#…]')) AS n_sym
              FROM documents),
            f2 AS (
              SELECT doc_id,
                     len(words) AS nw,
                     CAST(COALESCE(list_sum(list_transform(words, w -> length(w))), 0) AS DOUBLE)
                       / GREATEST(len(words), 1) AS mwl,
                     CAST(n_sym AS DOUBLE) / GREATEST(len(words), 1) AS sym_ratio,
                     CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE)
                       / GREATEST(len(lines), 1) AS bullet_frac,
                     CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS DOUBLE)
                       / GREATEST(len(lines), 1) AS ell_frac,
                     CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                       / GREATEST(len(words), 1) AS alpha_frac,
                     len(list_filter(['the','be','to','of','and','that','have','with'],
                         sw -> list_contains(list_transform(words, w -> lower(w)), sw))) AS n_stop
              FROM feats),
            fl AS (
              SELECT doc_id,
                     (CASE WHEN nw < 50 OR nw > 100000 THEN 1 ELSE 0 END)
                   + (CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 2 ELSE 0 END)
                   + (CASE WHEN sym_ratio > 0.1 THEN 4 ELSE 0 END)
                   + (CASE WHEN bullet_frac > 0.9 THEN 8 ELSE 0 END)
                   + (CASE WHEN ell_frac > 0.3 THEN 16 ELSE 0 END)
                   + (CASE WHEN alpha_frac < 0.8 THEN 32 ELSE 0 END)
                   + (CASE WHEN n_stop < 2 THEN 64 ELSE 0 END) AS fail_flags
              FROM f2)
            SELECT doc_id,
                   CAST(fail_flags = 0 AS BIGINT) AS keep,
                   CAST(fail_flags AS BIGINT) AS fail_flags
            FROM fl ORDER BY doc_id
        """,
        # Hill-MLE twin over the weighted host in-degree (self-loops kept,
        # as host_edges emits them); shift = dmin - 1/2 = 4.5.
        "powerlaw_alpha_hosts": f"""
            WITH he AS (
                SELECT 'site' || lpad(CAST(src % 50 AS VARCHAR), 4, '0') || '.example' AS src,
                       'site' || lpad(CAST(dst % 50 AS VARCHAR), 4, '0') || '.example' AS dst,
                       COUNT(*) AS w
                FROM ({WEB_EDGES_SQL}) GROUP BY 1, 2
            ),
            ind AS (SELECT dst AS host, CAST(SUM(w) AS DOUBLE) AS deg FROM he GROUP BY dst)
            SELECT ROUND(1 + COUNT(*) / SUM(LN(deg / 4.5)), 8) AS alpha,
                   CAST(COUNT(*) AS BIGINT) AS n_tail
            FROM ind WHERE deg >= 5
        """,
        # Anchor-text twins: replay the fixture's link arithmetic in document
        # order (ref0..ref2, next; the #cite fragment and case duplicates
        # always repeat ref0's target so first-wins drops them) and keep the
        # first anchor per (src, dst) — exactly the extractor's per-page
        # seen-set semantics (URL ↔ doc id is a bijection, N % 50 == 0).
        "anchor_texts": f"""
            WITH nd AS (SELECT COUNT(*) AS n FROM documents),
            links AS (
                SELECT doc_id AS src,
                       CAST((doc_id * {A_MULT} + k.k * {LINK_OFFSET}) % nd.n AS BIGINT) AS dst,
                       'ref' || CAST(k.k - 1 AS VARCHAR) AS anchor, k.k AS ord
                FROM documents, nd, (VALUES (1), (2), (3)) k(k)
                WHERE k.k <= 1 + doc_id % 3
                UNION ALL
                SELECT doc_id, CAST((doc_id + {D_DOMAINS}) % nd.n AS BIGINT), 'next', 4
                FROM documents, nd
            )
            SELECT src, dst, anchor FROM links
            QUALIFY ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY ord) = 1
            ORDER BY src, dst
        """,
        "anchor_summary": f"""
            WITH nd AS (SELECT COUNT(*) AS n FROM documents),
            links AS (
                SELECT doc_id AS src,
                       CAST((doc_id * {A_MULT} + k.k * {LINK_OFFSET}) % nd.n AS BIGINT) AS dst,
                       'ref' || CAST(k.k - 1 AS VARCHAR) AS anchor, k.k AS ord
                FROM documents, nd, (VALUES (1), (2), (3)) k(k)
                WHERE k.k <= 1 + doc_id % 3
                UNION ALL
                SELECT doc_id, CAST((doc_id + {D_DOMAINS}) % nd.n AS BIGINT), 'next', 4
                FROM documents, nd
            ),
            fw AS (
                SELECT src, dst, anchor FROM links
                QUALIFY ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY ord) = 1
            ),
            cnt AS (
                SELECT dst, anchor, CAST(COUNT(*) AS BIGINT) AS n
                FROM fw GROUP BY dst, anchor
            ),
            tot AS (SELECT dst, CAST(SUM(n) AS BIGINT) AS n_links FROM cnt GROUP BY dst)
            SELECT c.dst, c.anchor AS top_anchor, t.n_links
            FROM cnt c JOIN tot t USING (dst)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY c.dst ORDER BY c.n DESC, c.anchor) = 1
            ORDER BY c.dst
        """,
        "anchor_histogram": f"""
            WITH nd AS (SELECT COUNT(*) AS n FROM documents),
            links AS (
                SELECT doc_id AS src,
                       CAST((doc_id * {A_MULT} + k.k * {LINK_OFFSET}) % nd.n AS BIGINT) AS dst,
                       'ref' || CAST(k.k - 1 AS VARCHAR) AS anchor, k.k AS ord
                FROM documents, nd, (VALUES (1), (2), (3)) k(k)
                WHERE k.k <= 1 + doc_id % 3
                UNION ALL
                SELECT doc_id, CAST((doc_id + {D_DOMAINS}) % nd.n AS BIGINT), 'next', 4
                FROM documents, nd
            ),
            fw AS (
                SELECT anchor FROM links
                QUALIFY ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY ord) = 1
            )
            SELECT anchor, CAST(COUNT(*) AS BIGINT) AS n_links FROM fw
            GROUP BY anchor ORDER BY anchor
        """,
        "exact_dedup":"SELECT md5(text) AS text_md5, CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY md5(text)",
        # PII-redaction twin: identical corpus construction + staged RE2
        # replacements; counts are taken on the running text exactly as
        # the engine's ordered pattern loop does
        "redact_pii": r"""
            WITH corpus AS (
                SELECT CAST(c_custkey AS BIGINT) AS doc_id,
                       'Contact ' || c_name || ' at user' || c_custkey
                       || '@site' || (c_custkey % 50)
                       || '.example or +1-' || (100 + c_custkey % 900)
                       || '-' || (1000 + (c_custkey * 7) % 9000)
                       || ' from ' || (c_custkey % 256)
                       || '.' || ((c_custkey * 3) % 256)
                       || '.' || ((c_custkey * 7) % 256)
                       || '.' || ((c_custkey * 13) % 256) || ' done' AS t0
                FROM customer),
            s1 AS (SELECT doc_id, t0,
                       CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS c1,
                       regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
                   FROM corpus),
            s2 AS (SELECT doc_id, c1, t1,
                       CAST(len(regexp_extract_all(t1, '\+1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS c2,
                       regexp_replace(t1, '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t2
                   FROM s1),
            s3 AS (SELECT doc_id, c1, c2,
                       CAST(len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS c3,
                       regexp_replace(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS clean_text
                   FROM s2)
            SELECT doc_id, clean_text, c1 + c2 + c3 AS n_redactions
            FROM s3 ORDER BY doc_id
        """,
        # ExactSubstr twin: identical window strings group together
        # (tokens cannot contain the separator, so the space-joined
        # window string bijects with the token tuple the engine hashes)
        "substring_dedup": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            tk AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS pos FROM toks),
            tc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS T FROM tk GROUP BY doc_id),
            win AS (
                SELECT t.doc_id, t.pos AS p, STRING_AGG(t2.tok, ' ' ORDER BY t2.pos) AS s
                FROM tk t
                JOIN tc c ON c.doc_id = t.doc_id
                JOIN tk t2 ON t2.doc_id = t.doc_id AND t2.pos BETWEEN t.pos AND t.pos + 7
                WHERE t.pos + 8 <= c.T
                GROUP BY t.doc_id, t.pos
            ),
            winr AS (SELECT doc_id, p FROM (
                SELECT doc_id, p, ROW_NUMBER() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn
                FROM win) WHERE rn = 1),
            kept AS (
                SELECT t.doc_id, t.pos, t.tok FROM tk t JOIN tc c ON c.doc_id = t.doc_id
                WHERE c.T < 8 OR EXISTS (
                    SELECT 1 FROM winr k WHERE k.doc_id = t.doc_id
                      AND k.p BETWEEN GREATEST(t.pos - 7, 0) AND LEAST(t.pos, c.T - 8)
                )
            )
            SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id ORDER BY doc_id
        """,
        "segment_dedup": """
            WITH toks AS (
                SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord
                FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
            ), segs AS (
                SELECT doc_id, CAST((ord - 1) // 8 AS BIGINT) AS seg_no,
                       STRING_AGG(tok, ' ' ORDER BY ord) AS seg
                FROM toks GROUP BY doc_id, (ord - 1) // 8
            ), keep AS (
                SELECT doc_id, seg_no, seg,
                       ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
                FROM segs
            )
            SELECT doc_id, STRING_AGG(seg, ' ' ORDER BY seg_no) AS clean_text
            FROM keep WHERE rn = 1 GROUP BY doc_id
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_bpeish
            FROM documents
        """,
        # lm_cross_entropy twin: Laplace bigram LM trained on the corpus,
        # per-doc cross-entropy; V = #contexts + 1.
        "lm_cross_entropy": r"""
            WITH toks AS (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws
                FROM documents),
            bi AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
                   FROM toks, UNNEST(generate_series(1, GREATEST(len(ws) - 1, 0))) AS g(i)),
            c12 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c FROM bi GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c FROM bi GROUP BY w1),
            v AS (SELECT COUNT(*) + 1.0 AS v FROM c1),
            scored AS (SELECT bi.doc_id,
                              -LN((c12.c + 1.0) / (c1.c + (SELECT v FROM v))) AS nll
                       FROM bi JOIN c12 ON c12.w1 = bi.w1 AND c12.w2 = bi.w2
                               JOIN c1 ON c1.w1 = bi.w1),
            agg AS (SELECT doc_id, SUM(nll) AS nll, CAST(COUNT(*) AS BIGINT) AS n
                    FROM scored GROUP BY doc_id)
            SELECT d.doc_id, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bigrams,
                   ROUND(COALESCE(a.nll / a.n, 0), 8) AS cross_entropy
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # contamination_check twin: distinct word-trigram overlap between
        # the train slice and the %97 benchmark slice.
        "contamination": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS ws
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, u.s AS s
              FROM toks,
                   UNNEST(list_transform(generate_series(1, GREATEST(len(ws) - 2, 0)),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS u(s)),
            bm AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
            SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS hits
            FROM tr JOIN bm ON bm.s = tr.s
            GROUP BY tr.doc_id
            HAVING COUNT(*) >= 1
            ORDER BY tr.doc_id
        """,
        # token_shards twin: running whitespace-token cumsum // budget.
        "token_shards": r"""
            WITH tc AS (SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
                FROM documents),
            c AS (SELECT doc_id, n_tokens,
                         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                           - n_tokens AS before
                  FROM tc)
            SELECT doc_id, n_tokens, CAST(before // 2000 AS BIGINT) AS shard
            FROM c ORDER BY doc_id
        """,
        # sample_documents twin: the per-document hash coin.
        "doc_sample": """
            SELECT doc_id, lang FROM documents
            WHERE (doc_id * 2654435761 + 3) % 2147483648
                  < CAST(0.4 * 2147483648 AS BIGINT)
            ORDER BY doc_id
        """,
        # TF-IDF twin (analysis.py:tfidf_top_terms normative semantics):
        # [a-z0-9]+ tokens of lower(text), score = tf·ln(N/df), top-3 by
        # (score DESC, term ASC).
        "tfidf_top_terms": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM tok GROUP BY doc_id, term),
            df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            sc AS (SELECT tf.doc_id, tf.term,
                          tf.tf * LN((SELECT COUNT(*) FROM documents) * 1.0 / df.df) AS s
                   FROM tf JOIN df USING (term)),
            rk AS (SELECT doc_id, term, s,
                          ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY s DESC, term) AS r
                   FROM sc)
            SELECT doc_id, term, ROUND(s, 8) AS score
            FROM rk WHERE r <= 3 ORDER BY doc_id, term
        """,
        # Exact discrete percentiles: nearest-rank = quantile_disc
        # (analysis.py:token_count_percentiles histogram-cumsum semantics).
        "token_percentiles": r"""
            WITH tc AS (
                SELECT lang,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END
                            AS BIGINT) AS n
                FROM documents)
            SELECT lang,
                   CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
                   CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90,
                   CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99
            FROM tc GROUP BY lang ORDER BY lang
        """,
        # Gopher-repetition twin: exact token/3-gram distinct ratios.
        "repetition_scores": r"""
            WITH toks AS (
              SELECT doc_id, g.tok, g.ord FROM documents,
              LATERAL (
                SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok,
                       generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9_]+'), 1) AS ord
              ) g
            ),
            wd AS (
              SELECT doc_id, COUNT(*) AS nt, COUNT(DISTINCT tok) AS ndt
              FROM toks GROUP BY doc_id
            ),
            g3 AS (
              SELECT doc_id,
                     tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS gram,
                     ord, COUNT(*) OVER (PARTITION BY doc_id) AS nt
              FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
            ),
            g3v AS (SELECT doc_id, gram FROM g3 WHERE gram IS NOT NULL AND ord <= nt - 2),
            gd AS (SELECT doc_id, COUNT(*) AS ng, COUNT(DISTINCT gram) AS ndg FROM g3v GROUP BY doc_id)
            SELECT d.doc_id,
                   ROUND(CASE WHEN wd.nt > 0 THEN 1.0 - CAST(wd.ndt AS DOUBLE)/wd.nt ELSE 0 END, 6) AS dup_word_frac,
                   ROUND(COALESCE(1.0 - CAST(gd.ndg AS DOUBLE)/gd.ng, 0), 6) AS dup_3gram_frac
            FROM documents d
            LEFT JOIN wd ON wd.doc_id = d.doc_id
            LEFT JOIN gd ON gd.doc_id = d.doc_id
        """,
        "quality_scores": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentences,
                   ROUND(CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / GREATEST(length(text), 1), 6) AS alpha_ratio,
                   ROUND(CAST(length(regexp_replace(text, '[^A-Za-z0-9_]', '', 'g')) AS DOUBLE)
                         / GREATEST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')), 1), 6) AS mean_word_len
            FROM documents
        """,
        "fingerprint_md5": "SELECT doc_id, md5(text) AS md5 FROM documents",
        "lang_histogram": "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang",
        "langid": _langid_sql(),
        "jaccard_near_dups": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), t -> t <> '') AS ws
              FROM documents),
            -- word-trigram shingles as strings; the engine hashes the same
            -- trigrams 64-bit, so set sizes/intersections agree exactly
            -- (testdata docs all have ≥ 3 tokens, so the short-doc fold
            -- path of tokenize.shingle_hashes_batch never fires here)
            sh AS (
              SELECT DISTINCT doc_id, u.s AS s
              FROM toks,
                   UNNEST(list_transform(generate_series(1, GREATEST(len(ws) - 2, 0)),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS u(s)),
            sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id),
            j AS (
              SELECT a, b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
              FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b)
            SELECT a, b, ROUND(jac, 6) AS jaccard FROM j WHERE jac >= 0.8
        """,
        "embedding_near_dups_exact": """
            WITH nv AS (
              SELECT vec_id,
                     list_transform(embedding, x -> x / sqrt(list_sum(list_transform(embedding, y -> y*y)))) AS nvec
              FROM embeddings)
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_dot_product(a.nvec, b.nvec), 6) AS cos
            FROM nv a JOIN nv b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.nvec, b.nvec) >= 0.4
        """,
        # seeded spherical k-means training replayed in SQL (init + Lloyd
        # rounds + final assignment); floats inside the driver's 1e-9 band
        "kmeans_clusters": _kmeans_clusters_sql(8, 3),
        "ann_ivf_topk": _ivf_topk_sql(16, 3, 4, 5),
        # hash-plane (splitmix64 + Box-Muller) LSH replays
        "ann_lsh_topk": _lsh_topk_sql(8, 2, 5),
        "embedding_near_dups": _embed_near_dups_sql(32, 4, 0.4),
        # md5-token-hash simhash replay
        "simhash_near_dups": _simhash_sql(3, 200),
        # md5 tokens + splitmix permutations: full MinHash+LSH replay
        "minhash_near_dups": _minhash_sql(0.8, 64, 16, 42, 200),
        # splitmix noise bytes: synth->PPM->decode->features replay
        "multimodal_decode": _multimodal_sql(200),
        # splitmix coordinate draws: cold hyperbolic RGG replay
        "hyperbolic_edges": _hyperbolic_sql(512, 6.0, 0.85, 42),
        # splitmix init + unrolled pivot-BFS + 20 majorization updates
        "stress_layout": _stress_sql(8, 20, 42).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        # unrolled CG replays of the Laplacian solves (engine converges in
        # <=24 iterations on the sf fixtures; T=40 is the safety margin)
        "commute_time": _commute_time_sql(40).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        # oracle runs its OWN 8x8 eigensolver (unrolled cyclic Jacobi)
        "pivot_mds": _pivot_mds_sql(8, 2, sweeps=6).replace("{SYM}", SYMMETRIC_EDGES_SQL),
        "spanning_edge_centrality": _sec_sql(48, 42, 40).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "electrical_closeness": _ec_sql(48, 42, 40).replace(
            "{SYM}", SYMMETRIC_EDGES_SQL
        ),
        "ann_topk": """
            WITH nv AS (
              SELECT vec_id,
                     list_transform(embedding, x -> x / sqrt(list_sum(list_transform(embedding, y -> y*y)))) AS nvec
              FROM embeddings),
            q AS (SELECT vec_id AS query_id, nvec AS qv FROM nv WHERE vec_id IN (0, 1, 2, 3, 4)),
            scored AS (
              SELECT q.query_id, nv.vec_id, list_dot_product(q.qv, nv.nvec) AS score
              FROM q CROSS JOIN nv),
            ranked AS (
              SELECT query_id, vec_id, score,
                     CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS BIGINT) AS rank
              FROM scored)
            SELECT query_id, rank, vec_id, ROUND(score, 6) AS score
            FROM ranked WHERE rank <= 5
        """,
        "tumbling_window": """
            SELECT user_id,
                   CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS win,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY user_id, win
        """,
        "sliding_window": """
            -- window w covers [w*slide, w*slide + window); slide = 30 min,
            -- window = 1 h => every event lands in 2 windows
            WITH o AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
            fan AS (
              SELECT user_id, tus, value, CAST(FLOOR(tus / 1800000000) AS BIGINT) - k.k AS win
              FROM o CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) k
              WHERE CAST(FLOOR(tus / 1800000000) AS BIGINT) - k.k >= 0)
            SELECT user_id, win, CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM fan GROUP BY user_id, win
        """,
        "asof_click_to_view": """
            WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
            r AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'view'),
            pairs AS (
              SELECT l.user_id, l.event_id AS l_event_id, l.ts_us AS l_ts_us,
                     r.event_id AS r_event_id, r.ts_us AS r_ts_us,
                     row_number() OVER (PARTITION BY l.event_id
                                        ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
              FROM l JOIN r ON r.user_id = l.user_id AND r.ts_us <= l.ts_us)
            SELECT user_id, l_event_id, l_ts_us, r_event_id, r_ts_us
            FROM pairs WHERE rn = 1
        """,
        "sessionize": """
            WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
            marked AS (
              SELECT user_id, tus,
                     CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM o),
            sess AS (
              SELECT user_id, tus,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY tus ROWS UNBOUNDED PRECEDING) AS session
              FROM marked)
            SELECT user_id, CAST(session AS BIGINT) AS session,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(MIN(tus) AS BIGINT) AS start_us,
                   CAST(MAX(tus) AS BIGINT) AS end_us
            FROM sess GROUP BY user_id, session
        """,
        "event_type_histogram": "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type",
    }
    sql["top_harmonic_closeness"] = (
        "SELECT * FROM (" + sql["harmonic_closeness_exact"] + ") "
        "ORDER BY harmonic DESC, v LIMIT 10"
    )
    return sql
