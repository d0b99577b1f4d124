"""Driver-contract conformance: a fast subset of queries() vs oracle_sql().

The full battery is exercised by the driver at sf0.01; this keeps a quick
representative slice in the local suite (one per operator family).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as E

FAST_SUBSET = [
    "edge_table",
    "degree_table",
    "graph_stats",
    "compact_ids",
    "pagerank",
    "connected_components",
    "triangle_count",
    "lcc",
    "web_edges",
    "exact_dedup",
    "token_counts",
    "quality_scores",
    "tumbling_window",
    "sessionize",
    # round-2 session additions (one per new family)
    "jaccard_near_dups",
    "embedding_near_dups_exact",
    "link_prediction",
    "stable_partition_nodes",
    "eccentricity",
    "random_walks",
    "luby_mis",
    "local_max_matching",
    "personalized_pagerank",
    "reciprocity",
    "permanence",
    "spsp",
    "group_closeness",
    "diameter",
    "local_degree_scores",
    "simmelian_overlap",
    "scan_clustering",
    "harmonic_closeness_exact",
    "local_similarity",
    "graph_difference",
    # round-3 session additions
    "graphtool_roundtrip",
    "thrill_roundtrip",
    "dibap_roundtrip",
    "binary_partition_roundtrip",
    "repetition_scores",
    "host_stats",
    "host_capped_sample",
    "reachable_nodes",
    "apply_events_roundtrip",
    "curveball_degrees",
    "simple_paths",
    "set_conductance",
    "clustering_generator",
    "dgs_roundtrip",
    "bloom_prefilter",
    "scd_ground_truth",
    "normalize_text",
    "incremental_bfs",
    "binary_edgelist_roundtrip",
    "partitioned_sink_roundtrip",
    "bidirectional_bfs",
    "random_bfs_community",
    "tfidf_top_terms",
    "token_percentiles",
    "host_edges",
    "host_pagerank",
    "anchor_texts",
    "anchor_histogram",
    "web_hits",
    "host_trustrank",
    "anchor_summary",
    "web_salsa",
    "web_bowtie",
    "host_spam_mass",
    "powerlaw_alpha_hosts",
    "cocitation_topk",
    "coupling_topk",
    "redirect_resolution",
    "gopher_filter",
    "document_frequency",
    "bm25_topk",
    "truncated_pagerank",
    "plp_communities",
    "core_decomposition",
    "betweenness_pivots",
    "rmat_edges",
    "er_edges",
    "segment_dedup",
    "warc_roundtrip",
    "robots_allowed",
    "watts_strogatz_edges",
    "greedy_coloring",
    "hop_plot",
    "effective_diameter",
    "approx_distinct_users",
    "lp_degree_ordered",
    "barabasi_albert",
    "k_path_centrality",
    "spanning_forest",
    "forest_fire_scores",
    "chung_lu_edges",
    "node2vec_walks",
    "prefix_jaccard_scores",
    "dyn_betweenness",
    "betweenness",
    "warm_pagerank",
    "warm_katz",
    "langid",
    "ged_walk",
    "maximal_cliques",
    "biconnected_components",
    "gce_community",
    "localt_community",
    "clique_detect",
    "combined_scd",
    "two_phase_l",
    "lfm_community",
    "max_flow",
    "approx_global_clustering",
]


def _to_df(x):
    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


@pytest.fixture(scope="module")
def con(sf_tiny):
    c = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_tiny}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(name, sf_tiny, con):
    got = _to_df(E.queries()[name](sf_tiny))
    exp = con.execute(E.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (name, got.columns, exp.columns)
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp), name
    for c in cols:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), atol=1e-9, err_msg=f"{name}.{c}"
            )
        else:
            assert (a == b).all(), f"{name}.{c}"


def test_queries_oracles_consistent():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs), "oracle without a query"
    # every query carries an exact DuckDB twin (since round 4) EXCEPT the
    # three deliberate default-mode rows-only queries (round-4 advice:
    # the shipping stochastic defaults stay on the driver surface even
    # though their draws have no SQL twin; their invariants are pinned by
    # tests/test_lfr.py, tests/test_embedding.py, tests/test_scd.py)
    rows_only = set(qs) - set(os_)
    assert rows_only == {
        "lfr_edges_default", "sgns_embeddings_default", "lfm_cover_full",
    }


def test_entry_smoke():
    df = E.entry()
    assert len(df) == 20
    assert {"v", "score"} <= set(df.columns)
    assert df["score"].iloc[0] >= df["score"].iloc[-1]
