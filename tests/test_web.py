"""Web layer: byte-identical text roundtrip + edge extraction vs arithmetic oracle."""

import duckdb
import numpy as np
import pytest

from networkit_ray.web.extract import extract_edges, extract_texts, normalize_url
from networkit_ray.web.htmlgen import (
    WEB_EDGES_SQL,
    num_documents,
    outlink_targets,
    pages_dataset,
)


class TestNormalizeUrl:
    def test_basics(self):
        base = "https://site0001.example/p/000051"
        assert (
            normalize_url(base, "/p/000101")
            == "https://site0001.example/p/000101"
        )
        assert (
            normalize_url(base, "HTTPS://SITE0002.EXAMPLE/p/000003")
            == "https://site0002.example/p/000003"
        )
        assert (
            normalize_url(base, "https://a.example/x#frag")
            == "https://a.example/x"
        )
        assert normalize_url(base, "mailto:x@y.z") is None
        assert normalize_url(base, "javascript:void(0)") is None


class TestWebPipeline:
    def test_text_roundtrip_byte_identical(self, sf_tiny):
        pages = pages_dataset(sf_tiny)
        got = extract_texts(pages).to_pandas().sort_values("doc_id")
        expect = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{sf_tiny}/documents.parquet') ORDER BY doc_id"
        ).df()
        assert list(got["doc_id"]) == list(expect["doc_id"])
        # byte-identical, not just equal-after-normalization
        for g, e in zip(got["text"], expect["text"]):
            assert g.encode("utf-8") == e.encode("utf-8")

    def test_edges_match_arithmetic_oracle(self, sf_tiny):
        pages = pages_dataset(sf_tiny)
        got = (
            extract_edges(pages, ids="doc", concurrency=(1, 2))
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = (
            con.execute(f"SELECT src, dst FROM ({WEB_EDGES_SQL}) ORDER BY src, dst")
            .df()
        )
        assert got.shape == expect.shape
        assert (got["src"].to_numpy() == expect["src"].to_numpy()).all()
        assert (got["dst"].to_numpy() == expect["dst"].to_numpy()).all()

    def test_hash_ids_deterministic(self, sf_tiny):
        pages = pages_dataset(sf_tiny)
        a = extract_edges(pages, ids="hash").to_pandas()
        b = extract_edges(pages, ids="hash", concurrency=(1, 2), batch_size=64).to_pandas()
        ka = set(zip(a["src"], a["dst"]))
        kb = set(zip(b["src"], b["dst"]))
        assert ka == kb
        # same multiplicity of rows as the doc-id graph
        n = num_documents(sf_tiny)
        t1, t2 = outlink_targets(0, n)
        assert len(ka) > 0

    def test_host_stats_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E
        import numpy as np

        got = (
            E.queries()["host_stats"](sf_tiny)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = (
            con.execute(E.oracle_sql()["host_stats"])
            .df()
            .sort_values("host")
            .reset_index(drop=True)
        )
        assert got.shape == expect.shape
        assert np.all(got[sorted(got.columns)].values == expect[sorted(expect.columns)].values)

    def test_host_edges_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        got = (
            E.queries()["host_edges"](sf_tiny)
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = con.execute(E.oracle_sql()["host_edges"]).df()
        assert got.shape == expect.shape
        for c in ("src", "dst", "w"):
            assert (got[c].to_numpy() == expect[c].to_numpy()).all()

    def test_host_pagerank_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        got = (
            E.queries()["host_pagerank"](sf_tiny)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = con.execute(E.oracle_sql()["host_pagerank"]).df()
        assert got.shape == expect.shape
        assert (got["host"].to_numpy() == expect["host"].to_numpy()).all()
        assert np.abs(got["score"].to_numpy() - expect["score"].to_numpy()).max() < 1e-9
        # rank mass is a probability distribution before rounding
        assert abs(got["score"].sum() - 1.0) < 1e-4

    def test_host_trustrank_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        got = (
            E.queries()["host_trustrank"](sf_tiny)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = con.execute(E.oracle_sql()["host_trustrank"]).df()
        assert got.shape == expect.shape
        assert (got["host"].to_numpy() == expect["host"].to_numpy()).all()
        assert np.abs(got["score"].to_numpy() - expect["score"].to_numpy()).max() < 1e-9
        # trust concentrates at the whitelist: every seed outranks the median
        seeds = {f"site{i:04d}.example" for i in range(4)}
        med = got["score"].median()
        assert (got[got["host"].isin(seeds)]["score"] > med).all()

    def test_anchor_texts_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        got = (
            E.queries()["anchor_texts"](sf_tiny)
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = con.execute(E.oracle_sql()["anchor_texts"]).df()
        assert got.shape == expect.shape
        for c in ("src", "dst", "anchor"):
            assert (got[c].to_numpy() == expect[c].to_numpy()).all()
        # anchors biject with the deduplicated page edge set
        edges = extract_edges(pages_dataset(sf_tiny), ids="doc").to_pandas()
        assert len(got) == len(edges)

    def test_anchor_histogram_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        got = E.queries()["anchor_histogram"](sf_tiny).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = con.execute(E.oracle_sql()["anchor_histogram"]).df()
        assert list(got["anchor"]) == list(expect["anchor"])
        assert (got["n_links"].to_numpy() == expect["n_links"].to_numpy()).all()
        # the #cite fragment and case-duplicate anchors never survive dedup
        assert not set(got["anchor"]) & {"cite", "dup"}

    def test_anchor_summary_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        got = E.queries()["anchor_summary"](sf_tiny).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = con.execute(E.oracle_sql()["anchor_summary"]).df()
        assert got.shape == expect.shape
        for c in ("dst", "top_anchor", "n_links"):
            assert (got[c].to_numpy() == expect[c].to_numpy()).all()
        # every target of the fixture graph receives at least one link
        assert (got["n_links"] >= 1).all()

    def test_cap_per_host(self, sf_tiny):
        import __ray_entry__ as E
        import numpy as np

        got = (
            E.queries()["host_capped_sample"](sf_tiny)
            .to_pandas()
            .sort_values(["host", "doc_id"])
            .reset_index(drop=True)
        )
        # ≤ 5 per host, and each host's kept ids are its smallest doc ids
        per_host = got.groupby("host")["doc_id"].agg(["count", "max"])
        assert (per_host["count"] <= 5).all()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = (
            con.execute(E.oracle_sql()["host_capped_sample"])
            .df()
            .sort_values(["host", "doc_id"])
            .reset_index(drop=True)
        )
        assert got.shape == expect.shape
        assert np.all(got[sorted(got.columns)].values == expect[sorted(expect.columns)].values)


class TestRobots:
    """web/robots.py — REP longest-match semantics + corpus admission."""

    def test_longest_match_and_tiebreak(self):
        from networkit_ray.web.robots import is_allowed, parse_robots

        rules = parse_robots(
            "User-agent: *\nDisallow: /a/\nAllow: /a/b/\nDisallow: /a/b/c\n"
        )
        assert is_allowed("/x", rules)            # no rule
        assert not is_allowed("/a/z", rules)      # /a/ disallow
        assert is_allowed("/a/b/z", rules)        # longer allow wins
        assert not is_allowed("/a/b/c/d", rules)  # longest disallow wins
        # length tie: Allow wins
        tie = parse_robots("User-agent: *\nDisallow: /p/\nAllow: /q:/\n")
        assert is_allowed("/q:/x", tie)

    def test_wildcard_rules(self):
        from networkit_ray.web.robots import is_allowed, parse_robots

        rules = parse_robots(
            "User-agent: *\n"
            "Disallow: /*.php\n"
            "Allow: /shop/*.php\n"
            "Disallow: /tmp$\n"
            "Disallow: /a*b*c\n"
        )
        assert not is_allowed("/index.php", rules)        # mid-path wildcard
        assert not is_allowed("/dir/page.php?x=1", rules) # * spans segments
        assert is_allowed("/shop/cart.php", rules)        # longer Allow wins
        assert not is_allowed("/tmp", rules)              # $ end anchor hits
        assert is_allowed("/tmpfile", rules)              # $ anchor misses
        assert not is_allowed("/aXbYc", rules)            # multiple *
        assert is_allowed("/plain", rules)                # no rule matches
        # regex metacharacters in rules are literal (except * and trailing $)
        dot = parse_robots("User-agent: *\nDisallow: /f.o\n")
        assert is_allowed("/fXo", dot) and not is_allowed("/f.o", dot)
        # $ not at the end is a literal character
        lit = parse_robots("User-agent: *\nDisallow: /p$q\n")
        assert not is_allowed("/p$qr", lit) and is_allowed("/pXq", lit)

    def test_agent_group_selection(self):
        from networkit_ray.web.robots import is_allowed, parse_robots

        body = (
            "User-agent: badbot\nDisallow: /\n\n"
            "User-agent: goodbot\nUser-agent: otherbot\nDisallow: /private/\n\n"
            "User-agent: *\nDisallow: /p/\n"
        )
        star = parse_robots(body)                     # falls to *
        assert not is_allowed("/p/x", star) and is_allowed("/private/x", star)
        good = parse_robots(body, agent="GoodBot")    # case-insensitive exact
        assert is_allowed("/p/x", good) and not is_allowed("/private/x", good)
        bad = parse_robots(body, agent="badbot")
        assert not is_allowed("/anything", bad)

    def test_empty_disallow_allows_all(self):
        from networkit_ray.web.robots import is_allowed, parse_robots

        rules = parse_robots("User-agent: *\nDisallow:\n")
        assert rules == [] and is_allowed("/p/000001", rules)

    def test_corpus_admission_rule(self, sf_tiny):
        from networkit_ray.web.htmlgen import D_DOMAINS
        from networkit_ray.web.htmlgen import pages_dataset
        from networkit_ray.web.robots import robots_filter, robots_table

        out = robots_filter(
            pages_dataset(sf_tiny), robots_table(D_DOMAINS)
        ).to_pandas()
        doc_ids = out["url"].str.extract(r"/p/(\d{6})")[0].astype(int)
        host = doc_ids % D_DOMAINS
        expect = ~((host % 7 == 3) | ((host % 7 == 5) & (doc_ids >= 100)))
        assert (out["allowed"].to_numpy() == expect.to_numpy()).all()
