"""Host-level link graph: page edges → weighted host graph → host PageRank.

The standard web-graph coarsening (the reference's only web analog,
scripts/webgraph.py:27-49, aggregates urlparse().netloc exactly like this):
every page-level edge is mapped to (host(src_url), host(dst_url)) and
parallel edges collapse into an integer weight — the "host graph" whose
weighted PageRank ranks domains rather than pages.

Scale shape: the host parse is a vectorized Arrow split over the already
page-deduplicated edge stream; host-edge aggregation is a per-batch
``group_by`` combiner followed by one task-exchange ``exchange_unique`` on
(src, dst) — host cardinality is orders of magnitude below page cardinality,
so the exchange volume after the combiner is tiny.  The string→dense-id
mapping for the PageRank kernel is the distributed compact_ids pattern
(sort + zip_with_index + two hash joins), never a driver-side dict; the
kernel itself is the partitioned-CSR BSP PageRank with ``weighted=True``
(coefficient w(u,v)/wdeg(u), centrality/PageRank.cpp:54-64 semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from networkit_ray.common.exchange import exchange_join, exchange_unique
from networkit_ray.graph.build import drop_self_loops, zip_with_index
from networkit_ray.web.extract import extract_edges


def host_from_url(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """scheme://HOST/... → host, vectorized (split on '/', element 2)."""
    return pc.list_element(pc.split_pattern(urls, "/"), 2)


def host_edges(pages: ray.data.Dataset) -> ray.data.Dataset:
    """pages → (src, dst, w) weighted host-level edge table.

    ``w`` counts the *distinct page-level* links between the two hosts
    (within-page duplicates and cross-page repeats of the same (src_url,
    dst_url) pair collapse first, like the reference's webgraph script
    feeding a simple graph).  Host self-loops are kept — intra-host link
    volume is meaningful corpus structure; PageRank drops them downstream.
    """
    page_edges = extract_edges(pages, ids="url", dedup=True)

    def to_hosts(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "src": host_from_url(t["src"]),
                "dst": host_from_url(t["dst"]),
                "w": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tt.group_by(["src", "dst"]).aggregate([("w", "sum")])
        return g.rename_columns(["src", "dst", "w"])

    he = page_edges.map_batches(to_hosts, batch_format="pyarrow")
    return exchange_unique(
        he,
        ["src", "dst"],
        agg=[("w", "sum")],
        schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]
        ),
    )


def host_id_mapping(he: ray.data.Dataset) -> tuple[ray.data.Dataset, int]:
    """(host, idx) dense-id mapping over src ∪ dst, ascending host order.

    Distributed compact_ids first half (graph/build.py:compact_ids) with the
    column named ``host`` so downstream joins never collide with the score
    table's ``v``.
    """
    hs = he.select_columns(["src"]).map_batches(
        lambda t: pa.table({"host": t["src"].combine_chunks().unique()}),
        batch_format="pyarrow",
    )
    hd = he.select_columns(["dst"]).map_batches(
        lambda t: pa.table({"host": t["dst"].combine_chunks().unique()}),
        batch_format="pyarrow",
    )
    hosts = exchange_unique(hs.union(hd), ["host"]).sort("host")
    mapping = zip_with_index(hosts, "idx").materialize()
    return mapping, mapping.count()


def _build_host_graph(
    pages: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset, int]:
    """Shared kernel input: (remapped weighted edges, (host, idx) mapping,
    n_hosts) with host self-loops dropped (a self-link moves no rank mass in
    the reference's normalization and would otherwise dominate wdeg for
    navigation-heavy sites)."""
    he = drop_self_loops(host_edges(pages))
    mapping, n_hosts = host_id_mapping(he)

    e1 = exchange_join(he, mapping, left_on=["src"], right_on=["host"])
    e1 = e1.map_batches(
        lambda t: pa.table({"src_new": t["idx"], "dst": t["dst"], "w": t["w"]}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, mapping, left_on=["dst"], right_on=["host"])
    remapped = e2.map_batches(
        lambda t: pa.table(
            {
                "src": t["src_new"],
                "dst": t["idx"],
                "w": pc.cast(t["w"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    return remapped, mapping, n_hosts


def _named_scores(
    scores: ray.data.Dataset, mapping: ray.data.Dataset
) -> ray.data.Dataset:
    named = exchange_join(scores, mapping, left_on=["v"], right_on=["idx"])
    return named.map_batches(
        lambda t: pa.table({"host": t["host"], "score": t["score"]}),
        batch_format="pyarrow",
    )


def host_pagerank(
    pages: ray.data.Dataset,
    *,
    damp: float = 0.85,
    tol: float = 0.0,
    max_iterations: int | None = 30,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(host, score) weighted PageRank over the host graph; edge weight =
    inter-host page-link count."""
    from networkit_ray.graph.pagerank import pagerank

    remapped, mapping, n_hosts = _build_host_graph(pages)
    scores, info = pagerank(
        remapped,
        n_hosts,
        num_parts=num_parts,
        weighted=True,
        damp=damp,
        tol=tol,
        max_iterations=max_iterations,
    )
    return _named_scores(scores, mapping), info


def host_spam_mass(
    pages: ray.data.Dataset,
    seed_hosts: list[str],
    *,
    damp: float = 0.85,
    iterations: int = 30,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(host, spam_mass) over the host graph — one graph build feeding both
    the PageRank and TrustRank kernels (the two rank tables share the CSR
    blocks and id mapping; only the vertex-state supersteps differ)."""
    from networkit_ray.graph.pagerank import pagerank, personalized_pagerank

    remapped, mapping, n_hosts = _build_host_graph(pages)
    remapped = remapped.materialize()
    pr_scores, _ = pagerank(
        remapped,
        n_hosts,
        num_parts=num_parts,
        weighted=True,
        damp=damp,
        tol=0.0,
        max_iterations=iterations,
    )
    seed_rows = mapping.map_batches(
        lambda t: t.filter(
            pc.is_in(t["host"], value_set=pa.array(sorted(set(seed_hosts))))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    seeds = [int(i) for i in seed_rows["idx"]]
    if not seeds:
        raise ValueError("host_spam_mass: no seed host present in the graph")
    tr_scores, _ = personalized_pagerank(
        remapped,
        n_hosts,
        seeds,
        damp=damp,
        iterations=iterations,
        num_parts=num_parts,
        weighted=True,
    )
    return spam_mass(
        _named_scores(pr_scores, mapping), _named_scores(tr_scores, mapping)
    )


def spam_mass(
    pr: ray.data.Dataset,
    tr: ray.data.Dataset,
    *,
    round_inputs: int | None = 8,
) -> ray.data.Dataset:
    """(host, spam_mass) relative spam mass per host.

    Gyöngyi et al.'s "Link spam detection based on mass estimation"
    (VLDB 2006): the fraction of a host's PageRank that is NOT accounted
    for by trusted sources, ``(pr - tr) / pr`` — hosts near 1 earn almost
    all their rank from outside the trusted seed neighborhood and are spam
    candidates; trusted hubs sit near (or below) 0 because TrustRank
    concentrates the whitelist's teleport mass on them.

    ``pr`` is the L1-normalized (host, score) PageRank table, ``tr`` the
    strong-convention TrustRank table over the same graph.  Both inputs are
    first rounded half-away to ``round_inputs`` decimals so the engine and
    a SQL twin computing from identically-rounded scores agree bit-for-bit.
    """
    from networkit_ray.common.hashing import round_half_away

    joined = exchange_join(
        pr.map_batches(
            lambda t: pa.table({"host": t["host"], "pr": t["score"]}),
            batch_format="pyarrow",
        ),
        tr.map_batches(
            lambda t: pa.table({"host": t["host"], "tr": t["score"]}),
            batch_format="pyarrow",
        ),
        left_on=["host"],
    )

    def mass(t: pa.Table) -> pa.Table:
        p = t["pr"].to_numpy(zero_copy_only=False).astype(np.float64)
        q = t["tr"].to_numpy(zero_copy_only=False).astype(np.float64)
        if round_inputs is not None:
            p = round_half_away(p, round_inputs)
            q = round_half_away(q, round_inputs)
        with np.errstate(divide="ignore", invalid="ignore"):
            m = np.where(p > 0, (p - q) / p, 0.0)
        return pa.table(
            {"host": t["host"], "spam_mass": pa.array(round_half_away(m, 8))}
        )

    return joined.map_batches(mass, batch_format="pyarrow")


def host_trustrank(
    pages: ray.data.Dataset,
    seed_hosts: list[str],
    *,
    damp: float = 0.85,
    iterations: int = 30,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(host, score) TrustRank: personalized PageRank whose teleport mass
    restarts uniformly on a trusted seed-host whitelist (Gyöngyi et al.'s
    web-spam demotion scheme) over the weighted host graph.  Dangling mass
    leaks — the 'strong' PPR convention the engine's personalized_pagerank
    uses, so scores are comparable across seed sets.
    """
    from networkit_ray.graph.pagerank import personalized_pagerank

    remapped, mapping, n_hosts = _build_host_graph(pages)
    seed_set = set(seed_hosts)
    seed_rows = mapping.map_batches(
        lambda t: t.filter(pc.is_in(t["host"], value_set=pa.array(sorted(seed_set)))),
        batch_format="pyarrow",
    ).to_pandas()
    seeds = [int(i) for i in seed_rows["idx"]]
    if not seeds:
        raise ValueError("host_trustrank: no seed host present in the graph")
    scores, info = personalized_pagerank(
        remapped,
        n_hosts,
        seeds,
        damp=damp,
        iterations=iterations,
        num_parts=num_parts,
        weighted=True,
    )
    return _named_scores(scores, mapping), info
