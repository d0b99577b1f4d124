"""Deterministic edge-table derivation from the driver's TPC-H-ish tables.

The reference consumes edge lists from disk (networkit/cpp/io/EdgeListReader.cpp);
our correctness harness instead derives a pseudo-random directed graph from the
``orders`` parquet table with pure integer arithmetic, so the exact same graph
is expressible in ANSI SQL for the DuckDB oracle:

    nodes  = 0 .. C-1            (C = row count of ``customer``)
    raw edge per order row:  src = o_custkey          (keys are 0-based)
                             dst = (o_orderkey * 2654435761) % C
    then drop self-loops and deduplicate (src, dst).

2654435761 = floor(2^32/phi) (Knuth multiplicative hash) spreads dst ids
uniformly, giving a connected-ish random graph with triangles at every scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from networkit_ray.graph.build import dedup_edges

A_MULT = 2654435761


def num_customers(sf_dir: str) -> int:
    """Node-count C for the derived graph (parquet metadata only — no scan)."""
    return pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows


def derived_edges(sf_dir: str, *, dedup: bool = True) -> tuple[ray.data.Dataset, int]:
    """Directed deduplicated edge table (src:int64, dst:int64) + node count.

    Column-pruned read (only the two key columns leave storage), vectorized
    Arrow arithmetic per batch, dedup via partial per-batch unique + one
    (src, dst) groupby shuffle.
    """
    n = num_customers(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        import numpy as np

        src = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = (okey * A_MULT) % n
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        return t.filter(pc.not_equal(t["src"], t["dst"]))

    edges = ds.map_batches(to_edges, batch_format="pyarrow")
    if dedup:
        edges = dedup_edges(edges)
    return edges, n


DERIVED_EDGES_SQL = """
    SELECT DISTINCT
        CAST(o_custkey AS BIGINT) AS src,
        CAST((o_orderkey * 2654435761) % (SELECT COUNT(*) FROM customer) AS BIGINT) AS dst
    FROM orders
    WHERE o_custkey <> (o_orderkey * 2654435761) % (SELECT COUNT(*) FROM customer)
"""

# Symmetrized (both directions present once) — the input shape for the
# undirected kernels (CC / PLP / triangles), matching the reference's
# undirected adjacency where each edge appears in both endpoint lists
# (include/networkit/graph/Graph.hpp:130).
SYMMETRIC_EDGES_SQL = f"""
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM ({DERIVED_EDGES_SQL})
        UNION ALL
        SELECT dst AS src, src AS dst FROM ({DERIVED_EDGES_SQL})
    )
"""

# Canonical undirected edge set (each edge once as lo < hi).
CANONICAL_EDGES_SQL = f"""
    SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
    FROM ({DERIVED_EDGES_SQL})
"""


def num_suppliers(sf_dir: str) -> int:
    return pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows


def supplier_ring_edges(sf_dir: str) -> tuple[ray.data.Dataset, int]:
    """High-diameter test graph: supplier ring + sparse hashed chords.

    The customer graph is a dense random digraph (diameter ~4 at any sf) —
    useless for exercising diameter/eccentricity algorithms.  This graph is
    a ring over the S suppliers plus one chord per lineitem row with
    l_orderkey % 997 == 0 (dst = (l_orderkey * A_MULT) % S), symmetrized
    and deduplicated: connected by construction, small-world-ish, diameter
    O(ring gaps between chords).  Deterministic at any parallelism.
    """
    import numpy as np

    s = num_suppliers(sf_dir)
    ring_src = np.arange(s, dtype=np.int64)
    ring = ray.data.from_arrow(
        pa.table({"src": ring_src, "dst": (ring_src + 1) % s})
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )

    def chords(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = okey % 997 == 0
        t = pa.table(
            {
                "src": pa.array(supp[keep]),
                "dst": pa.array((okey[keep] * A_MULT) % s),
            }
        )
        return t.filter(pc.not_equal(t["src"], t["dst"]))

    from networkit_ray.graph.build import symmetrize

    return symmetrize(ring.union(li.map_batches(chords, batch_format="pyarrow"))), s


SUPPLIER_RING_SQL = f"""
    SELECT DISTINCT src, dst FROM (
        SELECT b.src, b.dst FROM (
            SELECT CAST(s_suppkey AS BIGINT) AS src,
                   CAST((s_suppkey + 1) % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS dst
            FROM supplier
            UNION ALL
            SELECT CAST(l_suppkey AS BIGINT) AS src,
                   CAST((l_orderkey * {A_MULT}) % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS dst
            FROM lineitem WHERE l_orderkey % 997 = 0
        ) b WHERE b.src <> b.dst
        UNION ALL
        SELECT b.dst AS src, b.src AS dst FROM (
            SELECT CAST(s_suppkey AS BIGINT) AS src,
                   CAST((s_suppkey + 1) % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS dst
            FROM supplier
            UNION ALL
            SELECT CAST(l_suppkey AS BIGINT) AS src,
                   CAST((l_orderkey * {A_MULT}) % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS dst
            FROM lineitem WHERE l_orderkey % 997 = 0
        ) b WHERE b.src <> b.dst
    )
"""
