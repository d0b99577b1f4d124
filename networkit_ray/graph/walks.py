"""Seeded first-order random walks (the Node2Vec walk kernel, p=q=1).

Reference: networkit/cpp/embedding/ — Node2Vec.cpp drives biased walks
feeding LearnEmbedding.cpp; with p=q=1 the walk is a uniform
neighbor-at-each-step chain.  The distributed form advances ALL walkers
one hop per round: walkers are joined (hash exchange on current vertex)
to a pre-built sorted adjacency-list table, and the next vertex is the
``h(walker, step) mod deg``-th smallest neighbor.

Determinism contract (shared with the DuckDB twin, so the walk is
oracle-checkable — unusual for a "random" op): the per-step draw is

    h = ((walker + 1) * GOLD + (step + 1) * MIX) mod 2^64, next = ns[h mod deg]

with ns sorted ascending.  A multiplicative-congruential draw, not a
cryptographic one — adequate for walk sampling, chosen because HUGEINT
arithmetic can reproduce it exactly in SQL.  Dead-end walkers stay put.

Scale notes: the adjacency-list table is built once (one groupby) and
reused every step; each step is one hash-exchange join over walker-count
rows, never edge-count.  Walk count and length are the only drivers of
cost — independent walkers shard trivially.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.common.exchange import exchange_join
from networkit_ray.common.schema import enforce_schema

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def ranked_edges(sym: ray.data.Dataset) -> ray.data.Dataset:
    """(v, r, nxt) — neighbor ``nxt`` is the r-th smallest (0-based) of v.

    Flat int64 columns only (pyarrow joins reject list payloads), so the
    per-step "index into the neighbor list" becomes an equi-join on
    (v, r) — the relational form of the array gather."""

    def rank(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = g["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        change = np.empty(len(src), dtype=bool)
        if len(src):
            change[0] = True
            change[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(change)
        idx = np.arange(len(src), dtype=np.int64)
        r = idx - np.repeat(starts, np.diff(np.append(starts, len(src))))
        return pa.table(
            {"v": pa.array(src), "r": pa.array(r), "nxt": pa.array(dst)}
        )

    re_ = sym.groupby("src").map_groups(rank, batch_format="pyarrow")
    return enforce_schema(
        re_, pa.schema([("v", pa.int64()), ("r", pa.int64()), ("nxt", pa.int64())])
    )


def random_walks(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    length: int = 4,
    n_walkers: int = 32,
    seed: int = 42,
) -> ray.data.Dataset:
    """(walker, step, v) trajectories of ``n_walkers`` deterministic walks.

    Walkers start at the closeness-pivot sample (smallest hash-ranked
    vertex ids, walker w starts at pivots[w]); step 0 is the start vertex.
    """
    from networkit_ray.graph.closeness import _pivots

    starts = _pivots(num_nodes, min(n_walkers, num_nodes), seed)
    re_ = ranked_edges(sym).materialize()
    deg = re_.groupby("v").count().map_batches(
        lambda t: t.rename_columns(["v", "d"]), batch_format="pyarrow"
    ).materialize()

    cur = ray.data.from_arrow(
        pa.table(
            {
                "walker": pa.array(np.arange(len(starts), dtype=np.int64)),
                "v": pa.array(starts.astype(np.int64)),
            }
        )
    )
    out = [
        cur.map_batches(
            lambda t: t.append_column("step", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow",
        )
    ]
    for step in range(length):
        j = exchange_join(cur, deg, left_on=["v"], join_type="left outer")

        def pick(t: pa.Table, step=step) -> pa.Table:
            wid = t["walker"].to_numpy(zero_copy_only=False).astype(np.uint64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            if "d" in t.column_names:
                d = np.nan_to_num(
                    t["d"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
                ).astype(np.int64)
            else:
                d = np.zeros(len(v), np.int64)
            h = (wid + np.uint64(1)) * _GOLD + np.uint64(step + 1) * _MIX
            r = np.where(
                d > 0, (h % np.maximum(d, 1).astype(np.uint64)).astype(np.int64), -1
            )
            return pa.table(
                {
                    "walker": pa.array(wid.astype(np.int64)),
                    "v": pa.array(v),
                    "r": pa.array(r),
                }
            )

        picked = j.map_batches(pick, batch_format="pyarrow")
        stepped = exchange_join(
            picked, re_, left_on=["v", "r"], join_type="left outer"
        )

        def advance(t: pa.Table) -> pa.Table:
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            if "nxt" in t.column_names:
                nx = t["nxt"].to_numpy(zero_copy_only=False).astype(np.float64)
                nx = np.where(np.isnan(nx), v, nx).astype(np.int64)
            else:
                nx = v
            return pa.table({"walker": t["walker"], "v": pa.array(nx)})

        cur = stepped.map_batches(advance, batch_format="pyarrow").materialize()
        out.append(
            cur.map_batches(
                lambda t, s=step + 1: t.append_column(
                    "step", pa.array(np.full(len(t), s, np.int64))
                ),
                batch_format="pyarrow",
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res.map_batches(
        lambda t: t.select(["walker", "step", "v"]), batch_format="pyarrow"
    )
