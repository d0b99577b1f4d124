"""Degree-preserving edge switching (distributed batched Markov rounds).

Reference: randomization/EdgeSwitching.cpp:10-51 — repeat: pick two random
edges (s1,t1),(s2,t2), reject if swapping to (s1,t2),(s2,t1) would create a
self-loop or duplicate edge, else swap.  Every accepted swap preserves each
endpoint's degree; the chain mixes toward a uniform simple graph with the
same degree sequence.

The reference chain is inherently sequential (each switch sees the current
graph), so the distributed analog is the standard batched variant (the
parallel edge-swap family): each ROUND pairs all edges at random, proposes
every swap at once, and rejects conflicting proposals —

1. seeded counter-hash of the edge VALUE draws a sort key; a global sort +
   dense rank pairs rank 2k with 2k+1 (`zip_with_index`),
2. each pair proposes canonical (min,max) swapped edges; self-loops and
   identity swaps are rejected locally,
3. a proposal is rejected globally if a proposed new edge already exists in
   the current graph (anti-join) or collides with another proposal's new
   edge (min-pair-id wins); rejected proposals keep their original edges.

Acceptance per round is below the sequential chain's, but the invariants are
identical: degree sequence preserved EXACTLY, edge count preserved, graph
stays simple.  Deterministic in (seed, rounds) at any parallelism — the draw
hashes edge values, never block layout.

Scale shape per round: one sort (the shuffle), one pair-keyed hash exchange,
one anti-join + one dedup groupby — all edge-sized; the driver holds only
per-block row counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from networkit_ray.common.exchange import _default_parts, exchange_join, partition_refs
from networkit_ray.graph.build import zip_with_index
from networkit_ray.sources.synth import _splitmix64

_PROP_SCHEMA = pa.schema(
    [
        ("pair", pa.int64()),
        ("o1_src", pa.int64()), ("o1_dst", pa.int64()),
        ("o2_src", pa.int64()), ("o2_dst", pa.int64()),
        ("n1_src", pa.int64()), ("n1_dst", pa.int64()),
        ("n2_src", pa.int64()), ("n2_dst", pa.int64()),
    ]
)


@ray.remote
def _propose_part(*tables) -> pa.Table:
    """One hash partition of (src, dst, pair, side) rows → proposal rows."""
    ts = [t for t in tables if t is not None and len(t) > 0]
    if not ts:
        return _PROP_SCHEMA.empty_table()
    t = pa.concat_tables(ts, promote_options="default")
    pair = t["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
    side = t["side"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((side, pair))
    pair, side, src, dst = pair[order], side[order], src[order], dst[order]
    # complete pairs = consecutive rows with equal pair id and sides 0,1
    left = np.nonzero(
        (pair[:-1] == pair[1:]) & (side[:-1] == 0) & (side[1:] == 1)
    )[0]
    s1, t1 = src[left], dst[left]
    s2, t2 = src[left + 1], dst[left + 1]
    n1_lo, n1_hi = np.minimum(s1, t2), np.maximum(s1, t2)
    n2_lo, n2_hi = np.minimum(s2, t1), np.maximum(s2, t1)
    ok = (
        (n1_lo != n1_hi)
        & (n2_lo != n2_hi)
        & ~((n1_lo == n2_lo) & (n1_hi == n2_hi))
    )
    return pa.table(
        {
            "pair": pa.array(pair[left][ok]),
            "o1_src": pa.array(s1[ok]), "o1_dst": pa.array(t1[ok]),
            "o2_src": pa.array(s2[ok]), "o2_dst": pa.array(t2[ok]),
            "n1_src": pa.array(n1_lo[ok]), "n1_dst": pa.array(n1_hi[ok]),
            "n2_src": pa.array(n2_lo[ok]), "n2_dst": pa.array(n2_hi[ok]),
        },
        schema=_PROP_SCHEMA,
    )


def _old_edges(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "src": pa.concat_arrays(
                [t["o1_src"].combine_chunks(), t["o2_src"].combine_chunks()]
            ),
            "dst": pa.concat_arrays(
                [t["o1_dst"].combine_chunks(), t["o2_dst"].combine_chunks()]
            ),
        }
    )


def _new_edges(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "src": pa.concat_arrays(
                [t["n1_src"].combine_chunks(), t["n2_src"].combine_chunks()]
            ),
            "dst": pa.concat_arrays(
                [t["n1_dst"].combine_chunks(), t["n2_dst"].combine_chunks()]
            ),
            "pair": pa.concat_arrays(
                [t["pair"].combine_chunks(), t["pair"].combine_chunks()]
            ),
        }
    )


def edge_switching(
    canon: ray.data.Dataset,
    *,
    rounds: int = 4,
    seed: int = 42,
) -> tuple[ray.data.Dataset, dict]:
    """Return (switched canonical edge table, info dict) after ``rounds``
    batched switch rounds; degree sequence and edge count preserved exactly."""
    cur = canon.select_columns(["src", "dst"]).materialize()
    m = cur.count()
    accepted_total = 0
    for r in range(rounds):
        rseed = np.uint64((seed * 0x9E3779B1 + r + 1) & 0xFFFFFFFFFFFFFFFF)

        def draw(t: pa.Table, _s=rseed) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
            d = _splitmix64((src << np.uint64(32)) ^ dst ^ _s)
            return pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    # shift to signed so int64 sort preserves uint64 order
                    "d": pa.array((d ^ np.uint64(1 << 63)).view(np.int64)),
                }
            )

        ranked = zip_with_index(
            cur.map_batches(draw, batch_format="pyarrow").sort("d"), "rank"
        ).map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "pair": pc.divide(t["rank"], 2),
                    "side": pc.subtract(
                        t["rank"], pc.multiply(pc.divide(t["rank"], 2), 2)
                    ),
                }
            ),
            batch_format="pyarrow",
        )

        P = _default_parts(None)
        slices = partition_refs(ranked, ["pair"], P)
        props = ray.data.from_arrow_refs(
            [_propose_part.remote(*[s[p] for s in slices]) for p in range(P)]
        ).materialize()

        old_edges = props.map_batches(_old_edges, batch_format="pyarrow")
        untouched = exchange_join(
            cur, old_edges, left_on=["src", "dst"], right_on=["src", "dst"],
            join_type="left anti",
        ).materialize()

        new_edges = props.map_batches(_new_edges, batch_format="pyarrow")
        # reject: proposed edge already exists in the current graph
        conflict_exist = exchange_join(
            new_edges, cur, left_on=["src", "dst"], right_on=["src", "dst"],
            join_type="left semi",
        ).map_batches(
            lambda t: pa.table({"pair": t["pair"]}), batch_format="pyarrow"
        )
        # reject: same new edge proposed by two pairs (smaller pair id wins)
        losers = (
            new_edges.groupby(["src", "dst"])
            .aggregate(Min("pair", alias_name="keep"), Count(alias_name="c"))
            .map_batches(
                lambda t: t.filter(pc.greater(t["c"], 1)).select(
                    ["src", "dst", "keep"]
                ),
                batch_format="pyarrow",
            )
        )
        dup_losers = exchange_join(
            new_edges, losers, left_on=["src", "dst"], right_on=["src", "dst"],
            join_type="inner",
        ).map_batches(
            lambda t: t.filter(pc.not_equal(t["pair"], t["keep"])).select(["pair"]),
            batch_format="pyarrow",
        )

        rejected = (
            conflict_exist.union(dup_losers)
            .groupby("pair")
            .aggregate(Count(alias_name="_c"))
            .map_batches(
                lambda t: t.select(["pair"]), batch_format="pyarrow"
            )
        )
        ok_props = exchange_join(
            props, rejected, left_on=["pair"], right_on=["pair"],
            join_type="left anti",
        ).materialize()
        bad_props = exchange_join(
            props, rejected, left_on=["pair"], right_on=["pair"],
            join_type="left semi",
        )

        accepted_total += ok_props.count()
        swapped = ok_props.map_batches(
            lambda t: pa.table(
                {
                    "src": pa.concat_arrays(
                        [t["n1_src"].combine_chunks(), t["n2_src"].combine_chunks()]
                    ),
                    "dst": pa.concat_arrays(
                        [t["n1_dst"].combine_chunks(), t["n2_dst"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        reverted = bad_props.map_batches(_old_edges, batch_format="pyarrow")
        cur = untouched.union(swapped).union(reverted).materialize()
    return cur, {"rounds": rounds, "accepted": accepted_total, "m": m}


def degree_preserving_shuffle(
    sym: ray.data.Dataset, num_nodes: int, *, seed: int = 42
) -> ray.data.Dataset:
    """(v, new_id) — a degree-preserving node-id permutation.

    Reference: randomization/DegreePreservingShuffle.cpp (shuffle ids
    within equal-degree classes; relabeling the graph by it preserves the
    exact degree sequence).  Deterministic form (SQL-twinned): within
    each degree class, member v's rank under the hash key
    ``(v·2654435761 + seed) mod 2³¹`` (ties → v) maps it to the rank-th
    smallest member id.

    Scale note: a degree class is processed whole in one group (the
    rank ↔ sorted-id pairing needs the class co-located) — the same
    worker-fits-a-group assumption as sessionize, documented.
    """
    import pandas as pd

    from networkit_ray.common.schema import enforce_schema

    deg = sym.groupby("src").aggregate(Count(alias_name="deg"))
    present = deg.map_batches(
        lambda t: pa.table(
            {"v": t["src"].combine_chunks().cast(pa.int64()), "deg": t["deg"]}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    # zero-degree nodes form their own class
    have = set(present["v"].tolist())
    missing = np.array([v for v in range(num_nodes) if v not in have], np.int64)
    all_deg = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(
                    np.concatenate([present["v"].to_numpy().astype(np.int64), missing])
                ),
                "deg": pa.array(
                    np.concatenate(
                        [
                            present["deg"].to_numpy().astype(np.int64),
                            np.zeros(len(missing), np.int64),
                        ]
                    )
                ),
            }
        )
    )

    def shuffle(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy().astype(np.int64)
        key = (v * 2654435761 + seed) % 2**31
        order = np.lexsort((v, key))
        tgt = np.sort(v)
        out = np.empty(len(v), np.int64)
        out[order] = tgt
        return pd.DataFrame({"v": v, "new_id": out})

    shuffled = all_deg.groupby("deg").map_groups(shuffle, batch_format="pandas")
    return enforce_schema(
        shuffled, pa.schema([("v", pa.int64()), ("new_id", pa.int64())])
    )
