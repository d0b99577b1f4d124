"""Local-max and Suitor matchings — deterministic distributed rounds.

Reference: matching/ (LocalMaxMatcher.cpp, SuitorMatcher.cpp).  Each round an
edge joins the matching iff it carries the minimum priority among the
remaining edges at BOTH endpoints (the "locally dominant" edge rule);
matched vertices leave, incident edges drop, repeat.  Terminates in
O(log m) expected rounds (the globally minimum edge always matches).

Priorities are collision-free by construction: p(e) = ((lo·n + hi + 1)
·GOLD) mod 2^64 is bijective in the packed edge id while n² < 2^64, so
no tie-breaking is needed and the DuckDB twin replays rounds exactly
(walks.py/mis.py determinism pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from networkit_ray.common.exchange import exchange_join

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def local_max_matching(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    max_rounds: int = 64,
) -> tuple[ray.data.Dataset, dict]:
    """(src, dst) matched edges (canonical lo<hi) + info dict."""
    n = np.uint64(num_nodes)

    def with_prio(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (src * n + dst + np.uint64(1)) * _GOLD
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                # signed view shifted so int64 Min() preserves uint64 order
                "p": pa.array((p ^ np.uint64(1 << 63)).view(np.int64)),
            }
        )

    active = canon.select_columns(["src", "dst"]).map_batches(
        with_prio, batch_format="pyarrow"
    ).materialize()
    return _dominant_rounds(active, max_rounds)


def suitor_matching(
    canon_w: ray.data.Dataset,
    num_nodes: int,
    *,
    max_weight: int,
    max_rounds: int = 64,
) -> tuple[ray.data.Dataset, dict]:
    """Weighted Suitor matching (matching/SuitorMatcher.cpp:56-90 semantics).

    Input (src, dst, w) canonical lo<hi with INTEGER weights 1..max_weight.
    Suitor's proposal chain with the (weight desc, smaller-partner) preference
    converges to the unique locally-dominant matching under the total edge
    order (w desc, lo asc, hi asc) — the same fixpoint the rounds helper
    computes, so the DuckDB twin replays it exactly.  Requires
    (max_weight+1)·(n²+2) < 2^63 (pack weight and edge id in one sortable
    int64); larger graphs need a wider rank encoding.
    """
    n = num_nodes
    mult = n * n + 2
    if (max_weight + 1) * mult >= 2**63:
        raise ValueError("suitor_matching: rank packing overflows int64")

    def with_prio(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = (max_weight - w) * mult + src * n + dst + 1
        return pa.table(
            {"src": pa.array(src), "dst": pa.array(dst), "p": pa.array(p)}
        )

    active = canon_w.select_columns(["src", "dst", "w"]).map_batches(
        with_prio, batch_format="pyarrow"
    ).materialize()
    return _dominant_rounds(active, max_rounds)


import os

import ray

_LOCAL_COLLAPSE = int(os.environ.get("NKR_MATCHING_COLLAPSE", 200_000))


@ray.remote
def _dominant_local(max_rounds: int, *tables) -> tuple:
    """State-sized collapse: the identical locally-dominant rounds in ONE
    task (louvain's small-level pattern).  The matching is uniquely
    determined by the (collision-free) priorities — an edge matches iff
    it is the minimum at both endpoints among remaining edges — so this
    is bit-identical to the exchange-based rounds at any size; it exists
    because each distributed round costs a groupby + four exchanges,
    which dominates wall time when the edge table is tiny."""
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return (np.empty(0, np.int64), np.empty(0, np.int64), 0)
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = t["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_max = int(max(src.max(), dst.max())) + 1
    alive = np.ones(len(src), dtype=bool)
    out_s, out_d = [], []
    rounds = 0
    big = np.iinfo(np.int64).max
    while rounds < max_rounds and alive.any():
        rounds += 1
        minp = np.full(n_max, big, np.int64)
        np.minimum.at(minp, src[alive], p[alive])
        np.minimum.at(minp, dst[alive], p[alive])
        dom = alive & (p == minp[src]) & (p == minp[dst])
        if not dom.any():
            break
        out_s.append(src[dom])
        out_d.append(dst[dom])
        mv = np.zeros(n_max, dtype=bool)
        mv[src[dom]] = True
        mv[dst[dom]] = True
        alive &= ~(mv[src] | mv[dst])
    s = np.concatenate(out_s) if out_s else np.empty(0, np.int64)
    d = np.concatenate(out_d) if out_d else np.empty(0, np.int64)
    return (s, d, rounds)


def _dominant_rounds(
    active: ray.data.Dataset, max_rounds: int
) -> tuple[ray.data.Dataset, dict]:
    """Locally-dominant edge rounds over an (src, dst, p) table: an edge is
    matched iff p is the minimum among remaining edges at BOTH endpoints."""
    m_edges = active.count()
    if m_edges <= _LOCAL_COLLAPSE:
        refs = active.to_arrow_refs()
        s, d, rounds = ray.get(_dominant_local.remote(max_rounds, *refs))
        out = ray.data.from_arrow(
            pa.table({"src": pa.array(s), "dst": pa.array(d)})
        )
        return out, {"rounds": rounds, "collapsed": True}
    matched_parts: list[ray.data.Dataset] = []
    rounds = 0
    for _ in range(max_rounds):
        if active.count() == 0:
            break
        rounds += 1
        ends = active.map_batches(
            lambda t: pa.table(
                {
                    "v": pa.concat_arrays(
                        [
                            t["src"].combine_chunks().cast(pa.int64()),
                            t["dst"].combine_chunks().cast(pa.int64()),
                        ]
                    ),
                    "p": pa.concat_arrays(
                        [t["p"].combine_chunks(), t["p"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        vmin = ends.groupby("v").aggregate(Min("p", alias_name="mp"))
        j1 = exchange_join(
            active,
            vmin.map_batches(
                lambda t: pa.table({"src": t["v"], "mu": t["mp"]}),
                batch_format="pyarrow",
            ),
            left_on=["src"],
        )
        j2 = exchange_join(
            j1,
            vmin.map_batches(
                lambda t: pa.table({"dst": t["v"], "mv": t["mp"]}),
                batch_format="pyarrow",
            ),
            left_on=["dst"],
        )

        def dominant(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.and_(
                pc.equal(t["p"], t["mu"]), pc.equal(t["p"], t["mv"])
            )
            return t.filter(keep).select(["src", "dst"])

        won = j2.map_batches(dominant, batch_format="pyarrow").materialize()
        if won.count() == 0:
            break
        matched_parts.append(won)
        # drop edges incident to a matched vertex
        mv = won.map_batches(
            lambda t: pa.table(
                {
                    "v": pa.concat_arrays(
                        [
                            t["src"].combine_chunks().cast(pa.int64()),
                            t["dst"].combine_chunks().cast(pa.int64()),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        active = exchange_join(
            active, mv, left_on=["src"], right_on=["v"], join_type="left anti"
        )
        active = exchange_join(
            active, mv, left_on=["dst"], right_on=["v"], join_type="left anti"
        ).materialize()
    out = matched_parts[0] if matched_parts else ray.data.from_arrow(
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()
    )
    for p_ in matched_parts[1:]:
        out = out.union(p_)
    return out, {"rounds": rounds}


def path_growing_matching(
    canon_w: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, w) — the Drake–Hougardy path-growing ½-approximation.

    Reference: matching/PathGrowingMatcher.cpp — repeatedly start at the
    highest-degree live vertex and grow a path along the HEAVIEST live
    incident edge, adding edges alternately to matchings M1/M2 and
    removing each visited vertex; return the heavier of M1, M2.
    Deterministic normative ties (replica-tested): start vertex → smaller
    id, heaviest edge → smaller neighbor id.

    Path growth is inherently sequential (each step consumes the previous
    vertex), so like Havel–Hakimi this is a SINGLE-TASK conformance
    operator over the collected weighted edge table; the distributed
    matchings are local-max and Suitor.
    """
    import ray

    @ray.remote
    def build(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        adj: dict[int, dict[int, float]] = {}
        for a, b, ww in zip(src, dst, w):
            adj.setdefault(int(a), {})[int(b)] = float(ww)
            adj.setdefault(int(b), {})[int(a)] = float(ww)
        alive = set(adj)
        m = [[], []]  # M1, M2
        wsum = [0.0, 0.0]
        while alive:
            u = max(alive, key=lambda v: (len(adj[v]), -v))
            if not adj[u]:
                alive.discard(u)
                continue
            take = 0
            while True:
                nbrs = adj[u]
                if not nbrs:
                    alive.discard(u)
                    break
                v = max(nbrs, key=lambda x: (nbrs[x], -x))
                ww = nbrs[v]
                m[take].append((min(u, v), max(u, v), ww))
                wsum[take] += ww
                take ^= 1
                # remove u entirely
                for x in list(adj[u]):
                    del adj[x][u]
                adj[u] = {}
                alive.discard(u)
                u = v
        best = m[0] if wsum[0] >= wsum[1] else m[1]
        best.sort()
        return pa.table(
            {
                "src": pa.array([e[0] for e in best], pa.int64()),
                "dst": pa.array([e[1] for e in best], pa.int64()),
                "w": pa.array([e[2] for e in best], pa.float64()),
            }
        )

    tbl = pa.concat_tables(
        [r if isinstance(r, pa.Table) else pa.Table.from_pandas(r)
         for r in ray.get(canon_w.to_arrow_refs())]
    )
    return ray.data.from_arrow_refs([build.remote(tbl)])
