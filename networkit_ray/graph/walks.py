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


@ray.remote
def _n2v_pick(p: float, q: float, seed: int, step: int, *tables):
    """Per-walker-partition biased pick: weight each neighbor candidate
    (1/p return, 1 triangle, 1/q explore), grouped inverse-CDF draw."""
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    wid = t["walker"].to_numpy(zero_copy_only=False).astype(np.int64)
    prev = t["prev"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = np.nan_to_num(
        t["r"].to_numpy(zero_copy_only=False).astype(np.float64), nan=-1.0
    ).astype(np.int64)
    nxt = t["nxt"].to_numpy(zero_copy_only=False).astype(np.float64)
    nxt = np.where(np.isnan(nxt), -1, nxt).astype(np.int64)
    adj = (
        np.nan_to_num(
            t["adj"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
        ).astype(np.int64)
        if "adj" in t.column_names
        else np.zeros(len(t), np.int64)
    )
    order = np.lexsort((r, wid))
    wid, prev, v, r, nxt, adj = (
        a[order] for a in (wid, prev, v, r, nxt, adj)
    )
    wgt = np.where(nxt == prev, 1.0 / p, np.where(adj == 1, 1.0, 1.0 / q))
    wgt = np.where(nxt < 0, 0.0, wgt)  # dead-end placeholder rows
    starts = np.flatnonzero(np.r_[True, wid[1:] != wid[:-1]])
    sizes = np.diff(np.r_[starts, len(wid)])
    cum = np.cumsum(wgt)
    base = np.repeat(np.r_[0.0, cum[starts[1:] - 1]], sizes)
    gcum = cum - base
    total = np.repeat(gcum[starts + sizes - 1], sizes)
    from networkit_ray.sources.synth import _splitmix64

    u = (
        _splitmix64(
            wid.astype(np.uint64) * _GOLD
            + np.uint64(step + 1) * _MIX
            + np.uint64(seed)
        ).astype(np.float64)
        / 2.0**64
    )
    # first candidate whose running weight exceeds u·total (strict >);
    # total == 0 (dead end) selects nothing → walker stays put
    hit = (gcum > u * total) & (total > 0)
    hit_idx = np.flatnonzero(hit)
    grp_of = np.repeat(np.arange(len(starts)), sizes)
    first = np.full(len(starts), len(wid), np.int64)
    if len(hit_idx):
        np.minimum.at(first, grp_of[hit_idx], hit_idx)
    stay = first >= len(wid)
    safe = np.where(stay, 0, first)
    nv = np.where(stay, v[starts], nxt[safe])
    return pa.table(
        {
            "walker": pa.array(wid[starts]),
            "prev": pa.array(v[starts]),
            "v": pa.array(nv),
        }
    )


def node2vec_walks(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    length: int = 4,
    n_walkers: int = 32,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(walker, step, v) p/q-biased second-order walks (true Node2Vec).

    Reference: embedding/Node2Vec.cpp (Grover–Leskovec biased walks):
    from state (prev, v), neighbor n of v is weighted 1/p if n == prev,
    1 if n is adjacent to prev (triangle), else 1/q; selection is a
    deterministic grouped inverse-CDF draw (splitmix64 on (walker, step))
    so results are parallelism-invariant.  The first step (prev = −1) is
    uniform: every candidate weighs 1/q and constants cancel.

    Scale shape per step: one gather join over Σ deg(v_cur) candidate
    rows, one (prev, nxt) adjacency-flag join, one hash exchange on
    walker for the grouped draw — never edge-count state.
    """
    import ray as _ray

    from networkit_ray.common.exchange import _nonnull, partition_refs
    from networkit_ray.graph.closeness import _pivots

    starts = _pivots(num_nodes, min(n_walkers, num_nodes), seed)
    re_ = ranked_edges(sym).materialize()
    mark = sym.map_batches(
        lambda t: pa.table(
            {
                "ps": t["src"].combine_chunks().cast(pa.int64()),
                "pn": t["dst"].combine_chunks().cast(pa.int64()),
                "adj": pa.array(np.ones(len(t), np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    cur = ray.data.from_arrow(
        pa.table(
            {
                "walker": pa.array(np.arange(len(starts), dtype=np.int64)),
                "prev": pa.array(np.full(len(starts), -1, np.int64)),
                "v": pa.array(starts.astype(np.int64)),
            }
        )
    )
    out = [
        cur.map_batches(
            lambda t: pa.table(
                {
                    "walker": t["walker"],
                    "step": pa.array(np.zeros(len(t), np.int64)),
                    "v": t["v"],
                }
            ),
            batch_format="pyarrow",
        )
    ]
    P = num_parts or 8
    for step in range(length):
        cand = exchange_join(cur, re_, left_on=["v"], join_type="left outer")
        cand = exchange_join(
            cand, mark, left_on=["prev", "nxt"], right_on=["ps", "pn"],
            join_type="left outer",
        )
        slices = partition_refs(cand, ["walker"], P)
        parts = [
            _n2v_pick.remote(p, q, seed, step, *[s[pp] for s in slices])
            for pp in range(len(slices[0]))
        ]
        keep = [
            rf
            for rf, ok in zip(parts, _ray.get([_nonnull.remote(x) for x in parts]))
            if ok
        ]
        cur = ray.data.from_arrow_refs(keep).materialize()
        out.append(
            cur.map_batches(
                lambda t, s=step + 1: pa.table(
                    {
                        "walker": t["walker"],
                        "step": pa.array(np.full(len(t), s, np.int64)),
                        "v": t["v"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res


_P3 = np.uint64(0x94D049BB133111EB)


def k_path_centrality(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    k: int = 5,
    num_walks: int | None = None,
    seed: int = 42,
    num_parts: int = 16,
) -> ray.data.Dataset:
    """(v, score) — k-path centrality by seeded self-avoiding walks.

    Reference: centrality/KPathCentrality.cpp — t random simple paths of
    length ≤ k; score[v] = (visits of v) · k / t.  Normative deterministic
    semantics (mirrored by the numpy replica in tests): walk w starts at
    splitmix64-hash(w) mod n with length 1 + hash(w') mod k; at step j it
    moves to the unvisited neighbor minimizing the keyed hash
    h(w, j, nbr) (uniform-without-replacement realized by hash ranking,
    like ForestFireScore), dying when none remains.  The reference's
    global `explored` bleed-over between successive walks is an artifact
    of its shared scratch array; independent per-walk visited sets are
    the documented deviation that makes walks embarrassingly parallel.

    Scale shape: per step one hash-exchange join (walker rows × adjacency)
    plus a per-walk argmin inside w-partitioned tasks; visited state is
    k+1 int64 columns per walker (pyarrow joins reject lists), never a
    global structure.
    """
    from networkit_ray.common.exchange import _nonnull, partition_refs
    from networkit_ray.sources.synth import _splitmix64

    if num_walks is None:
        num_walks = max(1, num_nodes // 2)
    base = np.uint64(seed) * np.uint64(0x100000001B3)
    vcols = [f"v{i}" for i in range(k + 1)]

    w = np.arange(num_walks, dtype=np.uint64)
    starts = (_splitmix64(w * _GOLD + base) % np.uint64(num_nodes)).astype(np.int64)
    lengths = (
        _splitmix64(w * _GOLD + _MIX + base) % np.uint64(k)
    ).astype(np.int64) + 1
    cols = {
        "w": pa.array(w.astype(np.int64)),
        "cur": pa.array(starts),
        "l": pa.array(lengths),
        "v0": pa.array(starts),
    }
    for c in vcols[1:]:
        cols[c] = pa.array(np.full(num_walks, -1, dtype=np.int64))
    walks = ray.data.from_arrow(pa.table(cols)).materialize()

    bi = sym.map_batches(
        lambda t: pa.table(
            {
                "u": t["src"].combine_chunks().cast(pa.int64()),
                "nbr": t["dst"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    picked_tables: list[ray.data.Dataset] = []
    for j in range(k):
        active = walks.map_batches(
            lambda t, _j=j: t.filter(
                pa.compute.greater(t["l"], pa.scalar(_j, pa.int64()))
            ),
            batch_format="pyarrow",
        ).materialize()
        if active.count() == 0:
            break
        cand = exchange_join(active, bi, left_on=["cur"], right_on=["u"])

        def unvisited(t: pa.Table) -> pa.Table:
            nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
            seen = np.zeros(len(t), dtype=bool)
            for c in vcols:
                if c in t.column_names:
                    seen |= nbr == t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(~seen))

        cand = cand.map_batches(unvisited, batch_format="pyarrow")

        def step(*tables, _j=j):
            live = [t for t in tables if t is not None and len(t)]
            if not live:
                return None
            t = pa.concat_tables(live)
            wv = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
            h = _splitmix64(
                (wv.astype(np.uint64) + np.uint64(1)) * _GOLD
                + np.uint64(_j + 1) * _MIX
                + nbr.astype(np.uint64) * _P3
                + base
            )
            order = np.lexsort((h, wv))
            first = np.flatnonzero(
                np.r_[True, wv[order][1:] != wv[order][:-1]]
            )
            pick = order[first]
            out = t.take(pa.array(pick))
            # advance: cur = nbr, v_{j+1} = nbr
            arrays, names = [], []
            for c in out.column_names:
                if c in ("u", "nbr"):
                    continue
                if c == "cur":
                    arrays.append(out["nbr"])
                elif c == f"v{_j + 1}":
                    arrays.append(out["nbr"])
                else:
                    arrays.append(out[c])
                names.append(c)
            return pa.table(dict(zip(names, arrays)))

        step_task = ray.remote(step)
        slices = partition_refs(cand, ["w"], num_parts)
        parts = [
            step_task.remote(*[s[p] for s in slices]) for p in range(len(slices[0]))
        ]
        keep = [
            ref
            for ref, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts]))
            if ok
        ]
        if not keep:
            break
        walks = ray.data.from_arrow_refs(keep).materialize()
        picked_tables.append(
            walks.map_batches(
                lambda t: pa.table({"v": t["cur"]}), batch_format="pyarrow"
            ).materialize()
        )

    allv = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(num_nodes, dtype=np.int64))})
    )
    if not picked_tables:
        return allv.map_batches(
            lambda t: t.append_column(
                "score", pa.array(np.zeros(len(t), np.float64))
            ),
            batch_format="pyarrow",
        )
    visits = picked_tables[0]
    for t in picked_tables[1:]:
        visits = visits.union(t)
    from ray.data.aggregate import Count

    counts = visits.groupby("v").aggregate(Count(alias_name="cnt"))
    joined = exchange_join(allv, counts, left_on=["v"], join_type="left outer")

    def score(t: pa.Table) -> pa.Table:
        c = (
            t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "cnt" in t.column_names
            else np.zeros(len(t))
        )
        c = np.where(np.isnan(c), 0.0, c)
        return pa.table(
            {"v": t["v"], "score": pa.array(c * float(k) / float(num_walks))}
        )

    return joined.map_batches(score, batch_format="pyarrow")
