"""Rank-based sparsification scores: LocalDegree and Simmelian overlap.

Reference: sparsification/LocalDegreeScore.cpp and
sparsification/SimmelianOverlapScore.cpp (both feed
GlobalThresholdFilter like the triangle/Jaccard scores in
graph/triangles.py).  Normative semantics (mirrored by the DuckDB
twins):

LocalDegree — from each endpoint u with the neighbors of u ranked by
(deg(nbr) DESC, nbr ASC), the side score of edge (u,v) is 1.0 at rank 1
else ``1 − ln(rank)/ln(deg(u))``; the edge score is the max over both
sides.  Keeping scores ≥ 1−α retains each vertex's top deg^α neighbors
— the local (per-node, degree-proportional) filter the score family is
named for.

Simmelian overlap (parametric, maxRank) — per-edge strength = triangle
count; each vertex's top-maxRank neighbors by (strength DESC, nbr ASC)
form its strong set; overlap(u,v) = |strong(u) ∩ strong(v)|.

Scale shape: one degree/strength build, one hash exchange per endpoint
ranking (per-partition numpy lexsort + grouped rank — no per-row
Python), bounded top-maxRank fan-out for the overlap join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from networkit_ray.common.exchange import _nonnull, exchange_join, partition_refs


def _grouped_rank(keys: np.ndarray) -> np.ndarray:
    """1-based rank within consecutive equal-key runs (keys pre-sorted)."""
    n = len(keys)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    sizes = np.diff(np.r_[starts, n])
    return np.arange(n) - np.repeat(starts, sizes) + 1


@ray.remote
def _ld_rank_part(*tables) -> pa.Table | None:
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    degv = t["degv"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dst, -degv, src))
    s, d = src[order], dst[order]
    rank = _grouped_rank(s)
    # deg(u) = size of u's run (sym table is deduplicated, both directions)
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    degu = np.repeat(np.diff(np.r_[starts, len(s)]), np.diff(np.r_[starts, len(s)]))
    with np.errstate(divide="ignore", invalid="ignore"):
        side = np.where(rank == 1, 1.0, 1.0 - np.log(rank) / np.log(degu))
    return pa.table(
        {
            "src": pa.array(np.minimum(s, d)),
            "dst": pa.array(np.maximum(s, d)),
            "score": pa.array(side),
        }
    )


def local_degree_scores(
    sym: ray.data.Dataset, num_nodes: int, *, num_parts: int | None = None
) -> ray.data.Dataset:
    """(src, dst, ld_score) over canonical edges."""
    deg = (
        sym.groupby("dst")
        .aggregate(Count(alias_name="degv"))
        .map_batches(
            lambda t: pa.table(
                {"v": t["dst"].combine_chunks().cast(pa.int64()), "degv": t["degv"]}
            ),
            batch_format="pyarrow",
        )
    )
    j = exchange_join(sym, deg, left_on=["dst"], right_on=["v"])
    slices = partition_refs(j, ["src"], num_parts or 16)
    parts = [
        _ld_rank_part.remote(*[s[p] for s in slices])
        for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    sided = ray.data.from_arrow_refs(keep)
    return (
        sided.groupby(["src", "dst"])
        .aggregate(Max("score", alias_name="ld_score"))
    )


@ray.remote
def _so_topk_part(max_rank: int, *tables) -> pa.Table | None:
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    tri = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((nbr, -tri, v))
    v, nbr = v[order], nbr[order]
    rank = _grouped_rank(v)
    keep = rank <= max_rank
    return pa.table({"v": pa.array(v[keep]), "nbr": pa.array(nbr[keep])})


def simmelian_overlap_scores(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    max_rank: int = 10,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(src, dst, overlap) over canonical edges."""
    from networkit_ray.graph.triangles import edge_triangle_scores

    tri = edge_triangle_scores(canon, num_nodes).materialize()

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "v": pa.array(np.concatenate([s, d])),
                "nbr": pa.array(np.concatenate([d, s])),
                "tri": pa.array(np.concatenate([w, w])),
            }
        )

    bi = tri.map_batches(both, batch_format="pyarrow")
    slices = partition_refs(bi, ["v"], num_parts or 16)
    parts = [
        _so_topk_part.remote(max_rank, *[s[p] for s in slices])
        for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    topk = ray.data.from_arrow_refs(keep).materialize()

    e = canon.select_columns(["src", "dst"])
    j1 = exchange_join(e, topk, left_on=["src"], right_on=["v"])
    j2 = exchange_join(
        j1, topk, left_on=["dst", "nbr"], right_on=["v", "nbr"], join_type="left semi"
    )
    ov = j2.groupby(["src", "dst"]).aggregate(Count(alias_name="overlap"))
    filled = exchange_join(e, ov, left_on=["src", "dst"], join_type="left outer")

    def fill(t: pa.Table) -> pa.Table:
        if "overlap" not in t.column_names:
            z = np.zeros(len(t), np.int64)
        else:
            z = np.nan_to_num(
                t["overlap"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
            ).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "overlap": pa.array(z)})

    return filled.map_batches(fill, batch_format="pyarrow")


@ray.remote
def _ls_rank_part(*tables) -> pa.Table | None:
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    jac = t["jaccard"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nbr, -jac, v))
    v, nbr = v[order], nbr[order]
    rank = _grouped_rank(v)
    starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
    sizes = np.diff(np.r_[starts, len(v)])
    degv = np.repeat(sizes, sizes)
    with np.errstate(divide="ignore", invalid="ignore"):
        side = np.where(rank == 1, 1.0, 1.0 - np.log(rank) / np.log(degv))
    return pa.table(
        {
            "src": pa.array(np.minimum(v, nbr)),
            "dst": pa.array(np.maximum(v, nbr)),
            "score": pa.array(side),
        }
    )


def local_similarity_scores(
    canon: ray.data.Dataset, num_nodes: int, *, num_parts: int | None = None
) -> ray.data.Dataset:
    """(src, dst, ls_score) — LocalSimilarity sparsification scores.

    Reference: sparsification/LocalSimilarityScore.cpp — the LocalDegree
    rank construction (1 at rank 1, else 1 − ln(rank)/ln(deg(u)), max
    over both sides) applied with neighbors ranked by JACCARD similarity
    (ties → smaller id) instead of degree: keeps each vertex's most
    similar neighbors under a global threshold.
    """
    from networkit_ray.graph.triangles import jaccard_edge_scores

    jac = jaccard_edge_scores(canon, num_nodes)

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": pa.array(np.concatenate([s, d])),
                "nbr": pa.array(np.concatenate([d, s])),
                "jaccard": pa.array(np.concatenate([j, j])),
            }
        )

    bi = jac.map_batches(both, batch_format="pyarrow")
    slices = partition_refs(bi, ["v"], num_parts or 16)
    parts = [
        _ls_rank_part.remote(*[s[p] for s in slices])
        for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    return (
        ray.data.from_arrow_refs(keep)
        .groupby(["src", "dst"])
        .aggregate(Max("score", alias_name="ls_score"))
    )


def multiscale_scores(sym_w: ray.data.Dataset) -> ray.data.Dataset:
    """(src, dst, ms_score) — Multiscale backbone scores over a weighted graph.

    Reference: sparsification/MultiscaleScore.cpp (getProbability:
    ``1 − (1 − w/Σw)^(deg(u)−1)`` under the null hypothesis that a
    degree-k node's normalized edge weights are uniform; Sparsifiers.cpp
    MultiscaleSparsifier feeds raw edge weights).  Input is the
    symmetrized weighted table (src, dst, w) with both directions
    present; the edge score is the max of the two side probabilities.

    Scale shape: one groupby (per-vertex degree + weight sum), one hash
    join back onto edges, vectorized probability, canonical max — no
    per-row Python, no driver materialization.
    """
    agg = sym_w.groupby("src").aggregate(
        Count(alias_name="deg"), Sum("w", alias_name="wsum")
    )
    deg = agg.map_batches(
        lambda t: pa.table(
            {
                "v": t["src"].combine_chunks().cast(pa.int64()),
                "deg": t["deg"].combine_chunks().cast(pa.int64()),
                "wsum": t["wsum"].combine_chunks().cast(pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = exchange_join(sym_w, deg, left_on=["src"], right_on=["v"])

    def side(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        wsum = t["wsum"].to_numpy(zero_copy_only=False).astype(np.float64)
        # pow(0,0)=1 (numpy and DuckDB agree), so a degree-1 vertex
        # contributes side score 0 — matching the reference's pow().
        p = 1.0 - (1.0 - w / wsum) ** (deg - 1.0)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
                "score": pa.array(p),
            }
        )

    return (
        j.map_batches(side, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Max("score", alias_name="ms_score"))
    )


def chance_corrected_triangle_scores(
    canon: ray.data.Dataset, num_nodes: int
) -> ray.data.Dataset:
    """(src, dst, cct_score) — chance-corrected triangle scores.

    Reference: sparsification/ChanceCorrectedTriangleScore.cpp — for edge
    (u,v): ``tri·(n−2) / ((deg(u)−1)·(deg(v)−1))`` when tri > 0, else 1
    if either endpoint has degree 1, else 0.  (A degree-1 endpoint can
    never carry a triangle, so the divisor is safe whenever tri > 0.)

    Scale shape: reuses the oriented-wedge triangle counts and the
    degree table; two hash joins, vectorized arithmetic.
    """
    from networkit_ray.graph.triangles import edge_triangle_scores, undirected_degrees

    tri = edge_triangle_scores(canon, num_nodes)
    deg = undirected_degrees(canon)
    j1 = exchange_join(tri, deg, left_on=["src"], right_on=["v"])
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["degu" if c == "deg" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    j2 = exchange_join(j1, deg, left_on=["dst"], right_on=["v"])

    def score(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        tr = t["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        du = t["degu"].to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom = np.maximum((du - 1.0) * (dv - 1.0), 1.0)
        val = np.where(
            tr > 0,
            tr * float(num_nodes - 2) / denom,
            np.where((du == 1.0) | (dv == 1.0), 1.0, 0.0),
        )
        return pa.table(
            {"src": pa.array(s), "dst": pa.array(d), "cct_score": pa.array(val)}
        )

    return j2.map_batches(score, batch_format="pyarrow")


def random_edge_scores(canon: ray.data.Dataset, *, seed: int = 42) -> ray.data.Dataset:
    """(src, dst, re_score) — seeded uniform 'random' edge scores.

    Reference: sparsification/RandomEdgeScore.cpp (uniform [0,1) per
    edge).  A mutable RNG is inherently sequential; the distributed
    equivalent is the keyed hash-coin from graph/sampling.py —
    ``((src·2654435761 + dst·40503 + seed) mod 2³¹) / 2³¹`` — identical
    across runs, partitionings and cluster sizes, and exactly
    reproducible by a SQL twin.
    """
    from networkit_ray.graph.sampling import _M, _coin

    def f(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(s),
                "dst": pa.array(d),
                "re_score": pa.array(_coin(s, d, seed).astype(np.float64) / _M),
            }
        )

    return canon.map_batches(f, batch_format="pyarrow")


def _u64_unit(h: np.ndarray) -> np.ndarray:
    return h.astype(np.float64) / 2.0**64


def _ff_key(
    f: np.ndarray, v: np.ndarray, r: int, t: np.ndarray, b: int, base: np.uint64
) -> np.ndarray:
    """Keyed counter hash for the forest-fire draws (splitmix64 twin of a
    sequential RNG; every draw is a pure function of its coordinates)."""
    from networkit_ray.sources.synth import _splitmix64

    P1 = np.uint64(0x9E3779B97F4A7C15)
    P2 = np.uint64(0xBF58476D1CE4E5B9)
    P3 = np.uint64(0x94D049BB133111EB)
    key = (
        (f.astype(np.uint64) * P1 + v.astype(np.uint64)) * P2
        + np.uint64(r)
    ) * P3 + np.asarray(t, np.uint64) * np.uint64(2) + np.uint64(b) + base
    return _splitmix64(key)


def forest_fire_scores(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    pf: float = 0.7,
    num_fires: int | None = None,
    seed: int = 42,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """(src, dst, ff_score) — burnt-edge frequencies from seeded fires.

    Reference: sparsification/ForestFireScore.cpp.  The reference runs
    sequential fires with a mutable RNG until targetBurntRatio·m edges
    burn; the distributed re-expression (normative semantics, mirrored by
    the numpy replica in tests) is ROUND-SYNCHRONOUS with keyed-hash
    draws:

    - ``num_fires`` fires (default n/50) start at
      splitmix64(fire)+seed mod n;
    - each round, every active (fire, v) burns k unvisited neighbors,
      where k counts the prefix of per-(fire,v,round) uniform draws ≤ pf
      (the reference's truncated-geometric stopping rule) and the burn
      targets are the k unvisited neighbors of smallest
      splitmix64(fire,v,nbr) rank (uniform-without-replacement realized
      by hash ranking);
    - all burners in a round see the round-START visited set (two burners
      may burn edges into the same new node; it joins the frontier once);
    - scores are burn counts normalized by the max, like the reference.

    Scale shape: each round is one adjacency join + one anti-join +
    vectorized group math over the frontier; visited/frontier state is
    fire-local, never the whole graph.
    """
    from ray.data.aggregate import Sum as _Sum

    if num_fires is None:
        num_fires = max(1, num_nodes // 50)
    from networkit_ray.sources.synth import _splitmix64

    base = np.uint64(seed) * np.uint64(0x100000001B3)

    bi = canon.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        t["dst"].combine_chunks().cast(pa.int64()),
                        t["src"].combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    fires = np.arange(num_fires, dtype=np.uint64)
    starts = (_splitmix64(fires + base) % np.uint64(num_nodes)).astype(np.int64)
    frontier = ray.data.from_arrow(
        pa.table(
            {"f": pa.array(fires.astype(np.int64)), "v": pa.array(starts)}
        )
    ).materialize()
    visited = frontier
    burn_tables: list[ray.data.Dataset] = []

    for r in range(max_rounds):
        if frontier.count() == 0:
            break
        adj = exchange_join(frontier, bi, left_on=["v"], right_on=["u"])
        cand = exchange_join(
            adj,
            visited,
            left_on=["f", "nbr"],
            right_on=["f", "v"],
            join_type="left anti",
        ).materialize()
        if cand.count() == 0:
            break

        def burn(*tables, _r=r) -> pa.Table | None:
            live = [t for t in tables if t is not None and len(t)]
            if not live:
                return None
            t = pa.concat_tables(live)
            f = t["f"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
            # group rows by (f, v); rank neighbors by the keyed hash
            # (t-slot = nbr, b=1: odd counters, disjoint from the q-draws)
            h = _ff_key(f, v, _r, nbr, 1, base)
            order = np.lexsort((h, v, f))
            f, v, nbr = f[order], v[order], nbr[order]
            n_ = len(f)
            starts_ = np.flatnonzero(
                np.r_[True, (f[1:] != f[:-1]) | (v[1:] != v[:-1])]
            )
            sizes = np.diff(np.r_[starts_, n_])
            rank = np.arange(n_) - np.repeat(starts_, sizes)
            # k per group: prefix of uniform draws ≤ pf, capped at 16
            gf, gv = f[starts_], v[starts_]
            cap = 16
            qs = _u64_unit(
                _ff_key(
                    np.repeat(gf, cap),
                    np.repeat(gv, cap),
                    _r,
                    np.tile(np.arange(cap), len(gf)),
                    0,
                    base,
                )
            ).reshape(len(gf), cap)
            k = np.argmax(qs > pf, axis=1)
            k = np.where((qs <= pf).all(axis=1), cap, k)
            keep = rank < np.repeat(k, sizes)
            return pa.table(
                {
                    "f": pa.array(f[keep]),
                    "v": pa.array(v[keep]),
                    "w": pa.array(nbr[keep]),
                }
            )

        # the anti-join leaves cand partitioned by (f, nbr); the grouped
        # burn math needs every (f, v) group whole in one task
        burn_task = ray.remote(burn)
        slices = partition_refs(cand, ["f", "v"], 16)
        parts = [
            burn_task.remote(*[s[p] for s in slices]) for p in range(len(slices[0]))
        ]
        keep = [
            ref
            for ref, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts]))
            if ok
        ]
        if not keep:
            break
        burned = ray.data.from_arrow_refs(keep).materialize()
        if burned.count() == 0:
            break
        burn_tables.append(
            burned.map_batches(
                lambda t: pa.table(
                    {
                        "src": pa.array(
                            np.minimum(
                                t["v"].to_numpy(zero_copy_only=False),
                                t["w"].to_numpy(zero_copy_only=False),
                            )
                        ),
                        "dst": pa.array(
                            np.maximum(
                                t["v"].to_numpy(zero_copy_only=False),
                                t["w"].to_numpy(zero_copy_only=False),
                            )
                        ),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
        )
        new_front = (
            burned.groupby(["f", "w"])
            .aggregate(Count(alias_name="_c"))
            .map_batches(
                lambda t: pa.table({"f": t["f"], "v": t["w"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        visited = visited.union(new_front).materialize()
        frontier = new_front

    if not burn_tables:
        empty = pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("ff_score", pa.float64())]
        )
        return ray.data.from_arrow(empty.empty_table())
    all_burns = burn_tables[0]
    for t in burn_tables[1:]:
        all_burns = all_burns.union(t)
    counts = all_burns.groupby(["src", "dst"]).aggregate(
        Count(alias_name="burnt")
    ).materialize()
    mx = counts.max("burnt")

    def norm(t: pa.Table) -> pa.Table:
        b = t["burnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "ff_score": pa.array(b / mx)}
        )

    return counts.map_batches(norm, batch_format="pyarrow")


def normalize_edge_scores(
    scored: ray.data.Dataset,
    score_col: str,
    *,
    invert: bool = False,
    lower: float = 0.0,
    upper: float = 1.0,
) -> ray.data.Dataset:
    """(src, dst, norm_score) — linear rescale of an edge score to
    [lower, upper] (edgescores/EdgeScoreNormalizer.cpp, incl. invert).
    One global min/max aggregate, then a vectorized map."""
    mn = scored.min(score_col)
    mx = scored.max(score_col)
    span = float(mx - mn) or 1.0
    factor = (upper - lower) / span
    offset = lower - mn * factor
    if invert:
        factor = -factor
        offset = upper - mn * factor

    def f(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "norm_score": pa.array(factor * s + offset),
            }
        )

    return scored.map_batches(f, batch_format="pyarrow")


def linearize_edge_scores(
    scored: ray.data.Dataset, score_col: str, *, inverse: bool = False
) -> ray.data.Dataset:
    """(src, dst, lin_score) — rank-uniform scores pos/(m−1) over the
    global (score, src, dst) order (edgescores/EdgeScoreLinearizer.cpp;
    the reference breaks score ties randomly, here deterministically by
    edge id so the DuckDB twin reproduces it).

    Distributed rank: one global sort, then per-block offsets (one count
    per block on the driver) + a vectorized in-block arange.
    """
    srt = scored.sort(
        [score_col, "src", "dst"], descending=[inverse, False, False]
    ).materialize()
    refs = srt.to_arrow_refs()

    @ray.remote
    def _cnt(t) -> int:
        return len(t)

    counts = np.array(ray.get([_cnt.remote(r) for r in refs]), np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    m = int(counts.sum())
    denom = float(max(m - 1, 1))

    @ray.remote
    def _rank(t, off: int) -> pa.Table:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        pos = off + np.arange(len(t), dtype=np.float64)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "lin_score": pa.array(
                    np.full(len(t), 0.5) if m == 1 else pos / denom
                ),
            }
        )

    out = [_rank.remote(r, int(offsets[i])) for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out)


@ray.remote
def _pj_rank_part(*tables) -> pa.Table | None:
    """(v, nbr, rank) — neighbors ranked by (attr DESC, ties share rank =
    count of strictly-greater attrs), per vertex."""
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nbr = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
    a = t["attr"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((nbr, -a, v))
    v, nbr, a = v[order], nbr[order], a[order]
    new_v = np.r_[True, v[1:] != v[:-1]]
    new_run = new_v | np.r_[True, a[1:] != a[:-1]]
    starts = np.flatnonzero(new_v)
    sizes = np.diff(np.r_[starts, len(v)])
    pos = np.arange(len(v)) - np.repeat(starts, sizes)
    run_start_pos = pos[np.flatnonzero(new_run)]
    rank = np.repeat(
        run_start_pos, np.diff(np.r_[np.flatnonzero(new_run), len(v)])
    )
    return pa.table(
        {"v": pa.array(v), "nbr": pa.array(nbr), "rank": pa.array(rank.astype(np.int64))}
    )


@ray.remote
def _pj_edge_part(*tables) -> pa.Table | None:
    """Per-edge best prefix Jaccard from (src, dst, side, nbr, rank) rows."""
    import pandas as pd

    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    df = pa.concat_tables(live).to_pandas()
    # matched neighbors become common at max(rank_u, rank_v)
    u_rows = df[df["side"] == 0]
    v_rows = df[df["side"] == 1]
    m = u_rows.merge(v_rows, on=["src", "dst", "nbr"], suffixes=("_u", "_v"))
    ev = pd.concat(
        [
            pd.DataFrame(
                {"src": df["src"], "dst": df["dst"], "r": df["rank"],
                 "du": (df["side"] == 0).astype(np.int64),
                 "dv": (df["side"] == 1).astype(np.int64),
                 "dm": 0}
            ),
            pd.DataFrame(
                {"src": m["src"], "dst": m["dst"],
                 "r": np.maximum(m["rank_u"], m["rank_v"]),
                 "du": 0, "dv": 0, "dm": 1}
            ),
        ],
        ignore_index=True,
    )
    src = ev["src"].to_numpy(np.int64)
    dst = ev["dst"].to_numpy(np.int64)
    r = ev["r"].to_numpy(np.int64)
    du = ev["du"].to_numpy(np.int64)
    dv = ev["dv"].to_numpy(np.int64)
    dm = ev["dm"].to_numpy(np.int64)
    order = np.lexsort((r, dst, src))
    src, dst, r, du, dv, dm = (x[order] for x in (src, dst, r, du, dv, dm))
    new_e = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
    starts = np.flatnonzero(new_e)
    sizes = np.diff(np.r_[starts, len(src)])
    base = np.repeat(starts, sizes)
    cu = np.cumsum(du)
    cv = np.cumsum(dv)
    cm = np.cumsum(dm)
    # group-local cumulative counts (subtract the prefix before the group)
    cu = cu - np.where(base > 0, np.cumsum(du)[base - 1], 0)
    cv = cv - np.where(base > 0, np.cumsum(dv)[base - 1], 0)
    cm = cm - np.where(base > 0, np.cumsum(dm)[base - 1], 0)
    # evaluate only at the LAST event of each (edge, rank) level
    last_of_level = np.r_[
        (src[1:] != src[:-1]) | (dst[1:] != dst[:-1]) | (r[1:] != r[:-1]), True
    ]
    denom = cu + cv - cm
    j = np.where(denom > 0, cm / np.maximum(denom, 1), 0.0)
    j = np.where(last_of_level, j, 0.0)
    out = pd.DataFrame({"src": src, "dst": dst, "j": j})
    best = out.groupby(["src", "dst"], sort=False)["j"].max().reset_index()
    return pa.table(
        {
            "src": pa.array(best["src"].to_numpy(np.int64)),
            "dst": pa.array(best["dst"].to_numpy(np.int64)),
            "pj_score": pa.array(best["j"].to_numpy(np.float64)),
        }
    )


def prefix_jaccard_scores(
    canon: ray.data.Dataset, num_nodes: int, *, num_parts: int | None = None
) -> ray.data.Dataset:
    """(src, dst, pj_score) — best prefix-Jaccard of the endpoints' ranked
    neighbor lists (edgescores/PrefixJaccardScore.cpp; the non-parametric
    Simmelian backbone's core).  Neighbors are ranked per vertex by
    (triangle strength DESC, ties share rank); for every rank level r,
    J_r = |A_r ∩ B_r| / |A_r ∪ B_r| over the two rank-≤-r prefixes
    (other endpoint excluded); the edge score is max_r J_r.

    Scale shape: one triangle-strength build, one per-vertex ranking pass,
    one per-edge event-cumsum pass — all vectorized inside hash-partitioned
    tasks; Σdeg rows per side, no per-edge Python loop.
    """
    from networkit_ray.graph.triangles import edge_triangle_scores

    tri = edge_triangle_scores(canon, num_nodes).materialize()

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "v": pa.array(np.concatenate([s, d])),
                "nbr": pa.array(np.concatenate([d, s])),
                "attr": pa.array(np.concatenate([w, w])),
            }
        )

    bi = tri.map_batches(both, batch_format="pyarrow")
    P = num_parts or 16
    slices = partition_refs(bi, ["v"], P)
    parts = [
        _pj_rank_part.remote(*[s[p] for s in slices]) for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    ranked = ray.data.from_arrow_refs(keep).materialize()

    # side rows per canonical edge, other endpoint excluded
    e = tri.select_columns(["src", "dst"])
    def mk_side(exclude_col: str, side_id: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pa.compute.not_equal(t["nbr"], t[exclude_col]))
            t = t.select(["src", "dst", "nbr", "rank"])
            return t.append_column(
                "side", pa.array(np.full(len(t), side_id, np.int64))
            )

        return f

    side_u = exchange_join(e, ranked, left_on=["src"], right_on=["v"]).map_batches(
        mk_side("dst", 0), batch_format="pyarrow"
    )
    side_v = exchange_join(e, ranked, left_on=["dst"], right_on=["v"]).map_batches(
        mk_side("src", 1), batch_format="pyarrow"
    )
    rows = side_u.union(side_v)
    slices = partition_refs(rows, ["src", "dst"], P)
    parts = [
        _pj_edge_part.remote(*[s[p] for s in slices]) for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts])) if ok]
    scored = ray.data.from_arrow_refs(keep)
    filled = exchange_join(e, scored, left_on=["src", "dst"], join_type="left outer")

    def fill(t: pa.Table) -> pa.Table:
        s = (
            t["pj_score"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "pj_score" in t.column_names
            else np.zeros(len(t))
        )
        s = np.where(np.isnan(s), 0.0, s)
        return pa.table({"src": t["src"], "dst": t["dst"], "pj_score": pa.array(s)})

    return filled.map_batches(fill, batch_format="pyarrow")


def blend_edge_scores(
    a: ray.data.Dataset, col_a: str, b: ray.data.Dataset, col_b: str, factor: float
) -> ray.data.Dataset:
    """(src, dst, blend_score) = factor·a + (1−factor)·b per edge
    (edgescores/EdgeScoreBlender.cpp) — one hash join + a vectorized map."""
    br = b.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "_b": pc_cast(t[col_b])}
        ),
        batch_format="pyarrow",
    )
    j = exchange_join(a, br, left_on=["src", "dst"])

    def f(t: pa.Table) -> pa.Table:
        av = t[col_a].to_numpy(zero_copy_only=False).astype(np.float64)
        bv = t["_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "blend_score": pa.array(factor * av + (1.0 - factor) * bv),
            }
        )

    return j.map_batches(f, batch_format="pyarrow")


def pc_cast(col):
    import pyarrow.compute as _pc

    return _pc.cast(col, pa.float64())


def edge_score_as_weight(
    scored: ray.data.Dataset, score_col: str, *, offset: float = 0.0, factor: float = 1.0
) -> ray.data.Dataset:
    """(src, dst, w) — attach an edge score as the weight column
    (edgescores/EdgeScoreAsWeight.cpp: w = offset + factor·score), making
    any scored table directly consumable by the weighted kernels."""

    def f(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "w": pa.array(offset + factor * s)}
        )

    return scored.map_batches(f, batch_format="pyarrow")
