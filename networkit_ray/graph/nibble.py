"""PageRankNibble — seed-set community via PPR sweep cut.

Reference: scd/PageRankNibble.cpp:97 + scd/ApproximatePageRank.cpp:66 —
run personalized PageRank from the seed(s), order vertices by score/deg,
and return the prefix with minimum conductance.

Distributed decomposition:
- PPR: the fixed-iteration superstep kernel (pagerank.personalized_pagerank);
- ranking: score/deg join, sort desc, cap at ``max_k`` candidates (the
  reference bounds support via the push eps; the cap is the analog and
  makes every later structure max_k-sized, i.e. driver-safe);
- sweep: ONE pass over the edge table computes, per prefix k,
      cut(k)  = #edges(min_rank ≤ k) − #edges(max_rank ≤ k) + #half-ranked(r ≤ k)
      vol(k)  = cumulative degree
  as per-batch histogram partials (edge-parallel, k-sized outputs);
  conductance(k) = cut(k)/min(vol(k), 2m−vol(k)), argmin with smallest-k
  tie-break.  Only max_k-sized arrays ever reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.common.exchange import exchange_join


def pagerank_nibble(
    sym: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    damp: float = 0.85,
    iterations: int = 30,
    max_k: int = 256,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, rank) of the best-conductance PPR sweep prefix + info dict."""
    from ray.data.aggregate import Count

    from networkit_ray.graph.pagerank import personalized_pagerank

    scores, _ = personalized_pagerank(
        sym, num_nodes, seeds, damp=damp, iterations=iterations,
        num_parts=num_parts,
    )
    deg = sym.groupby("src").aggregate(Count(alias_name="deg"))
    j = exchange_join(
        scores,
        deg.map_batches(
            lambda t: pa.table({"v": t["src"], "deg": t["deg"]}),
            batch_format="pyarrow",
        ),
        left_on=["v"],
    )

    def scored(t: pa.Table) -> pa.Table:
        from networkit_ray.common.hashing import round_half_away

        s = t["score"].to_numpy(zero_copy_only=False)
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = s > 0
        # rank on ROUNDED score/deg: the SQL twin computes sd through its
        # own float path (~1e-15 apart) — rounding to 8 on both sides makes
        # the ordering well-defined, with v-ascending as the tie-break
        return pa.table(
            {
                "v": t["v"].filter(pa.array(keep)),
                "deg": t["deg"].filter(pa.array(keep)),
                "sd": pa.array(round_half_away(s[keep] / d[keep], 8)),
            }
        )

    # Ray sort() has no per-column direction — sort on (-sd, v) ascending
    ranked = (
        j.map_batches(scored, batch_format="pyarrow")
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("sd"),
                "sd",
                pa.compute.negate(t["sd"]),
            ),
            batch_format="pyarrow",
        )
        .sort(["sd", "v"])
        .limit(max_k)
        .to_pandas()
    )  # max_k rows — driver-sized by construction
    ranked["sd"] = -ranked["sd"]
    K = len(ranked)
    if K == 0:
        return (
            ray.data.from_arrow(
                pa.schema([("v", pa.int64()), ("rank", pa.int64())]).empty_table()
            ),
            {"k": 0, "conductance": float("nan")},
        )
    degs = ranked["deg"].to_numpy().astype(np.int64)
    m2 = float(sym.count())  # 2m (sym table counts each edge twice)

    # K-sized sorted lookup (NOT an n-sized LUT — n may be vertex-scale)
    rv_keys = ranked["v"].to_numpy().astype(np.int64)
    order_k = np.argsort(rv_keys)
    sk, sv = rv_keys[order_k], np.arange(K, dtype=np.int64)[order_k]

    def _rank_lookup(x: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(sk, x)
        pos_c = np.minimum(pos, len(sk) - 1)
        hit = sk[pos_c] == x
        out = np.full(len(x), -1, np.int64)
        out[hit] = sv[pos_c[hit]]
        return out

    def hist(t: pa.Table) -> pa.Table:
        # canonical orientation inside the batch so each undirected edge
        # counts once: keep src < dst rows of the sym table
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src < dst
        src, dst = src[keep], dst[keep]
        ru, rv = _rank_lookup(src), _rank_lookup(dst)
        both = (ru >= 0) & (rv >= 0)
        single = (ru >= 0) ^ (rv >= 0)
        h_min = np.bincount(np.minimum(ru, rv)[both], minlength=K)[:K]
        h_max = np.bincount(np.maximum(ru, rv)[both], minlength=K)[:K]
        h_one = np.bincount(
            np.maximum(ru, rv)[single], minlength=K
        )[:K]  # the ranked endpoint's rank (other is -1)
        k = np.arange(K, dtype=np.int64)
        return pa.table(
            {
                "k": pa.array(k),
                "h_min": pa.array(h_min.astype(np.int64)),
                "h_max": pa.array(h_max.astype(np.int64)),
                "h_one": pa.array(h_one.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        sym.map_batches(hist, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("h_min", alias_name="h_min"),
            Sum("h_max", alias_name="h_max"),
            Sum("h_one", alias_name="h_one"),
        )
        .to_pandas()
        .sort_values("k")
    )  # K rows
    h_min = np.zeros(K, np.int64)
    h_max = np.zeros(K, np.int64)
    h_one = np.zeros(K, np.int64)
    kk = agg["k"].to_numpy().astype(np.int64)
    h_min[kk] = agg["h_min"]
    h_max[kk] = agg["h_max"]
    h_one[kk] = agg["h_one"]
    cut = np.cumsum(h_min) - np.cumsum(h_max) + np.cumsum(h_one)
    vol = np.cumsum(degs).astype(np.float64)
    denom = np.minimum(vol, m2 - vol)
    with np.errstate(divide="ignore", invalid="ignore"):
        cond = np.where(denom > 0, cut / denom, np.inf)
    best = int(np.argmin(cond))  # argmin takes the FIRST minimum — smallest k
    out = pa.table(
        {
            "v": pa.array(ranked["v"].to_numpy()[: best + 1].astype(np.int64)),
            "rank": pa.array(np.arange(best + 1, dtype=np.int64)),
        }
    )
    return ray.data.from_arrow(out), {
        "k": best + 1,
        "conductance": float(cond[best]),
    }
