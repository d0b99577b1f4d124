"""Greedy group-degree centrality (submodular max-coverage selection).

Reference: networkit/cpp/centrality/GroupDegree.cpp — greedy selection of a
k-vertex group maximizing neighborhood coverage.  Semantics here (documented
normative for the SQL twin): coverage objective |∪_{s∈S} N[s]| over CLOSED
neighborhoods; each round picks argmax_v |N[v] \\ covered| with ties broken
by smallest vertex id, stopping early when every remaining vertex has zero
uncovered closed neighbors.  An already-selected vertex has all of N[v]
covered, so it drops out of the gain table automatically — no explicit
exclusion needed (the property that keeps both the engine loop and the
unrolled DuckDB twin simple).

Scale shape: per round one anti-join (closed-neighbor rows vs the covered
set, hash-partitioned on the neighbor id) + one count aggregate + a
block-local argmax reduced on the driver (O(#blocks) rows, never the vertex
table).  The covered set is vertex-sized state, re-deduped per round.
k is small (single digits) so the loop is k supersteps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from networkit_ray.common.exchange import exchange_join, exchange_unique


def _closed_neighbors(sym: ray.data.Dataset, num_nodes: int) -> ray.data.Dataset:
    """(v, nbr) rows: symmetric edges plus (v, v) self rows."""
    edges = sym.map_batches(
        lambda t: pa.table(
            {
                "v": t["src"].combine_chunks().cast(pa.int64()),
                "nbr": t["dst"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    selfs = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.arange(num_nodes, dtype=np.int64)),
                "nbr": pa.array(np.arange(num_nodes, dtype=np.int64)),
            }
        )
    )
    return edges.union(selfs)


def _argmax_gain(gains: ray.data.Dataset) -> tuple[int, int] | None:
    """(v, gain) with max gain, ties to smallest v; None if empty."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        g = t["gain"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        best = np.lexsort((v, -g))[0]
        return t.take([best])

    parts = gains.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return None
    parts = parts.sort_values(["gain", "v"], ascending=[False, True])
    return int(parts.iloc[0]["v"]), int(parts.iloc[0]["gain"])


def group_degree(
    sym: ray.data.Dataset, num_nodes: int, k: int
) -> tuple[list[dict], int]:
    """Greedy k-group by closed-neighborhood coverage.

    Returns ([{rank, v, gain}, ...], total_covered).
    """
    closed = _closed_neighbors(sym, num_nodes).materialize()
    covered: ray.data.Dataset | None = None
    picks: list[dict] = []
    for r in range(k):
        if covered is None:
            uncov = closed
        else:
            uncov = exchange_join(
                closed, covered, left_on=["nbr"], right_on=["c"], join_type="left anti"
            )
        gains = uncov.groupby("v").aggregate(Count(alias_name="gain"))
        best = _argmax_gain(gains)
        if best is None:
            break
        v_star, gain = best
        picks.append({"rank": r + 1, "v": v_star, "gain": gain})
        def nbrs_of_pick(t: pa.Table, vs=v_star) -> pa.Table:
            mask = pa.compute.equal(t["v"], vs)
            return pa.table(
                {"c": t.filter(mask)["nbr"].combine_chunks().cast(pa.int64())}
            )

        newly = closed.map_batches(nbrs_of_pick, batch_format="pyarrow")
        merged = newly if covered is None else covered.union(newly)
        covered = exchange_unique(merged, ["c"]).materialize()
    total = covered.count() if covered is not None else 0
    return picks, total


# ---------------------------------------------------------------------------
# GroupCloseness — greedy farness minimization over a top-degree pool.
# Reference: networkit/cpp/centrality/GroupCloseness.cpp (greedy submodular
# group-closeness maximization).  Normative semantics for the SQL twin:
#   pool  = the `pool` vertices ranked by (degree DESC, v ASC) (degree 0 for
#           isolated vertices; ties by id);
#   d(v,S) = min hop distance to any s in S, UNREACHABLE CAPPED AT n
#           (a finite penalty larger than any real hop count, so adding a
#           vertex that reaches a new component always wins);
#   round r picks argmin_c Σ_v min(d(v,S), d(v,c)), ties to smallest
#   candidate id; farness reported is that post-pick sum.
# Scale shape: ONE batched multi-source BFS (supersteps = max ecc) leaves a
# per-partition (n_p × pool) distance block pinned in the object store; each
# greedy round is a per-partition numpy min+sum returning `pool` numbers —
# driver traffic is O(P × pool) per round, never vertex-sized.
# ---------------------------------------------------------------------------


@ray.remote
def _gc_pen(dists: np.ndarray, n: int) -> np.ndarray:
    d = dists.astype(np.int64, copy=True)
    d[d < 0] = n
    return d


@ray.remote
def _gc_totals(dp: np.ndarray, cur: np.ndarray) -> np.ndarray:
    return np.minimum(dp, cur[:, None]).sum(axis=0)


@ray.remote
def _gc_update(dp: np.ndarray, cur: np.ndarray, j: int) -> np.ndarray:
    return np.minimum(cur, dp[:, j])


def _top_degree_pool(sym: ray.data.Dataset, num_nodes: int, pool: int) -> np.ndarray:
    """Candidate ids ranked by (deg DESC, v ASC); zero-degree pad by v ASC."""
    deg = sym.groupby("src").aggregate(Count(alias_name="deg"))
    top = deg.sort(["deg", "src"], descending=[True, False]).limit(pool).to_pandas()
    cands = top["src"].to_numpy().astype(np.int64)
    if len(cands) < pool:  # fewer positive-degree vertices than pool
        have = set(cands.tolist())
        pad = [v for v in range(num_nodes) if v not in have][: pool - len(cands)]
        cands = np.concatenate([cands, np.array(pad, dtype=np.int64)])
    return cands


def group_closeness(
    sym: ray.data.Dataset,
    num_nodes: int,
    k: int,
    *,
    pool: int = 8,
    num_parts: int | None = None,
) -> list[dict]:
    """Greedy k-group minimizing capped hop farness.

    Returns [{rank, v, farness}, ...] (farness = Σ_v min(d(v,S), n) after
    the pick).
    """
    from networkit_ray.graph.bfs import multi_bfs_refs
    from networkit_ray.graph.bsp import build_pgraph

    cands = _top_degree_pool(sym, num_nodes, pool)
    g = build_pgraph(sym, num_nodes, num_parts=num_parts)
    dist_refs = multi_bfs_refs(g, cands)
    P = g.num_parts
    dp = [_gc_pen.remote(dist_refs[p], num_nodes) for p in range(P)]

    @ray.remote
    def _init_cur(vids: np.ndarray) -> np.ndarray:
        return np.full(len(vids), num_nodes, dtype=np.int64)

    cur = [_init_cur.remote(g.vid_refs[p]) for p in range(P)]
    taken = np.zeros(len(cands), dtype=bool)
    picks: list[dict] = []
    for r in range(min(k, len(cands))):
        totals = np.sum(
            ray.get([_gc_totals.remote(dp[p], cur[p]) for p in range(P)]), axis=0
        )
        totals = totals.astype(np.float64)
        totals[taken] = np.inf
        best_far = totals.min()
        # ties → smallest candidate VERTEX id (pool order is deg-ranked)
        tied = np.where(totals == best_far)[0]
        j = int(tied[np.argmin(cands[tied])])
        taken[j] = True
        picks.append({"rank": r + 1, "v": int(cands[j]), "farness": int(best_far)})
        cur = [_gc_update.remote(dp[p], cur[p], j) for p in range(P)]
    return picks


@ray.remote
def _ghc_totals(dp: np.ndarray, cur: np.ndarray, n: int) -> np.ndarray:
    m = np.minimum(dp, cur[:, None]).astype(np.float64)
    inv = np.where((m > 0) & (m < n), 1.0 / np.where(m > 0, m, 1.0), 0.0)
    return inv.sum(axis=0)


def group_harmonic_closeness(
    sym: ray.data.Dataset,
    num_nodes: int,
    k: int,
    *,
    pool: int = 8,
    num_parts: int | None = None,
) -> list[dict]:
    """Greedy k-group maximizing Σ_v 1/d(v, S).

    Reference: centrality/GroupHarmonicCloseness.cpp — greedy submodular
    selection on the harmonic objective.  Normative semantics (mirrored by
    the unrolled DuckDB twin): candidates are the top-``pool`` vertices by
    (deg DESC, v ASC); each round picks the candidate maximizing the total
    harmonic score (members and unreachable vertices contribute 0), ties →
    smallest vertex id.  Returns [{rank, v, harmonic}, ...].

    Scale shape: identical to :func:`group_closeness` — one multi-source
    BFS over the candidate pool, then k rounds of per-partition
    numpy reductions over (pool × partition-vertices) distance blocks;
    only O(pool) scalars cross the driver per round.
    """
    from networkit_ray.graph.bfs import multi_bfs_refs
    from networkit_ray.graph.bsp import build_pgraph

    cands = _top_degree_pool(sym, num_nodes, pool)
    g = build_pgraph(sym, num_nodes, num_parts=num_parts)
    dist_refs = multi_bfs_refs(g, cands)
    P = g.num_parts
    dp = [_gc_pen.remote(dist_refs[p], num_nodes) for p in range(P)]

    @ray.remote
    def _init_cur(vids: np.ndarray) -> np.ndarray:
        return np.full(len(vids), num_nodes, dtype=np.int64)

    cur = [_init_cur.remote(g.vid_refs[p]) for p in range(P)]
    taken = np.zeros(len(cands), dtype=bool)
    picks: list[dict] = []
    for r in range(min(k, len(cands))):
        totals = np.sum(
            ray.get([_ghc_totals.remote(dp[p], cur[p], num_nodes) for p in range(P)]),
            axis=0,
        )
        totals[taken] = -np.inf
        best = totals.max()
        tied = np.where(totals == best)[0]
        j = int(tied[np.argmin(cands[tied])])
        taken[j] = True
        picks.append({"rank": r + 1, "v": int(cands[j]), "harmonic": float(best)})
        cur = [_gc_update.remote(dp[p], cur[p], j) for p in range(P)]
    return picks
