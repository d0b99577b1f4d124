"""LFR benchmark graph generator — Ray-Data-native, deterministic.

Reference semantics: ``generators/LFRGenerator.cpp:1`` (pipeline: powerlaw
degree sequence → powerlaw community sizes → random capacity-feasible
assignment → per-community intra graphs via Havel–Hakimi + edge switching →
global inter-community configuration graph) and
``generators/PowerlawDegreeSequence.cpp:139-185`` (discrete inverse-CDF
powerlaw sampling; optional min-degree bisection to hit a target average
degree, ``:55-92``).  Published algorithm: Lancichinetti, Fortunato,
Radicchi, "Benchmark graphs for testing community detection algorithms",
PRE 78, 046110 (2008).

Ray-Data-first re-expression (NOT a port):
- degree sequence: ``range(n).map_batches`` with counter-based splitmix64
  draws through the broadcast inverse CDF — a pure function of
  (seed, vertex id), identical at any parallelism or resume point;
- node→community assignment: iterative HASH-DRAW with rejection — each
  round every unassigned node draws a community weighted by remaining
  capacity among its feasible communities (size > internal degree), a
  groupby keeps the first ``capacity`` drawers per community (hash order)
  and evicts the rest to the next round.  Per-round driver state is one
  O(#communities) capacity vector (the scale path co-partitions it);
- intra-community edges: ``groupby(community).map_groups`` — local
  Havel–Hakimi realization of the internal-degree sequence plus seeded
  local edge-switching rounds (the reference's
  EdgeSwitchingMarkovChainGenerator shape, one community per task);
- inter-community edges: configuration-model stub pairing — every node
  emits ``ext_deg`` stubs, stubs hash into 64 fixed logical buckets, each
  bucket pairs its stubs in hash order (odd leftovers and same-community /
  self pairs are dropped rather than rewired — realized μ is checked
  within tolerance by the tests, as is the realized degree sequence).

Duplicate edges between the intra and inter stages are removed by a final
distinct; all randomness is counter-hashed from ``seed`` so the graph is a
deterministic function of the parameters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from networkit_ray.sources.synth import _splitmix64

_EXT_BUCKETS = 64  # fixed logical buckets → partition-count-invariant pairing


# ------------------------------------------------------------------ powerlaw
def _plaw_cdf(gamma: float, lo: int, hi: int) -> np.ndarray:
    """Cumulative distribution over degrees lo..hi with pmf ∝ d^gamma
    (PowerlawDegreeSequence.cpp:139-157, ascending form)."""
    if lo > hi:
        raise ValueError("lo must be <= hi")
    d = np.arange(lo, hi + 1, dtype=np.float64)
    w = d**gamma
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    cdf[-1] = 1.0
    return cdf


def expected_average_degree(gamma: float, lo: int, hi: int) -> float:
    """E[d] for the discrete powerlaw (PowerlawDegreeSequence.cpp:159-168)."""
    d = np.arange(lo, hi + 1, dtype=np.float64)
    w = d**gamma
    return float((d * w).sum() / w.sum())


def min_degree_for_average(gamma: float, avg: float, hi: int) -> int:
    """Integer bisection of the minimum degree so the expected average
    matches ``avg`` (PowerlawDegreeSequence.cpp:55-92 semantics)."""
    lo_l, lo_r = 1, hi
    if expected_average_degree(gamma, lo_l, hi) > avg:
        raise ValueError("average degree too low for this gamma/max")
    if expected_average_degree(gamma, lo_r, hi) < avg:
        raise ValueError("average degree above the maximum degree")
    while lo_l + 1 < lo_r:
        mid = (lo_l + lo_r) // 2
        if expected_average_degree(gamma, mid, hi) > avg:
            lo_r = mid
        else:
            lo_l = mid
    a_l = expected_average_degree(gamma, lo_l, hi)
    a_r = expected_average_degree(gamma, lo_r, hi)
    return lo_l if avg - a_l < a_r - avg else lo_r


def powerlaw_sequence(
    count: int, gamma: float, lo: int, hi: int, seed: int
) -> np.ndarray:
    """Driver-side deterministic powerlaw draws (for community sizes —
    O(#communities), small)."""
    cdf = _plaw_cdf(gamma, lo, hi)
    u = _splitmix64(
        np.arange(count, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B1)
    ).astype(np.float64) / 2.0**64
    return lo + np.searchsorted(cdf, u, side="left").astype(np.int64)


def powerlaw_degrees(
    n: int, gamma: float, lo: int, hi: int, seed: int
) -> ray.data.Dataset:
    """(v, deg) dataset — distributed counter-hashed inverse-CDF draws."""
    cdf = _plaw_cdf(gamma, lo, hi)

    def gen(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.uint64)
        u = _splitmix64(idx + np.uint64(seed) * np.uint64(0x85EBCA77)).astype(
            np.float64
        ) / 2.0**64
        deg = lo + np.searchsorted(cdf, u, side="left").astype(np.int64)
        return pa.table(
            {"v": pa.array(idx.astype(np.int64)), "deg": pa.array(deg)}
        )

    return ray.data.range(n).map_batches(gen, batch_format="numpy")


# ------------------------------------------------------------- assignment
def _assign_communities(
    nodes: ray.data.Dataset,
    sizes: np.ndarray,
    seed: int,
    max_rounds: int = 40,
) -> ray.data.Dataset:
    """(v, deg, int_deg, c) — capacity-feasible hash-draw assignment.

    Communities are sorted by size descending; a node with internal degree
    k may only join a community of size ≥ k+1 (LFRGenerator.cpp assignment
    feasibility).  Each round: weighted hash draw over the remaining
    capacity of the feasible prefix, then per-community trim to capacity
    (hash order) with evictions retried next round.
    """
    order = np.argsort(-sizes, kind="stable")
    ssz = sizes[order].astype(np.int64)  # sizes, descending
    caps = ssz.copy()
    n_comm = len(ssz)
    out_parts: list[ray.data.Dataset] = []
    pending = nodes

    for t in range(max_rounds):
        cnt = pending.count()
        if cnt == 0:
            break
        cumcap = np.cumsum(caps)
        ssz_b = ssz  # closure broadcast (O(C) arrays ship once per stage)
        cumcap_b = cumcap

        def draw(tbl: pa.Table, t=t) -> pa.Table:
            v = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            ideg = tbl["int_deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            # feasible prefix: communities with size >= int_deg + 1
            f = np.searchsorted(-ssz_b, -(ideg + 1), side="right")
            fcap = np.where(f > 0, cumcap_b[np.maximum(f - 1, 0)], 0)
            h = _splitmix64(
                v.astype(np.uint64)
                + np.uint64(t) * np.uint64(0xC2B2AE35)
                + np.uint64(seed) * np.uint64(0x27D4EB2F)
            )
            # deadlock escape: a node whose feasible (large) communities
            # are all full draws over ALL remaining capacity instead —
            # its internal degree is clamped to community size − 1 by the
            # intra generator, mirroring LFRGenerator.cpp's community-size
            # adjustment when the assignment is infeasible
            total_cap = int(cumcap_b[-1]) if len(cumcap_b) else 0
            eff = np.where(fcap > 0, fcap, total_cap)
            ok = eff > 0
            r = (h % np.maximum(eff, 1).astype(np.uint64)).astype(np.int64)
            c = np.searchsorted(cumcap_b, r, side="right").astype(np.int64)
            c = np.where(ok, c, -1)
            return pa.table(
                {
                    "v": tbl["v"],
                    "deg": tbl["deg"],
                    "int_deg": tbl["int_deg"],
                    "c": pa.array(c),
                    "h": pa.array(h.astype(np.int64) & 0x7FFFFFFFFFFFFFFF),
                }
            )

        drawn = pending.map_batches(draw, batch_format="pyarrow").materialize()

        def trim(g: pd.DataFrame) -> pd.DataFrame:
            c = int(g["c"].iloc[0])
            if c < 0:
                return g.assign(keep=False)
            k = int(caps[c])
            gs = g.sort_values(["h", "v"]).reset_index(drop=True)
            keep = np.zeros(len(gs), dtype=bool)
            keep[: min(k, len(gs))] = True
            return gs.assign(keep=keep)

        from networkit_ray.common.schema import enforce_schema

        marked = enforce_schema(
            drawn.groupby("c").map_groups(trim, batch_format="pandas"),
            pa.schema(
                [
                    ("v", pa.int64()),
                    ("deg", pa.int64()),
                    ("int_deg", pa.int64()),
                    ("c", pa.int64()),
                    ("h", pa.int64()),
                    ("keep", pa.bool_()),
                ]
            ),
        ).materialize()  # consumed twice below (kept + pending)
        kept = marked.map_batches(
            lambda t: t.filter(
                pa.compute.and_(t["keep"], pa.compute.greater_equal(t["c"], 0))
            ).select(["v", "deg", "int_deg", "c"]),
            batch_format="pyarrow",
        ).materialize()
        # O(#communities) capacity update on the driver (scale path:
        # co-partitioned capacity dataset instead)
        used = kept.groupby("c").count().to_pandas()
        # a round can keep nothing (every drawer evicted); the all-empty
        # grouped Dataset loses its schema in to_pandas() (Ray 2.49)
        if len(used) and "c" in used.columns:
            for c_id, k in zip(used["c"], used["count()"]):
                caps[int(c_id)] -= int(k)
        out_parts.append(kept)
        pending = marked.map_batches(
            lambda t: t.filter(
                pa.compute.or_(
                    pa.compute.invert(t["keep"]), pa.compute.less(t["c"], 0)
                )
            ).select(["v", "deg", "int_deg"]),
            batch_format="pyarrow",
        ).materialize()
    else:
        left = pending.count()
        if left:
            raise ValueError(
                f"LFR assignment did not converge: {left} nodes unassigned "
                "(community sizes too tight for the internal degrees)"
            )

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out


# ------------------------------------------------------------ intra edges
def _intra_group(seed: int, replayable: bool = False):
    """Per-community Havel–Hakimi + seeded edge-switch rounds (local task;
    LFRGenerator.cpp:132-176 generateIntraClusterGraph shape).

    ``replayable=True`` (the SQL-oracle-backing mode): rows sort by vertex
    id first, so HH tie-breaks are a pure function of the member set (the
    default inherits the group's arrival order), and the PCG64 edge-switch
    randomization is skipped.  The planted DEGREE and MIXING invariants
    still hold, but the intra wiring is HH-deterministic and therefore
    STRUCTURALLY non-representative of reference LFR output (the
    reference's EdgeSwitchingMarkovChainGenerator decorrelates the
    wiring; HH graphs are highly assortative with inflated clustering
    within communities).  Replayable graphs are verification artifacts —
    community-recovery / structural tests stay on the DEFAULT
    edge-switched mode (tests/test_lfr.py), which is also what
    ``q_lfr_edges_default`` keeps on the driver surface."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if replayable:
            g = g.sort_values("v").reset_index(drop=True)
        c = int(g["c"].iloc[0])
        v = g["v"].to_numpy().astype(np.int64)
        ideg = g["int_deg"].to_numpy().astype(np.int64).copy()
        size = len(v)
        ideg = np.minimum(ideg, size - 1)
        if ideg.sum() % 2:
            ideg[int(np.argmax(ideg))] -= 1
        # local Havel–Hakimi (best-effort: clamp when targets run out)
        deficit = ideg.copy()
        src_l: list[int] = []
        dst_l: list[int] = []
        while True:
            u = int(np.lexsort((np.arange(size), -deficit))[0])
            d = int(deficit[u])
            if d <= 0:
                break
            order = np.lexsort((np.arange(size), -deficit))
            targets = [int(x) for x in order[1 : d + 1] if deficit[x] > 0]
            if not targets:
                deficit[u] = 0
                continue
            deficit[u] = 0
            for w in targets:
                deficit[w] -= 1
                src_l.append(u)
                dst_l.append(w)
        if not src_l:
            return pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)})
        a = np.array(src_l, np.int64)
        b = np.array(dst_l, np.int64)
        if replayable:
            ga, gb = v[a], v[b]
            return pd.DataFrame(
                {"src": np.minimum(ga, gb), "dst": np.maximum(ga, gb)}
            )
        # seeded local edge switching to randomize the HH structure
        rng = np.random.default_rng((seed * 1_000_003 + c) & 0xFFFFFFFF)
        m = len(a)
        existing = set(zip(np.minimum(a, b).tolist(), np.maximum(a, b).tolist()))
        for _ in range(10):
            perm = rng.permutation(m)
            for i in range(0, m - 1, 2):
                e1, e2 = perm[i], perm[i + 1]
                x1, y1, x2, y2 = a[e1], b[e1], a[e2], b[e2]
                nx1, ny1 = x1, y2
                nx2, ny2 = x2, y1
                if nx1 == ny1 or nx2 == ny2:
                    continue
                k1 = (min(nx1, ny1), max(nx1, ny1))
                k2 = (min(nx2, ny2), max(nx2, ny2))
                if k1 in existing or k2 in existing or k1 == k2:
                    continue
                o1 = (min(x1, y1), max(x1, y1))
                o2 = (min(x2, y2), max(x2, y2))
                existing.discard(o1)
                existing.discard(o2)
                existing.add(k1)
                existing.add(k2)
                a[e1], b[e1] = nx1, ny1
                a[e2], b[e2] = nx2, ny2
        ga, gb = v[a], v[b]  # canonicalize on GLOBAL ids, not local indices
        lo = np.minimum(ga, gb)
        hi = np.maximum(ga, gb)
        return pd.DataFrame({"src": lo, "dst": hi})

    return fn


# ------------------------------------------------------------ inter edges
def _inter_edges(assigned: ray.data.Dataset, seed: int) -> ray.data.Dataset:
    """Configuration-model pairing of external stubs in 64 fixed hash
    buckets; same-community and self pairs (and odd leftovers) drop."""

    def stubs(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        ideg = t["int_deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ext = np.maximum(deg - ideg, 0)
        rv = np.repeat(v, ext)
        rc = np.repeat(c, ext)
        j = np.arange(len(rv), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(ext)[:-1]]), ext
        )
        h = _splitmix64(
            rv.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + j.astype(np.uint64)
            + np.uint64(seed) * np.uint64(0x165667B1)
        )
        return pa.table(
            {
                "bucket": pa.array((h % _EXT_BUCKETS).astype(np.int64)),
                "h": pa.array((h >> np.uint64(8)).astype(np.int64) & 0x7FFFFFFFFFFFFFFF),
                "v": pa.array(rv),
                "c": pa.array(rc),
            }
        )

    def pair(g: pd.DataFrame) -> pd.DataFrame:
        gs = g.sort_values(["h", "v"]).reset_index(drop=True)
        k = len(gs) - (len(gs) % 2)
        va = gs["v"].to_numpy()[0:k:2]
        vb = gs["v"].to_numpy()[1:k:2]
        ca = gs["c"].to_numpy()[0:k:2]
        cb = gs["c"].to_numpy()[1:k:2]
        keep = (va != vb) & (ca != cb)
        lo = np.minimum(va[keep], vb[keep]).astype(np.int64)
        hi = np.maximum(va[keep], vb[keep]).astype(np.int64)
        return pd.DataFrame({"src": lo, "dst": hi})

    st = assigned.map_batches(stubs, batch_format="pyarrow")
    return st.groupby("bucket").map_groups(pair, batch_format="pandas")


# ----------------------------------------------------------------- public
def lfr_graph(
    n: int,
    *,
    mu: float = 0.3,
    gamma: float = -2.0,
    min_deg: int | None = 4,
    max_deg: int = 32,
    avg_deg: float | None = None,
    gamma_size: float = -1.0,
    min_comm: int = 16,
    max_comm: int = 64,
    seed: int = 42,
    replayable: bool = False,
) -> tuple[ray.data.Dataset, ray.data.Dataset, dict]:
    """(canonical edges (src<dst), communities (v, c), info).

    ``replayable=True``: canonical per-community row order and no PCG64
    edge switching (see _intra_group) — every draw is then a counter hash
    the SQL oracle replays bit-for-bit.

    Deterministic LFR: every random draw is a counter hash of ``seed``, so
    the same parameters give the same graph at any parallelism.  ``mu`` is
    the target mixing (fraction of each node's edges leaving its
    community); internal degrees use the reference's stochastic rounding
    (``LFRGenerator.cpp setMu:69-89``) with a hash coin.  Pass ``avg_deg``
    to bisect ``min_deg`` like PowerlawDegreeSequence
    ``setMinimumFromAverageDegree``.
    """
    if avg_deg is not None:
        min_deg = min_degree_for_average(gamma, avg_deg, max_deg)
    if min_deg is None:
        raise ValueError("min_deg or avg_deg required")
    if max_deg >= n:
        raise ValueError("max degree must be smaller than n")

    degrees = powerlaw_degrees(n, gamma, min_deg, max_deg, seed)

    def with_internal(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        intdeg_f = (1.0 - mu) * deg
        frac = intdeg_f - np.floor(intdeg_f)
        coin = (
            _splitmix64(
                v.astype(np.uint64) + np.uint64(seed) * np.uint64(0xB5297A4D)
            ).astype(np.float64)
            / 2.0**64
        )
        ideg = np.floor(intdeg_f).astype(np.int64) + (coin < frac).astype(np.int64)
        return pa.table(
            {"v": t["v"], "deg": t["deg"], "int_deg": pa.array(ideg)}
        )

    nodes = degrees.map_batches(with_internal, batch_format="pyarrow")

    # community sizes: draw until total ≥ n, then absorb the overshoot in
    # the smallest community (LFRGenerator.cpp:46-63)
    sizes_l: list[int] = []
    total = 0
    block = max(4, n // ((min_comm + max_comm) // 2) + 2)
    draw_off = 0
    while total < n:
        draws = powerlaw_sequence(block, gamma_size, min_comm, max_comm, seed + 7 + draw_off)
        for s in draws:
            sizes_l.append(int(s))
            total += int(s)
            if total >= n:
                break
        draw_off += 1
    sizes = np.array(sizes_l, np.int64)
    sizes[int(np.argmin(sizes))] += n - total
    if sizes.min() < 1:
        raise ValueError("community size adjustment went non-positive; raise min_comm")

    assigned = _assign_communities(nodes, sizes, seed).materialize()

    intra = assigned.groupby("c").map_groups(
        _intra_group(seed, replayable), batch_format="pandas"
    )
    inter = _inter_edges(assigned, seed)
    from networkit_ray.common.exchange import exchange_unique
    from networkit_ray.common.schema import enforce_schema

    sch = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    edges = exchange_unique(
        enforce_schema(intra, sch).union(enforce_schema(inter, sch)),
        ["src", "dst"],
        schema=sch,
    )
    communities = assigned.select_columns(["v", "c"])
    info = {
        "n": n,
        "communities": int(len(sizes)),
        "mu_target": mu,
        "min_deg": int(min_deg),
        "max_deg": int(max_deg),
    }
    return edges, communities, info


def realized_mixing(
    edges: ray.data.Dataset, communities: ray.data.Dataset
) -> float:
    """Fraction of canonical edges whose endpoints lie in different
    communities (two exchange joins; edge-table-sized, no driver pull)."""
    from networkit_ray.common.exchange import exchange_join

    lab_a = communities.map_batches(
        lambda t: pa.table({"src": t["v"], "ca": t["c"]}), batch_format="pyarrow"
    )
    lab_b = communities.map_batches(
        lambda t: pa.table({"dst": t["v"], "cb": t["c"]}), batch_format="pyarrow"
    )
    j = exchange_join(edges, lab_a, left_on=["src"])
    j = exchange_join(j, lab_b, left_on=["dst"])

    def flag(t: pa.Table) -> pa.Table:
        inter = (
            t["ca"].to_numpy(zero_copy_only=False)
            != t["cb"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"inter": pa.array(inter)})

    from ray.data.aggregate import Count, Sum

    agg = (
        j.map_batches(flag, batch_format="pyarrow")
        .aggregate(Sum("inter", alias_name="s"), Count(alias_name="m"))
    )
    return float(agg["s"]) / max(1, int(agg["m"]))
