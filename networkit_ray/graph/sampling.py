"""Seeded deterministic sampling ops + wedge-sampling approximate CC.

Reference surfaces:
- GraphTools::randomNode/randomNodes/randomEdge (GraphTools.hpp:53-95) and
  networkit/sampling.py — here as SEEDED HASH-COIN ops so results are
  reproducible across runs, partitioning and cluster sizes (a mutable RNG
  is inherently sequential; a keyed hash is the distributed equivalent);
- GlobalClusteringCoefficient::approx (global/GlobalClusteringCoefficient.cpp:40-66):
  sample wedges ∝ deg·(deg−1)/2, close-check each — re-expressed with a
  GLOBAL prefix-sum inverse-CDF (so the sampled wedge set is independent
  of partitioning) and a semi-join closure check.

The hash-coin uses plain int64 modular arithmetic (h = (src·2654435761 +
dst·40503 + seed) mod 2³¹) so a DuckDB oracle can evaluate the identical
expression — no 64-bit wraparound that SQL cannot reproduce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_A = 2654435761
_B = 40503
_M = 2**31


def _coin(src: np.ndarray, dst: np.ndarray, seed: int) -> np.ndarray:
    return (src.astype(np.int64) * _A + dst.astype(np.int64) * _B + seed) % _M


def sample_edges(
    edges: ray.data.Dataset, fraction: float, *, seed: int = 42
) -> ray.data.Dataset:
    """Bernoulli edge sample: keep iff hash-coin < fraction (exact-twin SQL:
    ``(src*2654435761 + dst*40503 + seed) % 2147483648 < fraction * 2147483648``)."""
    thresh = int(fraction * _M)

    def f(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_coin(src, dst, seed) < thresh))

    return edges.map_batches(f, batch_format="pyarrow")


def sample_nodes(num_nodes: int, k: int, *, seed: int = 42) -> np.ndarray:
    """k distinct seeded node ids (randomNodes) — small driver-side array,
    broadcast into tasks via closure capture when used as a filter."""
    rng = np.random.default_rng(seed)
    return np.sort(rng.choice(num_nodes, size=min(k, num_nodes), replace=False))


def random_edge(edges: ray.data.Dataset, *, seed: int = 42) -> ray.data.Dataset:
    """One deterministic 'random' edge: the argmin of the hash-coin — a
    per-batch partial argmin then a global limit (no full sort)."""

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "h": pa.array([], pa.int64())}
            )
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        h = _coin(src, dst, seed)
        i = int(np.lexsort((dst, src, h))[0])  # (h, src, dst) lexicographic min
        return pa.table(
            {
                "src": pa.array([int(src[i])], pa.int64()),
                "dst": pa.array([int(dst[i])], pa.int64()),
                "h": pa.array([int(h[i])], pa.int64()),
            }
        )

    partials = edges.map_batches(f, batch_format="pyarrow")
    # (src, dst) tiebreak keeps the result deterministic under hash ties
    return partials.sort(["h", "src", "dst"]).limit(1).drop_columns(["h"])


def _prefix_offsets(sorted_ds: ray.data.Dataset, col: str) -> tuple[list, np.ndarray, float]:
    """Per-block refs + cumulative start offsets of ``col`` sums (driver
    holds one float per block)."""
    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _bsum(t: pa.Table) -> float:
        return float(np.sum(t[col].to_numpy(zero_copy_only=False)))

    sums = np.array(ray.get([_bsum.remote(r) for r in refs]), dtype=np.float64)
    offsets = np.concatenate([[0.0], np.cumsum(sums)[:-1]])
    return refs, offsets, float(sums.sum())


def approx_global_clustering(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    n_samples: int = 10_000,
    seed: int = 42,
    sampler: str = "pcg",
) -> tuple[float, dict]:
    """Wedge-sampling estimate of the global clustering coefficient.

    1. per-vertex wedge weight w(v) = deg(v)·(deg(v)−1)/2 over the
       v-sorted degree table; global prefix sums assign each seeded
       uniform position in [0, W) to a vertex (inverse CDF) — the sampled
       multiset is partition-invariant because positions are global
       (wedge weights are integers, so block-local cumsums + float
       offsets equal the global cumsum EXACTLY at any blocking);
    2. per sampled wedge, two distinct neighbor RANKS are drawn seeded;
       the ranked neighbors are resolved by a semi-join of the adjacency
       onto the (small) sampled-vertex set + per-group sort;
    3. closure check: candidate (lo, hi) pairs semi-joined against the
       canonical edge set; estimate = closed / samples.

    ``sampler="pcg"`` draws positions/ranks from PCG64 (the reference's
    Mersenne-style seeded draw); ``sampler="hash"`` derives them from
    splitmix64 counters instead — statistically equivalent, and exactly
    replayable by the DuckDB oracle (positions pair with rank draws by
    sorted order in both modes).
    """
    from networkit_ray.common.exchange import exchange_join
    from networkit_ray.graph.build import degree_table

    deg = degree_table(sym_edges, key="src").sort("v")

    def wedges(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"v": t["v"], "w": pa.array(d * (d - 1) / 2.0)})

    wt = deg.map_batches(wedges, batch_format="pyarrow")
    refs, offsets, total = _prefix_offsets(wt, "w")
    if total == 0:
        return 0.0, {"samples": 0, "closed": 0}
    if sampler == "hash":
        from networkit_ray.sources.synth import _splitmix64

        base = np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
        ids = np.arange(n_samples, dtype=np.uint64)
        pos = np.sort(
            _splitmix64(ids * np.uint64(3) + base).astype(np.float64)
            / 2.0**64
            * total
        )
        nbr_rngs = (
            np.stack(
                [
                    _splitmix64(ids * np.uint64(3) + np.uint64(1) + base),
                    _splitmix64(ids * np.uint64(3) + np.uint64(2) + base),
                ],
                axis=1,
            )
            >> np.uint64(2)
        ).astype(np.int64)
    else:
        rng = np.random.default_rng(seed)
        pos = np.sort(rng.uniform(0, total, size=n_samples))
        nbr_rngs = rng.integers(0, 2**62, size=(n_samples, 2))

    @ray.remote
    def pick(t: pa.Table, off: float, lo_i: int, hi_i: int) -> pa.Table:
        """Resolve sample positions [lo_i, hi_i) that land in this block."""
        w = t["w"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(w)
        p = pos[lo_i:hi_i] - off
        idx = np.searchsorted(cum, p, side="right")
        idx = np.minimum(idx, len(v) - 1)
        d = np.sqrt(2 * w[idx] + 0.25) + 0.5  # recover deg from wedge count
        d = np.round(d).astype(np.int64)
        r = nbr_rngs[lo_i:hi_i]
        j1 = (r[:, 0] % d).astype(np.int64)
        j2 = (r[:, 1] % (d - 1)).astype(np.int64)
        j2 = np.where(j2 >= j1, j2 + 1, j2)  # distinct ranks
        return pa.table(
            {
                "sv": pa.array(v[idx].astype(np.int64)),
                "j1": pa.array(j1),
                "j2": pa.array(j2),
                "sample_id": pa.array(np.arange(lo_i, hi_i, dtype=np.int64)),
            }
        )

    block_ends = np.append(offsets[1:], total)
    tasks = []
    for i, r in enumerate(refs):
        lo_i = int(np.searchsorted(pos, offsets[i], side="left"))
        hi_i = int(np.searchsorted(pos, block_ends[i], side="left"))
        if hi_i > lo_i:
            tasks.append(pick.remote(r, float(offsets[i]), lo_i, hi_i))
    if not tasks:
        return 0.0, {"samples": n_samples, "closed": 0}
    samples = ray.data.from_arrow_refs(tasks).materialize()

    # resolve ranked neighbors: adjacency semi-joined to sampled vertices,
    # then per-vertex sort by dst assigns ranks
    adj = exchange_join(
        sym_edges.select_columns(["src", "dst"]),
        samples.select_columns(["sv"]),
        left_on=["src"],
        right_on=["sv"],
        join_type="left semi",
    )

    import pandas as pd

    def rank_groups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("dst").reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["src", "dst", "rank"]]

    ranked = adj.groupby("src").map_groups(rank_groups, batch_format="pandas")
    from networkit_ray.common.schema import enforce_schema

    # materialize: ranked is consumed by BOTH joins below; enforce_schema
    # is lazy, so without a pin the ranking groupby would re-execute
    ranked = enforce_schema(
        ranked,
        pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("rank", pa.int64())]),
    ).materialize()
    j1 = exchange_join(samples, ranked, left_on=["sv", "j1"], right_on=["src", "rank"])
    j1 = j1.map_batches(
        lambda t: pa.table(
            {"sv": t["sv"], "j2": t["j2"], "a": t["dst"], "sample_id": t["sample_id"]}
        ),
        batch_format="pyarrow",
    )
    j2 = exchange_join(j1, ranked, left_on=["sv", "j2"], right_on=["src", "rank"])
    pairs = j2.map_batches(
        lambda t: pa.table(
            {
                "src": pa.compute.min_element_wise(t["a"], t["dst"]),
                "dst": pa.compute.max_element_wise(t["a"], t["dst"]),
            }
        ),
        batch_format="pyarrow",
    )
    canon = sym_edges.map_batches(
        lambda t: t.filter(pa.compute.less(t["src"], t["dst"])).select(["src", "dst"]),
        batch_format="pyarrow",
    )
    closed = exchange_join(
        pairs, canon, left_on=["src", "dst"], join_type="left semi"
    ).count()
    return closed / n_samples, {"samples": n_samples, "closed": closed}
