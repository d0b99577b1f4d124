"""GlobalCurveball degree-preserving randomization (parallel global trades).

Reference: randomization/GlobalCurveball.cpp + CurveballImpl.cpp — a
*global trade* pairs every vertex with a partner and, for each pair
(u, v), trades the neighbors u and v do NOT share: common neighbors and
the u–v edge stay, the disjoint neighbor pool is redistributed with |A|
going back to u and |B| to v.  Repeating R global trades mixes toward
the uniform distribution over simple graphs with the same degree
sequence (the Carstens et al. global-trade Markov chain, the same
scheme NetworKit's EM/parallel implementation uses).

Engine shape: one (pair) groupby shuffle per global trade.  Pairing and
the pool shuffle are counter-hash deterministic (seeded bijection on
[0, n) via the cycle-walked mixer), so results are independent of block
layout and parallelism.  Each undirected edge is *hosted* by its
σ-smaller endpoint for the round and emitted exactly once, preserving
the degree sequence and simple-graph property exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from networkit_ray.common.schema import enforce_schema
from networkit_ray.graph.bsp import _dom_bits, _mix_fwd

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (np.asarray(x).astype(np.uint64) + _SM_GAMMA) * np.uint64(1)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def seeded_rank(v: np.ndarray, num_nodes: int, seed: int) -> np.ndarray:
    """Seeded bijection [0, n) → [0, n): rank of v under permutation σ_seed.

    Each cycle-walk step x ↦ mix(x ⊕ c) is a bijection of [0, 2^k), so
    walking until the image lands in [0, n) yields a bijection on [0, n)
    (standard cycle-walking); c is seed-derived, giving an independent
    permutation per (seed, round).
    """
    if num_nodes <= 1:
        return np.zeros(len(np.atleast_1d(v)), dtype=np.uint64)
    k = _dom_bits(num_nodes)
    mask = np.uint64((1 << k) - 1)
    c = _splitmix64(np.array([seed], dtype=np.uint64))[0] & mask
    u = np.asarray(v).astype(np.uint64) & mask
    u = _mix_fwd(u ^ c, k)
    bad = u >= num_nodes
    while bad.any():
        u[bad] = _mix_fwd(u[bad] ^ c, k)
        bad = u >= num_nodes
    return u


def _trade(round_seed: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy()
        nbr = df["nbr"].to_numpy()
        parity = df["parity"].to_numpy()
        hosted = df["hosted"].to_numpy()
        um = parity == 0
        wm = parity == 1
        if not um.any() or not wm.any():
            # unpaired vertex (odd-n boundary): hosted edges pass through
            s, d = v[hosted], nbr[hosted]
            return pd.DataFrame(
                {"src": np.minimum(s, d), "dst": np.maximum(s, d)}
            )
        u = int(v[um][0])
        w = int(v[wm][0])
        nu_all = nbr[um]
        nv_all = nbr[wm]
        hu = nbr[um & hosted]
        hv = nbr[wm & hosted]
        a_mask = ~np.isin(hu, nv_all) & (hu != w)
        b_mask = ~np.isin(hv, nu_all) & (hv != u)
        A, B = hu[a_mask], hv[b_mask]
        pool = np.concatenate([A, B])
        # deterministic pool shuffle keyed by (seed, pair, member)
        pair = int(df["pair"].iloc[0])
        h = _splitmix64(
            pool.astype(np.uint64)
            ^ _splitmix64(np.array([round_seed], np.uint64) * np.uint64(31)
                          + np.uint64(pair))
        )
        order = np.lexsort((pool, h))
        pool = pool[order]
        to_u, to_v = pool[: len(A)], pool[len(A) :]
        src = np.concatenate(
            [
                np.full(len(to_u), u, np.int64),
                np.full(len(to_v), w, np.int64),
                np.full(int((~a_mask).sum()), u, np.int64),
                np.full(int((~b_mask).sum()), w, np.int64),
            ]
        )
        dst = np.concatenate([to_u, to_v, hu[~a_mask], hv[~b_mask]]).astype(
            np.int64
        )
        return pd.DataFrame(
            {"src": np.minimum(src, dst), "dst": np.maximum(src, dst)}
        )

    return fn


def _expand(num_nodes: int, round_seed: int):
    def fn(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([s, d])
        nbr = np.concatenate([d, s])
        rv = seeded_rank(v, num_nodes, round_seed)
        rn = seeded_rank(nbr, num_nodes, round_seed)
        return pa.table(
            {
                "pair": pa.array((rv >> np.uint64(1)).astype(np.int64)),
                "parity": pa.array((rv & np.uint64(1)).astype(np.int64)),
                "v": pa.array(v),
                "nbr": pa.array(nbr),
                "hosted": pa.array(rv < rn),
            }
        )

    return fn


def global_curveball(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    rounds: int = 20,
    seed: int = 1,
) -> ray.data.Dataset:
    """R global trades over a canonical (src < dst) simple edge table.

    Returns a canonical edge table with the SAME degree sequence (exact)
    and no self-loops/multi-edges.  One groupby shuffle per round.
    """
    edges = canon
    for r in range(rounds):
        round_seed = (seed * 1_000_003 + r) & 0xFFFFFFFF
        bi = edges.map_batches(
            _expand(num_nodes, round_seed), batch_format="pyarrow"
        )
        out = bi.groupby("pair").map_groups(
            _trade(round_seed), batch_format="pandas"
        )
        # per-round materialize: the next round's groupby re-consumes
        # `edges`, and enforce_schema is lazy — without a pin the lineage
        # (and re-execution cost) would compound across rounds
        edges = enforce_schema(out, _EDGE_SCHEMA).materialize()
    return edges
