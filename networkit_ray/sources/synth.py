"""Deterministic distributed graph generators (R-MAT, planted partition).

R-MAT follows the reference's quadrant-recursion drawEdge
(networkit/cpp/generators/RmatGenerator.cpp:54-66) with the fork's benchmark
parameter grid (Paper/IJPP/vectgraph.tex:719-730), but replaces the serial
PRNG with counter-based hashing (splitmix64 over the edge index), so the
edge set is a pure function of (seed, edge_index) — identical at any
parallelism, partition count, or resume point.  Generation is
``ray.data.range(m).map_batches`` — an embarrassingly parallel source.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based uniform uint64 hash (public splitmix64 constants)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def rmat_edges(
    scale: int,
    edge_factor: int = 16,
    *,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
) -> tuple[ray.data.Dataset, int]:
    """R-MAT edge table: n = 2^scale nodes, m = n·edge_factor directed edges.

    Each of the ``scale`` recursion levels consumes one hashed uniform draw
    per edge: quadrant thresholds (a, a+b, a+b+c) pick the bit of src/dst at
    that level (RmatGenerator.cpp:54-66 semantics, vectorized).
    """
    n = 1 << scale
    m = n * edge_factor
    t_ab, t_abc = a + b, a + b + c
    base = np.uint64(seed) * np.uint64(0x100000001B3)

    def gen(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.uint64)
        src = np.zeros(len(idx), dtype=np.uint64)
        dst = np.zeros(len(idx), dtype=np.uint64)
        for level in range(scale):
            ctr = base + idx * np.uint64(scale) + np.uint64(level)
            u = _splitmix64(ctr).astype(np.float64) / 2.0**64
            sbit = ((u >= t_ab)).astype(np.uint64)  # lower half: a|b, upper: c|d
            dbit = ((u >= t_abc) | ((u >= a) & (u < t_ab))).astype(np.uint64)
            src = (src << np.uint64(1)) | sbit
            dst = (dst << np.uint64(1)) | dbit
        return pa.table(
            {
                "src": pa.array(src.astype(np.int64)),
                "dst": pa.array(dst.astype(np.int64)),
            }
        )

    return ray.data.range(m).map_batches(gen, batch_format="numpy"), n


def planted_partition(
    n: int, k: int, *, p_in: float = 1.0, p_out: float = 0.0, seed: int = 7
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Planted-partition graph (ClusteredRandomGraphGenerator analog,
    generators/ClusteredRandomGraphGenerator.cpp) with hash-coin edges.

    Returns (canonical (lo,hi) edge Dataset, ground-truth labels).  Test-
    scale generator (materializes the pair grid driver-side).
    """
    labels = np.arange(n) % k
    iu, ju = np.triu_indices(n, 1)
    ctr = np.uint64(seed) + iu.astype(np.uint64) * np.uint64(n) + ju.astype(np.uint64)
    u = _splitmix64(ctr).astype(np.float64) / 2.0**64
    same = labels[iu] == labels[ju]
    keep = np.where(same, u < p_in, u < p_out)
    t = pa.table(
        {
            "src": pa.array(iu[keep].astype(np.int64)),
            "dst": pa.array(ju[keep].astype(np.int64)),
        }
    )
    return ray.data.from_arrow(t), labels


def erdos_renyi_edges(
    n: int,
    *,
    m: int | None = None,
    p: float | None = None,
    directed: bool = False,
    seed: int = 42,
) -> tuple[ray.data.Dataset, int]:
    """G(n,m) Erdős–Rényi edge table via counter hashing.

    Reference: generators/ErdosRenyiGenerator.cpp (G(n,p) with geometric
    skipping).  The scale-friendly counter form fixes the EDGE COUNT
    (m = round(p·n(n−1)/2) when ``p`` is given — the G(n,m) twin model,
    indistinguishable from G(n,p) at large n): counter i hashes to an
    ordered pair with self-loops excluded; undirected output is
    canonical (lo, hi).  Multi-draws of the same pair are deduplicated,
    so the realized edge count is ≤ m (Binomial-collision shortfall
    ~m²/n², negligible when sparse).  Deterministic at any parallelism.
    """
    if m is None:
        if p is None:
            raise ValueError("need m or p")
        pairs = n * (n - 1) * (1 if directed else 0.5)
        m = int(round(p * pairs))
    base = np.uint64(seed) * np.uint64(0x100000001B3)

    def gen(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.uint64)
        u = _splitmix64(base + idx * np.uint64(2)) % np.uint64(n)
        v = _splitmix64(base + idx * np.uint64(2) + np.uint64(1)) % np.uint64(n - 1)
        v = v + (v >= u)  # skip the diagonal: no self loops
        src = u.astype(np.int64)
        dst = v.astype(np.int64)
        if not directed:
            lo = np.minimum(src, dst)
            hi = np.maximum(src, dst)
            src, dst = lo, hi
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    from networkit_ray.graph.build import dedup_edges

    edges = ray.data.range(m).map_batches(gen, batch_format="numpy")
    return dedup_edges(edges), n


def chung_lu_edges(
    n: int,
    weights: np.ndarray,
    *,
    seed: int = 42,
) -> tuple[ray.data.Dataset, int]:
    """Chung–Lu random graph with expected degree sequence ``weights``.

    Reference: generators/ChungLuGenerator.cpp — P(u~v) ∝ w_u·w_v.  The
    scale form draws m = round(Σw / 2) edges with both endpoints sampled
    ∝ w via inverse-CDF lookup on the weight prefix sum (broadcast ONCE
    with ray.put — n·8 bytes; for n beyond driver memory, shard the CDF
    by key range).  Canonical (lo, hi) undirected output, deduplicated.
    Deterministic at any parallelism.
    """
    w = np.asarray(weights, dtype=np.float64)
    if len(w) != n or (w < 0).any():
        raise ValueError("weights must be n non-negative values")
    m = int(round(w.sum() / 2))
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    cdf_ref = ray.put(cdf)
    base = np.uint64(seed) * np.uint64(0x100000001B3)

    def gen(batch: dict) -> pa.Table:
        c = ray.get(cdf_ref)
        idx = batch["id"].astype(np.uint64)
        uu = _splitmix64(base + idx * np.uint64(2)).astype(np.float64) / 2.0**64
        vv = (
            _splitmix64(base + idx * np.uint64(2) + np.uint64(1)).astype(np.float64)
            / 2.0**64
        )
        src = np.searchsorted(c, uu, side="right").astype(np.int64)
        dst = np.searchsorted(c, vv, side="right").astype(np.int64)
        keep = src != dst
        lo = np.minimum(src[keep], dst[keep])
        hi = np.maximum(src[keep], dst[keep])
        return pa.table({"src": pa.array(lo), "dst": pa.array(hi)})

    from networkit_ray.graph.build import dedup_edges

    edges = ray.data.range(m).map_batches(gen, batch_format="numpy")
    return dedup_edges(edges), n


def watts_strogatz_edges(
    n: int, k: int, p: float, *, seed: int = 42
) -> tuple[ray.data.Dataset, int]:
    """Watts–Strogatz small-world graph: ring lattice + hash rewiring.

    Reference: generators/WattsStrogatzGenerator.cpp (RegularRingLattice +
    per-edge rewiring).  Each lattice edge (v, v+j) for j in 1..k/2 is
    rewired (its far endpoint replaced by a uniform non-self vertex) when
    its counter hash is below p — deterministic at any parallelism;
    collisions after rewiring are deduplicated like every generator here.
    ``k`` must be even (k/2 neighbors per side).
    """
    if k % 2:
        raise ValueError("k must be even")
    half = k // 2
    base = np.uint64(seed) * np.uint64(0x100000001B3)

    def gen(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.uint64)  # edge counter: v * half + (j-1)
        v = (idx // np.uint64(half)).astype(np.int64)
        j = (idx % np.uint64(half)).astype(np.int64) + 1
        tgt = (v + j) % n
        u1 = _splitmix64(base + idx * np.uint64(2)).astype(np.float64) / 2.0**64
        rnd = _splitmix64(base + idx * np.uint64(2) + np.uint64(1)) % np.uint64(n - 1)
        rnd = rnd.astype(np.int64)
        rnd = rnd + (rnd >= v)  # uniform over vertices != v
        dst = np.where(u1 < p, rnd, tgt)
        keep = dst != v
        lo = np.minimum(v[keep], dst[keep])
        hi = np.maximum(v[keep], dst[keep])
        return pa.table({"src": pa.array(lo), "dst": pa.array(hi)})

    from networkit_ray.graph.build import dedup_edges

    edges = ray.data.range(n * half).map_batches(gen, batch_format="numpy")
    return dedup_edges(edges), n


def generate_clustering(
    num_nodes: int,
    kind: str,
    *,
    k: int = 1,
    seed: int = 42,
) -> ray.data.Dataset:
    """(v, label) synthetic partition over the dense vertex universe.

    Reference: community/ClusteringGenerator.cpp — ``singleton`` (label=v),
    ``one`` (label=0), ``continuous`` (k contiguous balanced blocks, the
    first n%k blocks one larger, :48-75), ``noncontinuous`` (label = v%k,
    :77-88), ``random`` (hashed uniform block in [0,k), :30-46 with the
    counter-hash replacing the PRNG so the result is parallelism-invariant).
    """
    q, r = divmod(num_nodes, k) if k else (0, 0)
    base = np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)

    def gen(batch: dict) -> pa.Table:
        v = batch["id"].astype(np.int64)
        if kind == "singleton":
            lab = v
        elif kind == "one":
            lab = np.zeros(len(v), np.int64)
        elif kind == "noncontinuous":
            lab = v % k
        elif kind == "continuous":
            cutoff = r * (q + 1)
            lab = np.where(v < cutoff, v // max(1, q + 1), r + (v - cutoff) // max(1, q))
        elif kind == "random":
            lab = (_splitmix64(v.astype(np.uint64) + base) % np.uint64(k)).astype(np.int64)
        else:
            raise ValueError(f"unknown clustering kind: {kind}")
        return pa.table({"v": pa.array(v), "label": pa.array(lab.astype(np.int64))})

    return ray.data.range(num_nodes).map_batches(gen, batch_format="numpy")
