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


def ring_lattice_edges(n: int, k: int) -> tuple[ray.data.Dataset, int]:
    """Regular ring lattice: node i ↔ (i+j) mod n for j = 1..k.

    Reference: generators/RegularRingLatticeGenerator.cpp (k is clamped to
    n/2 − 1, which also guarantees the n·k generated edges are distinct —
    no dedup pass needed).  Embarrassingly parallel: edge counter
    idx = i·k + (j−1) over ``ray.data.range(n*k)``.
    """
    k = min(k, n // 2 - 1)

    def gen(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.int64)
        i = idx // k
        j = idx % k + 1
        t = (i + j) % n
        return pa.table(
            {"src": pa.array(np.minimum(i, t)), "dst": pa.array(np.maximum(i, t))}
        )

    return ray.data.range(n * k).map_batches(gen, batch_format="numpy"), n


def stochastic_blockmodel_edges(
    n: int,
    num_blocks: int,
    p_in: float,
    p_out: float,
    *,
    seed: int = 42,
) -> tuple[ray.data.Dataset, int]:
    """Stochastic blockmodel over blocks b(v) = v mod B.

    Reference: generators/StochasticBlockmodel.cpp (per-pair Bernoulli with
    an affinity matrix; here the two-level in/out affinity).  Each ordered
    pair index decodes to (u, v), kept when u < v and
    ``splitmix64(pair_index + seed·FNV) < p·2⁶⁴`` for the block pair's p
    — a well-mixed coin (the cheap 2³¹ LCG coin clumps badly at small p),
    reproduced bit-exactly by the DuckDB twin via HUGEINT mod-2⁶⁴
    arithmetic.  O(n²) counters, the model's inherent cost; deterministic
    at any parallelism.
    """
    base = np.uint64(seed) * np.uint64(0x100000001B3)
    t_in = np.uint64(min(int(p_in * 2**64), 2**64 - 1))
    t_out = np.uint64(min(int(p_out * 2**64), 2**64 - 1))

    def gen(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.int64)
        u = idx // n
        v = idx % n
        keep = u < v
        idx, u, v = idx[keep], u[keep], v[keep]
        same = (u % num_blocks) == (v % num_blocks)
        thresh = np.where(same, t_in, t_out)
        hit = _splitmix64(idx.astype(np.uint64) + base) < thresh
        return pa.table({"src": pa.array(u[hit]), "dst": pa.array(v[hit])})

    return ray.data.range(n * n).map_batches(gen, batch_format="numpy"), n


def havel_hakimi_edges(degrees: "np.ndarray") -> tuple[ray.data.Dataset, int]:
    """Havel–Hakimi realization of a degree sequence.

    Reference: generators/HavelHakimiGenerator.cpp — repeatedly connect the
    largest-deficit node to the next-largest ones.  The algorithm is
    inherently sequential, so (like the METIS reader) this is a
    SINGLE-TASK conformance generator: the sequence itself must fit in one
    worker.  Raises ValueError when the sequence is not graphical.  When
    it succeeds, the realized degree table equals the input sequence
    exactly — the oracle invariant the driver query checks.
    """
    seq = np.asarray(degrees, dtype=np.int64)
    n = len(seq)
    if seq.sum() % 2:
        raise ValueError("degree sequence has odd sum — not graphical")

    @ray.remote
    def build(seq: np.ndarray) -> pa.Table:
        deficit = seq.copy()
        src_out, dst_out = [], []
        while True:
            order = np.lexsort((np.arange(len(deficit)), -deficit))
            u = order[0]
            d = deficit[u]
            if d == 0:
                break
            targets = order[1 : d + 1]
            if len(targets) < d or deficit[targets[-1]] == 0:
                raise ValueError("degree sequence is not graphical")
            deficit[u] = 0
            deficit[targets] -= 1
            src_out.extend([int(u)] * d)
            dst_out.extend(int(t) for t in targets)
        lo = np.minimum(src_out, dst_out).astype(np.int64)
        hi = np.maximum(src_out, dst_out).astype(np.int64)
        return pa.table({"src": pa.array(lo), "dst": pa.array(hi)})

    return ray.data.from_arrow_refs([build.remote(seq)]), n


def dorogovtsev_mendes_edges(n: int, *, seed: int = 42) -> tuple[ray.data.Dataset, int]:
    """Dorogovtsev–Mendes growing network (triangle seed; each new node
    attaches to both endpoints of a seeded-random existing edge).

    Reference: generators/DorogovtsevMendesGenerator.cpp.  Growth is
    inherently sequential (each step samples the CURRENT edge list), so
    this is a single-task conformance generator; m = 3 + 2(n−3) exactly.
    """
    if n < 3:
        raise ValueError("n must be ≥ 3")

    @ray.remote
    def build() -> pa.Table:
        src = [0, 0, 1]
        dst = [1, 2, 2]
        for v in range(3, n):
            pick = int(_splitmix64(np.uint64(seed) + np.uint64(v)) % np.uint64(len(src)))
            src.extend([src[pick], dst[pick]])
            dst.extend([v, v])
        lo = np.minimum(src, dst).astype(np.int64)
        hi = np.maximum(src, dst).astype(np.int64)
        return pa.table({"src": pa.array(lo), "dst": pa.array(hi)})

    return ray.data.from_arrow_refs([build.remote()]), n


def barabasi_albert_edges(
    n: int, k: int, *, seed: int = 42
) -> tuple[ray.data.Dataset, int]:
    """Barabási–Albert preferential attachment (Batagelj–Brandes form).

    Reference: generators/BarabasiAlbertGenerator.cpp (generateBatagelj):
    preferential attachment is realized WITHOUT degree bookkeeping by
    sampling a uniform position of the growing endpoint array — every
    vertex appears in it once per incident edge, so sampling positions IS
    degree-proportional sampling.  Deterministic re-expression: the
    sampled position of attachment i is ``splitmix64(i + seed·FNV) mod
    (prefix length)``; odd positions form pointer chains that resolve by
    vectorized chasing (expected O(log) gather rounds) — the structure a
    distributed pointer-jumping implementation would use, here one task
    (growth is globally ordered, like the reference).

    Init: path 0−1−…−(k−1); nodes k..n−1 attach k edges each (possibly
    parallel/self duplicates, deduplicated like the reference's addEdge
    on the simple graph).
    """
    if k < 1 or n < k:
        raise ValueError("need 1 <= k <= n")
    base = np.uint64(seed) * np.uint64(0x100000001B3)

    @ray.remote
    def build() -> pa.Table:
        # seed endpoint array: the init path's endpoints
        S = np.repeat(np.arange(k, dtype=np.int64), 2)[1:-1]  # 0,1,1,2,...,k-1
        s_len = len(S)
        m = (n - k) * k  # attachment count
        i = np.arange(m, dtype=np.uint64)
        u = (i // np.uint64(k)).astype(np.int64) + k  # attaching node
        # position array A = S ++ M, M[2i] = u_i, M[2i+1] = resolved target;
        # attachment i samples a uniform position < s_len + 2i
        r = (_splitmix64(i + base) % (np.uint64(s_len) + np.uint64(2) * i)).astype(
            np.int64
        )
        # chase pointers: position p >= s_len and odd (M[2j+1]) forwards to
        # attachment j's own sampled position; even → node (j // k + k);
        # p < s_len → seed value S[p]
        x = r.copy()
        while True:
            in_m = x >= s_len
            off = x - s_len
            odd = in_m & (off % 2 == 1)
            if not odd.any():
                break
            j = (off[odd] - 1) // 2
            x[odd] = r[j]
        dst = np.where(
            x < s_len,
            S[np.minimum(x, s_len - 1)],
            ((x - s_len) // 2 // k + k),
        ).astype(np.int64)
        src = np.concatenate([np.arange(1, k, dtype=np.int64), u])
        dst = np.concatenate([np.arange(0, k - 1, dtype=np.int64), dst])
        keep = src != dst
        lo = np.minimum(src[keep], dst[keep])
        hi = np.maximum(src[keep], dst[keep])
        uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"src": pa.array(uniq[:, 0]), "dst": pa.array(uniq[:, 1])})

    return ray.data.from_arrow_refs([build.remote()]), n


def hyperbolic_edges(
    n: int, radius: float, alpha: float = 1.0, *, seed: int = 42
) -> tuple[ray.data.Dataset, int]:
    """Cold (T = 0) hyperbolic random geometric graph.

    Reference: generators/HyperbolicGenerator.cpp (threshold variant):
    node i sits at angle θ_i ~ U[0, 2π) and radial coordinate with density
    sinh(αr)/(cosh(αR) − 1) (inverse CDF: acosh(1 + u·(cosh(αR) − 1))/α);
    an edge joins every pair at hyperbolic distance ≤ R, with
    cosh d = cosh r₁ cosh r₂ − sinh r₁ sinh r₂ cos Δθ — the construction
    whose degree distribution is a power law with exponent 2α + 1.

    Coordinates are splitmix64-counter draws, so the graph is a pure
    function of (n, R, α, seed) at any parallelism.  The pair check is
    the O(n²) grid (conformance scale); the reference's quadtree / band
    partitioning is the web-scale path and maps to a θ-range hash
    partitioning of the same math.
    """
    base = np.uint64(seed) * np.uint64(0x100000001B3)
    ids = np.arange(n, dtype=np.uint64)
    theta = (
        _splitmix64(ids * np.uint64(2) + base).astype(np.float64) / 2.0**64
    ) * 2.0 * np.pi
    u = _splitmix64(ids * np.uint64(2) + np.uint64(1) + base).astype(np.float64) / 2.0**64
    r = np.arccosh(1.0 + u * (np.cosh(alpha * radius) - 1.0)) / alpha
    cosh_r, sinh_r = np.cosh(r), np.sinh(r)
    theta_ref = ray.put(theta)
    cosh_ref = ray.put(cosh_r)
    sinh_ref = ray.put(sinh_r)
    thresh = np.cosh(radius)

    def gen(batch: dict) -> pa.Table:
        th = ray.get(theta_ref)
        ch = ray.get(cosh_ref)
        sh = ray.get(sinh_ref)
        idx = batch["id"].astype(np.int64)
        a = idx // n
        b = idx % n
        keep = a < b
        a, b = a[keep], b[keep]
        cosh_d = ch[a] * ch[b] - sh[a] * sh[b] * np.cos(th[a] - th[b])
        hit = cosh_d <= thresh
        return pa.table({"src": pa.array(a[hit]), "dst": pa.array(b[hit])})

    return ray.data.range(n * n).map_batches(gen, batch_format="numpy"), n
