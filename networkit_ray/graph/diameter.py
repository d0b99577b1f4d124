"""ANF/HyperANF effective-diameter approximation on the BSP engine.

Reference: distance/EffectiveDiameterApproximation.cpp (ANF with
Flajolet–Martin bitmask sketches, after Palmer/Gibbons/Faloutsos) and
distance/HopPlotApproximation.cpp.

Each vertex carries r independent FM bitmasks (uint64): sketch_k(v) has
bit ρ(hash_k(v)) set, where ρ = geometric position (trailing-zero count).
One superstep ORs every vertex's sketches with its out-neighbors' —
bitwise-OR is exactly the union estimator, so after t supersteps
sketch_t(v) summarizes B_t(v) = {u : dist(v→u) ≤ t}.  The per-superstep
aggregation reuses the grouped reduceat with ``np.bitwise_or`` — OR is
associative/commutative, so hub skew combines in the map tasks like any
other kernel.

N(t) = Σ_v |B_t(v)| is estimated per superstep (2^R̄ / 0.77351 with R̄ the
mean least-zero-bit position); iteration stops when no sketch bit changes.
effectiveDiameter(q) = interpolated smallest t with N(t) ≥ q · N(∞) —
the reference's convention (EffectiveDiameterApproximation.cpp:66-80).

Seeded splitmix hashing ⇒ deterministic across partitioning and cluster
size.  Memory: n × r × 8 bytes of state per graph (r=64 default).
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bfs import multi_bfs_refs
from networkit_ray.graph.bsp import PGraph, build_pgraph, chunk_edge_index

_PHI = 0.77351  # Flajolet–Martin correction constant


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


@ray.remote
def _anf_init(vids: np.ndarray, r: int, seed: int) -> np.ndarray:
    n = len(vids)
    sk = np.zeros((n, r), dtype=np.uint64)
    for k in range(r):
        h = _splitmix(vids + np.uint64(seed + k * 0x9E3779B9))
        # geometric position = trailing zeros of the hash (capped at 63)
        lsb = h & (~h + np.uint64(1))
        pos = np.where(h == 0, 63, np.log2(lsb.astype(np.float64)).astype(np.int64))
        sk[:, k] = np.uint64(1) << pos.astype(np.uint64)
    return sk


@ray.remote
def _anf_map(block: dict, sk: np.ndarray, chunk: int) -> tuple:
    idx = chunk_edge_index(block, chunk)
    vals = sk[block["src_local"][idx]]  # (E, r) uint64
    return tuple(bsp._reduceat_messages(block, vals, chunk, np.bitwise_or))


@ray.remote(num_returns=3)
def _anf_reduce(sk: np.ndarray, *partials):
    new = sk.copy()
    for idx, ors in partials:
        if len(idx):
            np.bitwise_or.at(new, idx, ors)
    changed = int((new != sk).any(axis=1).sum())
    return new, changed, _est_sum(new)


def _est_sum(sk: np.ndarray) -> float:
    """Σ_v 2^R̄(v) / φ — FM cardinality estimates for this partition."""
    inv = ~sk
    lsb = inv & (~inv + np.uint64(1))
    pos = np.log2(lsb.astype(np.float64))  # least-zero-bit position
    return float((2.0 ** pos.mean(axis=1)).sum() / _PHI)


def anf_refs(g: PGraph, *, r: int = 64, seed: int = 42, max_t: int = 10**4):
    """Run ANF to sketch fixpoint; returns (sketch refs, [N(0), N(1), ...])."""
    P = g.num_parts
    sk = [_anf_init.remote(g.vid_refs[p], r, seed) for p in range(P)]
    units = g.map_units()

    @ray.remote
    def _est0(s):
        return _est_sum(s)

    curve = [sum(ray.get([_est0.remote(s) for s in sk]))]
    t = 0
    while t < max_t:
        mo = [
            _anf_map.options(num_returns=P).remote(g.block_refs[p], sk[p], c)
            for p, c in units
        ]
        new_sk, ch, est = [], [], []
        for q in range(P):
            s2, c2, e2 = _anf_reduce.remote(sk[q], *[m[q] for m in mo])
            new_sk.append(s2)
            ch.append(c2)
            est.append(e2)
        changed = sum(ray.get(ch))
        sk = new_sk
        t += 1
        curve.append(sum(ray.get(est)))
        if changed == 0:
            break
    return sk, curve


def hop_plot(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    r: int = 64,
    seed: int = 42,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(hop, n_pairs) — the ANF hop plot (HopPlotApproximation.cpp):
    estimated number of vertex pairs within each hop distance."""
    g = build_pgraph(edges, num_nodes, num_parts=num_parts)
    _, curve = anf_refs(g, r=r, seed=seed)
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table(
            {
                "hop": pa.array(np.arange(len(curve), dtype=np.int64)),
                "n_pairs": pa.array(np.asarray(curve, np.float64)),
            }
        )
    )


def effective_diameter(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    ratio: float = 0.9,
    r: int = 64,
    seed: int = 42,
    num_parts: int | None = None,
) -> tuple[float, dict]:
    """Approximate effective diameter: interpolated t with N(t) ≥ ratio·N(∞).

    Pass the symmetrized table for the undirected convention.
    """
    g = build_pgraph(edges, num_nodes, num_parts=num_parts)
    _, curve = anf_refs(g, r=r, seed=seed)
    n_inf = curve[-1]
    target = ratio * n_inf
    eff = float(len(curve) - 1)
    for t in range(len(curve)):
        if curve[t] >= target:
            if t == 0 or curve[t] == curve[t - 1]:
                eff = float(t)
            else:
                eff = (t - 1) + (target - curve[t - 1]) / (curve[t] - curve[t - 1])
            break
    return eff, {"iterations": len(curve) - 1, "curve": curve}


def hop_histogram_sampled(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    sample: int = 16,
    seed: int = 42,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(d, n_pairs) — EXACT hop-distance histogram from a deterministic
    pivot sample (the oracle-checkable sibling of the ANF hop plot).

    Pivots are the ``sample`` smallest multiplicative-hash-ranked vertex
    ids (same selection as closeness.approx_harmonic_closeness, so one
    SQL twin convention covers both); one batched multi-source BFS gives
    every (pivot, v) min-distance, and the d ≥ 1 counts are histogrammed
    per partition then summed (histogram width = max ecc — tiny)."""
    from networkit_ray.graph.closeness import _pivots

    g = build_pgraph(edges, num_nodes, num_parts=num_parts)
    pivots = _pivots(num_nodes, min(sample, num_nodes), seed)
    dist_refs = multi_bfs_refs(g, pivots)

    @ray.remote
    def hist(dists: np.ndarray) -> np.ndarray:
        d = dists.reshape(-1)
        d = d[d >= 1]
        return np.bincount(d) if len(d) else np.zeros(1, np.int64)

    parts = ray.get([hist.remote(r) for r in dist_refs])
    width = max(len(h) for h in parts)
    total = np.zeros(width, np.int64)
    for h in parts:
        total[: len(h)] += h
    ds = np.nonzero(total)[0]
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table(
            {
                "d": pa.array(ds.astype(np.int64)),
                "n_pairs": pa.array(total[ds].astype(np.int64)),
            }
        )
    )


# ---------------------------------------------------------------------------
# Exact diameter via iFUB (iterative Fringe Upper Bound).
# Reference: distance/Diameter.cpp (estimatedRange/exact uses iFub after
# Crescenzi et al.); semantics: largest finite hop distance on a CONNECTED
# undirected graph (callers pass the supplier ring graph or another
# connected component).
# Scale shape: root BFS + double-sweep lower bound, then per-level batched
# multi-source BFS (K sources per lockstep wave) from the deepest fringe
# down, stopping when lb >= 2*level — the level sets iFUB actually
# inspects are the few bottom fringes, each a small vid list (the only
# driver-side pull, documented).
# ---------------------------------------------------------------------------


@ray.remote
def _dia_lvl_vids(vids: np.ndarray, dists: np.ndarray, lvl: int) -> np.ndarray:
    return vids[dists[:, 0] == lvl].astype(np.int64)


@ray.remote
def _dia_col_max(dists: np.ndarray) -> np.ndarray:
    return dists.max(axis=0) if len(dists) else np.array([], dtype=np.int64)


@ray.remote
def _dia_farthest(vids: np.ndarray, dists: np.ndarray) -> tuple:
    if len(dists) == 0:
        return (-1, -1)
    d = dists[:, 0]
    m = d.max()
    return (int(m), int(vids[d == m].min()))


def exact_diameter(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    batch_k: int = 16,
) -> dict:
    """iFUB exact diameter of a connected undirected graph.

    Returns {"diameter": D, "bfs_count": B} — B is the number of BFS
    sources actually inspected (the iFUB efficiency metric).
    """
    from networkit_ray.graph.bfs import multi_bfs_refs
    from networkit_ray.graph.bsp import build_pgraph
    from networkit_ray.graph.groupcent import _top_degree_pool

    root = int(_top_degree_pool(sym, num_nodes, 1)[0])
    g = build_pgraph(sym, num_nodes, num_parts=num_parts)
    P = g.num_parts

    root_refs = multi_bfs_refs(g, np.array([root], dtype=np.int64))
    far = ray.get([_dia_farthest.remote(g.vid_refs[p], root_refs[p]) for p in range(P)])
    ecc_root = max(f[0] for f in far)
    a = min(v for m, v in far if m == ecc_root)
    # double sweep: ecc(farthest-from-root) is a strong diameter lower bound
    a_refs = multi_bfs_refs(g, np.array([a], dtype=np.int64))
    lb = max(
        int(m.max()) if len(m) else -1
        for m in ray.get([_dia_col_max.remote(r) for r in a_refs])
    )
    bfs_count = 2

    lvl = ecc_root
    while lb < 2 * lvl:
        cand = np.concatenate(
            ray.get(
                [_dia_lvl_vids.remote(g.vid_refs[p], root_refs[p], lvl) for p in range(P)]
            )
        )
        cand = np.sort(cand)
        for i in range(0, len(cand), batch_k):
            batch = cand[i : i + batch_k]
            refs = multi_bfs_refs(g, batch)
            bfs_count += len(batch)
            eccs = np.max(
                [
                    m
                    for m in ray.get([_dia_col_max.remote(r) for r in refs])
                    if len(m)
                ],
                axis=0,
            )
            lb = max(lb, int(eccs.max()))
            if lb >= 2 * lvl:
                break
        lvl -= 1
    return {"diameter": int(lb), "bfs_count": int(bfs_count)}
