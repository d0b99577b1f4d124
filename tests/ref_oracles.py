"""Single-process numpy reference implementations — test oracles only.

Dense float64 fixed-order re-statements of the reference kernels'
mathematical definitions (networkit/cpp/centrality/PageRank.cpp,
components/ParallelConnectedComponents.cpp, community/PLP.cpp,
centrality/LocalClusteringCoefficient.cpp), used by pytest to validate the
distributed engine on small graphs.  Never used in pipelines.
"""

from __future__ import annotations

import numpy as np


def pagerank_ref(
    edges: np.ndarray,
    n: int,
    damp: float = 0.85,
    tol: float = 1e-8,
    norm: str = "l1",
    max_iterations: int = 10**9,
    normalized: bool = False,
) -> tuple[np.ndarray, int]:
    """edges: (m,2) int array of directed (src,dst). Returns (scores, iters)."""
    src, dst = edges[:, 0], edges[:, 1]
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    scores = np.full(n, 1.0 / n)
    it = 0
    while it < max_iterations:
        contrib = scores[src] / outdeg[src]
        new = np.full(n, (1.0 - damp) / n)
        np.add.at(new, dst, damp * contrib)
        delta = new - scores
        resid = np.abs(delta).sum() if norm == "l1" else np.sqrt(delta @ delta)
        scores = new
        it += 1
        if resid <= tol:
            break
    if normalized:
        dangling = scores[outdeg == 0].sum()
        factor = ((1.0 - damp) + damp * dangling) / n
    else:
        factor = scores.sum()
    return scores / factor, it


def components_ref(sym_edges: np.ndarray, n: int) -> np.ndarray:
    """Min-id component labels (union-find)."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in sym_edges:
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return np.array([find(i) for i in range(n)])


def plp_ref(
    sym_edges: np.ndarray,
    n: int,
    w: np.ndarray | None = None,
    update_threshold: int = 0,
    max_iterations: int = 100,
) -> tuple[np.ndarray, int]:
    """Synchronous PLP with the engine's exact semantics (Jacobi schedule,
    weighted histogram, argmax with smallest-label tie-break)."""
    src, dst = sym_edges[:, 0], sym_edges[:, 1]
    if w is None:
        w = np.ones(len(src))
    labels = np.arange(n, dtype=np.int64)
    it = 0
    while it < max_iterations:
        new = labels.copy()
        # histogram per dst of neighbor labels
        lab = labels[src]
        order = np.lexsort((lab, dst))
        d, l, ww = dst[order], lab[order], w[order]
        change = np.empty(len(d), dtype=bool)
        if len(d):
            change[0] = True
            change[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
            starts = np.flatnonzero(change)
            dd, ll = d[starts], l[starts]
            sums = np.add.reduceat(ww, starts)
            o2 = np.lexsort((ll, -sums, dd))
            dd, ll = dd[o2], ll[o2]
            first = np.empty(len(dd), dtype=bool)
            first[0] = True
            first[1:] = dd[1:] != dd[:-1]
            heads = np.flatnonzero(first)
            new[dd[heads]] = ll[heads]
        n_updated = int((new != labels).sum())
        labels = new
        it += 1
        if n_updated <= update_threshold:
            break
    return labels, it


def triangles_ref(canon_edges: np.ndarray, n: int) -> np.ndarray:
    """Per-vertex triangle counts from a canonical (lo<hi) edge set.

    Each triangle {a<b<c} is found exactly once, at its (a,b) edge, as a
    common neighbor c > b.
    """
    adj = [set() for _ in range(n)]
    for u, v in canon_edges:
        adj[int(u)].add(int(v))
        adj[int(v)].add(int(u))
    nbrs = [np.array(sorted(s), dtype=np.int64) for s in adj]
    tri = np.zeros(n, dtype=np.int64)
    for u, v in canon_edges:
        lo, hi = min(int(u), int(v)), max(int(u), int(v))
        common = np.intersect1d(nbrs[lo], nbrs[hi], assume_unique=True)
        for wv in common[common > hi]:
            tri[lo] += 1
            tri[hi] += 1
            tri[wv] += 1
    return tri


def lcc_ref(canon_edges: np.ndarray, n: int) -> np.ndarray:
    """Local clustering coefficient: c(u) = 2·tri(u)/(deg(u)(deg(u)-1))."""
    tri = triangles_ref(canon_edges, n)
    deg = np.zeros(n, dtype=np.int64)
    for u, v in canon_edges:
        deg[int(u)] += 1
        deg[int(v)] += 1
    out = np.zeros(n, dtype=np.float64)
    mask = deg >= 2
    out[mask] = 2.0 * tri[mask] / (deg[mask] * (deg[mask] - 1.0))
    return out


def katz_ref(
    edges: np.ndarray,
    n: int,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iterations: int = 30,
) -> np.ndarray:
    """Fixed-iteration Katz, L2-normalized (engine/SQL twin)."""
    src, dst = edges[:, 0], edges[:, 1]
    x = np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        new = np.full(n, beta)
        np.add.at(new, dst, alpha * x[src])
        x = new
    return x / np.linalg.norm(x)


def eigenvector_ref(sym_edges: np.ndarray, n: int, max_iterations: int = 30) -> np.ndarray:
    """Power iteration with per-step L2 normalization."""
    src, dst = sym_edges[:, 0], sym_edges[:, 1]
    x = np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        new = np.zeros(n)
        np.add.at(new, dst, x[src])
        norm = np.linalg.norm(new)
        x = new / norm if norm > 0 else new
    return x


def bfs_ref(edges: np.ndarray, n: int, source: int) -> np.ndarray:
    """Hop distances along directed edges; -1 unreachable."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[int(u)].append(int(v))
    dist = np.full(n, -1, dtype=np.int64)
    dist[source] = 0
    dq = deque([source])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if dist[v] < 0:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


def pagerank_weighted_ref(
    edges: np.ndarray,
    w: np.ndarray,
    n: int,
    damp: float = 0.85,
    max_iterations: int = 30,
) -> np.ndarray:
    """Weighted PageRank, fixed iterations, divide-by-sum normalization."""
    src, dst = edges[:, 0], edges[:, 1]
    wdeg = np.zeros(n)
    np.add.at(wdeg, src, w)
    scores = np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        contrib = scores[src] * w / wdeg[src]
        new = np.full(n, (1.0 - damp) / n)
        np.add.at(new, dst, damp * contrib)
        scores = new
    return scores / scores.sum()


def core_ref(sym_edges: np.ndarray, n: int) -> np.ndarray:
    """Core numbers by sequential peeling (CoreDecomposition semantics)."""
    deg = np.zeros(n, dtype=np.int64)
    adj = [[] for _ in range(n)]
    for u, v in sym_edges:
        adj[int(u)].append(int(v))
    for u, v in sym_edges:
        deg[int(u)] += 1
    core = np.zeros(n, dtype=np.int64)
    removed = np.zeros(n, dtype=bool)
    k = 1
    remaining = n
    while remaining > 0:
        while True:
            low = [u for u in range(n) if not removed[u] and deg[u] < k]
            if not low:
                break
            for u in low:
                core[u] = k - 1
                removed[u] = True
                remaining -= 1
                for v in adj[u]:
                    if not removed[v]:
                        deg[v] -= 1
        k += 1
    return core
