"""PivotMDS vs a driver-side numpy replication of the reference algorithm."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from networkit_ray.graph.layout import pivot_mds


def _sym_ds(edges):
    src = [u for u, v in edges] + [v for u, v in edges]
    dst = [v for u, v in edges] + [u for u, v in edges]
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _bfs_dists(n, adj, s):
    dist = np.full(n, -1, np.int64)
    dist[s] = 0
    q = [s]
    while q:
        u = q.pop(0)
        for v in adj[u]:
            if dist[v] < 0:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _pmds_oracle(n, edges, num_pivots, dim):
    adj = [[] for _ in range(n)]
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    pivots = np.unique((np.arange(num_pivots) * n) // num_pivots)
    k = len(pivots)
    D = np.stack([_bfs_dists(n, adj, int(p)) for p in pivots], axis=1)
    D = np.where(D < 0, 0.0, D).astype(float)
    row_mean = D.sum(1) / k
    col_mean = D.sum(0) / n
    grand = D.sum() / (n * k)
    C = D - row_mean[:, None] - col_mean[None, :] + grand
    evals, evecs = np.linalg.eigh(C.T @ C)
    order = np.argsort(evals)[::-1][:dim]
    V = evecs[:, order]
    for d in range(dim):
        j = int(np.argmax(np.abs(V[:, d])))
        if V[j, d] < 0:
            V[:, d] = -V[:, d]
    return C @ V


def test_pivot_mds_path_graph(ray_session):
    # NOTE: PivotMDS.cpp centers RAW distances (not squared), so rows whose
    # pivot distances differ only by a constant shift (the collinear tail
    # beyond the last pivot) collapse to one point — the replication oracle
    # reproduces that faithfully; we additionally check the dominant axis is
    # monotone non-increasing along the path (the reference's behavior).
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    df = pivot_mds(_sym_ds(edges), n, num_pivots=4).to_pandas().sort_values("v")
    exp = _pmds_oracle(n, edges, 4, 2)
    np.testing.assert_allclose(df["x"].to_numpy(), exp[:, 0], atol=1e-8)
    x = df["x"].to_numpy()
    assert np.all(np.diff(x) <= 1e-12) and x[0] > x[-1]


def test_pivot_mds_matches_numpy_replication(ray_session):
    rng = np.random.default_rng(11)
    n = 40
    eset = set()
    for i in range(n - 1):
        eset.add((i, i + 1))
    for _ in range(50):
        u, v = rng.integers(0, n, 2)
        if u != v:
            eset.add((int(min(u, v)), int(max(u, v))))
    edges = sorted(eset)
    df = (
        pivot_mds(_sym_ds(edges), n, num_pivots=6, num_parts=4)
        .to_pandas()
        .sort_values("v")
    )
    exp = _pmds_oracle(n, edges, 6, 2)
    np.testing.assert_allclose(df["x"].to_numpy(), exp[:, 0], atol=1e-8)
    np.testing.assert_allclose(df["y"].to_numpy(), exp[:, 1], atol=1e-8)


def test_stress_layout_reduces_stress_and_orders_ring(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.layout import stress_layout

    # ring of 40 nodes
    n = 40
    canon = [(i, (i + 1) % n) for i in range(n)]
    both = canon + [(b, a) for a, b in canon]
    sym = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()
    ds, info = stress_layout(sym, n, num_pivots=8, iterations=40, seed=3)
    trace = info["stress_trace"]
    df = ds.to_pandas().sort_values("v")
    assert len(df) == n
    # stress drops substantially and the tail is (near-)monotone
    assert trace[-1] < 0.2 * trace[0]
    assert trace[-1] <= trace[len(trace) // 2] + 1e-9
    # layout distance correlates with hop distance
    xy = df[["x", "y"]].to_numpy()
    hops, eucs = [], []
    for a in range(0, n, 3):
        for b in range(a + 1, n, 3):
            h = min((b - a) % n, (a - b) % n)
            hops.append(h)
            eucs.append(np.linalg.norm(xy[a] - xy[b]))
    r = np.corrcoef(hops, eucs)[0, 1]
    assert r > 0.5, r
