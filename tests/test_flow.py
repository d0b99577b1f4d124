"""Edmonds-Karp max-flow vs a driver-side numpy oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from networkit_ray.graph.build import symmetrize
from networkit_ray.graph.flow import max_flow


def _ek_oracle(n, edges, s, t):
    """Plain BFS Edmonds-Karp on a dense residual dict; returns
    (flow value, source-side reachable set)."""
    resid = {}
    for u, v, w in edges:
        resid[(u, v)] = resid.get((u, v), 0.0) + w
        resid[(v, u)] = resid.get((v, u), 0.0) + w
    adj = {}
    for (u, v) in resid:
        adj.setdefault(u, []).append(v)
    flow = 0.0
    while True:
        parent = {s: None}
        q = [s]
        while q and t not in parent:
            u = q.pop(0)
            for v in sorted(adj.get(u, [])):
                if v not in parent and resid[(u, v)] > 0:
                    parent[v] = u
                    q.append(v)
        if t not in parent:
            return flow, {v for v in parent}
        path = []
        v = t
        while v != s:
            path.append((parent[v], v))
            v = parent[v]
        b = min(resid[e] for e in path)
        for u, v in path:
            resid[(u, v)] -= b
            resid[(v, u)] += b
        flow += b


def _edge_ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v, w in edges], pa.int64()),
                "dst": pa.array([v for u, v, w in edges], pa.int64()),
                "w": pa.array([w for u, v, w in edges], pa.float64()),
            }
        )
    )


def _sym(edges):
    both = [(u, v, w) for u, v, w in edges] + [(v, u, w) for u, v, w in edges]
    return _edge_ds(both)


def test_max_flow_textbook(ray_session):
    # two disjoint s→t paths of caps 3 and 2, plus a cross edge
    edges = [(0, 1, 3.0), (1, 4, 3.0), (0, 2, 2.0), (2, 4, 2.0), (1, 2, 1.0)]
    f, side, info = max_flow(_sym(edges), 5, 0, 4)
    exp_f, exp_side = _ek_oracle(5, edges, 0, 4)
    assert f == pytest.approx(exp_f)
    df = side.to_pandas().sort_values("v")
    got_side = set(df[df["in_source_set"] == 1]["v"])
    assert got_side == exp_side
    assert info["augmentations"] >= 2


def test_max_flow_bottleneck_and_unreachable(ray_session):
    # path graph with a 0.5 bottleneck + an isolated component
    edges = [(0, 1, 4.0), (1, 2, 0.5), (2, 3, 4.0), (5, 6, 9.0)]
    f, side, _ = max_flow(_sym(edges), 7, 0, 3)
    assert f == pytest.approx(0.5)
    # unreachable target → zero flow, source set = s's component
    f2, side2, info2 = max_flow(_sym(edges), 7, 0, 6)
    assert f2 == 0.0 and info2["augmentations"] == 0
    df2 = side2.to_pandas()
    assert set(df2[df2["in_source_set"] == 1]["v"]) == {0, 1, 2, 3}


def test_max_flow_random_matches_oracle(ray_session):
    rng = np.random.default_rng(7)
    n = 24
    m = 80
    eset = {}
    for _ in range(m):
        u, v = rng.integers(0, n, 2)
        if u != v:
            a, b = int(min(u, v)), int(max(u, v))
            eset[(a, b)] = float(rng.integers(1, 6))
    edges = [(u, v, w) for (u, v), w in eset.items()]
    f, side, _ = max_flow(_sym(edges), n, 0, n - 1, num_parts=4)
    exp_f, exp_side = _ek_oracle(n, edges, 0, n - 1)
    assert f == pytest.approx(exp_f)
    # min-cut value check: side must be a valid cut of capacity == flow
    df = side.to_pandas()
    s_side = set(df[df["in_source_set"] == 1]["v"])
    cut = sum(w for (u, v, w) in edges if (u in s_side) != (v in s_side))
    assert cut == pytest.approx(f)


def _cut_clustering_oracle(n, canon_w, alpha):
    """Sequential Flake–Tarjan replica on the numpy EK oracle."""
    import collections

    t = n
    aug = list(canon_w) + [(v, t, alpha) for v in range(n)]
    deg = collections.Counter()
    for u, v, w in canon_w:
        deg[u] += 1
        deg[v] += 1
    labels = {v: -1 for v in range(n)}
    for u in sorted(range(n), key=lambda v: (-deg[v], v)):
        if labels[u] != -1:
            continue
        _, side = _ek_oracle(n + 1, aug, u, t)
        for v in side:
            if v != t:
                labels[v] = u
    return labels


def test_cut_clustering_matches_replica(ray_session):
    import numpy as np

    from networkit_ray.graph.flow import cut_clustering

    rng = np.random.default_rng(131)
    n = 18
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (40, 2)) if a != b}
    )
    canon_w = [(u, v, float((u + v) % 3 + 1)) for u, v in canon]
    got = {
        r["v"]: r["label"]
        for r in cut_clustering(_sym(canon_w), n, 1.5).take_all()
    }
    want = _cut_clustering_oracle(n, canon_w, 1.5)
    assert got == want


def test_cut_clustering_alpha_extremes(ray_session):
    import numpy as np

    from networkit_ray.graph.flow import cut_clustering

    # two triangles joined by one light edge
    canon_w = [
        (0, 1, 2.0), (1, 2, 2.0), (0, 2, 2.0),
        (3, 4, 2.0), (4, 5, 2.0), (3, 5, 2.0),
        (2, 3, 0.5),
    ]
    n = 6
    # α between the bridge (0.5) and the triangle weights → two clusters
    got = {
        r["v"]: r["label"] for r in cut_clustering(_sym(canon_w), n, 1.0).take_all()
    }
    assert len({got[0], got[3]}) == 2
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    # tiny α → everything in one cluster
    one = {
        r["v"]: r["label"] for r in cut_clustering(_sym(canon_w), n, 0.05).take_all()
    }
    assert len(set(one.values())) == 1
