"""GedWalk greedy group selection vs a dense numpy replica."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _gw_replica(n, edges, k, pool, levels, alpha=None):
    A = np.zeros((n, n))
    for a, b in edges:
        A[a, b] = 1.0
    if alpha is None:
        alpha = 1.0 / (1.0 + A.sum(0).max() + A.sum(1).max())
    deg_tot = (A.sum(0) + A.sum(1)).astype(int)
    cands = sorted(range(n), key=lambda v: (-deg_tot[v], v))[:pool]
    ones = np.ones(n)

    # W_l = total l-walks
    w_tot = []
    x = ones.copy()
    for _ in range(levels):
        x = A @ x
        w_tot.append(x.sum())

    def miss(S):
        mask = np.ones(n)
        mask[list(S)] = 0.0
        o = mask.copy()
        out = []
        for _ in range(levels):
            o = mask * (A @ o)
            out.append(o.sum())
        return np.array(out)

    alphas = alpha ** np.arange(1, levels + 1)
    picked = []
    for r in range(k):
        best, best_c = -1.0, None
        for c in cands:
            if c in picked:
                continue
            s = float((alphas * (np.array(w_tot) - miss(picked + [c]))).sum())
            if s > best or (s == best and c < best_c):
                best, best_c = s, c
        picked.append(best_c)
    return picked


def test_ged_walk_matches_replica(ray_session):
    from networkit_ray.graph.gedwalk import ged_walk

    rng = np.random.default_rng(107)
    n = 35
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (120, 2)) if a != b})
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).materialize()
    got = ged_walk(ds, n, 3, levels=5, pool=6)
    want = _gw_replica(n, edges, 3, 6, 5)
    assert [p["v"] for p in got] == want, (got, want)
    # the reported value is the GROUP score after each pick — monotone
    assert 0 <= got[0]["score"] <= got[1]["score"] <= got[2]["score"]


def test_ged_walk_star_picks_center(ray_session):
    from networkit_ray.graph.gedwalk import ged_walk

    n = 10
    edges = [(0, i) for i in range(1, n)] + [(i, 0) for i in range(1, n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).materialize()
    got = ged_walk(ds, n, 1, levels=4, pool=4)
    assert got[0]["v"] == 0
