"""SCAN structural clustering vs a brute-force numpy oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in rows], pa.int64()),
                "dst": pa.array([v for u, v in rows], pa.int64()),
            }
        )
    )


def _scan_oracle(n, canon, eps, mu):
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    tri = {}
    for a, b in canon:
        tri[(a, b)] = len(adj[a] & adj[b])
    sigma = {
        e: (t + 2.0) / np.sqrt((len(adj[e[0]]) + 1.0) * (len(adj[e[1]]) + 1.0))
        for e, t in tri.items()
    }
    eedges = [e for e in canon if sigma[e] >= eps]
    enbrs = collections.defaultdict(set)
    for a, b in eedges:
        enbrs[a].add(b)
        enbrs[b].add(a)
    cores = {v for v in range(n) if len(enbrs[v]) + 1 >= mu}
    # CC over core-core eps edges
    label = {v: v for v in cores}
    changed = True
    while changed:
        changed = False
        for a, b in eedges:
            if a in cores and b in cores:
                m = min(label[a], label[b])
                if label[a] != m or label[b] != m:
                    label[a] = label[b] = m
                    changed = True
    out = {}
    for v in range(n):
        if v in cores:
            out[v] = label[v]
        else:
            cands = [label[u] for u in enbrs[v] if u in cores]
            out[v] = min(cands) if cands else -1
    return out


class TestScan:
    def test_two_cliques_bridge(self):
        from networkit_ray.graph.scan import scan_clustering

        canon = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        canon += [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
        canon += [(4, 5)]  # weak bridge
        # vertex 10 isolated
        out, _ = scan_clustering(_ds(canon).materialize(), 11, eps=0.7, mu=3)
        got = dict(out.to_pandas().itertuples(index=False))
        exp = _scan_oracle(11, canon, 0.7, 3)
        assert got == exp
        # two clusters, isolated vertex is an outlier
        assert got[0] == 0 and got[9] == 5 and got[10] == -1

    def test_matches_bruteforce_random(self):
        from networkit_ray.graph.scan import scan_clustering

        rng = np.random.default_rng(6)
        n, m = 40, 140
        canon = sorted(
            {
                (int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, n, (m, 2))
                if a != b
            }
        )
        for eps, mu in [(0.4, 3), (0.55, 2)]:
            out, _ = scan_clustering(_ds(canon).materialize(), n, eps=eps, mu=mu)
            got = dict(out.to_pandas().itertuples(index=False))
            assert got == _scan_oracle(n, canon, eps, mu), (eps, mu)

    def test_parallelism_invariant(self):
        from networkit_ray.graph.scan import scan_clustering

        rng = np.random.default_rng(8)
        canon = sorted(
            {
                (int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, 30, (80, 2))
                if a != b
            }
        )
        ds = _ds(canon).materialize()
        a, _ = scan_clustering(ds, 30, eps=0.45, mu=3, num_parts=2)
        b, _ = scan_clustering(
            ds.repartition(7).materialize(), 30, eps=0.45, mu=3, num_parts=5
        )
        assert a.to_pandas().sort_values("v").reset_index(drop=True).equals(
            b.to_pandas().sort_values("v").reset_index(drop=True)
        )
