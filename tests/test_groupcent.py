"""Group-degree greedy selection vs a brute-force numpy oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.groupcent import group_degree


def _random_sym(seed, n, m):
    rng = np.random.default_rng(seed)
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )
    both = canon + [(b, a) for a, b in canon]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()
    return ds, canon


def _greedy_oracle(n, canon, k):
    adj = {v: {v} for v in range(n)}
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    covered: set[int] = set()
    picks = []
    for r in range(k):
        gains = [(len(adj[v] - covered), -v) for v in range(n)]
        g, negv = max(gains)
        if g == 0:
            break
        picks.append({"rank": r + 1, "v": -negv, "gain": g})
        covered |= adj[-negv]
    return picks, len(covered)


class TestGroupDegree:
    def test_matches_bruteforce(self):
        for seed, n, m in [(3, 30, 70), (9, 45, 120)]:
            sym, canon = _random_sym(seed, n, m)
            picks, total = group_degree(sym, n, 4)
            exp_picks, exp_total = _greedy_oracle(n, canon, 4)
            assert picks == exp_picks, (seed, picks, exp_picks)
            assert total == exp_total

    def test_early_stop_full_coverage(self):
        # star graph: center covers everything in one pick
        n = 8
        both = [(0, i) for i in range(1, n)] + [(i, 0) for i in range(1, n)]
        sym = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _ in both], pa.int64()),
                    "dst": pa.array([b for _, b in both], pa.int64()),
                }
            )
        ).materialize()
        picks, total = group_degree(sym, n, 3)
        assert picks == [{"rank": 1, "v": 0, "gain": n}]
        assert total == n

    def test_parallelism_invariant(self):
        sym, canon = _random_sym(3, 30, 70)
        picks1, t1 = group_degree(sym, 30, 3)
        picks2, t2 = group_degree(sym.repartition(7).materialize(), 30, 3)
        assert picks1 == picks2 and t1 == t2


def _gc_oracle(n, canon, k, pool):
    """Brute-force greedy group-closeness on the normative semantics."""
    import collections

    adj = collections.defaultdict(set)
    deg = [0] * n
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
        deg[a] += 1
        deg[b] += 1
    cands = sorted(range(n), key=lambda v: (-deg[v], v))[:pool]

    def bfs(s):
        d = [n] * n
        d[s] = 0
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if d[w] == n:
                        d[w] = d[u] + 1
                        nq.append(w)
            q = nq
        return d

    dist = {c: bfs(c) for c in cands}
    cur = [n] * n
    taken = set()
    picks = []
    for r in range(min(k, len(cands))):
        best = min(
            ((sum(min(cur[v], dist[c][v]) for v in range(n)), c)
             for c in cands if c not in taken)
        )
        far, c = best
        taken.add(c)
        cur = [min(cur[v], dist[c][v]) for v in range(n)]
        picks.append({"rank": r + 1, "v": c, "farness": far})
    return picks


class TestGroupCloseness:
    def test_matches_bruteforce(self):
        from networkit_ray.graph.groupcent import group_closeness

        for seed, n, m in [(3, 30, 70), (9, 45, 120)]:
            sym, canon = _random_sym(seed, n, m)
            picks = group_closeness(sym, n, 3, pool=6)
            assert picks == _gc_oracle(n, canon, 3, 6), (seed, picks)

    def test_disconnected_prefers_new_component(self):
        from networkit_ray.graph.groupcent import group_closeness

        # two cliques {0..3} and {4..7}: second pick must jump components
        canon = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        canon += [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        both = canon + [(b, a) for a, b in canon]
        sym = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in both], pa.int64()),
                    "dst": pa.array([e[1] for e in both], pa.int64()),
                }
            )
        ).materialize()
        picks = group_closeness(sym, 8, 2, pool=8)
        assert {picks[0]["v"] < 4, picks[1]["v"] < 4} == {True, False}
        assert picks == _gc_oracle(8, canon, 2, 8)

    def test_parallelism_invariant(self):
        from networkit_ray.graph.groupcent import group_closeness

        sym, _ = _random_sym(3, 30, 70)
        p1 = group_closeness(sym, 30, 3, pool=6)
        p2 = group_closeness(sym.repartition(7).materialize(), 30, 3, pool=6, num_parts=5)
        assert p1 == p2


def _ghc_oracle(n, canon, k, pool):
    """Brute-force greedy group-harmonic-closeness (normative semantics)."""
    import collections

    adj = collections.defaultdict(set)
    deg = [0] * n
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
        deg[a] += 1
        deg[b] += 1
    cands = sorted(range(n), key=lambda v: (-deg[v], v))[:pool]

    def bfs(s):
        d = [n] * n
        d[s] = 0
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if d[w] == n:
                        d[w] = d[u] + 1
                        nq.append(w)
            q = nq
        return d

    dist = {c: bfs(c) for c in cands}

    def inv(x):
        return 1.0 / x if 0 < x < n else 0.0

    cur = [n] * n
    taken = set()
    picks = []
    for r in range(min(k, len(cands))):
        best_h, best_c = -1.0, None
        for c in cands:
            if c in taken:
                continue
            h = sum(inv(min(cur[v], dist[c][v])) for v in range(n))
            if h > best_h or (h == best_h and c < best_c):
                best_h, best_c = h, c
        taken.add(best_c)
        cur = [min(cur[v], dist[best_c][v]) for v in range(n)]
        picks.append({"rank": r + 1, "v": best_c, "harmonic": best_h})
    return picks


class TestGroupHarmonicCloseness:
    def test_matches_bruteforce(self):
        from networkit_ray.graph.groupcent import group_harmonic_closeness

        for seed, n, m in [(3, 30, 70), (9, 45, 120)]:
            sym, canon = _random_sym(seed, n, m)
            picks = group_harmonic_closeness(sym, n, 3, pool=6)
            want = _ghc_oracle(n, canon, 3, 6)
            assert [p["v"] for p in picks] == [p["v"] for p in want], (seed, picks)
            for p, w in zip(picks, want):
                assert abs(p["harmonic"] - w["harmonic"]) < 1e-9

    def test_parallelism_invariant(self):
        from networkit_ray.graph.groupcent import group_harmonic_closeness

        sym, _ = _random_sym(3, 30, 70)
        a = group_harmonic_closeness(sym, 30, 3, pool=6)
        b = group_harmonic_closeness(sym.repartition(7).materialize(), 30, 3, pool=6)
        assert [p["v"] for p in a] == [p["v"] for p in b]
