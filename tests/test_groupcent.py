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
