"""Edge switching invariants and Suitor matching vs greedy oracle."""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.matching import suitor_matching
from networkit_ray.graph.randomize import edge_switching


def _random_canon(seed, n, m):
    rng = np.random.default_rng(seed)
    return sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )


def _ds(canon, w=None):
    cols = {
        "src": pa.array([e[0] for e in canon], pa.int64()),
        "dst": pa.array([e[1] for e in canon], pa.int64()),
    }
    if w is not None:
        cols["w"] = pa.array(w, pa.int64())
    return rd.from_arrow(pa.table(cols)).materialize()


class TestEdgeSwitching:
    def test_invariants(self):
        canon = _random_canon(0, 200, 600)
        out, info = edge_switching(_ds(canon), rounds=3, seed=7)
        df = out.to_pandas()
        # edge count and simplicity preserved
        assert len(df) == len(canon)
        assert (df.src < df.dst).all()
        assert not df.duplicated(["src", "dst"]).any()
        # degree sequence preserved exactly
        deg0, deg1 = collections.Counter(), collections.Counter()
        for a, b in canon:
            deg0[a] += 1
            deg0[b] += 1
        for a, b in zip(df.src, df.dst):
            deg1[int(a)] += 1
            deg1[int(b)] += 1
        assert deg0 == deg1
        # the chain actually moved
        assert info["accepted"] > 0
        assert len(set(zip(df.src.astype(int), df.dst.astype(int))) - set(canon)) > 0

    def test_deterministic_across_partitioning(self):
        canon = _random_canon(0, 200, 600)
        a, _ = edge_switching(_ds(canon), rounds=2, seed=11)
        b, _ = edge_switching(
            _ds(canon).repartition(5).materialize(), rounds=2, seed=11
        )
        sa = set(zip(*[c.astype(int) for _, c in a.to_pandas().items()]))
        sb = set(zip(*[c.astype(int) for _, c in b.to_pandas().items()]))
        assert sa == sb

    def test_seed_changes_result(self):
        canon = _random_canon(0, 200, 600)
        a, _ = edge_switching(_ds(canon), rounds=2, seed=1)
        b, _ = edge_switching(_ds(canon), rounds=2, seed=2)
        sa = set(zip(*[c.astype(int) for _, c in a.to_pandas().items()]))
        sb = set(zip(*[c.astype(int) for _, c in b.to_pandas().items()]))
        assert sa != sb


class TestSuitorMatching:
    def test_equals_greedy_by_weight(self):
        for seed in (0, 4):
            canon = _random_canon(seed, 150, 450)
            w = [(a + b) % 7 + 1 for a, b in canon]
            ms, _ = suitor_matching(_ds(canon, w), 150, max_weight=7)
            got = set(
                zip(
                    ms.to_pandas().src.astype(int),
                    ms.to_pandas().dst.astype(int),
                )
            )
            order = sorted(
                ((ww, a, b) for (a, b), ww in zip(canon, w)),
                key=lambda x: (-x[0], x[1], x[2]),
            )
            used, exp = set(), set()
            for ww, a, b in order:
                if a not in used and b not in used:
                    exp.add((a, b))
                    used |= {a, b}
            assert got == exp

    def test_matching_is_valid(self):
        canon = _random_canon(2, 120, 500)
        w = [(a * b) % 5 + 1 for a, b in canon]
        ms, _ = suitor_matching(_ds(canon, w), 120, max_weight=5)
        df = ms.to_pandas()
        ends = list(df.src.astype(int)) + list(df.dst.astype(int))
        assert len(ends) == len(set(ends))  # no vertex matched twice
        assert set(zip(df.src.astype(int), df.dst.astype(int))) <= set(canon)


def test_degree_preserving_shuffle_matches_replica(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.randomize import degree_preserving_shuffle

    rng = np.random.default_rng(61)
    n = 40
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (100, 2)) if a != b}
    )
    both = canon + [(b, a) for a, b in canon]
    sym = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()
    got = {
        r["v"]: r["new_id"]
        for r in degree_preserving_shuffle(sym, n, seed=42).take_all()
    }
    deg = collections.Counter()
    for a, b in canon:
        deg[a] += 1
        deg[b] += 1
    # bijection over all n ids
    assert sorted(got) == list(range(n))
    assert sorted(got.values()) == list(range(n))
    # degree-preserving: new_id has the same degree as v
    for v, nv in got.items():
        assert deg[v] == deg[nv], (v, nv)
    # replica of the hash-rank pairing
    classes = collections.defaultdict(list)
    for v in range(n):
        classes[deg[v]].append(v)
    for members in classes.values():
        arr = np.array(members, np.int64)
        key = (arr * 2654435761 + 42) % 2**31
        order = np.lexsort((arr, key))
        tgt = np.sort(arr)
        for pos, idx in enumerate(order):
            assert got[int(arr[idx])] == int(tgt[pos])


def test_path_growing_matching_valid_and_half_approx(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.matching import path_growing_matching

    rng = np.random.default_rng(113)
    n = 12
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (30, 2)) if a != b}
    )
    w = {e: float((e[0] + e[1]) % 7 + 1) for e in canon}
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in canon], pa.int64()),
                "dst": pa.array([e[1] for e in canon], pa.int64()),
                "w": pa.array([w[e] for e in canon], pa.float64()),
            }
        )
    ).materialize()
    got = [(r["src"], r["dst"], r["w"]) for r in path_growing_matching(ds, n).take_all()]
    # valid matching
    seen = set()
    for a, b, ww in got:
        assert w[(a, b)] == ww
        assert a not in seen and b not in seen
        seen |= {a, b}
    # ≥ 1/2 of the optimum (brute force on the small graph)
    best = 0.0
    for r in range(1, n // 2 + 1):
        for combo in itertools.combinations(canon, r):
            verts = [v for e in combo for v in e]
            if len(set(verts)) == len(verts):
                best = max(best, sum(w[e] for e in combo))
    assert sum(ww for _, _, ww in got) >= 0.5 * best
    # deterministic
    again = [(r["src"], r["dst"], r["w"]) for r in path_growing_matching(ds, n).take_all()]
    assert got == again
