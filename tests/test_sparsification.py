"""LocalDegree and Simmelian-overlap scores vs brute-force numpy oracles."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.build import symmetrize


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in rows], pa.int64()),
                "dst": pa.array([v for u, v in rows], pa.int64()),
            }
        )
    )


def _random_canon(seed, n, m):
    rng = np.random.default_rng(seed)
    return sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )


def _ld_oracle(n, canon):
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in adj}
    out = {}
    for u in adj:
        ranked = sorted(adj[u], key=lambda x: (-deg[x], x))
        for r, v in enumerate(ranked, 1):
            s = 1.0 if r == 1 else 1.0 - np.log(r) / np.log(deg[u])
            key = (min(u, v), max(u, v))
            out[key] = max(out.get(key, -np.inf), s)
    return out


def _so_oracle(n, canon, max_rank):
    import collections

    tri = collections.Counter()
    aset = set(canon)
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    for a, b in canon:
        for c in adj[a] & adj[b]:
            tri[(a, b)] += 1
    strong = {}
    for u in adj:
        ranked = sorted(
            adj[u], key=lambda x: (-tri[(min(u, x), max(u, x))], x)
        )[:max_rank]
        strong[u] = set(ranked)
    return {
        (a, b): len(strong[a] & strong[b]) for a, b in canon
    }


class TestLocalDegree:
    def test_matches_bruteforce(self):
        from networkit_ray.graph.sparsification import local_degree_scores

        for seed, n, m in [(2, 25, 60), (11, 40, 110)]:
            canon = _random_canon(seed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            got = local_degree_scores(sym, n).to_pandas()
            exp = _ld_oracle(n, canon)
            assert len(got) == len(exp)
            for row in got.itertuples(index=False):
                assert abs(row.ld_score - exp[(row.src, row.dst)]) < 1e-9

    def test_parallelism_invariant(self):
        from networkit_ray.graph.sparsification import local_degree_scores

        canon = _random_canon(2, 25, 60)
        sym = symmetrize(_ds(canon)).materialize()
        a = local_degree_scores(sym, 25, num_parts=2).to_pandas()
        b = local_degree_scores(
            sym.repartition(5).materialize(), 25, num_parts=7
        ).to_pandas()
        a = a.sort_values(["src", "dst"]).reset_index(drop=True)
        b = b.sort_values(["src", "dst"]).reset_index(drop=True)
        assert a.equals(b)


class TestSimmelianOverlap:
    def test_matches_bruteforce(self):
        from networkit_ray.graph.sparsification import simmelian_overlap_scores

        for seed, n, m, mr in [(4, 20, 70, 5), (13, 35, 140, 10)]:
            canon = _random_canon(seed, n, m)
            got = simmelian_overlap_scores(_ds(canon).materialize(), n, max_rank=mr).to_pandas()
            exp = _so_oracle(n, canon, mr)
            assert len(got) == len(exp)
            for row in got.itertuples(index=False):
                assert row.overlap == exp[(row.src, row.dst)], (seed, row)

    def test_triangle_free_graph_zero_overlap(self):
        from networkit_ray.graph.sparsification import simmelian_overlap_scores

        # path graph has no triangles but consecutive edges share strong
        # neighbors: overlap counts shared top-rank members, tri ties -> id
        canon = [(i, i + 1) for i in range(9)]
        got = simmelian_overlap_scores(_ds(canon).materialize(), 10, max_rank=2).to_pandas()
        exp = _so_oracle(10, canon, 2)
        for row in got.itertuples(index=False):
            assert row.overlap == exp[(row.src, row.dst)]


def _ls_oracle(n, canon):
    import collections

    aset = set(canon)
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in adj}

    def jac(a, b):
        a, b = min(a, b), max(a, b)
        tri = len(adj[a] & adj[b])
        union = deg[a] + deg[b] - 2 - tri
        return tri / union if union > 0 else 1.0

    out = {}
    for u in adj:
        ranked = sorted(adj[u], key=lambda x: (-jac(u, x), x))
        for r, v in enumerate(ranked, 1):
            s = 1.0 if r == 1 else 1.0 - np.log(r) / np.log(deg[u])
            key = (min(u, v), max(u, v))
            out[key] = max(out.get(key, -np.inf), s)
    return out


class TestLocalSimilarity:
    def test_matches_bruteforce(self):
        from networkit_ray.graph.sparsification import local_similarity_scores

        for seed, n, m in [(5, 22, 70), (17, 38, 130)]:
            canon = _random_canon(seed, n, m)
            got = local_similarity_scores(_ds(canon).materialize(), n).to_pandas()
            exp = _ls_oracle(n, canon)
            assert len(got) == len(exp)
            for row in got.itertuples(index=False):
                assert abs(row.ls_score - exp[(row.src, row.dst)]) < 1e-9, (
                    seed,
                    row,
                )

    def test_parallelism_invariant(self):
        from networkit_ray.graph.sparsification import local_similarity_scores

        canon = _random_canon(5, 22, 70)
        ds = _ds(canon).materialize()
        a = local_similarity_scores(ds, 22, num_parts=2).to_pandas()
        b = local_similarity_scores(
            ds.repartition(5).materialize(), 22, num_parts=7
        ).to_pandas()
        a = a.sort_values(["src", "dst"]).reset_index(drop=True)
        b = b.sort_values(["src", "dst"]).reset_index(drop=True)
        assert np.allclose(a.ls_score, b.ls_score)
        assert (a.src == b.src).all() and (a.dst == b.dst).all()


def _w(u, v):
    return float((u + v) % 7 + 1)


def test_multiscale_scores_match_oracle(ray_session):
    from networkit_ray.graph.sparsification import multiscale_scores

    canon = _random_canon(7, 40, 160)
    bi = [(u, v) for u, v in canon] + [(v, u) for u, v in canon]
    sym_w = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in bi], pa.int64()),
                "dst": pa.array([v for u, v in bi], pa.int64()),
                "w": pa.array([_w(u, v) for u, v in bi], pa.float64()),
            }
        )
    )
    got = {
        (r["src"], r["dst"]): r["ms_score"]
        for r in multiscale_scores(sym_w).take_all()
    }

    import collections

    adj = collections.defaultdict(list)
    for u, v in bi:
        adj[u].append(v)
    want = {}
    for u in adj:
        ssum = sum(_w(u, v) for v in adj[u])
        k = len(adj[u])
        for v in adj[u]:
            p = 1.0 - (1.0 - _w(u, v) / ssum) ** (k - 1)
            key = (min(u, v), max(u, v))
            want[key] = max(want.get(key, -1.0), p)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_chance_corrected_triangle_scores_match_oracle(ray_session):
    from networkit_ray.graph.sparsification import chance_corrected_triangle_scores

    n = 40
    canon = _random_canon(11, n, 160)
    got = {
        (r["src"], r["dst"]): r["cct_score"]
        for r in chance_corrected_triangle_scores(_ds(canon), n).take_all()
    }

    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for a, b in canon:
        tri = len(adj[a] & adj[b])
        if tri > 0:
            want[(a, b)] = tri * (n - 2) / ((len(adj[a]) - 1) * (len(adj[b]) - 1))
        elif len(adj[a]) == 1 or len(adj[b]) == 1:
            want[(a, b)] = 1.0
        else:
            want[(a, b)] = 0.0
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_random_edge_scores_deterministic_uniform(ray_session):
    from networkit_ray.graph.sparsification import random_edge_scores

    canon = _random_canon(13, 60, 400)
    a = {(r["src"], r["dst"]): r["re_score"]
         for r in random_edge_scores(_ds(canon), seed=42).take_all()}
    b = {(r["src"], r["dst"]): r["re_score"]
         for r in random_edge_scores(_ds(canon).repartition(7), seed=42).take_all()}
    assert a == b                       # partition-invariant
    vals = np.array(list(a.values()))
    assert (vals >= 0).all() and (vals < 1).all()
    assert 0.3 < vals.mean() < 0.7      # roughly uniform
    c = {(r["src"], r["dst"]): r["re_score"]
         for r in random_edge_scores(_ds(canon), seed=1).take_all()}
    assert a != c                       # seed-sensitive


def _ff_replica(canon, n, pf, num_fires, seed, max_rounds=64):
    """Sequential replica of forest_fire_scores' round-synchronous rules."""
    import collections

    from networkit_ray.graph.sparsification import _ff_key, _u64_unit
    from networkit_ray.sources.synth import _splitmix64

    base = np.uint64(seed) * np.uint64(0x100000001B3)
    adj = collections.defaultdict(list)
    for a, b in canon:
        adj[a].append(b)
        adj[b].append(a)
    fires = np.arange(num_fires, dtype=np.uint64)
    starts = (_splitmix64(fires + base) % np.uint64(n)).astype(np.int64)
    frontier = {(int(f), int(s)) for f, s in zip(fires, starts)}
    visited = set(frontier)
    burns = collections.Counter()
    for r in range(max_rounds):
        if not frontier:
            break
        new_front = set()
        any_burn = False
        for f, v in sorted(frontier):
            nbrs = [w for w in adj[v] if (f, w) not in visited]
            if not nbrs:
                continue
            qs = _u64_unit(
                _ff_key(
                    np.full(16, f), np.full(16, v), r, np.arange(16), 0, base
                )
            )
            k = 16
            for t in range(16):
                if qs[t] > pf:
                    k = t
                    break
            ranked = sorted(
                nbrs,
                key=lambda w: int(
                    _ff_key(np.array([f]), np.array([v]), r, np.array([w]), 1, base)[0]
                ),
            )
            for w in ranked[:k]:
                burns[(min(v, w), max(v, w))] += 1
                new_front.add((f, w))
                any_burn = True
        if not any_burn:
            break
        visited |= new_front
        frontier = new_front
    if not burns:
        return {}
    mx = max(burns.values())
    return {e: c / mx for e, c in burns.items()}


def test_forest_fire_scores_match_replica(ray_session):
    from networkit_ray.graph.sparsification import forest_fire_scores

    n = 60
    canon = _random_canon(31, n, 240)
    got = {
        (r["src"], r["dst"]): r["ff_score"]
        for r in forest_fire_scores(
            _ds(canon), n, pf=0.7, num_fires=6, seed=9
        ).take_all()
    }
    want = _ff_replica(canon, n, 0.7, 6, 9)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_forest_fire_scores_partition_invariant(ray_session):
    from networkit_ray.graph.sparsification import forest_fire_scores

    n = 50
    canon = _random_canon(37, n, 180)
    a = {
        (r["src"], r["dst"]): r["ff_score"]
        for r in forest_fire_scores(_ds(canon), n, num_fires=5, seed=3).take_all()
    }
    b = {
        (r["src"], r["dst"]): r["ff_score"]
        for r in forest_fire_scores(
            _ds(canon).repartition(7), n, num_fires=5, seed=3
        ).take_all()
    }
    assert a == b


def test_normalize_and_linearize_edge_scores(ray_session):
    import ray.data as rd

    from networkit_ray.graph.sparsification import (
        linearize_edge_scores,
        normalize_edge_scores,
    )

    canon = _random_canon(91, 30, 120)
    rng = np.random.default_rng(5)
    score = rng.integers(0, 20, len(canon)).astype(np.float64)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in canon], pa.int64()),
                "dst": pa.array([v for u, v in canon], pa.int64()),
                "s": pa.array(score),
            }
        )
    ).materialize()

    got = {
        (r["src"], r["dst"]): r["norm_score"]
        for r in normalize_edge_scores(ds, "s", lower=1.0, upper=3.0).take_all()
    }
    mn, mx = score.min(), score.max()
    for (u, v), s in zip(canon, score):
        want = 1.0 + (s - mn) * 2.0 / (mx - mn)
        assert abs(got[(u, v)] - want) < 1e-12

    inv = {
        (r["src"], r["dst"]): r["norm_score"]
        for r in normalize_edge_scores(ds, "s", invert=True).take_all()
    }
    for (u, v), s in zip(canon, score):
        want = 1.0 - (s - mn) / (mx - mn)
        assert abs(inv[(u, v)] - want) < 1e-12

    lin = {
        (r["src"], r["dst"]): r["lin_score"]
        for r in linearize_edge_scores(ds, "s").take_all()
    }
    order = sorted(zip(score, [u for u, v in canon], [v for u, v in canon]))
    m = len(canon)
    for pos, (s, u, v) in enumerate(order):
        assert abs(lin[(u, v)] - pos / (m - 1)) < 1e-12


def test_prefix_jaccard_scores_match_replica(ray_session):
    import collections

    from networkit_ray.graph.sparsification import prefix_jaccard_scores

    n = 35
    canon = _random_canon(103, n, 140)
    got = {
        (r["src"], r["dst"]): r["pj_score"]
        for r in prefix_jaccard_scores(_ds(canon), n).take_all()
    }

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    tri = {}
    for a, b in canon:
        tri[(a, b)] = tri[(b, a)] = len(adj[a] & adj[b])

    def ranks(u):
        nbrs = sorted(adj[u], key=lambda w: (-tri[(u, w)], w))
        out = {}
        r = 0
        for i, w in enumerate(nbrs):
            if i > 0 and tri[(u, nbrs[i - 1])] != tri[(u, w)]:
                r = i
            out[w] = r
        return out

    assert len(got) == len(canon)
    for u, v in canon:
        ru = {w: r for w, r in ranks(u).items() if w != v}
        rv = {w: r for w, r in ranks(v).items() if w != u}
        best = 0.0
        levels = set(ru.values()) | set(rv.values())
        for lev in sorted(levels):
            A = {w for w, r in ru.items() if r <= lev}
            B = {w for w, r in rv.items() if r <= lev}
            if A | B:
                best = max(best, len(A & B) / len(A | B))
        assert abs(got[(u, v)] - best) < 1e-12, (u, v, got[(u, v)], best)
