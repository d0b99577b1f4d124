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
