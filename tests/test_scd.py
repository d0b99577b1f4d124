"""GCE seed expansion vs sequential numpy replica; SetConductance vs direct."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.build import symmetrize
from networkit_ray.graph.scd import gce_communities, set_conductance


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, b in rows], pa.int64()),
                "dst": pa.array([b for a, b in rows], pa.int64()),
            }
        )
    )


def _random_canon(seed, n, m):
    rng = np.random.default_rng(seed)
    return sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )


def _gce_oracle(canon, seed):
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in adj}
    if seed not in adj:
        return {seed}
    com = {seed}
    int_w = 0.0
    cut = float(deg[seed])
    cur_q = 0.0 if cut > 0 else float("inf")
    int_deg = {v: 1 for v in adj[seed]}
    while int_deg:
        best_v, best_dq = None, 0.0
        for v in sorted(int_deg):
            idg = int_deg[v]
            edg = deg[v] - idg
            denom = cut - idg + edg
            q = (int_w + idg) / denom if denom > 0 else float("inf")
            if q - cur_q > best_dq:
                best_v, best_dq = v, q - cur_q
        if best_v is None:
            break
        v = best_v
        com.add(v)
        int_w += int_deg.pop(v)
        cut = sum(deg[x] for x in com) - 2.0 * int_w
        cur_q = int_w / cut if cut > 0 else float("inf")
        for nbr in adj[v]:
            if nbr not in com:
                int_deg[nbr] = int_deg.get(nbr, 0) + 1
        if cut <= 0:
            break
    return com


def _planted(seed, blocks, bsize, p_in_deg, bridges):
    """Dense blocks joined by sparse bridge edges."""
    rng = np.random.default_rng(seed)
    edges = set()
    for b in range(blocks):
        base = b * bsize
        for i in range(bsize):
            for j in range(i + 1, bsize):
                if rng.random() < p_in_deg:
                    edges.add((base + i, base + j))
    for _ in range(bridges):
        b1, b2 = rng.choice(blocks, 2, replace=False)
        edges.add(
            (
                int(min(b1 * bsize + rng.integers(bsize), b2 * bsize + rng.integers(bsize))),
                int(max(b1 * bsize + rng.integers(bsize), b2 * bsize + rng.integers(bsize))),
            )
        )
    return sorted(edges)


class TestGCE:
    def test_matches_sequential_replica(self):
        for gseed, n, m in [(2, 24, 70), (9, 36, 120)]:
            canon = _random_canon(gseed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            seeds = [0, 5, 11]
            got = gce_communities(sym, n, seeds, radius=n).to_pandas()
            for s in seeds:
                exp = _gce_oracle(canon, s)
                mine = set(got[got.seed == s]["v"])
                assert mine == exp, (gseed, s, mine, exp)

    def test_planted_block_recovered(self):
        canon = _planted(3, blocks=3, bsize=8, p_in_deg=0.9, bridges=3)
        sym = symmetrize(_ds(canon)).materialize()
        got = gce_communities(sym, 24, [4], radius=24).to_pandas()
        com = set(got["v"])
        block = set(range(0, 8))
        # GCE from a block member should stay inside its dense block
        assert com <= block and len(com) >= 6, com

    def test_isolated_seed(self):
        canon = [(1, 2), (2, 3)]
        sym = symmetrize(_ds(canon)).materialize()
        got = gce_communities(sym, 10, [7], radius=4).to_pandas()
        assert set(got["v"]) == {7}


class TestSetConductance:
    def test_matches_direct(self):
        for gseed, n, m in [(4, 20, 60), (12, 30, 110)]:
            canon = _random_canon(gseed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            comm = list(range(n // 3))
            cds = rd.from_arrow(pa.table({"v": pa.array(comm, pa.int64())}))
            got = set_conductance(sym, cds)
            cset = set(comm)
            cut = sum(1 for a, b in canon if (a in cset) != (b in cset))
            vol_s = sum((a in cset) + (b in cset) for a, b in canon)
            vol_rest = 2 * len(canon) - vol_s
            denom = min(vol_s, vol_rest)
            exp = cut / denom if denom > 0 else 1.0
            assert abs(got - exp) < 1e-12, (gseed, got, exp)

    def test_whole_graph_is_one(self):
        canon = [(0, 1), (1, 2)]
        sym = symmetrize(_ds(canon)).materialize()
        cds = rd.from_arrow(pa.table({"v": pa.array([0, 1, 2], pa.int64())}))
        assert set_conductance(sym, cds) == 1.0


def _lfm_oracle(canon, seed, alpha=1.0):
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in adj}
    if seed not in adj:
        return {seed}

    def fitness(iw, ct):
        tot = 2.0 * iw + ct
        return (2.0 * iw) / tot**alpha if tot > 0 else 0.0

    com = {seed}

    def stats():
        iw = sum(1 for x in com for y in adj[x] if y in com and x < y)
        ct = sum(deg[x] for x in com) - 2 * iw
        return float(iw), float(ct)

    iw, ct = stats()
    if iw + ct == 0:
        return {seed}
    cur = fitness(iw, ct)
    while True:
        shell = sorted({y for x in com for y in adj[x] if y not in com})
        best, bdq = None, 0.0
        for v in shell:
            idg = sum(1 for y in adj[v] if y in com)
            dq = fitness(iw + idg, ct - idg + (deg[v] - idg)) - cur
            if dq > bdq:
                best, bdq = v, dq
        if best is None:
            break
        com.add(best)
        iw, ct = stats()
        cur = fitness(iw, ct)
        while True:
            worst, wdq = None, 0.0
            for x in sorted(com):
                if x == seed:
                    continue
                idg = sum(1 for y in adj[x] if y in com)
                dq = cur - fitness(iw - idg, ct + idg - (deg[x] - idg))
                if dq < wdq:
                    worst, wdq = x, dq
            if worst is None:
                break
            com.discard(worst)
            iw, ct = stats()
            cur = fitness(iw, ct)
    return com


class TestLFMLocal:
    def test_matches_sequential_replica(self):
        from networkit_ray.graph.scd import lfm_communities

        for gseed, n, m in [(5, 24, 70), (14, 36, 130)]:
            canon = _random_canon(gseed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            seeds = [0, 6, 13]
            got = lfm_communities(sym, n, seeds, radius=n).to_pandas()
            for s in seeds:
                exp = _lfm_oracle(canon, s)
                mine = set(got[got.seed == s]["v"])
                assert mine == exp, (gseed, s, mine, exp)

    def test_planted_block(self):
        from networkit_ray.graph.scd import lfm_communities

        canon = _planted(3, blocks=3, bsize=8, p_in_deg=0.9, bridges=3)
        sym = symmetrize(_ds(canon)).materialize()
        got = lfm_communities(sym, 24, [4], radius=24).to_pandas()
        com = set(got["v"])
        assert com <= set(range(8)) and len(com) >= 6, com


def _clique_oracle(canon, seed):
    import itertools
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    nbrs = sorted(adj.get(seed, ()))
    if not nbrs:
        return {seed}
    best = []
    # brute force all subsets (neighborhoods small in tests)
    for size in range(len(nbrs), 0, -1):
        found = None
        for comb in itertools.combinations(nbrs, size):
            if all(b in adj[a] for a, b in itertools.combinations(comb, 2)):
                cand = sorted(comb)
                if found is None or cand < found:
                    found = cand
        if found is not None:
            best = found
            break
    return set([seed] + best)


class TestCliqueDetect:
    def test_matches_bruteforce(self):
        from networkit_ray.graph.scd import clique_detect

        for gseed, n, m in [(6, 18, 60), (15, 25, 90)]:
            canon = _random_canon(gseed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            seeds = [0, 4, 9]
            got = clique_detect(sym, n, seeds).to_pandas()
            for s in seeds:
                exp = _clique_oracle(canon, s)
                mine = set(got[got.seed == s]["v"])
                assert mine == exp, (gseed, s, mine, exp)

    def test_triangle_seed(self):
        from networkit_ray.graph.scd import clique_detect

        canon = [(0, 1), (0, 2), (1, 2), (0, 3)]
        sym = symmetrize(_ds(canon)).materialize()
        got = clique_detect(sym, 4, [0]).to_pandas()
        assert set(got["v"]) == {0, 1, 2}


class TestGroundTruthComparison:
    def test_matches_bruteforce(self):
        from networkit_ray.graph.scd import scd_ground_truth_comparison

        rng = np.random.default_rng(17)
        n = 40
        found_rows = [(int(s), int(v)) for s in range(3) for v in rng.choice(n, 12, replace=False)]
        truth_rows = [(int(v), int(v) % 4) for v in range(n)]
        fds = rd.from_arrow(
            pa.table(
                {
                    "seed": pa.array([a for a, b in found_rows], pa.int64()),
                    "v": pa.array([b for a, b in found_rows], pa.int64()),
                }
            )
        )
        tds = rd.from_arrow(
            pa.table(
                {
                    "v": pa.array([a for a, b in truth_rows], pa.int64()),
                    "label": pa.array([b for a, b in truth_rows], pa.int64()),
                }
            )
        )
        got = scd_ground_truth_comparison(fds, tds).to_pandas().set_index("seed")
        import collections

        fsets = collections.defaultdict(set)
        for s, v in found_rows:
            fsets[s].add(v)
        tsets = collections.defaultdict(set)
        for v, l in truth_rows:
            tsets[l].add(v)
        for s, F in fsets.items():
            bj = bf = bp = br = 0.0
            for T in tsets.values():
                o = len(F & T)
                if o == 0:
                    continue
                j = o / len(F | T)
                p = o / len(F)
                r = o / len(T)
                f1 = 2 * p * r / (p + r)
                bj, bf, bp, br = max(bj, j), max(bf, f1), max(bp, p), max(br, r)
            row = got.loc[s]
            assert abs(row.jaccard - bj) < 1e-12
            assert abs(row.f1 - bf) < 1e-12
            assert abs(row.precision - bp) < 1e-12
            assert abs(row.recall - br) < 1e-12


def _tce_oracle(canon, seed):
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in adj}
    if seed not in adj:
        return {seed}
    result = {seed}
    score = {}
    cut_edges = {}
    active = set()

    def add_member(x):
        for v in adj[x]:
            if v in result:
                continue
            tri = len(adj[x] & adj[v])
            denom = min(deg[v], deg[x]) * deg[v]
            if denom > 0:
                score[v] = score.get(v, 0.0) + (1.0 + tri) / denom
            cut_edges[v] = cut_edges.get(v, 0.0) + 1.0
            active.add(v)

    volume = float(deg[seed])
    add_member(seed)
    num_cut = float(len(adj[seed]))
    while active:
        vmax = min(active, key=lambda v: (-score.get(v, 0.0), v))
        active.discard(vmax)
        ce = cut_edges.get(vmax, 0.0)
        cut_new = num_cut + deg[vmax] - 2.0 * ce
        vol_new = volume + deg[vmax]
        if volume > 0 and cut_new / vol_new < num_cut / volume:
            result.add(vmax)
            score.pop(vmax, None)
            cut_edges.pop(vmax, None)
            add_member(vmax)
            num_cut, volume = cut_new, vol_new
    return result


class TestTCE:
    def test_matches_sequential_replica(self):
        from networkit_ray.graph.scd import tce_communities

        for gseed, n, m in [(7, 24, 80), (16, 36, 140)]:
            canon = _random_canon(gseed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            seeds = [0, 6, 13]
            got = tce_communities(sym, n, seeds, radius=n).to_pandas()
            for s in seeds:
                exp = _tce_oracle(canon, s)
                mine = set(got[got.seed == s]["v"])
                assert mine == exp, (gseed, s, mine, exp)

    def test_planted_block(self):
        from networkit_ray.graph.scd import tce_communities

        canon = _planted(3, blocks=3, bsize=8, p_in_deg=0.9, bridges=3)
        sym = symmetrize(_ds(canon)).materialize()
        got = tce_communities(sym, 24, [4], radius=24).to_pandas()
        com = set(got["v"])
        assert com <= set(range(8)) and len(com) >= 6, com


class TestCombinedSCD:
    def test_clique_then_gce(self):
        from networkit_ray.graph.scd import combined_scd

        canon = _planted(3, blocks=3, bsize=8, p_in_deg=0.9, bridges=3)
        sym = symmetrize(_ds(canon)).materialize()
        got = combined_scd(sym, 24, [4], radius=24).to_pandas()
        com = set(got["v"])
        # the clique anchor keeps the expansion inside the dense block
        assert com <= set(range(8)) and len(com) >= 6, com

    def test_contains_initial_clique(self):
        from networkit_ray.graph.scd import clique_detect, combined_scd

        canon = _random_canon(8, 25, 90)
        sym = symmetrize(_ds(canon)).materialize()
        cl = clique_detect(sym, 25, [0]).to_pandas()
        comb = combined_scd(sym, 25, [0], radius=25).to_pandas()
        assert set(cl["v"]) <= set(comb["v"])


class TestTwoPhaseL:
    def test_planted_block(self):
        from networkit_ray.graph.scd import two_phase_l_communities

        canon = _planted(3, blocks=3, bsize=8, p_in_deg=0.9, bridges=3)
        sym = symmetrize(_ds(canon)).materialize()
        got = two_phase_l_communities(sym, 24, [4], radius=24).to_pandas()
        com = set(got["v"])
        assert com <= set(range(8)) and len(com) >= 5, com

    def test_parallelism_invariant(self):
        from networkit_ray.graph.scd import two_phase_l_communities

        canon = _random_canon(10, 24, 80)
        sym = symmetrize(_ds(canon)).materialize()
        a = two_phase_l_communities(sym, 24, [0, 5], radius=24, num_parts=2).to_pandas()
        b = two_phase_l_communities(
            sym.repartition(5).materialize(), 24, [0, 5], radius=24, num_parts=7
        ).to_pandas()
        sa = a.sort_values(["seed", "v"]).reset_index(drop=True)
        sb = b.sort_values(["seed", "v"]).reset_index(drop=True)
        assert sa.equals(sb)


def _localt_oracle(canon, seed, max_size=300):
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    if seed not in adj:
        return {seed}

    def tri_split(v, com):
        nb = sorted(adj[v])
        bi = se = bo = 0
        for i, x in enumerate(nb):
            for y in nb[i + 1 :]:
                if y in adj[x]:
                    k = (x in com) + (y in com)
                    if k == 2:
                        bi += 1
                    elif k == 1:
                        se += 1
                    else:
                        bo += 1
        return bi, se, bo

    def totals(com):
        it = et = 0
        for x in com:
            bi, se, bo = tri_split(x, com - {x})
            it += bi
            et += bo
        return it // 3, et

    com = {seed}
    while len(com) < max_size:
        it, et = totals(com)
        best = max(0, it * (it - et))
        bv, be = None, None
        for v in sorted({y for x in com for y in adj[x] if y not in com}):
            bi, se, bo = tri_split(v, com)
            ni, ne = it + bi, et + bo - se
            ns = max(0, ni * (ni - ne))
            if ns > best or (ns == best and (be is None or ne < be)):
                bv, best, be = v, ns, ne
        if bv is None:
            break
        com.add(bv)
    return com


class TestLocalT:
    def test_matches_sequential_replica(self):
        from networkit_ray.graph.scd import localt_communities

        for gseed, n, m in [(9, 20, 70), (18, 28, 110)]:
            canon = _random_canon(gseed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            seeds = [0, 6]
            got = localt_communities(
                sym, n, seeds, radius=n, max_size=40
            ).to_pandas()
            for s in seeds:
                exp = _localt_oracle(canon, s, max_size=40)
                mine = set(got[got.seed == s]["v"])
                assert mine == exp, (gseed, s, mine, exp)

    def test_triangle_rich_block(self):
        from networkit_ray.graph.scd import localt_communities

        canon = _planted(3, blocks=3, bsize=8, p_in_deg=0.95, bridges=2)
        sym = symmetrize(_ds(canon)).materialize()
        got = localt_communities(sym, 24, [4], radius=24, max_size=12).to_pandas()
        com = set(got["v"])
        assert len(com & set(range(8))) >= 6, com


def _lte_oracle(canon, seed, alpha=1.0):
    import collections
    import math

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in adj}
    if seed not in adj:
        return {seed}

    def sim(a, b):
        tri = len(adj[a] & adj[b])
        return (2.0 + tri) / (math.sqrt(1 + deg[a]) * math.sqrt(1 + deg[b]))

    com = {seed}
    active = set(adj[seed])
    while active:
        best = None
        for v in sorted(active):
            si = sum(sim(v, x) for x in adj[v] if x in com)
            if best is None or si > best[1]:
                best = (v, si)
        v, si = best
        se = sum(sim(v, x) for x in adj[v] if x not in com)
        active.discard(v)
        if si <= 0:
            continue
        X = sum(sim(x, y) for x in com for y in adj[x] if y in com)
        E = sum(sim(x, y) for x in com for y in adj[x] if y not in com)
        ratio = E / X if X > 0 else float("inf")
        if ratio - (alpha * se - si) / (2 * si) > 0:
            com.add(v)
            active |= adj[v] - com
    return com


class TestLTE:
    def test_matches_sequential_replica(self):
        from networkit_ray.graph.scd import lte_communities

        for gseed, n, m in [(11, 22, 75), (20, 30, 120)]:
            canon = _random_canon(gseed, n, m)
            sym = symmetrize(_ds(canon)).materialize()
            seeds = [0, 7]
            got = lte_communities(sym, n, seeds, radius=n).to_pandas()
            for s in seeds:
                exp = _lte_oracle(canon, s)
                mine = set(got[got.seed == s]["v"])
                assert mine == exp, (gseed, s, mine, exp)

    def test_planted_block(self):
        from networkit_ray.graph.scd import lte_communities

        canon = _planted(3, blocks=3, bsize=8, p_in_deg=0.9, bridges=3)
        sym = symmetrize(_ds(canon)).materialize()
        got = lte_communities(sym, 24, [4], radius=24).to_pandas()
        com = set(got["v"])
        assert com <= set(range(8)) and len(com) >= 6, com


def test_lfm_cover_complete_and_deterministic(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.scd import lfm_communities, lfm_cover
    from networkit_ray.sources.synth import _splitmix64

    rng = np.random.default_rng(97)
    n = 40
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (120, 2)) if a != b}
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
    cover = lfm_cover(sym, n, seeds_per_round=4, seed=7).materialize()
    rows = [(r["c"], r["v"]) for r in cover.take_all()]
    covered = {v for _, v in rows}
    assert covered == set(range(n))          # complete cover
    # community c is exactly the LFMLocal expansion of seed c
    cids = sorted({c for c, _ in rows})
    memb = {
        (r["seed"], r["v"])
        for r in lfm_communities(sym, n, cids).take_all()
    }
    assert set(rows) == memb
    # deterministic
    again = sorted(
        (r["c"], r["v"]) for r in lfm_cover(sym, n, seeds_per_round=4, seed=7).take_all()
    )
    assert sorted(rows) == again
