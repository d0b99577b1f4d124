"""Deterministic random walks: edge validity, determinism, dead-ends."""

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.build import symmetrize
from networkit_ray.graph.walks import random_walks


def ds_of(e):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )


class TestRandomWalks:
    def test_steps_follow_edges(self):
        rng = np.random.default_rng(2)
        n = 30
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (80, 2)) if a != b})
        sym = symmetrize(ds_of(e)).materialize()
        adj = {v: set() for v in range(n)}
        for a, b in e:
            adj[a].add(b)
            adj[b].add(a)
        t = random_walks(sym, n, length=5, n_walkers=8).to_pandas()
        assert len(t) == 8 * 6
        t = t.sort_values(["walker", "step"])
        for w in range(8):
            tw = t[t["walker"] == w]["v"].tolist()
            for a, b in zip(tw, tw[1:]):
                assert b in adj[a] or (a == b and not adj[a])

    def test_deterministic_across_partitioning(self):
        e = [(i, (i + 1) % 12) for i in range(12)] + [(0, 5), (3, 9)]
        sym = symmetrize(ds_of(e))
        a = (
            random_walks(sym.repartition(1).materialize(), 12, length=6, n_walkers=5)
            .to_pandas()
            .sort_values(["walker", "step"])
            .reset_index(drop=True)
        )
        b = (
            random_walks(sym.repartition(7).materialize(), 12, length=6, n_walkers=5)
            .to_pandas()
            .sort_values(["walker", "step"])
            .reset_index(drop=True)
        )
        assert a.equals(b)

    def test_dead_end_stays(self):
        # vertex 3 is isolated; a walker starting there must stay forever
        e = [(0, 1), (1, 2)]
        sym = symmetrize(ds_of(e)).materialize()
        t = random_walks(sym, 4, length=3, n_walkers=4).to_pandas()
        from networkit_ray.graph.closeness import _pivots

        starts = _pivots(4, 4, 42)
        w_iso = int(np.where(starts == 3)[0][0])
        tw = t[t["walker"] == w_iso].sort_values("step")["v"].tolist()
        assert tw == [3, 3, 3, 3]


def _kpath_replica(canon, n, k, num_walks, seed):
    import collections

    from networkit_ray.graph.walks import _GOLD, _MIX, _P3
    from networkit_ray.sources.synth import _splitmix64

    base = np.uint64(seed) * np.uint64(0x100000001B3)
    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    counts = collections.Counter()
    # NOTE: numpy SCALAR uint64 arithmetic promotes on overflow — all hash
    # math must stay on arrays to wrap mod 2^64 like the engine's
    ws = np.arange(num_walks, dtype=np.uint64)
    starts = (_splitmix64(ws * _GOLD + base) % np.uint64(n)).astype(np.int64)
    lengths = (_splitmix64(ws * _GOLD + _MIX + base) % np.uint64(k)).astype(
        np.int64
    ) + 1
    for w in range(num_walks):
        start, length = int(starts[w]), int(lengths[w])
        visited = {start}
        cur = start
        for j in range(length):
            nbrs = [x for x in adj[cur] if x not in visited]
            if not nbrs:
                break
            hs = _splitmix64(
                np.full(len(nbrs), w + 1, np.uint64) * _GOLD
                + np.full(len(nbrs), j + 1, np.uint64) * _MIX
                + np.array(nbrs, np.uint64) * _P3
                + np.full(len(nbrs), base, np.uint64)
            )
            cur = nbrs[int(np.argmin(hs))]
            visited.add(cur)
            counts[cur] += 1
    return {v: counts.get(v, 0) * k / num_walks for v in range(n)}


def test_k_path_centrality_matches_replica(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.walks import k_path_centrality

    rng = np.random.default_rng(41)
    n = 40
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (150, 2)) if a != b}
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
        r["v"]: r["score"]
        for r in k_path_centrality(sym, n, k=4, num_walks=30, seed=11).take_all()
    }
    want = _kpath_replica(canon, n, 4, 30, 11)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_k_path_centrality_partition_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.walks import k_path_centrality

    rng = np.random.default_rng(43)
    n = 30
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (90, 2)) if a != b}
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
    a = {r["v"]: r["score"] for r in k_path_centrality(sym, n, k=3, num_walks=20).take_all()}
    b = {
        r["v"]: r["score"]
        for r in k_path_centrality(
            sym.repartition(5).materialize(), n, k=3, num_walks=20
        ).take_all()
    }
    assert a == b
