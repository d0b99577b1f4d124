"""Biased Node2Vec walks vs an exact numpy replica of the draw."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.walks import node2vec_walks

GOLD = np.uint64(0x9E3779B97F4A7C15)
MIX = np.uint64(0xBF58476D1CE4E5B9)


def _splitmix(x):
    z = np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)
    z = np.uint64((int(z) ^ (int(z) >> 30)) * 0xBF58476D1CE4E5B9 % 2**64)
    z = np.uint64((int(z) ^ (int(z) >> 27)) * 0x94D049BB133111EB % 2**64)
    return np.uint64(int(z) ^ (int(z) >> 31))


def _pivots(n, s, seed):
    ids = np.arange(n, dtype=np.uint64)
    rank = (ids + np.uint64(seed)) * GOLD
    return np.sort(ids[np.argsort(rank)[:s]]).astype(np.int64)


def _oracle(canon, n, length, n_walkers, p, q, seed):
    import collections

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    starts = _pivots(n, min(n_walkers, n), seed)
    rows = []
    for w, s0 in enumerate(starts):
        prev, v = -1, int(s0)
        rows.append((w, 0, v))
        for step in range(length):
            ns = sorted(adj[v])
            if not ns:
                rows.append((w, step + 1, v))
                prev = v
                continue
            wgt = [
                (1.0 / p if x == prev else (1.0 if x in adj.get(prev, set()) else 1.0 / q))
                for x in ns
            ]
            total = sum(wgt)
            ctr = (
                np.uint64(w) * GOLD
                + np.uint64(step + 1) * MIX
                + np.uint64(seed)
            )
            u = float(_splitmix(int(ctr) % 2**64)) / 2.0**64
            cum, pick = 0.0, ns[-1]
            for x, g in zip(ns, wgt):
                cum += g
                if cum > u * total:
                    pick = x
                    break
            prev, v = v, pick
            rows.append((w, step + 1, v))
    return sorted(rows)


def _sym_ds(canon):
    both = canon + [(b, a) for a, b in canon]
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()


class TestNode2Vec:
    def _rand(self, seed, n, m):
        rng = np.random.default_rng(seed)
        return sorted(
            {
                (int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, n, (m, 2))
                if a != b
            }
        )

    def test_matches_oracle(self):
        for p, q in [(1.0, 1.0), (0.25, 2.0), (4.0, 0.5)]:
            canon = self._rand(3, 25, 60)
            got = node2vec_walks(
                _sym_ds(canon), 25, length=5, n_walkers=8, p=p, q=q
            ).to_pandas()
            rows = sorted(got[["walker", "step", "v"]].itertuples(index=False))
            assert rows == _oracle(canon, 25, 5, 8, p, q, 42), (p, q)

    def test_return_bias(self):
        # p→0: after the first step, the walk should mostly backtrack
        canon = self._rand(9, 30, 90)
        got = node2vec_walks(
            _sym_ds(canon), 30, length=6, n_walkers=12, p=1e-6, q=1.0
        ).to_pandas()
        piv = got.pivot(index="walker", columns="step", values="v")
        back = sum(
            (piv[s] == piv[s - 2]).sum() for s in range(2, 7)
        )
        total = 12 * 5
        assert back / total > 0.8

    def test_parallelism_invariant(self):
        canon = self._rand(5, 25, 60)
        ds = _sym_ds(canon)
        a = node2vec_walks(ds, 25, length=4, n_walkers=8, p=0.5, q=2.0, num_parts=2)
        b = node2vec_walks(
            ds.repartition(5).materialize(), 25, length=4, n_walkers=8,
            p=0.5, q=2.0, num_parts=7,
        )
        pa_ = a.to_pandas().sort_values(["walker", "step"]).reset_index(drop=True)
        pb = b.to_pandas().sort_values(["walker", "step"]).reset_index(drop=True)
        assert pa_.equals(pb)
