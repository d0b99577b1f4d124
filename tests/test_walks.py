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
