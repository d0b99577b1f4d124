"""EgoSplitting overlapping communities: planted structure + invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.build import symmetrize
from networkit_ray.graph.egosplit import ego_splitting


def _canon_ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in rows], pa.int64()),
                "dst": pa.array([v for u, v in rows], pa.int64()),
            }
        )
    ).materialize()


def _run(canon, n, **kw):
    ds = _canon_ds(canon)
    sym = symmetrize(ds).materialize()
    out, info = ego_splitting(ds, sym, n, **kw)
    df = out.to_pandas()
    memb = {}
    for v, c in df.itertuples(index=False):
        memb.setdefault(int(v), set()).add(int(c))
    return memb, info


class TestEgoSplitting:
    def test_two_triangles_shared_vertex(self):
        canon = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)]
        memb, info = _run(canon, 5)
        # vertex 0's ego-net splits {1,2} | {3,4} → two communities overlap at 0
        assert len(memb[0]) == 2
        assert len(memb[1]) == 1 and memb[1] == memb[2]
        assert len(memb[3]) == 1 and memb[3] == memb[4]
        assert memb[1] != memb[3]
        assert memb[0] == memb[1] | memb[3]

    def test_single_clique_one_community(self):
        canon = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        memb, _ = _run(canon, 4)
        comms = set()
        for v in range(4):
            assert len(memb[v]) == 1
            comms |= memb[v]
        assert len(comms) == 1

    def test_path_graph_edge_communities(self):
        # triangle-free: every edge is its own persona pair / community
        canon = [(i, i + 1) for i in range(4)]
        memb, _ = _run(canon, 5)
        assert len(memb[0]) == 1 and len(memb[4]) == 1
        for v in (1, 2, 3):
            assert len(memb[v]) == 2  # interior vertices sit in 2 edge-communities

    def test_parallelism_invariant(self):
        rng = np.random.default_rng(17)
        canon = sorted(
            {
                (int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, 30, (80, 2))
                if a != b
            }
        )
        m1, _ = _run(canon, 30)
        ds = _canon_ds(canon).repartition(7).materialize()
        sym = symmetrize(ds).materialize()
        out2, _ = ego_splitting(ds, sym, 30, num_parts=5)
        m2 = {}
        for v, c in out2.to_pandas().itertuples(index=False):
            m2.setdefault(int(v), set()).add(int(c))
        assert m1 == m2
