"""Louvain/PLM: planted-partition recovery, modularity vs PLP, determinism."""

import numpy as np
import ray.data

from networkit_ray.graph.build import canonicalize, symmetrize, transpose
from networkit_ray.graph.louvain import louvain
from networkit_ray.graph.plp import plp
from networkit_ray.graph.quality import modularity
from networkit_ray.sources.synth import planted_partition


class TestLouvain:
    def test_planted_partition_recovery(self):
        canon, truth = planted_partition(120, 4, p_in=0.7, p_out=0.05)
        canon = canon.materialize()
        sym = symmetrize(canon).materialize()
        labels, info = louvain(sym, 120, num_parts=4)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        assert len(got) == 120
        # exact recovery: communities == planted classes
        for c in range(4):
            idx = np.flatnonzero(truth == c)
            assert len(np.unique(got[idx])) == 1
        assert len(np.unique(got)) == 4
        # labels are original-vertex representatives: each label is a member
        for lab in np.unique(got):
            assert got[lab] == lab

    def test_modularity_geq_plp(self):
        """PLM is the reference fork's headline family precisely because it
        beats plain LP on modularity (PLM.cpp benchmark rows)."""
        canon, _ = planted_partition(150, 5, p_in=0.5, p_out=0.1, seed=13)
        canon = canon.materialize()
        sym = symmetrize(canon).materialize()
        lv, _ = louvain(sym, 150, num_parts=3)
        pl, _ = plp(sym, 150, num_parts=3, update_threshold=0)
        q_lv = modularity(canon, lv, 150)
        q_plp = modularity(canon, pl, 150)
        assert q_lv >= q_plp - 1e-9
        assert q_lv > 0.1

    def test_deterministic_across_parallelism(self):
        canon, _ = planted_partition(100, 4, p_in=0.6, p_out=0.08, seed=3)
        sym = symmetrize(canon.materialize()).materialize()
        a, _ = louvain(sym, 100, num_parts=2)
        b, _ = louvain(sym, 100, num_parts=7)
        ga = a.to_pandas().sort_values("v")["label"].to_numpy()
        gb = b.to_pandas().sort_values("v")["label"].to_numpy()
        assert np.array_equal(ga, gb)

    def test_weighted_and_isolated(self):
        """Two triangles joined by a weak bridge + an isolated vertex."""
        import pyarrow as pa

        e = np.array(
            [[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5], [2, 3]],
            dtype=np.int64,
        )
        w = np.array([5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 0.1])
        ds = ray.data.from_arrow(
            pa.table({"src": e[:, 0], "dst": e[:, 1], "w": w})
        )
        sym = symmetrize(ds, agg=[("w", "sum")]).materialize()
        labels, _ = louvain(sym, 7, num_parts=2, weighted=True)
        got = labels.to_pandas().sort_values("v")["label"].to_numpy()
        assert got[0] == got[1] == got[2]
        assert got[3] == got[4] == got[5]
        assert got[0] != got[3]
        assert got[6] == 6  # isolated vertex keeps its singleton label


class TestSmallPathEquivalence:
    def test_single_task_equals_bsp_path(self):
        """The state-sized single-task local mover must produce bit-identical
        labels to the distributed BSP path (integer-valued quantities on
        unweighted inputs make both paths exact)."""
        canon, _ = planted_partition(90, 3, p_in=0.6, p_out=0.08, seed=21)
        sym = symmetrize(canon).materialize()
        small, _ = louvain(sym, 90)  # num_parts=None -> single-task path
        dist, _ = louvain(sym, 90, num_parts=3)  # forces BSP path
        a = small.to_pandas().sort_values("v").reset_index(drop=True)
        b = dist.to_pandas().sort_values("v").reset_index(drop=True)
        assert a.equals(b)


class TestPageRankNibble:
    def test_recovers_planted_community(self):
        """Seeding inside one planted community: the sweep cut must return
        (mostly) that community."""
        from networkit_ray.graph.nibble import pagerank_nibble

        canon, truth = planted_partition(80, 4, p_in=0.7, p_out=0.02, seed=5)
        sym = symmetrize(canon).materialize()
        seed_v = 0
        out, info = pagerank_nibble(sym, 80, [seed_v], iterations=25, max_k=40)
        got = set(out.to_pandas()["v"])
        seed_class = int(truth[seed_v])
        community = {int(v) for v in np.flatnonzero(truth == seed_class)}
        assert seed_v in got
        # precision: the bulk of the returned set is the seed's community
        assert len(got & community) / len(got) >= 0.8, (len(got), len(got & community))
        assert info["conductance"] < 0.3


class TestRefineCommunities:
    def _ds(self, rows):
        import pyarrow as pa
        import ray.data as rd

        both = rows + [(b, a) for a, b in rows]
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in both], pa.int64()),
                    "dst": pa.array([e[1] for e in both], pa.int64()),
                }
            )
        ).materialize()

    def _labels(self, pairs):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "v": pa.array([p[0] for p in pairs], pa.int64()),
                    "label": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        ).materialize()

    def test_splits_disconnected_community(self):
        import numpy as np

        from networkit_ray.graph.louvain import refine_communities

        # one "community" = two disjoint triangles; refinement must split
        canon = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
        labels = self._labels([(v, 0) for v in range(6)])
        out, _ = refine_communities(self._ds(canon), 6, labels)
        df = out.to_pandas().sort_values("v")
        lab = df["label"].to_numpy()
        assert len(set(lab[:3])) == 1 and len(set(lab[3:])) == 1
        assert lab[0] != lab[3]

    def test_keeps_well_connected_community(self):
        from networkit_ray.graph.louvain import refine_communities

        # a clique stays together
        canon = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        labels = self._labels([(v, 0) for v in range(5)])
        out, _ = refine_communities(self._ds(canon), 5, labels)
        lab = out.to_pandas()["label"].to_numpy()
        assert len(set(lab)) == 1

    def test_respects_parent_boundaries_and_determinism(self):
        import numpy as np

        from networkit_ray.graph.louvain import refine_communities

        rng = np.random.default_rng(4)
        n = 40
        canon = sorted(
            {
                (int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, n, (120, 2))
                if a != b
            }
        )
        parents = self._labels([(v, v % 3) for v in range(n)])
        ds = self._ds(canon)
        a_out, _ = refine_communities(ds, n, parents)
        b_out, _ = refine_communities(
            ds.repartition(7).materialize(), n, parents, num_parts=5
        )
        a = a_out.to_pandas().sort_values("v").reset_index(drop=True)
        b = b_out.to_pandas().sort_values("v").reset_index(drop=True)
        assert a.equals(b)
        # refined labels never cross parent boundaries: members of one
        # refined community share a parent
        par = {v: v % 3 for v in range(n)}
        for lab, grp in a.groupby("label"):
            assert len({par[v] for v in grp["v"]}) == 1
