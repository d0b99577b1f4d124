"""Spanning forest properties + algebraic distance behavior."""

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.build import canonicalize, symmetrize
from networkit_ray.graph.components import connected_components
from networkit_ray.graph.forest import spanning_forest


def ds_of(e):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )


class TestSpanningForest:
    def _check(self, edges, n):
        canon = canonicalize(ds_of(edges)).materialize()
        f = spanning_forest(canon, n).to_pandas()
        fe = set(zip(f["src"], f["dst"]))
        ce = set(
            zip(*canonicalize(ds_of(edges)).to_pandas()[["src", "dst"]].T.values)
        )
        assert fe <= ce, "forest must be a subset of the edges"
        # size = n - #components
        labels, _ = connected_components(symmetrize(ds_of(edges)).materialize(), n)
        n_comp = labels.to_pandas()["label"].nunique()
        assert len(fe) == n - n_comp
        # forest connects exactly the same components
        fl, _ = connected_components(symmetrize(spanning_forest(canon, n)).materialize(), n)
        assert fl.to_pandas().sort_values("v")["label"].tolist() == \
            labels.to_pandas().sort_values("v")["label"].tolist()

    def test_two_components(self):
        e = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (1, 3)]
        # fully connected after bridge (1,3): one component of 6
        self._check(e, 7)  # vertex 6 isolated

    def test_random_graph(self):
        rng = np.random.default_rng(8)
        n = 40
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (70, 2)) if a != b})
        self._check(e, n)

    def test_deterministic_across_partitioning(self):
        rng = np.random.default_rng(1)
        n = 20
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2)) if a != b})
        canon = canonicalize(ds_of(e))
        a = spanning_forest(canon.repartition(1).materialize(), n).to_pandas()
        b = spanning_forest(canon.repartition(5).materialize(), n).to_pandas()
        key = lambda d: sorted(zip(d["src"], d["dst"]))
        assert key(a) == key(b)


class TestAlgebraicDistance:
    def test_bridge_scores_high(self):
        """Two dense cliques joined by one bridge: the bridge edge must have
        a larger algebraic distance than intra-clique edges."""
        from networkit_ray.graph.algdist import algebraic_distances

        k = 6
        e = []
        for i in range(k):
            for j in range(i + 1, k):
                e.append((i, j))
                e.append((k + i, k + j))
        e.append((0, k))  # bridge
        sym = symmetrize(ds_of(e)).materialize()
        ad = algebraic_distances(sym, 2 * k, iterations=15).to_pandas()
        ad = ad.set_index(["src", "dst"])["ad"]
        bridge = ad[(0, k)]
        intra = [v for (a, b), v in ad.items() if (a < k) == (b < k)]
        assert bridge > max(intra), (bridge, max(intra))

    def test_partition_invariance(self):
        from networkit_ray.graph.algdist import algebraic_distances

        rng = np.random.default_rng(3)
        n = 25
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (60, 2)) if a != b})
        sym = symmetrize(ds_of(e)).materialize()
        a = algebraic_distances(sym, n, num_parts=2).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        b = algebraic_distances(sym, n, num_parts=7).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert np.allclose(a["ad"], b["ad"], atol=1e-12)
        assert a[["src", "dst"]].equals(b[["src", "dst"]])


class TestLubyMIS:
    def test_independent_and_maximal(self):
        from networkit_ray.graph.mis import luby_mis

        rng = np.random.default_rng(6)
        n = 35
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (80, 2)) if a != b})
        sym = symmetrize(ds_of(e)).materialize()
        mis, info = luby_mis(sym, n)
        s = set(mis.to_pandas()["v"])
        adj = {v: set() for v in range(n)}
        for a, b in e:
            adj[a].add(b)
            adj[b].add(a)
        # independence: no edge inside the set
        for a, b in e:
            assert not (a in s and b in s), (a, b)
        # maximality: every vertex outside has a neighbor inside
        for v in range(n):
            if v not in s:
                assert adj[v] & s, v
        assert info["rounds"] >= 1

    def test_deterministic_across_partitioning(self):
        from networkit_ray.graph.mis import luby_mis

        e = [(i, (i + 3) % 17) for i in range(17)] + [(0, 8), (2, 11)]
        sym = symmetrize(ds_of(e))
        a, _ = luby_mis(sym.repartition(1).materialize(), 17)
        b, _ = luby_mis(sym.repartition(6).materialize(), 17)
        assert sorted(a.to_pandas()["v"]) == sorted(b.to_pandas()["v"])


class TestLocalMaxMatching:
    def test_valid_and_maximal(self):
        from networkit_ray.graph.build import canonicalize
        from networkit_ray.graph.matching import local_max_matching

        rng = np.random.default_rng(12)
        n = 35
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (90, 2)) if a != b})
        canon = canonicalize(ds_of(e)).materialize()
        m, info = local_max_matching(canon, n)
        pairs = list(zip(m.to_pandas()["src"], m.to_pandas()["dst"]))
        seen = set()
        for a, b in pairs:
            assert a not in seen and b not in seen, (a, b)
            seen.add(a)
            seen.add(b)
        # maximal: every unmatched edge has a matched endpoint
        ce = set(zip(*canonicalize(ds_of(e)).to_pandas()[["src", "dst"]].T.values))
        for a, b in ce:
            if (a, b) not in set(pairs):
                assert a in seen or b in seen, (a, b)
        assert info["rounds"] >= 1

    def test_empty_right_anti_join_regression(self):
        """left-anti with an empty right partition must keep all left rows
        (the bug dropped whole partitions of the active edge set)."""
        import pyarrow as pa

        from networkit_ray.common.exchange import exchange_join

        left = ray.data.from_arrow(
            pa.table({"src": pa.array([1, 2, 3], pa.int64()), "dst": pa.array([4, 5, 6], pa.int64())})
        )
        right = ray.data.from_arrow(
            pa.table({"v": pa.array([], pa.int64())})
        )
        out = exchange_join(left, right, left_on=["src"], right_on=["v"], join_type="left anti")
        assert out.count() == 3


class TestGreedyColoring:
    def test_proper_and_deterministic(self):
        from networkit_ray.graph.coloring import greedy_coloring

        rng = np.random.default_rng(15)
        n = 30
        e = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (70, 2)) if a != b})
        sym = symmetrize(ds_of(e)).materialize()
        col, info = greedy_coloring(sym, n)
        cdf = col.to_pandas()
        assert len(cdf) == n
        cmap = dict(zip(cdf["v"], cdf["color"]))
        for a, b in e:
            assert cmap[a] != cmap[b], (a, b)
        assert max(cmap.values()) <= max(
            len({b for x, b in e if x == v} | {a for a, x in e if x == v})
            for v in range(n)
        )  # colors <= max degree + 1 - 1 bound loosened
        b2, _ = greedy_coloring(sym.repartition(5).materialize(), n)
        assert b2.to_pandas().sort_values("v")["color"].tolist() == \
            cdf.sort_values("v")["color"].tolist()
        # distributed JP rounds must equal the sequential single-task twin
        d1, dinfo = greedy_coloring(sym, n, single_task_threshold=0)
        assert dinfo.get("mode") != "single_task"
        assert d1.to_pandas().sort_values("v")["color"].tolist() == \
            cdf.sort_values("v")["color"].tolist()
        print("rounds:", info["rounds"], "colors:", max(cmap.values()) + 1)
