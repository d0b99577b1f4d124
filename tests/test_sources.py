"""Edge-list / METIS reader-writer conformance + R-MAT determinism."""

import numpy as np
import pytest

from networkit_ray.sources.edgelist import read_edge_list, read_metis, write_edge_list
from networkit_ray.sources.synth import planted_partition, rmat_edges


class TestEdgeList:
    def test_read_with_comments_offset_and_weights(self, tmp_path):
        p = tmp_path / "g.txt"
        p.write_text("# a comment\n1 2 1.5\n2 3 0.5\n\n# tail\n3 1 2.0\n")
        ds = read_edge_list(str(p), first_node=1)
        df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert list(df["src"]) == [0, 1, 2]
        assert list(df["dst"]) == [1, 2, 0]
        np.testing.assert_allclose(df["w"], [1.5, 0.5, 2.0])

    def test_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        e = np.array([[0, 1], [1, 2], [5, 3]], dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]}))
        out = tmp_path / "out"
        write_edge_list(ds, str(out))
        back = read_edge_list(str(out)).to_pandas().sort_values(["src", "dst"])
        assert np.array_equal(
            back[["src", "dst"]].to_numpy(), e[np.lexsort((e[:, 1], e[:, 0]))]
        )


class TestMetis:
    def test_tiny_graph(self, tmp_path):
        # 4 nodes, 3 edges path; METIS: 1-based neighbor lists per line
        p = tmp_path / "m.graph"
        p.write_text("4 3\n2\n1 3\n2 4\n3\n")
        ds, n = read_metis(str(p))
        assert n == 4
        df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert list(map(tuple, df.to_numpy())) == [(0, 1), (1, 2), (2, 3)]


class TestGenerators:
    def test_rmat_deterministic_across_parallelism(self):
        a, n = rmat_edges(10, 4)
        b, _ = rmat_edges(10, 4)
        da = a.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        db = b.repartition(7).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert da.equals(db)
        assert len(da) == (1 << 10) * 4
        assert da["src"].max() < n

    def test_planted_partition_structure(self):
        edges, labels = planted_partition(60, 3, p_in=1.0, p_out=0.0)
        df = edges.to_pandas()
        same = labels[df["src"]] == labels[df["dst"]]
        assert same.all()
        # three k-cliques of 20
        assert len(df) == 3 * (20 * 19 // 2)


class TestKeyedAndFormats:
    def test_read_edge_list_keyed_compact(self, tmp_path):
        from networkit_ray.sources.edgelist import read_edge_list_keyed

        p = tmp_path / "keyed.txt"
        p.write_text(
            "# comment\n"
            "alpha beta\n"
            "beta gamma\n"
            "alpha gamma\n"
            "gamma alpha\n"
        )
        edges, mapping = read_edge_list_keyed(str(p))
        mp = mapping.to_pandas().sort_values("v")
        assert len(mp) == 3  # three distinct keys
        assert sorted(mp["key"]) == ["alpha", "beta", "gamma"]
        assert sorted(mp["v"]) == [0, 1, 2]
        e = edges.to_pandas()
        assert len(e) == 4
        # edge count per key matches the file via the mapping
        key_of = dict(zip(mp["v"], mp["key"]))
        got = sorted((key_of[a], key_of[b]) for a, b in zip(e["src"], e["dst"]))
        assert got == sorted(
            [("alpha", "beta"), ("beta", "gamma"), ("alpha", "gamma"), ("gamma", "alpha")]
        )

    def test_read_edge_list_keyed_weighted(self, tmp_path):
        from networkit_ray.sources.edgelist import read_edge_list_keyed

        p = tmp_path / "kw.txt"
        p.write_text("x y 2.5\ny z 1.0\n")
        edges, mapping = read_edge_list_keyed(str(p))
        e = edges.to_pandas()
        assert sorted(e["w"]) == [1.0, 2.5]

    def test_read_snap_remap(self, tmp_path):
        from networkit_ray.sources.edgelist import read_snap

        p = tmp_path / "snap.txt"
        # non-continuous ids with a duplicate edge
        p.write_text("# SNAP\n100 205\n205 999\n100 205\n999 100\n")
        edges, mapping, n = read_snap(str(p))
        assert n == 3
        mp = mapping.to_pandas().sort_values("orig")
        assert list(mp["orig"]) == [100, 205, 999]
        assert list(mp["v"]) == [0, 1, 2]  # ascending original order
        e = edges.to_pandas()
        assert len(e) == 3  # duplicate dropped
        got = sorted(zip(e["src"], e["dst"]))
        assert got == [(0, 1), (1, 2), (2, 0)]

    def test_konect(self, tmp_path):
        from networkit_ray.sources.edgelist import read_konect

        p = tmp_path / "out.test"
        p.write_text("% sym unweighted\n1 2\n2 3\n")
        e = read_konect(str(p)).to_pandas()
        assert sorted(zip(e["src"], e["dst"])) == [(0, 1), (1, 2)]

    def test_metis_writer_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.graph.build import symmetrize
        from networkit_ray.sources.edgelist import read_metis, write_metis

        t = pa.table(
            {
                "src": pa.array([0, 1, 2], pa.int64()),
                "dst": pa.array([1, 2, 0], pa.int64()),
            }
        )
        sym = symmetrize(ray.data.from_arrow(t)).materialize()
        path = str(tmp_path / "g.metis")
        write_metis(sym, 3, path)
        back, n = read_metis(path)
        assert n == 3
        b = back.to_pandas()
        assert sorted(zip(b["src"], b["dst"])) == [(0, 1), (0, 2), (1, 2)]

    def test_dispatch(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import read_graph, write_graph

        t = pa.table(
            {"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())}
        )
        d = str(tmp_path / "el")
        write_graph(ray.data.from_arrow(t), d, "edgelisttab")
        back = read_graph(d + "/part-00000.txt", "edgelist").to_pandas()
        assert sorted(zip(back["src"], back["dst"])) == [(0, 1), (1, 2)]

    def test_partition_io_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import read_partition, write_partition

        t = pa.table(
            {
                "v": pa.array([2, 0, 1], pa.int64()),
                "label": pa.array([7, 5, 5], pa.int64()),
            }
        )
        p = str(tmp_path / "part.txt")
        write_partition(ray.data.from_arrow(t), p)
        assert open(p).read().split() == ["5", "5", "7"]
        back = read_partition(p).to_pandas().sort_values("v")
        assert list(back["label"]) == [5, 5, 7]

    def test_weight_helpers_and_union(self):
        import pyarrow as pa
        import ray.data

        from networkit_ray.graph.build import graph_union, to_unweighted, to_weighted

        a = ray.data.from_arrow(
            pa.table({"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64()), "w": [2.0]})
        )
        b = ray.data.from_arrow(
            pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64()), "w": [3.0, 1.0]})
        )
        u = graph_union(a, b, agg=[("w", "sum")]).to_pandas().sort_values(["src", "dst"])
        assert list(u["w"]) == [5.0, 1.0]
        uw = to_unweighted(a)
        assert uw.schema().base_schema.names == ["src", "dst"]
        w = to_weighted(uw).to_pandas()
        assert list(w["w"]) == [1.0]

    def test_matrix_market_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import (
            read_matrix_market,
            write_matrix_market,
        )

        t = pa.table(
            {
                "src": pa.array([0, 0, 1], pa.int64()),
                "dst": pa.array([1, 2, 2], pa.int64()),
            }
        )
        path = str(tmp_path / "g.mtx")
        write_matrix_market(ray.data.from_arrow(t), 3, path)
        back, n = read_matrix_market(path)
        assert n == 3
        b = back.to_pandas()
        assert sorted(zip(b["src"], b["dst"])) == [(0, 1), (0, 2), (1, 2)]

    def test_gml_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import read_gml, write_gml

        t = pa.table(
            {
                "src": pa.array([0, 1], pa.int64()),
                "dst": pa.array([1, 2], pa.int64()),
            }
        )
        path = str(tmp_path / "g.gml")
        write_gml(ray.data.from_arrow(t), 3, path)
        back, n = read_gml(path)
        assert n == 3
        b = back.to_pandas()
        assert sorted(zip(b["src"], b["dst"])) == [(0, 1), (1, 2)]

    def test_graphml_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import read_graphml, write_graphml

        t = pa.table(
            {
                "src": pa.array([0, 1, 2], pa.int64()),
                "dst": pa.array([1, 2, 0], pa.int64()),
                "w": pa.array([1.5, 2.0, 0.25], pa.float64()),
            }
        )
        path = str(tmp_path / "g.graphml")
        write_graphml(ray.data.from_arrow(t), 3, path)
        back, n = read_graphml(path)
        assert n == 3
        b = back.to_pandas().sort_values(["src", "dst"])
        assert list(zip(b["src"], b["dst"], b["w"])) == [
            (0, 1, 1.5),
            (1, 2, 2.0),
            (2, 0, 0.25),
        ]

    def test_gexf_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import read_gexf, write_gexf

        t = pa.table(
            {
                "src": pa.array([0, 0], pa.int64()),
                "dst": pa.array([1, 2], pa.int64()),
            }
        )
        path = str(tmp_path / "g.gexf")
        write_gexf(ray.data.from_arrow(t), 4, path)
        back, n = read_gexf(path)
        assert n == 4
        b = back.to_pandas()
        assert sorted(zip(b["src"], b["dst"])) == [(0, 1), (0, 2)]

    def test_dot_writer(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import write_dot

        t = pa.table(
            {
                "src": pa.array([0, 1], pa.int64()),
                "dst": pa.array([1, 2], pa.int64()),
            }
        )
        p = str(tmp_path / "g.dot")
        write_dot(ray.data.from_arrow(t), p)
        text = open(p).read()
        assert text.startswith("graph G {")
        assert "0 -- 1;" in text and "1 -- 2;" in text
        write_dot(ray.data.from_arrow(t), p, directed=True)
        assert "0 -> 1;" in open(p).read()

    def test_cover_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import read_cover, write_cover

        # node 1 belongs to two subsets — Cover, not Partition
        t = pa.table(
            {
                "v": pa.array([0, 1, 1, 2], pa.int64()),
                "label": pa.array([0, 0, 1, 1], pa.int64()),
            }
        )
        p = str(tmp_path / "c.cover")
        write_cover(ray.data.from_arrow(t), p)
        back = read_cover(p).to_pandas()
        assert sorted(zip(back["v"], back["label"])) == [
            (0, 0),
            (1, 0),
            (1, 1),
            (2, 1),
        ]

    def test_dispatch_new_formats(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.sources.edgelist import read_graph, write_graph

        t = pa.table(
            {
                "src": pa.array([0, 1], pa.int64()),
                "dst": pa.array([1, 2], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t)
        for fmt, ext in [("graphml", "graphml"), ("gexf", "gexf")]:
            p = str(tmp_path / f"d.{ext}")
            write_graph(ds, p, fmt, num_nodes=3)
            back, n = read_graph(p, fmt)
            assert n == 3 and back.count() == 2
        write_graph(ds, str(tmp_path / "d.dot"), "dot")

    def test_batch_workflow(self, tmp_path):
        import pyarrow as pa
        import ray.data

        from networkit_ray.pipelines.batch import batch_run
        from networkit_ray.sources.edgelist import write_graph

        for i, edges in enumerate([[(0, 1)], [(0, 1), (1, 2)], [(0, 1), (1, 2), (2, 3)]]):
            t = pa.table(
                {
                    "src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64()),
                }
            )
            write_graph(ray.data.from_arrow(t), str(tmp_path / f"g{i}.gml"), "gml", num_nodes=i + 2)

        def count_edges(loaded, path):
            ds, n = loaded
            return {"n": n, "m": ds.count()}

        out_csv = str(tmp_path / "report.csv")
        res = batch_run(str(tmp_path), "g*.gml", "gml", count_edges, out_path=out_csv).to_pandas()
        assert list(res["m"]) == [1, 2, 3]
        assert list(res["n"]) == [2, 3, 4]
        text = open(out_csv).read()
        assert text.splitlines()[0] == "graph,n,m"
        assert len(text.splitlines()) == 4


class TestRandomGenerators:
    def test_er_deterministic_and_sized(self):
        from networkit_ray.sources.synth import erdos_renyi_edges

        a, n = erdos_renyi_edges(200, m=600)
        b, _ = erdos_renyi_edges(200, m=600)
        da = a.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        db = b.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert da.equals(db)
        assert 560 <= len(da) <= 600  # dedup shortfall only
        assert (da["src"] < da["dst"]).all()  # canonical, no self loops
        assert da["src"].min() >= 0 and da["dst"].max() < 200

    def test_er_p_form_matches_expected_density(self):
        from networkit_ray.sources.synth import erdos_renyi_edges

        p = 0.05
        e, n = erdos_renyi_edges(100, p=p)
        got = len(e.to_pandas())
        exp = p * 100 * 99 / 2
        assert abs(got - exp) / exp < 0.15

    def test_chung_lu_degree_proportional(self):
        import numpy as np

        from networkit_ray.sources.synth import chung_lu_edges

        n = 300
        w = np.where(np.arange(n) < 30, 20.0, 2.0)  # 30 hubs
        e, _ = chung_lu_edges(n, w)
        df = e.to_pandas()
        deg = np.zeros(n)
        np.add.at(deg, df["src"].to_numpy(), 1)
        np.add.at(deg, df["dst"].to_numpy(), 1)
        hub, leaf = deg[:30].mean(), deg[30:].mean()
        assert hub / leaf > 5  # ∝ 10× weights, minus collision shrink
        # deterministic
        e2, _ = chung_lu_edges(n, w)
        assert e.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True).equals(
            e2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        )


class TestWattsStrogatz:
    def test_no_rewire_is_ring_lattice(self):
        from networkit_ray.sources.synth import watts_strogatz_edges

        e, n = watts_strogatz_edges(20, 4, 0.0)
        df = e.to_pandas()
        exp = set()
        for v in range(20):
            for j in (1, 2):
                a, b = v, (v + j) % 20
                exp.add((min(a, b), max(a, b)))
        assert set(map(tuple, df.to_numpy())) == exp

    def test_rewire_fraction_and_determinism(self):
        from networkit_ray.sources.synth import watts_strogatz_edges

        a, _ = watts_strogatz_edges(300, 6, 0.3)
        b, _ = watts_strogatz_edges(300, 6, 0.3)
        da = a.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        db = b.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert da.equals(db)
        ring = set()
        for v in range(300):
            for j in (1, 2, 3):
                x, y = v, (v + j) % 300
                ring.add((min(x, y), max(x, y)))
        got = set(map(tuple, da.to_numpy()))
        frac_kept = len(got & ring) / len(ring)
        assert 0.6 < frac_kept < 0.8  # ~70% kept at p=0.3


class TestBinaryEdgeList:
    def test_roundtrip_both_widths(self, tmp_path):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.sources.edgelist import (
            read_binary_edge_list,
            write_binary_edge_list,
        )

        rng = np.random.default_rng(2)
        rows = sorted({(int(a), int(b)) for a, b in rng.integers(0, 500, (300, 2))})
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, b in rows], pa.int64()),
                    "dst": pa.array([b for a, b in rows], pa.int64()),
                }
            )
        ).repartition(4).materialize()
        for width in (4, 8):
            d = str(tmp_path / f"w{width}")
            write_binary_edge_list(ds, d, width=width)
            back = read_binary_edge_list(d, width=width).to_pandas()
            got = sorted(back.itertuples(index=False, name=None))
            assert got == rows, width

    def test_byte_range_split(self, tmp_path):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.sources.edgelist import (
            read_binary_edge_list,
            write_binary_edge_list,
        )

        rows = [(i, i + 1) for i in range(1000)]
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, b in rows], pa.int64()),
                    "dst": pa.array([b for a, b in rows], pa.int64()),
                }
            )
        ).materialize()
        d = str(tmp_path / "one")
        write_binary_edge_list(ds, d)
        # tiny ranges: forces many byte-range tasks over one file
        back = read_binary_edge_list(d, records_per_task=64).to_pandas()
        assert sorted(back.itertuples(index=False, name=None)) == rows

    def test_first_node_offset(self, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from networkit_ray.sources.edgelist import (
            read_binary_edge_list,
            write_binary_edge_list,
        )

        rows = [(1, 2), (2, 3)]
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, b in rows], pa.int64()),
                    "dst": pa.array([b for a, b in rows], pa.int64()),
                }
            )
        )
        d = str(tmp_path / "fn")
        write_binary_edge_list(ds, d)
        back = read_binary_edge_list(d, first_node=1).to_pandas()
        assert sorted(back.itertuples(index=False, name=None)) == [(0, 1), (1, 2)]
