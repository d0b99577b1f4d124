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
