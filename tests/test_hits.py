"""HITS: structural properties on known graphs + DuckDB oracle twin."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.hits import hits


def _ds(edges):
    src, dst = zip(*edges)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )


class TestHits:
    def test_star_authority(self):
        # 1..4 all point at 0: node 0 is the unique authority, the spokes
        # are equal hubs, and (being a bipartite star) scores are exact
        # after one iteration.
        res, info = hits(_ds([(1, 0), (2, 0), (3, 0), (4, 0)]), 5, iterations=5, num_parts=2)
        df = res.to_pandas().sort_values("v").reset_index(drop=True)
        assert np.isclose(df.loc[0, "auth"], 1.0)
        assert np.allclose(df.loc[1:4, "auth"], 0.0)
        assert np.allclose(df.loc[1:4, "hub"], 0.5)
        assert np.isclose(df.loc[0, "hub"], 0.0)

    def test_l2_norms_are_one(self):
        edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(0, 5), (2, 6)]
        res, _ = hits(_ds(edges), 7, iterations=10, num_parts=3)
        df = res.to_pandas()
        assert np.isclose(np.sqrt((df["hub"] ** 2).sum()), 1.0)
        assert np.isclose(np.sqrt((df["auth"] ** 2).sum()), 1.0)

    def test_partition_invariance(self):
        edges = [(i, (i * 5 + 2) % 11) for i in range(11)] + [(3, 7), (9, 1)]
        a = hits(_ds(edges), 11, iterations=8, num_parts=2)[0].to_pandas().sort_values("v")
        b = hits(_ds(edges), 11, iterations=8, num_parts=5)[0].to_pandas().sort_values("v")
        assert np.allclose(a["hub"].to_numpy(), b["hub"].to_numpy(), atol=1e-12)
        assert np.allclose(a["auth"].to_numpy(), b["auth"].to_numpy(), atol=1e-12)

    def test_web_hits_matches_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        got = E.queries()["web_hits"](sf_tiny).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        expect = con.execute(E.oracle_sql()["web_hits"]).df()
        assert got.shape == expect.shape
        assert (got["v"].to_numpy() == expect["v"].to_numpy()).all()
        assert np.abs(got["hub"].to_numpy() - expect["hub"].to_numpy()).max() < 1e-9
        assert np.abs(got["auth"].to_numpy() - expect["auth"].to_numpy()).max() < 1e-9
