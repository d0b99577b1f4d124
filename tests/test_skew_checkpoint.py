"""Skew splitting (chunked map tasks) and checkpoint/resume for all kernels."""

import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from networkit_ray.graph import bsp
import ref_oracles as ref
from networkit_ray.graph.bsp import build_pgraph, state_to_dataset
from networkit_ray.graph.components import connected_components_refs
from networkit_ray.graph.pagerank import pagerank_refs
from networkit_ray.graph.plp import plp_refs


def ds_of(arr):
    arr = np.asarray(arr, dtype=np.int64)
    return ray.data.from_arrow(pa.table({"src": arr[:, 0], "dst": arr[:, 1]}))


def hub_graph(n_hub_out=3000, n_side=200, seed=5):
    """One hot source vertex (web-hub skew) + random background edges."""
    rng = np.random.default_rng(seed)
    hub = np.column_stack([np.zeros(n_hub_out, np.int64), 1 + np.arange(n_hub_out)])
    n = n_hub_out + n_side + 1
    bg = rng.integers(1, n, size=(4 * n_side, 2))
    bg = bg[bg[:, 0] != bg[:, 1]]
    edges = np.unique(np.vstack([hub, bg]), axis=0)
    return edges, n


class TestSkewSplitting:
    def test_chunked_matches_unchunked(self):
        edges, n = hub_graph()
        sym = np.unique(np.vstack([edges, edges[:, ::-1]]), axis=0)

        g_plain = build_pgraph(ds_of(edges), n, num_parts=4)
        g_chunk = build_pgraph(ds_of(edges), n, num_parts=4, chunk_size=400)
        units = g_chunk.map_units()
        assert len(units) > g_chunk.num_parts, "hub partition must split into chunks"

        for kwargs in ({"tol": 1e-12}, {"tol": 0.0, "max_iterations": 7}):
            a, _ = pagerank_refs(g_plain, **kwargs)
            b, _ = pagerank_refs(g_chunk, **kwargs)
            pa_ = state_to_dataset(g_plain, a, "score").to_pandas().sort_values("v")
            pb = state_to_dataset(g_chunk, b, "score").to_pandas().sort_values("v")
            np.testing.assert_allclose(
                pa_["score"].to_numpy(), pb["score"].to_numpy(), atol=1e-15
            )

        gs_plain = build_pgraph(ds_of(sym), n, num_parts=4)
        gs_chunk = build_pgraph(ds_of(sym), n, num_parts=4, chunk_size=500)
        assert len(gs_chunk.map_units()) > gs_chunk.num_parts
        la, _ = connected_components_refs(gs_plain)
        lb, _ = connected_components_refs(gs_chunk)
        assert np.array_equal(
            state_to_dataset(gs_plain, la, "label").to_pandas().sort_values("v")["label"].to_numpy(),
            state_to_dataset(gs_chunk, lb, "label").to_pandas().sort_values("v")["label"].to_numpy(),
        )

        pa_l, _ = plp_refs(gs_plain, update_threshold=0, max_iterations=10)
        pb_l, _ = plp_refs(gs_chunk, update_threshold=0, max_iterations=10)
        assert np.array_equal(
            state_to_dataset(gs_plain, pa_l, "label").to_pandas().sort_values("v")["label"].to_numpy(),
            state_to_dataset(gs_chunk, pb_l, "label").to_pandas().sort_values("v")["label"].to_numpy(),
        )


class TestCheckpointResume:
    def _graph(self):
        rng = np.random.default_rng(11)
        e = np.unique(rng.integers(0, 100, size=(500, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        sym = np.unique(np.vstack([e, e[:, ::-1]]), axis=0)
        return e, sym, 100

    def test_pagerank_resume_across_partition_counts(self, tmp_path):
        e, _, n = self._graph()
        ck = str(tmp_path / "pr")
        g4 = build_pgraph(ds_of(e), n, num_parts=4)
        pagerank_refs(g4, tol=0.0, max_iterations=6, checkpoint_dir=ck, checkpoint_every=3)
        full, _ = pagerank_refs(g4, tol=0.0, max_iterations=12)
        expect = state_to_dataset(g4, full, "score").to_pandas().sort_values("v")["score"].to_numpy()
        g3 = build_pgraph(ds_of(e), n, num_parts=3)
        resumed, info = pagerank_refs(
            g3, tol=0.0, max_iterations=12, checkpoint_dir=ck, resume=True
        )
        assert info["iterations"] == 12
        got = state_to_dataset(g3, resumed, "score").to_pandas().sort_values("v")["score"].to_numpy()
        np.testing.assert_allclose(got, expect, atol=1e-15)

    def test_cc_resume(self, tmp_path):
        _, sym, n = self._graph()
        ck = str(tmp_path / "cc")
        g = build_pgraph(ds_of(sym), n, num_parts=3)
        connected_components_refs(g, max_iterations=2, checkpoint_dir=ck, checkpoint_every=2)
        resumed, info = connected_components_refs(g, checkpoint_dir=ck, resume=True)
        got = state_to_dataset(g, resumed, "label").to_pandas().sort_values("v")["label"].to_numpy()
        expect = ref.components_ref(sym, n)
        assert np.array_equal(got, expect)

    def test_plp_resume(self, tmp_path):
        _, sym, n = self._graph()
        ck = str(tmp_path / "plp")
        g = build_pgraph(ds_of(sym), n, num_parts=3)
        plp_refs(g, update_threshold=0, max_iterations=4, checkpoint_dir=ck, checkpoint_every=4)
        resumed, info = plp_refs(
            g, update_threshold=0, max_iterations=12, checkpoint_dir=ck, resume=True
        )
        full, _ = plp_refs(g, update_threshold=0, max_iterations=12)
        assert np.array_equal(
            state_to_dataset(g, resumed, "label").to_pandas().sort_values("v")["label"].to_numpy(),
            state_to_dataset(g, full, "label").to_pandas().sort_values("v")["label"].to_numpy(),
        )


class TestSlidingWindow:
    def test_overlap_and_vs_duckdb(self, sf_tiny):
        import duckdb

        import ray.data

        from networkit_ray.pipelines.events import sliding_window, tumbling_window

        ev = ray.data.read_parquet(f"{sf_tiny}/events.parquet")
        got = (
            sliding_window(ev)
            .to_pandas()
            .sort_values(["user_id", "win"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH o AS (SELECT user_id, epoch_us(ts) AS tus, value
                       FROM read_parquet('{sf_tiny}/events.parquet')),
            fan AS (SELECT user_id, tus, value,
                           CAST(FLOOR(tus / 1800000000) AS BIGINT) - k.k AS win
                    FROM o CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) k
                    WHERE CAST(FLOOR(tus / 1800000000) AS BIGINT) - k.k >= 0)
            SELECT user_id, win, CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM fan GROUP BY user_id, win ORDER BY user_id, win
            """
        ).df()
        assert len(got) == len(exp)
        assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
        import numpy as np

        np.testing.assert_allclose(got["sum_value"], exp["sum_value"], atol=1e-6)
        # each event is in exactly window/slide = 2 windows
        tumb = tumbling_window(ev).to_pandas()
        assert got["n_events"].sum() == 2 * tumb["n_events"].sum()


class TestAsofJoin:
    def test_golden(self):
        import pyarrow as pa

        import ray.data

        from networkit_ray.pipelines.events import asof_join

        left = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1, 1, 2, 3], pa.int64()),
                    "event_id": pa.array([10, 11, 20, 30], pa.int64()),
                    "ts_us": pa.array([100, 250, 50, 10], pa.int64()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                    "event_id": pa.array([5, 6, 7, 8], pa.int64()),
                    "ts_us": pa.array([90, 100, 200, 60], pa.int64()),
                }
            )
        )
        got = (
            asof_join(left, right)
            .to_pandas()
            .sort_values(["user_id", "l_event_id"])
            .reset_index(drop=True)
        )
        # left 10 (ts100) → right 6 (ts100, ties pick latest id at ts<=100)
        # left 11 (ts250) → right 7 (ts200); left 20 (ts50) → none (60>50);
        # left 30 → no right rows for user 3
        assert got[["l_event_id", "r_event_id"]].values.tolist() == [[10, 6], [11, 7]]

    def test_matches_duckdb(self, sf_tiny):
        import duckdb

        import ray.data

        from networkit_ray.pipelines.events import asof_click_to_view

        got = (
            asof_click_to_view(ray.data.read_parquet(f"{sf_tiny}/events.parquet"))
            .to_pandas()
            .sort_values(["l_event_id"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""
            WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
                       FROM read_parquet('{sf_tiny}/events.parquet') WHERE event_type = 'click'),
            r AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
                  FROM read_parquet('{sf_tiny}/events.parquet') WHERE event_type = 'view'),
            pairs AS (
              SELECT l.user_id, l.event_id AS l_event_id, l.ts_us AS l_ts_us,
                     r.event_id AS r_event_id, r.ts_us AS r_ts_us,
                     row_number() OVER (PARTITION BY l.event_id
                                        ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
              FROM l JOIN r ON r.user_id = l.user_id AND r.ts_us <= l.ts_us)
            SELECT user_id, l_event_id, l_ts_us, r_event_id, r_ts_us
            FROM pairs WHERE rn = 1 ORDER BY l_event_id
            """
        ).df()
        assert len(got) == len(exp)
        for c in ("user_id", "l_event_id", "r_event_id", "r_ts_us"):
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


class TestSSSPKcoreResume:
    def test_sssp_resume_cross_p(self, tmp_path, sf_tiny):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from networkit_ray.graph.bfs import sssp_distances
        from networkit_ray.sources.derive import derived_edges

        e, n = derived_edges(sf_tiny)

        def add_w(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "w", pa.array(((src + dst) % 7 + 1).astype(np.float64))
            )

        w = e.map_batches(add_w, batch_format="pyarrow").materialize()
        ck = str(tmp_path / "sssp_ck")
        # interrupted run: checkpoint every 2 iterations, stop at 4
        sssp_distances(
            w, n, 0, num_parts=3, max_iterations=4, checkpoint_dir=ck, checkpoint_every=2
        )
        resumed, info = sssp_distances(
            w, n, 0, num_parts=5, checkpoint_dir=ck, resume=True
        )
        full, _ = sssp_distances(w, n, 0, num_parts=3)
        a = resumed.to_pandas().sort_values("v")["dist"].to_numpy()
        b = full.to_pandas().sort_values("v")["dist"].to_numpy()
        np.testing.assert_allclose(a, b)
        assert info["iterations"] >= 4  # resumed from the checkpointed iter

    def test_kcore_resume(self, tmp_path):
        import numpy as np

        import pyarrow as pa
        import ray.data

        from networkit_ray.graph.build import symmetrize
        from networkit_ray.graph.core import core_decomposition

        rng = np.random.default_rng(2)
        e = np.unique(rng.integers(0, 80, size=(500, 2)), axis=0)
        e = e[e[:, 0] != e[:, 1]]
        ds = ray.data.from_arrow(
            pa.table({"src": e[:, 0], "dst": e[:, 1]})
        )
        sym = symmetrize(ds).materialize()
        ck = str(tmp_path / "kcore_ck")
        # run with aggressive checkpointing, then resume with a different P
        full, _ = core_decomposition(sym, 80, num_parts=3, checkpoint_dir=ck, checkpoint_every=1)
        resumed, _ = core_decomposition(
            sym, 80, num_parts=5, checkpoint_dir=ck, resume=True
        )
        a = full.to_pandas().sort_values("v")["core"].to_numpy()
        b = resumed.to_pandas().sort_values("v")["core"].to_numpy()
        assert np.array_equal(a, b)
