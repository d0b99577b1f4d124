"""ray-job-submit driver contract: pipelines/job.py end-to-end + resume."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from networkit_ray.pipelines.job import run_job
from networkit_ray.state.sink import read_partitioned


@pytest.fixture()
def edges_pq(tmp_path):
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep].astype(np.int64)),
                  "dst": pa.array(dst[keep].astype(np.int64))})
    path = str(tmp_path / "edges.parquet")
    pq.write_table(t, path)
    return path, t


def test_pagerank_job_matches_kernel_and_resumes(edges_pq, tmp_path):
    path, t = edges_pq
    out_dir = str(tmp_path / "pr_out")
    r1 = run_job(["--algo", "pagerank", "--edges", path, "--output", out_dir,
                  "--checkpoint-dir", str(tmp_path / "ck"),
                  "--tol", "0", "--max-iterations", "15"])
    assert r1["rows_written"] == r1["num_nodes"] == 60
    assert r1["iterations"] == 15
    # rerun: every output bucket already complete
    r2 = run_job(["--algo", "pagerank", "--edges", path, "--output", out_dir,
                  "--tol", "0", "--max-iterations", "15"])
    assert r2["buckets_skipped"] == 16 and r2["rows_written"] == 0

    from networkit_ray.graph.pagerank import pagerank

    ref, _ = pagerank(ray.data.from_arrow(t), 60, tol=0, max_iterations=15)
    ref = ref.to_pandas().sort_values("v").reset_index(drop=True)
    got = read_partitioned(out_dir).to_pandas().sort_values("v").reset_index(drop=True)
    np.testing.assert_allclose(got["score"], ref["score"], atol=1e-12)


def test_cc_job_symmetrize(edges_pq, tmp_path):
    path, t = edges_pq
    r = run_job(["--algo", "cc", "--edges", path,
                 "--output", str(tmp_path / "cc_out"), "--symmetrize"])
    assert r["rows_written"] == 60
    got = read_partitioned(str(tmp_path / "cc_out")).to_pandas()
    assert set(got.columns) == {"v", "label"}
    # component label is the component's min member id
    assert (got.groupby("label")["v"].min().index == got.groupby("label")["v"].min().values).all()
