"""Resumable partitioned Parquet sink: roundtrip + skip-finished buckets."""

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.state.sink import read_partitioned, write_partitioned


def _ds(n):
    rng = np.random.default_rng(3)
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 1 << 30, n).astype(np.int64)),
                "val": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    ).repartition(5).materialize()


class TestPartitionedSink:
    def test_roundtrip(self, tmp_path):
        ds = _ds(2000)
        out = str(tmp_path / "o")
        info = write_partitioned(ds, out, ["k"], num_buckets=8)
        assert info["rows_written"] == 2000
        back = read_partitioned(out).to_pandas().sort_values("val")
        orig = ds.to_pandas().sort_values("val")
        assert (back["val"].to_numpy() == orig["val"].to_numpy()).all()
        assert (back["k"].to_numpy() == orig["k"].to_numpy()).all()

    def test_rerun_skips_finished(self, tmp_path):
        ds = _ds(1000)
        out = str(tmp_path / "o")
        write_partitioned(ds, out, ["k"], num_buckets=6)
        mtimes = {
            b: os.path.getmtime(os.path.join(out, b, "part.parquet"))
            for b in os.listdir(out)
        }
        info2 = write_partitioned(ds, out, ["k"], num_buckets=6)
        assert info2["rows_written"] == 0  # everything skipped
        for b, m in mtimes.items():
            assert os.path.getmtime(os.path.join(out, b, "part.parquet")) == m

    def test_partial_resume(self, tmp_path):
        import shutil

        ds = _ds(1200)
        out = str(tmp_path / "o")
        write_partitioned(ds, out, ["k"], num_buckets=6)
        total = read_partitioned(out).count()
        # simulate a crashed bucket: wipe one bucket entirely
        victim = sorted(os.listdir(out))[2]
        shutil.rmtree(os.path.join(out, victim))
        assert read_partitioned(out).count() < total  # incomplete: invisible
        info = write_partitioned(ds, out, ["k"], num_buckets=6)
        assert 0 < info["rows_written"] < 1200  # only the victim rewritten
        assert read_partitioned(out).count() == total

    def test_incomplete_bucket_invisible(self, tmp_path):
        ds = _ds(500)
        out = str(tmp_path / "o")
        write_partitioned(ds, out, ["k"], num_buckets=4)
        victim = sorted(os.listdir(out))[0]
        os.remove(os.path.join(out, victim, "_DONE"))
        # bucket without marker is treated as half-written
        assert read_partitioned(out).count() < 500
