"""WARC source/sink: byte-exact roundtrip, determinism, resumability."""

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.sources.warc import parse_warc_bytes, read_warc, write_warc


def _pages(n=20):
    urls = [f"https://site{i % 3:04d}.example/p/{i:06d}" for i in range(n)]
    htmls = [f"<html><body>doc {i} &amp; stuff</body></html>".encode() for i in range(n)]
    ts = pa.array(np.arange(n, dtype=np.int64) * 1_000_000).cast(pa.timestamp("us"))
    return ray.data.from_arrow(
        pa.table({"url": pa.array(urls), "warc_ts": ts,
                  "html": pa.array(htmls, pa.binary())})
    )


def test_roundtrip_byte_exact(tmp_path):
    pages = _pages()
    out = str(tmp_path / "warc")
    man = write_warc(pages, out, shards=4).to_pandas()
    assert man["records"].sum() == 20 and not man["skipped"].any()
    back = read_warc(out).to_pandas()
    orig = pages.to_pandas()
    m = orig.merge(back, on="url", suffixes=("_a", "_b"))
    assert len(m) == 20
    assert all(bytes(a) == bytes(b) for a, b in zip(m["html_a"], m["html_b"]))
    assert (m["warc_ts_a"] == m["warc_ts_b"]).all()


def test_rerun_skips_complete_shards(tmp_path):
    pages = _pages()
    out = str(tmp_path / "warc")
    write_warc(pages, out, shards=4).materialize()
    man2 = write_warc(pages, out, shards=4).to_pandas()
    assert man2["skipped"].all()


def test_shard_bytes_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(_pages().repartition(1), a, shards=2).materialize()
    write_warc(_pages().repartition(7), b, shards=2).materialize()
    import os

    for name in sorted(os.listdir(a)):
        with open(os.path.join(a, name), "rb") as f1, open(os.path.join(b, name), "rb") as f2:
            assert f1.read() == f2.read(), name


def test_parse_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        parse_warc_bytes(b"NOT A WARC")
