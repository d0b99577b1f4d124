"""WARC source/sink — Common Crawl's native archive format, stdlib-only.

The north-star corpus ships as WARC shards (thousands of ~1 GB files of
concatenated response records); the scale unit is the FILE — one parse
task per shard, which is exactly how Common Crawl jobs fan out — so
``read_warc`` maps shards to tasks and never splits a record across
tasks.  (For a single giant WARC, a byte-range scanner can resync on the
``WARC/1.0`` record magic; with per-shard files that machinery is
unnecessary.)

Record layout written/parsed (WARC/1.0, response records with an HTTP
payload, like Common Crawl):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <ISO8601, second precision>\r\n
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: <len(http block)>\r\n
    \r\n
    HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n
    Content-Length: <len(html)>\r\n\r\n<html bytes>
    \r\n\r\n

Round-trip invariant: ``read_warc(write_warc(pages))`` recovers
(url, warc_ts, html) byte-identically (timestamps are whole seconds in
the synthesized corpus, so ISO-second WARC-Date is lossless).

Determinism: records are hash-sharded by url and written sorted by url
within each shard, so shard bytes are a pure function of the corpus at
any parallelism; each shard commits via a ``.tmp`` + rename and skips
itself on rerun (resumable like state/sink.py).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _record(url: str, ts_us: int, html: bytes) -> bytes:
    iso = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + iso.encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    return head + http + b"\r\n\r\n"


def _shard_of(url: str, shards: int) -> int:
    return int.from_bytes(hashlib.md5(url.encode()).digest()[:4], "big") % shards


def write_warc(
    pages: ray.data.Dataset, out_dir: str, *, shards: int = 8
) -> ray.data.Dataset:
    """pages(url, warc_ts, html, ...) → ``out_dir/shard-NNNN.warc`` files.

    Returns a manifest Dataset (shard, path, records, skipped).
    """
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["url", "warc_ts", "html"]].copy()
        df["shard"] = [_shard_of(u, shards) for u in df["url"]]
        return df

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:04d}.warc")
        if os.path.exists(path):  # resumable: complete shards are skipped
            return pd.DataFrame(
                {"shard": [shard], "path": [path], "records": [len(g)],
                 "skipped": [True]}
            )
        # stable + full tiebreak so shard bytes are deterministic even when
        # duplicate URLs share a shard (quicksort would permute them)
        g = g.sort_values(["url", "warc_ts"], kind="stable")
        ts = g["warc_ts"]
        ts_us = (
            ts.astype("int64")
            if str(ts.dtype).startswith("datetime64[us")
            else pd.to_datetime(ts).astype("int64") // 1000
        )
        blob = b"".join(
            _record(u, int(t), bytes(h))
            for u, t, h in zip(g["url"], ts_us, g["html"])
        )
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard": [shard], "path": [path], "records": [len(g)],
             "skipped": [False]}
        )

    return (
        pages.map_batches(add_shard, batch_format="pandas")
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
    )


def parse_warc_bytes(blob: bytes) -> tuple[list, list, list]:
    """Parse concatenated WARC response records → (urls, ts_us, htmls)."""
    urls, tss, htmls = [], [], []
    i, n = 0, len(blob)
    while i < n:
        if not blob.startswith(b"WARC/1.0\r\n", i):
            raise ValueError(f"bad WARC magic at byte {i}")
        hdr_end = blob.index(b"\r\n\r\n", i)
        headers = {}
        for line in blob[i + 10 : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b": ")
            headers[k.decode().lower()] = v.decode()
        clen = int(headers["content-length"])
        body = blob[hdr_end + 4 : hdr_end + 4 + clen]
        http_end = body.index(b"\r\n\r\n")
        html = body[http_end + 4 :]
        urls.append(headers["warc-target-uri"])
        ts = datetime.strptime(
            headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
        ).replace(tzinfo=timezone.utc)
        tss.append(int((ts - _EPOCH).total_seconds()) * 1_000_000)
        htmls.append(html)
        i = hdr_end + 4 + clen + 4  # skip the \r\n\r\n record separator
    return urls, tss, htmls


def read_warc(path_or_dir: str) -> ray.data.Dataset:
    """WARC shard file(s) → pages Dataset (url, warc_ts, html).

    One parse task per shard file (the Common Crawl fan-out unit)."""
    if os.path.isdir(path_or_dir):
        paths = sorted(
            os.path.join(path_or_dir, p)
            for p in os.listdir(path_or_dir)
            if p.endswith(".warc")
        )
    else:
        paths = [path_or_dir]

    def parse(batch: dict) -> pa.Table:
        urls, tss, htmls = [], [], []
        for p in batch["path"]:
            with open(p, "rb") as f:
                u, t, h = parse_warc_bytes(f.read())
            urls.extend(u)
            tss.extend(t)
            htmls.extend(h)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(tss, np.int64)).cast(pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    files = ray.data.from_arrow(pa.table({"path": pa.array(paths, pa.string())}))
    return files.repartition(max(len(paths), 1)).map_batches(
        parse, batch_format="numpy"
    )
