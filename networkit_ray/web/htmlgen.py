"""Deterministic Common-Crawl-style pages table synthesized from ``documents``.

Produces the exact input shape of BASELINE.json's input_hint —
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string) —
with link structure derived from doc_id by pure integer arithmetic, so the
extracted edge table is independently expressible in SQL for the DuckDB
oracle (no external data; same rows at any parallelism).

Per document (N = number of documents, D = 50 domains, A = 2654435761):

    url      = https://site{doc_id % D:04d}.example/p/{doc_id:06d}
    warc_ts  = 2020-01-01T00:00:00Z + doc_id seconds
    outlinks = t_k = (doc_id * A + k * 40503) % N  for k = 1..(1 + doc_id % 3)
                    — absolute hrefs; each k-layer is a bijection mod N but
                    applies to only part of the docs, so in-degrees vary
                    (1..4) and PageRank is non-trivial
               t_r = (doc_id + D) % N            — *relative* href /p/{t_r:06d}
                    (resolves against the page's own domain; the resolved URL
                    is a real page URL because N % D == 0 for the driver
                    testdata sizes 500/5000, keeping t_r in the same domain)
               plus a fragment duplicate of t_1 (#cite) and an upper-cased
               scheme/host duplicate — both must collapse after URL
               normalization + per-page dedup.
    html     = template embedding html-escaped text and the hrefs
    text     = documents.text, byte-identical after extraction (the
               input_hint per-row invariant; cf. the reference's only web
               analog, scripts/webgraph.py:27-49 netloc handling)
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

D_DOMAINS = 50
A_MULT = 2654435761
LINK_OFFSET = 40503
EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds


def num_documents(sf_dir: str) -> int:
    import os

    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):  # partitioned table (e.g. web.bigcorpus output)
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def page_url(doc_id: int) -> str:
    return f"https://site{doc_id % D_DOMAINS:04d}.example/p/{doc_id:06d}"


def outlink_targets(doc_id: int, n_docs: int) -> tuple[list[int], int]:
    """(absolute-link targets, relative-link target)."""
    k_links = 1 + doc_id % 3
    abs_ts = [(doc_id * A_MULT + k * LINK_OFFSET) % n_docs for k in range(1, k_links + 1)]
    t_rel = (doc_id + D_DOMAINS) % n_docs
    return abs_ts, t_rel


def render_page(doc_id: int, text: str, n_docs: int) -> bytes:
    abs_ts, t_rel = outlink_targets(doc_id, n_docs)
    u1 = page_url(abs_ts[0])
    links = "".join(f'<a href="{page_url(t)}">ref{i}</a>' for i, t in enumerate(abs_ts))
    body = _html.escape(text, quote=False)
    page = (
        f"<html><head><title>Doc {doc_id}</title></head><body>"
        f"<p>{body}</p>"
        f"{links}"
        f'<a href="/p/{t_rel:06d}">next</a>'
        f'<a href="{u1}#cite">cite</a>'
        f'<a href="{u1.replace("https://", "HTTPS://")}">dup</a>'
        f"</body></html>"
    )
    return page.encode("utf-8")


def pages_dataset(sf_dir: str) -> ray.data.Dataset:
    """documents.parquet → pages Dataset (url, warc_ts, html, text, lang)."""
    n_docs = num_documents(sf_dir)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        urls = [page_url(int(i)) for i in ids]
        htmls = [render_page(int(i), tx, n_docs) for i, tx in zip(ids, texts)]
        ts = pa.array(EPOCH_US + ids.astype(np.int64) * 1_000_000).cast(
            pa.timestamp("us")
        )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts,
                "html": pa.array(htmls, pa.binary()),
                "text": t["text"],
                "lang": t["lang"],
            }
        )

    return docs.map_batches(to_pages, batch_format="pyarrow")


# SQL for the expected (src_doc, dst_doc) edge table after extraction,
# normalization and (src,dst) dedup; self-links kept here (the graph builder
# filters them downstream like any edge table).
WEB_EDGES_SQL = f"""
    SELECT DISTINCT src, dst FROM (
        SELECT doc_id AS src,
               CAST((doc_id * {A_MULT} + k.k * {LINK_OFFSET}) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
        FROM documents, (VALUES (1), (2), (3)) k(k)
        WHERE k.k <= 1 + doc_id % 3
        UNION ALL
        SELECT doc_id,
               CAST((doc_id + {D_DOMAINS}) % (SELECT COUNT(*) FROM documents) AS BIGINT)
        FROM documents
    )
"""
