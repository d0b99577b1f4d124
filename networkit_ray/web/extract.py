"""HTML outlink extraction + byte-identical text extraction (actor pool).

The extraction stage of the north-star pipeline: pages (url, html, ...) →
edge table.  Stateful pieces — compiled regexes, the URL normalizer — are
built once per actor in ``__init__`` and reused across batches
(``map_batches(OutlinkExtractor, concurrency=N, batch_size=B)``), per the
warm-parser actor-pool design (SURVEY.md §2.3).  The reference has no HTML
layer; its closest analog is the URL/netloc script scripts/webgraph.py:27-49,
and its string→id reader map (io/EdgeListReader.cpp:30-35) is replaced by
stable ``hash64(normalized_url)`` ids — no sequential shared dict.

URL normalization: resolve relative hrefs against the page URL, lowercase
scheme+host, strip fragments, drop non-http(s) schemes.  Duplicate targets
within a page collapse; cross-page duplicates are removed by the standard
(src, dst) dedup shuffle in graph.build.
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.common.hashing import hash64_array
from networkit_ray.graph.build import dedup_edges

_HREF_RE = re.compile(rb'<a\s+[^>]*href="([^"]*)"', re.IGNORECASE)
_ANCHOR_RE = re.compile(
    rb'<a\s+[^>]*href="([^"]*)"[^>]*>(.*?)</a>', re.IGNORECASE | re.DOTALL
)
_TEXT_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


def normalize_url(base: str, href: str) -> str | None:
    """Absolute, lowercase-host, fragment-free URL — or None if not http(s)."""
    absu = urljoin(base, href)
    parts = urlsplit(absu)
    if parts.scheme.lower() not in ("http", "https"):
        return None
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc.lower(), parts.path, parts.query, "")
    )


_ABS_HTTP_RE = re.compile(r"^[hH][tT][tT][pP][sS]?://[^/?#]")
_MISS = object()


class _UrlNormalizer:
    """Memoizing :func:`normalize_url` for the warm-parser actors.

    An absolute http(s) href with a nonempty authority resolves
    independently of the base URL (RFC 3986 §5.2.2: when R.scheme and
    R.authority are defined the target is built from R alone), so its
    normalization caches on the href ALONE.  Link targets repeat heavily
    on the web (popular pages), and urljoin/urlsplit dominate the
    extraction stage (~17 µs/href measured, 70% of the actor's time), so
    the cache converts the dominant cost into a dict hit.  Relative
    hrefs take the full urljoin path.  The cache resets at ``max_size``
    entries to bound actor memory (plain dict: hits stay O(1))."""

    def __init__(self, max_size: int = 1_000_000):
        self._cache: dict = {}
        self._max = max_size

    def __call__(self, base: str, href: str) -> str | None:
        if _ABS_HTTP_RE.match(href):
            got = self._cache.get(href, _MISS)
            if got is not _MISS:
                return got
            out = normalize_url(base, href)
            if len(self._cache) >= self._max:
                self._cache.clear()
            self._cache[href] = out
            return out
        return normalize_url(base, href)


def extract_text(html: bytes) -> str:
    """Byte-identical text extraction: first <p> block, entity-unescaped.

    The fixture generator writes html-escaped ``text`` into one <p>; this
    inverse must reproduce ``documents.text`` byte-for-byte (input_hint
    invariant).
    """
    m = _TEXT_RE.search(html)
    if m is None:
        return ""
    return _html.unescape(m.group(1).decode("utf-8"))


class OutlinkExtractor:
    """Actor-pool batch UDF: pages → (src, dst) url-hash edge rows.

    ``ids="hash"`` emits uint64 hash64(url) ids (production path);
    ``ids="doc"`` parses the fixture's /p/{doc_id} path into doc ids
    (oracle-comparable path); ``ids="url"`` keeps the normalized URL
    strings (for host-level aggregation, which parses hosts downstream).
    """

    def __init__(self, ids: str = "hash"):
        self.ids = ids
        self.href_re = _HREF_RE
        self.docid_re = re.compile(r"/p/(\d+)$")
        self.norm = _UrlNormalizer()

    def _doc_id(self, url: str) -> int:
        m = self.docid_re.search(url)
        return int(m.group(1)) if m else -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        src_list: list[str] = []
        dst_list: list[str] = []
        norm = self.norm
        for url, html in zip(urls, htmls):
            seen = set()
            for m in self.href_re.finditer(html):
                href = m.group(1).decode("utf-8", "replace")
                if "&" in href:  # unescape is a no-op otherwise
                    href = _html.unescape(href)
                target = norm(url, href)
                if target is None or target in seen:
                    continue
                seen.add(target)
                src_list.append(url)
                dst_list.append(target)
        if self.ids == "doc":
            src = pa.array([self._doc_id(u) for u in src_list], pa.int64())
            dst = pa.array([self._doc_id(u) for u in dst_list], pa.int64())
        elif self.ids == "url":
            src = pa.array(src_list, pa.string())
            dst = pa.array(dst_list, pa.string())
        else:
            src = pa.array(hash64_array(src_list), pa.uint64())
            dst = pa.array(hash64_array(dst_list), pa.uint64())
        return pa.table({"src": src, "dst": dst})


def extract_edges(
    pages: ray.data.Dataset,
    *,
    ids: str = "hash",
    concurrency: int | tuple = (1, 16),
    batch_size: int = 1024,
    dedup: bool = True,
) -> ray.data.Dataset:
    """pages → deduplicated edge table via the warm-parser actor pool."""
    edges = pages.map_batches(
        OutlinkExtractor,
        fn_constructor_kwargs={"ids": ids},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return dedup_edges(edges) if dedup else edges


class AnchorTextExtractor:
    """Actor-pool batch UDF: pages → (src, dst, anchor) link rows with the
    link's anchor text — the classic web-retrieval signal (anchor corpora
    describe the *target* page).  Per-page dedup is first-wins on the
    normalized target URL, matching :class:`OutlinkExtractor`'s edge set
    exactly: a fragment/case duplicate of an earlier link contributes no
    second row, so anchors biject with extracted edges.

    ``ids="doc"`` parses fixture doc ids (oracle path); ``ids="hash"``
    emits uint64 hash64(url) ids (production path).
    """

    def __init__(self, ids: str = "hash"):
        self.ids = ids
        self.anchor_re = _ANCHOR_RE
        self.docid_re = re.compile(r"/p/(\d+)$")
        self.norm = _UrlNormalizer()

    def _doc_id(self, url: str) -> int:
        m = self.docid_re.search(url)
        return int(m.group(1)) if m else -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        src_list: list[str] = []
        dst_list: list[str] = []
        anchors: list[str] = []
        norm = self.norm
        for url, html in zip(urls, htmls):
            seen = set()
            for m in self.anchor_re.finditer(html):
                href = m.group(1).decode("utf-8", "replace")
                if "&" in href:  # unescape is a no-op otherwise
                    href = _html.unescape(href)
                target = norm(url, href)
                if target is None or target in seen:
                    continue
                seen.add(target)
                src_list.append(url)
                dst_list.append(target)
                anchors.append(
                    _html.unescape(m.group(2).decode("utf-8", "replace")).strip()
                )
        if self.ids == "doc":
            src = pa.array([self._doc_id(u) for u in src_list], pa.int64())
            dst = pa.array([self._doc_id(u) for u in dst_list], pa.int64())
        else:
            src = pa.array(hash64_array(src_list), pa.uint64())
            dst = pa.array(hash64_array(dst_list), pa.uint64())
        return pa.table(
            {"src": src, "dst": dst, "anchor": pa.array(anchors, pa.string())}
        )


def extract_anchors(
    pages: ray.data.Dataset,
    *,
    ids: str = "hash",
    concurrency: int | tuple = (1, 16),
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """pages → (src, dst, anchor) anchor-text link table (no cross-page
    dedup: the same (src, dst) pair appears once per page by construction
    after the per-page first-wins pass)."""
    return pages.map_batches(
        AnchorTextExtractor,
        fn_constructor_kwargs={"ids": ids},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def anchor_summary(anchors: ray.data.Dataset) -> ray.data.Dataset:
    """(dst, top_anchor, n_links): the most common anchor text pointing at
    each target (ties broken lexicographically) and the target's total
    in-link count — the anchor-corpus aggregation retrieval systems build
    per document.  Shape: per-batch (dst, anchor) count combiner → one hash
    exchange on (dst, anchor) → re-partition by dst → vectorized per-group
    argmax (lexsort + first-hit), no Python loop over targets.
    """
    import ray as _ray

    from networkit_ray.common.exchange import (
        _default_parts,
        exchange_unique,
        partition_refs,
    )

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "dst": t["dst"],
                "anchor": t["anchor"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tt.group_by(["dst", "anchor"]).aggregate([("n", "sum")])
        return g.rename_columns(["dst", "anchor", "n"])

    counts = exchange_unique(
        anchors.map_batches(partial, batch_format="pyarrow"),
        ["dst", "anchor"],
        agg=[("n", "sum")],
    )
    P = _default_parts()
    slices = partition_refs(counts, ["dst"], P)
    out = [_top_anchor_part.remote(*[s[p] for s in slices]) for p in range(P)]
    keep = [
        r for r, ok in zip(out, _ray.get([_ch_nonnull.remote(t) for t in out])) if ok
    ]
    if not keep:
        schema = pa.schema(
            [("dst", pa.int64()), ("top_anchor", pa.string()), ("n_links", pa.int64())]
        )
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(keep)


@ray.remote
def _top_anchor_part(*tables) -> pa.Table | None:
    ts = [t for t in tables if t is not None and len(t)]
    if not ts:
        return None
    t = pa.concat_tables(ts)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    # fixed-width unicode (np.lexsort does not take object arrays)
    anchor = np.asarray(t["anchor"].to_pylist(), dtype=str)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((anchor, -n, dst))
    dst, anchor, n = dst[order], anchor[order], n[order]
    first = np.empty(len(dst), dtype=bool)
    first[0] = True
    first[1:] = dst[1:] != dst[:-1]
    tot = np.add.reduceat(n, np.flatnonzero(first))
    return pa.table(
        {
            "dst": pa.array(dst[first]),
            "top_anchor": pa.array(list(anchor[first]), pa.string()),
            "n_links": pa.array(tot),
        }
    )


class TextExtractor:
    """Actor-pool batch UDF: pages → (url, text) with byte-identical text."""

    def __init__(self):
        self.text_re = _TEXT_RE
        self.docid_re = re.compile(r"/p/(\d+)$")

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts = [extract_text(h) for h in htmls]
        doc_ids = [int(self.docid_re.search(u).group(1)) for u in urls]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )


def extract_texts(
    pages: ray.data.Dataset, *, concurrency: int | tuple = (1, 16), batch_size: int = 1024
) -> ray.data.Dataset:
    return pages.map_batches(
        TextExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def host_stats(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(host, n_pages, total_chars) — per-host corpus statistics.

    The host is parsed from the ``url`` column with vectorized Arrow
    string kernels (scheme://HOST/...), then aggregated with a per-batch
    combiner and one task-exchange groupby — the standard first look at a
    Common-Crawl snapshot (host skew drives partition and politeness
    decisions downstream).
    """
    import pyarrow.compute as pc

    from networkit_ray.common.exchange import exchange_unique

    def partial(t: pa.Table) -> pa.Table:
        host = pc.list_element(pc.split_pattern(t["url"], "/"), 2)
        tt = pa.table(
            {
                "host": host,
                "n_pages": pa.array(np.ones(t.num_rows, np.int64)),
                "total_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )
        g = tt.group_by(["host"]).aggregate(
            [("n_pages", "sum"), ("total_chars", "sum")]
        )
        return pa.table(
            {
                "host": g["host"],
                "n_pages": g["n_pages_sum"],
                "total_chars": g["total_chars_sum"],
            }
        )

    out = exchange_unique(
        pages.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        agg=[("n_pages", "sum"), ("total_chars", "sum")],
        schema=pa.schema(
            [("host", pa.string()), ("n_pages", pa.int64()), ("total_chars", pa.int64())]
        ),
    )
    return out


def cap_per_host(pages: ray.data.Dataset, k: int) -> ray.data.Dataset:
    """(doc_id, host) keeping at most ``k`` pages per host (smallest doc_id
    first) — domain balancing: web corpora are host-skewed, and training
    mixes cap any single domain's contribution.  One hash exchange on host,
    then a vectorized within-host rank filter per partition.
    """
    import ray as _ray
    import pyarrow.compute as pc

    from networkit_ray.common.exchange import partition_refs, _default_parts

    def key_rows(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["url"], "/")
        host = pc.list_element(parts, 2)
        # fixture urls are scheme://host/p/{doc_id}: segment 4 is the id
        # (Arrow list_element rejects negative indices)
        ids = pc.cast(pc.list_element(parts, 4), pa.int64())
        return pa.table({"host": host, "doc_id": ids})

    rows = pages.map_batches(key_rows, batch_format="pyarrow")
    P = _default_parts()
    slices = partition_refs(rows, ["host"], P)
    out = [_cap_host_part.remote(k, *[s[p] for s in slices]) for p in range(P)]
    schema = pa.schema([("doc_id", pa.int64()), ("host", pa.string())])
    keep = [
        r for r, ok in zip(out, _ray.get([_ch_nonnull.remote(t) for t in out])) if ok
    ]
    if not keep:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(keep)


@ray.remote
def _ch_nonnull(t) -> bool:
    return t is not None


@ray.remote
def _cap_host_part(k: int, *tables) -> pa.Table | None:
    import pandas as pd  # noqa: F401  (hash_array path in exchange only)

    ts = [t for t in tables if t is not None and len(t)]
    if not ts:
        return None
    t = pa.concat_tables(ts)
    host = t["host"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.lexsort((ids, host))
    host, ids = host[o], ids[o]
    new = np.empty(len(ids), dtype=bool)
    new[0] = True
    new[1:] = host[1:] != host[:-1]
    rank = np.arange(len(ids)) - np.flatnonzero(new)[np.cumsum(new) - 1]
    keep = rank < k
    if not keep.any():
        return None
    return pa.table(
        {"doc_id": pa.array(ids[keep]), "host": pa.array(host[keep])}
    )
