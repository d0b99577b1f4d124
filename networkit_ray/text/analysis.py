"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over the ``documents``
table (doc_id, text, lang, source, n_chars).  Where a DuckDB-exact SQL
equivalent exists the semantics are pinned to it (ASCII word classes, not
Python's unicode ``\\w``), so the oracle comparison is bit-exact:

- :func:`token_counts` — whitespace tokens + a BPE-ish regex token count;
- :func:`quality_scores` — length / punctuation / alpha-ratio heuristics;
- :func:`fingerprints` — md5 content fingerprint (matches DuckDB ``md5``)
  plus a 64-bit rolling hash;
- :class:`LangId` — actor-pool n-gram/stopword language classifier
  (stateful: stopword tables + compiled regexes built once per actor).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_BPEISH_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
_PUNCT_RE = re.compile(r"[.!?]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WS_RE = re.compile(r"\s+")

# ---- byte-level character-class machinery -------------------------------
# token_counts / quality_scores count ASCII character classes; those are
# exact on the raw UTF-8 byte buffer (a class byte can never be a UTF-8
# continuation byte), so instead of per-doc Python regex loops we run one
# numpy lookup + cumsum pass over the batch's concatenated string buffer.
# Whitespace is RE2's \s == [\t\n\f\r ] — the semantics of the DuckDB
# oracle twins (string_split_regex / regexp_extract_all are RE2 too).
_LUT_WORD = np.zeros(256, np.uint8)
_LUT_WORD[np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_",
    np.uint8)] = 1
_LUT_ALPHA = np.zeros(256, np.uint8)
_LUT_ALPHA[np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz", np.uint8)] = 1
_LUT_SENT = np.zeros(256, np.uint8)
_LUT_SENT[np.frombuffer(b".!?", np.uint8)] = 1
_LUT_SPACE = np.zeros(256, np.uint8)
_LUT_SPACE[[9, 10, 12, 13, 32]] = 1
_IS_CONT = np.zeros(256, np.uint8)  # UTF-8 continuation bytes 0x80..0xBF
_IS_CONT[0x80:0xC0] = 1
_LUT_CODEPOINT = 1 - _IS_CONT  # one per code point == utf8 length
_LUT_NONSPACE = 1 - _LUT_SPACE
# single chars matching [^A-Za-z0-9_\s]: code-point leads that are neither
# word nor space (multi-byte leads 0xC0+ are non-word non-space → counted
# once per character, continuation bytes excluded)
_LUT_BPE_SINGLE = _LUT_CODEPOINT * (1 - _LUT_WORD) * (1 - _LUT_SPACE)


def _utf8_view(txt) -> tuple[np.ndarray, np.ndarray]:
    """String column → (uint8 byte view, int64 offsets of len n+1).

    Zero-copy views of the Arrow buffers; nulls count as empty strings.
    """
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    if txt.null_count:
        import pyarrow.compute as pc

        txt = pc.fill_null(txt, "")
    odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
    offs = np.frombuffer(txt.buffers()[1], dtype=odt)
    offs = offs[txt.offset : txt.offset + len(txt) + 1].astype(np.int64)
    buf = txt.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None
        else np.zeros(0, np.uint8)
    )
    return data, offs


def _seg_sums(x: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-document sums of ``x[offs[i]:offs[i+1]]`` (uint8 input).

    ``np.add.reduceat`` after one int64 cast — ~25× faster than a
    uint8→int64 ``np.cumsum`` (numpy's casting-accumulate path is slow).
    Empty documents (including trailing ones, whose index would be out of
    range for reduceat) are masked to 0.
    """
    n = len(offs) - 1
    end = int(offs[-1])
    if n == 0 or end == int(offs[0]):
        return np.zeros(n, np.int64)
    # one-zero sentinel pad keeps every offset (including offs==end for
    # trailing empty docs) a valid reduceat index without clipping — a
    # clipped index would silently truncate the preceding segment
    xi = np.empty(end + 1, np.int64)
    xi[:end] = x[:end]
    xi[end] = 0
    raw = np.add.reduceat(xi, offs[:-1])
    return np.where(np.diff(offs) > 0, raw, 0)


def _class_counts(data: np.ndarray, offs: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Per-document count of bytes whose class LUT entry is 1."""
    return _seg_sums(lut[data], offs)


def _run_counts(data: np.ndarray, offs: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Per-document count of maximal runs of class bytes (doc-bounded)."""
    m = lut[data]
    starts = m.copy()
    starts[1:] &= 1 - m[:-1]
    cnt = _seg_sums(starts, offs)
    # a run crossing a document boundary still starts a run in the later
    # doc: re-add heads whose global predecessor byte is also in-class
    head = offs[:-1]
    nonempty = head < offs[1:]
    h = head[nonempty]
    fix = (h > 0) & (m[h] > 0) & (m[np.maximum(h - 1, 0)] > 0)
    cnt[nonempty] += fix
    return cnt


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_bpeish) token counts.

    n_tokens = whitespace-delimited tokens of trimmed text (0 for blank);
    n_bpeish = ASCII-word-or-single-punct tokens, a proxy for BPE token
    count without a tokenizer dependency.
    """

    def f(t: pa.Table) -> pa.Table:
        # n_tokens == number of \S+ runs (identical to split-trimmed-on-\s+,
        # including 0 for blank); n_bpeish == word runs + lone non-word
        # non-space chars — all per-doc byte-class passes, no Python loop
        data, offs = _utf8_view(t["text"])
        n_tok = _run_counts(data, offs, _LUT_NONSPACE)
        n_bpe = _run_counts(data, offs, _LUT_WORD) + _class_counts(
            data, offs, _LUT_BPE_SINGLE
        )
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pa.array(n_tok), "n_bpeish": pa.array(n_bpe)}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def quality_scores(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_chars, n_words, n_sentences, alpha_ratio, mean_word_len).

    Heuristic quality features of a web-scale filter stage; ratios rounded to
    6 decimals half-away (DuckDB ROUND semantics).
    """
    from networkit_ray.common.hashing import round_half_away

    def f(t: pa.Table) -> pa.Table:
        data, offs = _utf8_view(t["text"])
        n_chars = _class_counts(data, offs, _LUT_CODEPOINT)  # == utf8 length
        n_words = _run_counts(data, offs, _LUT_WORD)
        n_sent = _class_counts(data, offs, _LUT_SENT)
        n_alpha = _class_counts(data, offs, _LUT_ALPHA)
        alpha_ratio = round_half_away(
            n_alpha / np.maximum(n_chars, 1), 6
        )
        # total word chars == sum of word-run lengths (single-char class)
        wlen = _class_counts(data, offs, _LUT_WORD)
        mean_wl = round_half_away(wlen / np.maximum(n_words, 1), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars),
                "n_words": pa.array(n_words),
                "n_sentences": pa.array(n_sent),
                "alpha_ratio": pa.array(alpha_ratio),
                "mean_word_len": pa.array(mean_wl),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def repetition_scores(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, dup_word_frac, dup_3gram_frac) — Gopher-style within-document
    repetition filters (Rae et al. 2021 §A1.1, public method): the fraction
    of duplicate word tokens and of duplicate word 3-grams per document.
    Complements the cross-document dedup family (dedup/): these rules drop
    degenerate pages (boilerplate loops, keyword stuffing) before corpus
    dedup ever runs.

    Fully vectorized: one Arrow tokenization + siphash per batch
    (dedup/tokenize.py), per-doc distinct counting via one lexsort over
    (doc, hash) — no Python loop over tokens.  Token semantics match
    ``regexp_extract_all(lower(text), '[a-z0-9_]+')`` so the DuckDB twin
    is exact (hash collisions would need ~2^32 distinct tokens per doc).
    Documents with no tokens (resp. < 3 tokens) score 0.
    """
    from networkit_ray.common.hashing import round_half_away
    from networkit_ray.dedup.tokenize import _GOLD, _splitmix, token_hashes

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        h, counts = token_hashes(t["text"])
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)

        def distinct_per_doc(vals: np.ndarray, docs_of: np.ndarray) -> np.ndarray:
            if not len(vals):
                return np.zeros(n, np.int64)
            o = np.lexsort((vals, docs_of))
            v, d = vals[o], docs_of[o]
            new = np.empty(len(v), dtype=bool)
            new[0] = True
            new[1:] = (v[1:] != v[:-1]) | (d[1:] != d[:-1])
            return np.bincount(d, weights=new, minlength=n).astype(np.int64)

        ndist = distinct_per_doc(h, doc_idx)
        dup_word = np.where(counts > 0, 1.0 - ndist / np.maximum(counts, 1), 0.0)

        n3 = np.maximum(counts - 2, 0)
        if len(h) >= 3:
            g = (h[:-2] * _GOLD) ^ h[1:-1]
            g = _splitmix((g * _GOLD) ^ h[2:])
            valid = doc_idx[:-2] == doc_idx[2:]  # gram stays within one doc
            ndist3 = distinct_per_doc(g[valid], doc_idx[:-2][valid])
        else:
            ndist3 = np.zeros(n, np.int64)
        dup_3 = np.where(n3 > 0, 1.0 - ndist3 / np.maximum(n3, 1), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "dup_word_frac": pa.array(round_half_away(dup_word, 6)),
                "dup_3gram_frac": pa.array(round_half_away(dup_3, 6)),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


# Gopher document-filter thresholds (Rae et al. 2021 §A1.1, public method).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2


def gopher_filter(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, keep, fail_flags) — composite Gopher quality filter.

    One pass per batch applying the public Gopher rules; ``fail_flags`` is a
    bitmask (bit set = rule failed):

        bit 0  word count outside [50, 100000]
        bit 1  mean word length outside [3, 10]
        bit 2  symbol-to-word ratio ('#' or '…') > 0.1
        bit 3  > 90% of lines start with a bullet (-, *, •)
        bit 4  > 30% of lines end with an ellipsis (... or …)
        bit 5  < 80% of words contain an alphabetic character
        bit 6  < 2 distinct stop words of a fixed 8-word list

    ``keep`` = 1 iff no rule fails.  Ratio comparisons use raw int/int
    doubles so the DuckDB twin compares bit-identical values.  Repetition
    rules live in :func:`repetition_scores` (they need the hashing pass);
    compose downstream when both families are wanted.
    """

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        flags = np.zeros(n, np.int64)
        for i, s in enumerate(texts):
            words = _WORD_RE.findall(s)
            nw = len(words)
            fl = 0
            if nw < GOPHER_MIN_WORDS or nw > GOPHER_MAX_WORDS:
                fl |= 1
            mean_wl = sum(len(w) for w in words) / max(nw, 1)
            if mean_wl < GOPHER_MIN_MEAN_WL or mean_wl > GOPHER_MAX_MEAN_WL:
                fl |= 2
            n_sym = s.count("#") + s.count("…")
            if n_sym / max(nw, 1) > GOPHER_MAX_SYMBOL_RATIO:
                fl |= 4
            lines = s.split("\n")
            n_bullet = sum(1 for l in lines if l.startswith(("-", "*", "•")))
            if n_bullet / max(len(lines), 1) > GOPHER_MAX_BULLET_FRAC:
                fl |= 8
            n_ell = sum(1 for l in lines if l.endswith(("...", "…")))
            if n_ell / max(len(lines), 1) > GOPHER_MAX_ELLIPSIS_FRAC:
                fl |= 16
            n_alpha = sum(1 for w in words if _ALPHA_RE.search(w))
            if n_alpha / max(nw, 1) < GOPHER_MIN_ALPHA_WORD_FRAC:
                fl |= 32
            lowered = {w.lower() for w in words}
            n_stop = sum(1 for sw in GOPHER_STOPWORDS if sw in lowered)
            if n_stop < GOPHER_MIN_STOPWORDS:
                fl |= 64
            flags[i] = fl
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "keep": pa.array((flags == 0).astype(np.int64)),
                "fail_flags": pa.array(flags),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def document_frequency(
    docs: ray.data.Dataset, *, min_df: int = 5
) -> ray.data.Dataset:
    """(term, df) corpus document frequencies — the statistics half of an
    inverted index (postings-list sizes), the input every TF-IDF / BM25 /
    stop-list stage needs.

    Fully vectorized: Arrow lower+split per batch, list_parent_indices for
    the (term, doc) pairs, an in-batch distinct+count combiner, then ONE
    term-keyed exchange summing partial dfs — the per-term shuffle volume
    is the distinct-term count per batch, never the token stream.  Token
    rule matches ``string_split_regex(lower(text), '[^a-z0-9_]+')`` so the
    DuckDB twin is exact.
    """
    import pyarrow.compute as pc

    from networkit_ray.common.exchange import exchange_unique

    def partial(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t["text"].combine_chunks())
        toks = pc.split_pattern_regex(lower, "[^a-z0-9_]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        doc = pc.take(t["doc_id"].combine_chunks(), parent)
        tt = pa.table({"term": flat, "doc_id": doc}).filter(
            pc.not_equal(flat, "")
        )
        d = tt.group_by(["term", "doc_id"]).aggregate([])  # distinct pairs
        d = d.append_column("df", pa.array(np.ones(len(d), np.int64)))
        g = d.select(["term", "df"]).group_by(["term"]).aggregate([("df", "sum")])
        return g.rename_columns(["term", "df"])

    parts = docs.map_batches(partial, batch_format="pyarrow")
    out = exchange_unique(
        parts,
        ["term"],
        agg=[("df", "sum")],
        schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], min_df)),
        batch_format="pyarrow",
    )


def bm25_topk(
    docs: ray.data.Dataset,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> ray.data.Dataset:
    """(doc_id, score) top-k BM25 (Robertson/Sparck Jones) for a fixed
    query-term set — the retrieval-scoring consumer of
    :func:`document_frequency`.

        idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
        score(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Two passes: a tiny per-batch stats partial (N, Σdl, per-term df) summed
    dataset-side and broadcast into the scoring closure, then one
    vectorized scoring pass (per-term token-mask bincounts, no Python loop
    over tokens).  Arithmetic mirrors the DuckDB twin operation-for-
    operation so rounded scores compare exactly; ties sort (score desc,
    doc_id asc).
    """
    import pyarrow.compute as pc

    from networkit_ray.common.hashing import round_half_away

    terms = list(query_terms)

    def _tok(t: pa.Table):
        lower = pc.utf8_lower(t["text"].combine_chunks())
        toks = pc.split_pattern_regex(lower, "[^a-z0-9_]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat.to_numpy(zero_copy_only=False), parent, keep

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, parent, keep = _tok(t)
        n = t.num_rows
        dl = np.bincount(parent[keep], minlength=n)
        dfs = [
            int(
                (np.bincount(parent[keep & (flat == term)], minlength=n) > 0).sum()
            )
            for term in terms
        ]
        cols = {
            "n_docs": pa.array([n], pa.int64()),
            "total_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        for i, d in enumerate(dfs):
            cols[f"df_{i}"] = pa.array([d], pa.int64())
        return pa.table(cols)

    agg = docs.map_batches(stats_partial, batch_format="pyarrow").sum(
        ["n_docs", "total_dl"] + [f"df_{i}" for i in range(len(terms))]
    )
    n_total = int(agg["sum(n_docs)"])
    avgdl = int(agg["sum(total_dl)"]) / n_total
    dfs = np.array([int(agg[f"sum(df_{i})"]) for i in range(len(terms))], np.float64)
    idf = np.log((n_total - dfs + 0.5) / (dfs + 0.5) + 1.0)

    def score(t: pa.Table) -> pa.Table:
        flat, parent, keep = _tok(t)
        n = t.num_rows
        dl = np.bincount(parent[keep], minlength=n).astype(np.float64)
        total = np.zeros(n, np.float64)
        for i, term in enumerate(terms):
            tf = np.bincount(parent[keep & (flat == term)], minlength=n).astype(
                np.float64
            )
            total += idf[i] * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
        m = total > 0
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().filter(pa.array(m)),
                "score": pa.array(round_half_away(total[m], 8)),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, md5, rhash64): md5 hex fingerprint (= DuckDB md5(text)) and a
    64-bit polynomial rolling hash of the whole text (engine-internal key)."""

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
        rh = np.empty(len(texts), dtype=np.uint64)
        MASK = (1 << 64) - 1
        for i, s in enumerate(texts):
            h = 1469598103934665603
            for b in s.encode("utf-8"):
                h = (h * 1000003 + b) & MASK
            rh[i] = h
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "md5": pa.array(md5s, pa.string()),
                "rhash64": pa.array(rh.astype(np.int64)),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with", "was", "on", "as", "are", "this", "by", "be", "at", "have", "not", "from"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein", "eine", "nicht", "den", "dem", "des", "zu", "im", "sich", "auch", "werden", "aus", "bei"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans", "que", "pas", "des", "du", "en", "au", "aux", "ce", "qui", "sur", "se", "plus"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una", "es", "no", "por", "con", "para", "su", "se", "del", "al", "como", "más", "pero"},
    "it": {"il", "la", "le", "e", "di", "che", "in", "un", "una", "è", "non", "per", "con", "del", "della", "si", "sono", "come", "anche", "questo", "dei", "più"},
    "pt": {"o", "a", "os", "as", "e", "de", "que", "em", "um", "uma", "é", "não", "por", "com", "para", "do", "da", "dos", "das", "se", "mais", "como"},
    "nl": {"de", "het", "een", "en", "van", "is", "in", "dat", "op", "te", "met", "voor", "zijn", "niet", "aan", "er", "ook", "maar", "als", "bij", "door", "naar"},
    "sv": {"och", "att", "det", "som", "en", "på", "är", "av", "för", "med", "den", "till", "inte", "om", "har", "de", "ett", "han", "men", "var", "sig", "från"},
}


class LangId:
    """Actor-pool language classifier: per-language stopword hit-rate.

    Stateful stage (SURVEY.md §2.3): stopword tables and the tokenizer regex
    are built once per actor.  Heuristic n-gram-free classifier over 8
    European languages; scoring = hit fraction with a deterministic
    (score, -table-specificity, lang) tie-break; 'und' when nothing matches.
    Languages that share function words (pt/es, nl/de) are disambiguated by
    the words unique to each table.
    """

    def __init__(self):
        self.word_re = re.compile(r"[a-zà-öø-ÿœ']+")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = []
        for s in texts:
            toks = self.word_re.findall(s.lower())
            if not toks:
                out.append("und")
                continue
            scores = {
                lang: sum(tk in tbl for tk in toks) for lang, tbl in self.tables.items()
            }
            best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            out.append(best[0] if best[1] > 0 else "und")
        return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(out, pa.string())})


def langid(docs: ray.data.Dataset, *, concurrency=(1, 4)) -> ray.data.Dataset:
    return docs.map_batches(
        LangId, batch_format="pyarrow", batch_size=2048, concurrency=concurrency
    )


def lang_histogram(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n_docs) — groupby aggregate over the declared lang column."""
    from ray.data.aggregate import Count

    return docs.groupby("lang").aggregate(Count(alias_name="n_docs"))


def token_count_percentiles(
    docs: ray.data.Dataset, qs: tuple = (0.5, 0.9, 0.99)
) -> ray.data.Dataset:
    """(lang, p50, p90, p99) EXACT discrete token-count percentiles.

    Distributed exact quantiles without a sort: per-batch (lang, n_tokens)
    histogram partials collapse in one groupby (distinct token counts are
    bounded, so the aggregated table is tiny regardless of corpus size),
    then each language's percentile reads the cumulative histogram —
    nearest-rank semantics (value at 1-based rank ⌈q·n⌉), matching
    DuckDB/PostgreSQL ``quantile_disc``/``percentile_disc`` exactly.
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tok = np.fromiter(
            (0 if not s.strip() else len(_WS_RE.split(s.strip())) for s in texts),
            np.int64,
            len(texts),
        )
        return pa.table({"lang": t["lang"], "n_tokens": pa.array(n_tok)})

    hist = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_tokens"])
        .count()
    )

    def pcts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_tokens")
        vals = df["n_tokens"].to_numpy()
        cnt = df["count()"].to_numpy()
        cum = np.cumsum(cnt)
        n = cum[-1]
        out = {"lang": [df["lang"].iloc[0]]}
        for q, name in zip(qs, ("p50", "p90", "p99")):
            rank = max(1, int(np.ceil(q * n - 1e-9)))
            out[name] = [int(vals[np.searchsorted(cum, rank)])]
        return pd.DataFrame(out)

    return hist.groupby("lang").map_groups(pcts, batch_format="pandas")


_TFIDF_RE = re.compile(r"[a-z0-9]+")


@ray.remote
def _tfidf_topk_part(k: int, *tables) -> "pa.Table | None":
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    term = np.asarray(t["term"].to_pylist(), dtype=object)
    s = t["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((term, -s, doc))
    doc, term, s = doc[order], term[order], s[order]
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    sizes = np.diff(np.r_[starts, len(doc)])
    rank = np.arange(len(doc)) - np.repeat(starts, sizes) + 1
    keep = rank <= k
    return pa.table(
        {
            "doc_id": pa.array(doc[keep]),
            "term": pa.array(term[keep].tolist(), pa.string()),
            "score": pa.array(s[keep]),
        }
    )


def tfidf_top_terms(
    docs: ray.data.Dataset, n_docs: int, *, k: int = 3
) -> ray.data.Dataset:
    """(doc_id, term, score) — top-k TF-IDF terms per document.

    Normative semantics (mirrored by the DuckDB twin): tokens are
    ``[a-z0-9]+`` runs of lower(text); tf = in-document count; df =
    number of documents containing the term; score = tf · ln(N/df);
    top-k by (score DESC, term ASC).

    Scale shape: per-batch explode+count partials, one (doc,term)
    groupby, one term-keyed df join (vocabulary-sized, not corpus-
    sized), one doc-keyed exchange for the per-document top-k rank.
    """
    import pandas as pd

    from networkit_ray.common.exchange import _nonnull, exchange_join, partition_refs

    def explode(t: pa.Table) -> pa.Table:
        ids, terms = [], []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _TFIDF_RE.findall(s.lower())
            ids.extend([d] * len(toks))
            terms.extend(toks)
        tt = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "term": pa.array(terms, pa.string())}
        )
        return tt.group_by(["doc_id", "term"]).aggregate([([], "count_all")]).rename_columns(
            ["doc_id", "term", "tf"]
        )

    tf = (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby(["doc_id", "term"])
        .sum("tf")
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "term", "tf"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    df = tf.groupby("term").count().map_batches(
        lambda t: t.rename_columns(["term", "df"]), batch_format="pyarrow"
    )
    j = exchange_join(tf, df, left_on=["term"])

    def score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "term": t["term"],
                "score": pa.array(tfv * np.log(n_docs / dfv)),
            }
        )

    scored = j.map_batches(score, batch_format="pyarrow")
    slices = partition_refs(scored, ["doc_id"], 16)
    parts = [
        _tfidf_topk_part.remote(k, *[s[p] for s in slices])
        for p in range(len(slices[0]))
    ]
    keep = [r for r, ok in zip(parts, ray.get([_nonnull.remote(x) for x in parts])) if ok]
    return ray.data.from_arrow_refs(keep)


def normalize_text(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, norm) byte-deterministic text normalization.

    The standard web-text cleaning prefix before dedup / shingling:
    lowercase → collapse all whitespace runs to one space → strip.  Every
    step is a whole-batch Arrow kernel, and each has an exact DuckDB
    equivalent (LOWER / REGEXP_REPLACE / TRIM), so the output is
    byte-identical to the SQL twin — the same invariant the web extractor
    maintains for extracted text per url.
    """
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = t["text"].combine_chunks()
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({"doc_id": t["doc_id"], "norm": s})

    return docs.map_batches(f, batch_format="pyarrow")


def token_shards(
    docs: ray.data.Dataset, budget: int
) -> ray.data.Dataset:
    """(doc_id, n_tokens, shard) — token-budget sharding for training-data
    packing: documents in doc_id order are assigned to shard
    ``floor(tokens_before / budget)``, where tokens_before is the global
    running whitespace-token total of all smaller doc_ids.

    No reference analog (training-pipeline op); SQL-twinned via a window
    cumulative sum.  Distributed form: sort by doc_id, per-block token
    sums → driver-side prefix offsets (one float per block, never the
    rows), then a vectorized per-block cumsum + shard assignment.
    """
    tc = token_counts(docs).select_columns(["doc_id", "n_tokens"]).sort("doc_id")
    mat = tc.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _bsum(t) -> int:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        return int(np.sum(t["n_tokens"].to_numpy(zero_copy_only=False)))

    sums = np.array(ray.get([_bsum.remote(r) for r in refs]), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    @ray.remote
    def _assign(t, off: int) -> pa.Table:
        t = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        before = off + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n),
                "shard": pa.array(before // budget),
            }
        )

    out = [_assign.remote(r, int(offsets[i])) for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out)


def sample_documents(
    docs: ray.data.Dataset, fraction: float, *, seed: int = 42
) -> ray.data.Dataset:
    """Seeded Bernoulli document sample: keep doc iff
    ``(doc_id·2654435761 + seed) mod 2³¹ < fraction·2³¹``.  The coin is
    keyed per document, so every stratum (language, source, …) is sampled
    at the same expected rate with NO shuffle — the scalable form of
    stratified sampling for training-data curation (exact proportional
    allocation would need a per-stratum rank-select).  SQL-twinned."""
    thresh = int(fraction * 2**31)

    def f(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (d * 2654435761 + seed) % 2**31 < thresh
        return t.filter(pa.array(keep))

    return docs.map_batches(f, batch_format="pyarrow")


def lm_cross_entropy(
    docs: ray.data.Dataset,
    train_docs: ray.data.Dataset | None = None,
    *,
    k: float = 1.0,
) -> ray.data.Dataset:
    """(doc_id, n_bigrams, cross_entropy) — bigram-LM quality score.

    The CCNet-style quality filter (no reference analog; training-data
    curation op): train an add-k-smoothed bigram scorer on ``train_docs``
    (default: the scored corpus itself) —
    p(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V) over ``[a-z0-9]+`` tokens of
    lower(text), with V = training CONTEXT-vocabulary size + 1.  Note this
    deviates from textbook Laplace smoothing (whose V is the successor
    vocabulary), so p(·|w₁) does not normalize to exactly 1 — the scores
    are a quasi-likelihood used for RANKING documents, not calibrated
    probabilities (the SQL oracle twin uses the identical formula).  Each
    document scores its per-bigram cross-entropy −Σ ln p / n_bigrams
    (0 for docs with < 2 tokens).  Documents unlike the training corpus
    (gibberish, boilerplate, wrong language) score HIGH.

    Scale shape: one bigram-count groupby (vocabulary²-bounded, corpus-
    frequency-distributed), one context-count groupby, two vocabulary-
    keyed left-outer joins, one per-doc aggregate — no per-row Python
    beyond the tokenizer that every text op here shares.
    """
    from ray.data.aggregate import Count as _Count

    tok_re = re.compile(r"[a-z0-9]+")

    def bigram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_d, out_a, out_b = [], [], []
        for i, s in enumerate(t["text"].to_pylist()):
            ws = tok_re.findall(s.lower())
            for j in range(len(ws) - 1):
                out_d.append(ids[i])
                out_a.append(ws[j])
                out_b.append(ws[j + 1])
        return pa.table(
            {
                "doc_id": pa.array(np.array(out_d, np.int64)),
                "w1": pa.array(out_a, pa.string()),
                "w2": pa.array(out_b, pa.string()),
            }
        )

    grams = docs.select_columns(["doc_id", "text"]).map_batches(
        bigram_rows, batch_format="pyarrow"
    ).materialize()
    train_grams = (
        grams
        if train_docs is None
        else train_docs.select_columns(["doc_id", "text"])
        .map_batches(bigram_rows, batch_format="pyarrow")
        .materialize()
    )
    c12 = (
        train_grams.groupby(["w1", "w2"]).aggregate(_Count(alias_name="c12")).materialize()
    )
    c1 = train_grams.groupby("w1").aggregate(_Count(alias_name="c1")).materialize()
    vocab = float(c1.count() + 1)

    from networkit_ray.common.exchange import exchange_join

    j = exchange_join(grams, c12, left_on=["w1", "w2"], join_type="left outer")
    j = exchange_join(j, c1, left_on=["w1"], join_type="left outer")

    def logp(t: pa.Table) -> pa.Table:
        a = (
            t["c12"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "c12" in t.column_names
            else np.zeros(len(t))
        )
        b = (
            t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "c1" in t.column_names
            else np.zeros(len(t))
        )
        a = np.where(np.isnan(a), 0.0, a)
        b = np.where(np.isnan(b), 0.0, b)
        p = (a + k) / (b + k * vocab)
        return pa.table(
            {"doc_id": t["doc_id"], "nll": pa.array(-np.log(p))}
        )

    from ray.data.aggregate import Sum as _Sum

    per_doc = (
        j.map_batches(logp, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(_Sum("nll", alias_name="nll"), _Count(alias_name="n_bigrams"))
    )
    # docs with < 2 tokens produce no bigram rows: left-outer fill with 0
    all_docs = docs.select_columns(["doc_id"])
    filled = exchange_join(all_docs, per_doc, left_on=["doc_id"], join_type="left outer")

    def final(t: pa.Table) -> pa.Table:
        n = (
            t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "n_bigrams" in t.column_names
            else np.zeros(len(t))
        )
        nll = (
            t["nll"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "nll" in t.column_names
            else np.zeros(len(t))
        )
        n = np.where(np.isnan(n), 0.0, n)
        nll = np.where(np.isnan(nll), 0.0, nll)
        ce = np.where(n > 0, nll / np.maximum(n, 1.0), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(n.astype(np.int64)),
                "cross_entropy": pa.array(ce),
            }
        )

    return filled.map_batches(final, batch_format="pyarrow")
