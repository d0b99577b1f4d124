"""PII redaction — the standard pre-training scrub pass (actor pool).

Large-scale training-data pipelines redact personally identifying
strings (emails, phone numbers, IP addresses) before anything else sees
the text.  This stage is a warm-regex actor pool: patterns compile once
per actor in ``__init__`` (SURVEY.md §2.3 stateful-stage shape), each
batch is redacted with pandas' vectorized ``str.replace`` (C-level loop
per pattern, no per-row Python), and the per-document match count rides
along as ``n_redactions`` so downstream filters can drop PII-dense
documents.

The default patterns deliberately use only constructs whose semantics
are identical between Python ``re`` and RE2 (character classes, bounded
repetition, ``\\b``, greedy matching, left-to-right non-overlapping
replacement) so the DuckDB ``regexp_replace(..., 'g')`` twin is exact.
Patterns apply in list order on the running text — order is part of the
contract.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

# (name, pattern, replacement) — RE2/re-identical constructs only
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+1-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


class PiiRedactor:
    """Actor-pool batch UDF: (doc_id, text) → (doc_id, clean_text,
    n_redactions)."""

    def __init__(self, patterns: list[tuple[str, str, str]] | None = None):
        import re

        self.pats = [
            (re.compile(p), r) for _, p, r in (patterns or DEFAULT_PATTERNS)
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().astype(str)
        n = pd.Series(0, index=s.index, dtype="int64")
        for pat, rep in self.pats:
            n = n + s.str.count(pat)
            s = s.str.replace(pat, rep, regex=True)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_text": pa.array(s, pa.string()),
                "n_redactions": pa.array(n.to_numpy(), pa.int64()),
            }
        )


def redact_pii(
    docs: ray.data.Dataset,
    *,
    patterns: list[tuple[str, str, str]] | None = None,
    concurrency: int | tuple = (1, 16),
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """(doc_id, text) → (doc_id, clean_text, n_redactions)."""
    return docs.map_batches(
        PiiRedactor,
        fn_constructor_kwargs={"patterns": patterns},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
