"""Redirect-chain canonicalization by pointer doubling.

Every crawl pipeline must map each URL to its canonical target by following
HTTP-redirect chains, with a bounded hop budget (crawlers cap depth — a
chain that hasn't terminated after ``max_hops`` is treated as unresolved,
which also neutralizes redirect cycles).  The reference's closest kernel is
the pointer-jumping half of its connected-components family
(components/ParallelConnectedComponents.cpp:1 label shortcutting); here the
same doubling trick runs on an arbitrary successor mapping.

    f(v)      = target(v) if v redirects else v   (non-redirects are fixpoints)
    f^(2k)    = f^k ∘ f^k                         (one exchange join per doubling)

so ``ceil(log2(max_hops))`` joins give the hop-capped fixpoint — at web
scale 3 rounds replace 8 sequential chain-following passes, and each round
is one hash exchange on (v, next) tables, never a driver-side walk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.common.exchange import exchange_join

# Deterministic synthetic redirect rule shared with the SQL twin:
# doc_id % 7 == 3 redirects to (doc_id * 3 + 11) % N.
REDIRECT_MOD = 7
REDIRECT_RESIDUE = 3
REDIRECT_MULT = 3
REDIRECT_ADD = 11


def synthetic_redirects(sf_dir: str) -> tuple[ray.data.Dataset, int]:
    """(v, target) redirect mapping derived from the documents table by the
    fixed arithmetic rule (chains and the occasional cycle arise naturally
    because a target may itself redirect)."""
    from networkit_ray.web.htmlgen import num_documents

    n = num_documents(sf_dir)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def rule(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = v[v % REDIRECT_MOD == REDIRECT_RESIDUE]
        return pa.table(
            {
                "v": pa.array(v),
                "target": pa.array((v * REDIRECT_MULT + REDIRECT_ADD) % n),
            }
        )

    return docs.map_batches(rule, batch_format="pyarrow"), n


def resolve_chains(
    universe: ray.data.Dataset,
    mapping: ray.data.Dataset,
    *,
    max_hops: int = 8,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(src, final, resolved) hop-capped chain resolution.

    ``universe`` is a (v) table of all ids; ``mapping`` a (v, target)
    successor table (ids absent from it are fixpoints).  ``final`` is the
    state after ``max_hops`` steps; ``resolved`` = 1 iff final is not
    itself a mapping source (chains longer than the budget and cycles
    report 0).
    """
    # f0: (v, nxt) over the universe — left outer join against the mapping.
    f = exchange_join(
        universe,
        mapping.map_batches(
            lambda t: pa.table({"mv": t["v"], "mtarget": t["target"]}),
            batch_format="pyarrow",
        ),
        left_on=["v"],
        right_on=["mv"],
        join_type="left outer",
        num_parts=num_parts,
    )

    def seed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        if "mtarget" in t.column_names:  # empty-right partitions lack it
            tgt = pc.fill_null(
                t["mtarget"].combine_chunks().cast(pa.int64()), -1
            ).to_numpy(zero_copy_only=False)
            nxt = np.where(tgt < 0, v, tgt)
        else:
            nxt = v
        return pa.table({"v": pa.array(v), "nxt": pa.array(nxt)})

    f = f.map_batches(seed, batch_format="pyarrow")

    rounds = max(1, int(np.ceil(np.log2(max_hops))))
    for _ in range(rounds):
        g = f.map_batches(
            lambda t: pa.table({"gv": t["v"], "gnxt": t["nxt"]}),
            batch_format="pyarrow",
        )
        j = exchange_join(f, g, left_on=["nxt"], right_on=["gv"], num_parts=num_parts)
        f = j.map_batches(
            lambda t: pa.table({"v": t["v"], "nxt": t["gnxt"]}),
            batch_format="pyarrow",
        )

    # the right KEY column is coalesced away by the Arrow join, so carry an
    # explicit payload flag to detect matches
    out = exchange_join(
        f,
        mapping.map_batches(
            lambda t: pa.table(
                {"mv": t["v"], "is_src": pa.array(np.ones(len(t), np.int64))}
            ),
            batch_format="pyarrow",
        ),
        left_on=["nxt"],
        right_on=["mv"],
        join_type="left outer",
        num_parts=num_parts,
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        nxt = t["nxt"].to_numpy(zero_copy_only=False).astype(np.int64)
        if "is_src" in t.column_names:
            flag = pc.fill_null(
                t["is_src"].combine_chunks().cast(pa.int64()), 0
            ).to_numpy(zero_copy_only=False)
            resolved = (flag == 0).astype(np.int64)
        else:
            resolved = np.ones(len(v), np.int64)
        return pa.table(
            {
                "src_doc": pa.array(v),
                "final_doc": pa.array(nxt),
                "resolved": pa.array(resolved),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
