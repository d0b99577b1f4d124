"""Parallel agglomerative clustering: score → match → contract levels.

Reference: community/ParallelAgglomerativeClusterer.cpp:20-85 — repeat
{ score every edge with the modularity merge gain Δmod(u,v) =
(2W·ω(u,v) − ω(u)·ω(v)) / (2W) (scoring/ModularityScoring.hpp:46),
compute a matching on the scored graph, contract matched pairs
(coarsening/MatchingCoarsening.cpp:17-56, self-loops kept) } until the
level shrinks by ≤0.5% or fewer than 2 nodes remain; the coarsest
vertices are the communities, projected back to the finest graph.

Deviation: the reference uses sequential PathGrowingMatcher; here each
level runs deterministic HANDSHAKE matching rounds (every vertex points
at its best-scoring incident edge, ties → smaller partner; an edge is
matched when both endpoints agree) — the standard parallel
locally-heaviest matching, one exchange + grouped argmax per round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from networkit_ray.common.exchange import _nonnull, exchange_join, partition_refs


@ray.remote
def _best_partner_part(*tables) -> pa.Table | None:
    live = [t for t in tables if t is not None and len(t)]
    if not live:
        return None
    t = pa.concat_tables(live)
    x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = t["partner"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = t["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((p, -s, x))
    x, p = x[order], p[order]
    first = np.r_[True, x[1:] != x[:-1]]
    return pa.table({"x": pa.array(x[first]), "bp": pa.array(p[first])})


def _handshake_matching(
    scored: ray.data.Dataset, *, max_rounds: int = 4, num_parts: int = 16
) -> ray.data.Dataset:
    """(u, v) matched pairs (u < v) from a (u, v, score) edge table."""
    pairs: list[ray.data.Dataset] = []
    edges = scored.materialize()
    for _ in range(max_rounds):
        if edges.count() == 0:
            break
        bi = edges.map_batches(
            lambda t: pa.table(
                {
                    "x": pa.array(
                        np.concatenate(
                            [
                                t["u"].to_numpy(zero_copy_only=False),
                                t["v"].to_numpy(zero_copy_only=False),
                            ]
                        ).astype(np.int64)
                    ),
                    "partner": pa.array(
                        np.concatenate(
                            [
                                t["v"].to_numpy(zero_copy_only=False),
                                t["u"].to_numpy(zero_copy_only=False),
                            ]
                        ).astype(np.int64)
                    ),
                    "score": pa.array(
                        np.concatenate(
                            [
                                t["score"].to_numpy(zero_copy_only=False),
                                t["score"].to_numpy(zero_copy_only=False),
                            ]
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        slices = partition_refs(bi, ["x"], num_parts)
        parts = [
            _best_partner_part.remote(*[s[p] for s in slices])
            for p in range(len(slices[0]))
        ]
        keep = [
            r
            for r, ok in zip(parts, ray.get([_nonnull.remote(p) for p in parts]))
            if ok
        ]
        if not keep:
            break
        best = ray.data.from_arrow_refs(keep).materialize()
        rev = best.map_batches(
            lambda t: pa.table({"bp": t["x"], "bb": t["bp"]}),
            batch_format="pyarrow",
        )
        agreed = exchange_join(best, rev, left_on=["bp"], num_parts=num_parts).map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.equal(t["bb"], t["x"]), pc.less(t["x"], t["bp"])
                )
            ),
            batch_format="pyarrow",
        )
        round_pairs = agreed.map_batches(
            lambda t: pa.table({"u": t["x"], "v": t["bp"]}),
            batch_format="pyarrow",
        ).materialize()
        if round_pairs.count() == 0:
            break
        pairs.append(round_pairs)
        # drop edges incident to matched vertices
        mv = round_pairs.map_batches(
            lambda t: pa.table(
                {
                    "mv": pa.array(
                        np.concatenate(
                            [
                                t["u"].to_numpy(zero_copy_only=False),
                                t["v"].to_numpy(zero_copy_only=False),
                            ]
                        ).astype(np.int64)
                    )
                }
            ),
            batch_format="pyarrow",
        )
        e1 = exchange_join(
            edges,
            mv.map_batches(
                lambda t: pa.table({"u": t["mv"]}), batch_format="pyarrow"
            ),
            left_on=["u"],
            join_type="left anti",
            num_parts=num_parts,
        )
        edges = exchange_join(
            e1,
            mv.map_batches(
                lambda t: pa.table({"v": t["mv"]}), batch_format="pyarrow"
            ),
            left_on=["v"],
            join_type="left anti",
            num_parts=num_parts,
        ).materialize()
    if not pairs:
        return ray.data.from_arrow(
            pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        )
    out = pairs[0]
    for p in pairs[1:]:
        out = out.union(p)
    return out.materialize()


def agglomerative_communities(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    max_levels: int = 30,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """(v, label) communities from matching-based agglomeration.

    label = smallest member id of the coarsest-level group (deterministic).
    """
    P = num_parts or 16

    def with_w(t: pa.Table) -> pa.Table:
        if "w" in t.column_names:
            return pa.table(
                {"u": t["src"], "v": t["dst"], "w": t["w"].cast(pa.float64())}
            )
        return pa.table(
            {
                "u": t["src"],
                "v": t["dst"],
                "w": pa.array(np.ones(len(t), np.float64)),
            }
        )

    edges = canon.map_batches(with_w, batch_format="pyarrow").materialize()
    verts = edges.map_batches(
        lambda t: pa.table(
            {
                "v": pa.array(
                    np.concatenate(
                        [
                            t["u"].to_numpy(zero_copy_only=False),
                            t["v"].to_numpy(zero_copy_only=False),
                        ]
                    ).astype(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
    ).groupby("v").aggregate(Sum("v", alias_name="_s"))
    mapping = verts.map_batches(
        lambda t: pa.table({"v": t["v"], "rep": t["v"]}),
        batch_format="pyarrow",
    ).materialize()

    levels = 0
    for _lvl in range(max_levels):
        # modularity merge-gain scores on the current coarse graph
        tw = edges.aggregate(Sum("w", alias_name="W"))["W"] or 0.0
        if tw <= 0:
            break
        nonself = edges.map_batches(
            lambda t: t.filter(pc.not_equal(t["u"], t["v"])),
            batch_format="pyarrow",
        ).materialize()
        n_cur = (
            nonself.map_batches(
                lambda t: pa.table(
                    {
                        "x": pa.array(
                            np.concatenate(
                                [
                                    t["u"].to_numpy(zero_copy_only=False),
                                    t["v"].to_numpy(zero_copy_only=False),
                                ]
                            ).astype(np.int64)
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("x")
            .aggregate(Sum("x", alias_name="_s"))
            .count()
        )
        if n_cur < 2:
            break
        wdeg = (
            edges.map_batches(
                lambda t: pa.table(
                    {
                        "x": pa.array(
                            np.concatenate(
                                [
                                    t["u"].to_numpy(zero_copy_only=False),
                                    t["v"].to_numpy(zero_copy_only=False),
                                ]
                            ).astype(np.int64)
                        ),
                        "wd": pa.array(
                            np.concatenate(
                                [
                                    t["w"].to_numpy(zero_copy_only=False),
                                    t["w"].to_numpy(zero_copy_only=False),
                                ]
                            )
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("x")
            .aggregate(Sum("wd", alias_name="wd"))
            .materialize()
        )
        j1 = exchange_join(
            nonself,
            wdeg.map_batches(
                lambda t: pa.table({"u": t["x"], "wu": t["wd"]}),
                batch_format="pyarrow",
            ),
            left_on=["u"],
            num_parts=P,
        )
        j2 = exchange_join(
            j1,
            wdeg.map_batches(
                lambda t: pa.table({"v": t["x"], "wv": t["wd"]}),
                batch_format="pyarrow",
            ),
            left_on=["v"],
            num_parts=P,
        )

        def score(t: pa.Table, tw=tw) -> pa.Table:
            w = t["w"].to_numpy(zero_copy_only=False)
            wu = t["wu"].to_numpy(zero_copy_only=False)
            wv = t["wv"].to_numpy(zero_copy_only=False)
            dq = (2.0 * tw * w - wu * wv) / (2.0 * tw)
            return pa.table({"u": t["u"], "v": t["v"], "score": pa.array(dq)})

        matched = _handshake_matching(
            j2.map_batches(score, batch_format="pyarrow"), num_parts=P
        )
        diff = matched.count()
        if diff == 0 or (n_cur - diff) < 2 or diff / n_cur <= 5e-3:
            break
        levels += 1
        # rep(x) = min(u,v) for matched pairs, identity otherwise
        rep = matched.map_batches(
            lambda t: pa.table(
                {
                    "old": pa.array(
                        np.concatenate(
                            [
                                t["u"].to_numpy(zero_copy_only=False),
                                t["v"].to_numpy(zero_copy_only=False),
                            ]
                        ).astype(np.int64)
                    ),
                    "new": pa.array(
                        np.concatenate(
                            [
                                np.minimum(
                                    t["u"].to_numpy(zero_copy_only=False),
                                    t["v"].to_numpy(zero_copy_only=False),
                                ),
                                np.minimum(
                                    t["u"].to_numpy(zero_copy_only=False),
                                    t["v"].to_numpy(zero_copy_only=False),
                                ),
                            ]
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        # compose mapping: rep column updates where it was matched
        m2 = exchange_join(
            mapping,
            rep.map_batches(
                lambda t: pa.table({"rep": t["old"], "nrep": t["new"]}),
                batch_format="pyarrow",
            ),
            left_on=["rep"],
            join_type="left outer",
            num_parts=P,
        )
        def _apply_rep(t: pa.Table) -> pa.Table:
            # left-outer partitions with an empty right side lack "nrep"
            if "nrep" not in t.column_names or len(t) == 0:
                return pa.table({"v": t["v"], "rep": t["rep"]})
            rep_np = t["rep"].to_numpy(zero_copy_only=False).astype(np.int64)
            nrep_np = t["nrep"].to_numpy(zero_copy_only=False)
            null = pc.is_null(t["nrep"]).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "v": t["v"],
                    "rep": pa.array(
                        np.where(null, rep_np, nrep_np).astype(np.int64)
                    ),
                }
            )

        mapping = m2.map_batches(_apply_rep, batch_format="pyarrow").materialize()
        # contract edges
        e2 = exchange_join(
            edges,
            rep.map_batches(
                lambda t: pa.table({"u": t["old"], "nu": t["new"]}),
                batch_format="pyarrow",
            ),
            left_on=["u"],
            join_type="left outer",
            num_parts=P,
        )
        e3 = exchange_join(
            e2,
            rep.map_batches(
                lambda t: pa.table({"v": t["old"], "nv": t["new"]}),
                batch_format="pyarrow",
            ),
            left_on=["v"],
            join_type="left outer",
            num_parts=P,
        )

        def contract(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            nu = (
                t["nu"].to_numpy(zero_copy_only=False)
                if "nu" in t.column_names
                else np.full(len(t), np.nan)
            )
            nv = (
                t["nv"].to_numpy(zero_copy_only=False)
                if "nv" in t.column_names
                else np.full(len(t), np.nan)
            )
            cu = np.where(np.isnan(nu.astype(np.float64)), u, nu).astype(np.int64)
            cv = np.where(np.isnan(nv.astype(np.float64)), v, nv).astype(np.int64)
            return pa.table(
                {
                    "u": pa.array(np.minimum(cu, cv)),
                    "v": pa.array(np.maximum(cu, cv)),
                    "w": t["w"],
                }
            )

        edges = (
            e3.map_batches(contract, batch_format="pyarrow")
            .groupby(["u", "v"])
            .aggregate(Sum("w", alias_name="w"))
            .materialize()
        )

    labels = mapping.map_batches(
        lambda t: pa.table({"v": t["v"], "label": t["rep"]}),
        batch_format="pyarrow",
    )
    return labels, {"levels": levels}
