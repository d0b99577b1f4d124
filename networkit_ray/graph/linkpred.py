"""Link-prediction index family + neighborhood-overlap machinery.

Reference: networkit/cpp/linkprediction/ — CommonNeighborsIndex.cpp,
JaccardIndex.cpp, AdamicAdarIndex.cpp, PreferentialAttachmentIndex.cpp
compute per-pair scalar scores from the two endpoints' neighborhoods.
The distributed re-expression scores EVERY candidate at once instead of
one pair at a time: a wedge pass over full adjacency (pairs of
neighbors of each mid vertex) yields common-neighbor counts and
Adamic-Adar mass in one groupby, then two degree joins and an anti-join
against existing edges finish all four indices.

Cost note: emitting all 2-hop pairs is inherently Σ deg(mid)² work —
that is what "score all candidates" means.  ``max_deg`` caps the mid
degree (hubs contribute noise-dominated candidates anyway); the cap is
a documented approximation, None = exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from networkit_ray.common.exchange import exchange_join
from networkit_ray.common.schema import enforce_schema


def _wedge_pairs(sym: ray.data.Dataset, max_deg: int | None) -> ray.data.Dataset:
    """(a, b, aaw, raw) one row per wedge a—mid—b (a<b): aaw = 1/ln(deg(mid)),
    raw = 1/deg(mid) (the ResourceAllocationIndex.cpp mass)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        nb = np.sort(g["dst"].to_numpy())
        k = len(nb)
        empty = pd.DataFrame(
            {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "aaw": np.empty(0, np.float64),
                "raw": np.empty(0, np.float64),
            }
        )
        if k < 2 or (max_deg is not None and k > max_deg):
            return empty
        if max_deg is None:
            from networkit_ray.common.guards import check_group_rows

            check_group_rows(
                k, 8192, "linkpred._wedge_pairs",
                "hop-2 pair expansion is O(deg^2); pass max_deg= to cap "
                "hub degrees before wedge enumeration.",
            )
        iu, ju = np.triu_indices(k, 1)
        return pd.DataFrame(
            {
                "a": nb[iu],
                "b": nb[ju],
                # ln(k) > 0 because k >= 2
                "aaw": np.full(len(iu), 1.0 / np.log(k)),
                "raw": np.full(len(iu), 1.0 / k),
            }
        )

    w = sym.groupby("src").map_groups(pairs, batch_format="pandas")
    return enforce_schema(
        w,
        pa.schema(
            [
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("aaw", pa.float64()),
                ("raw", pa.float64()),
            ]
        ),
    )


def link_prediction_scores(
    sym: ray.data.Dataset,
    canon: ray.data.Dataset,
    *,
    max_deg: int | None = None,
) -> ray.data.Dataset:
    """(u, v, cn, jaccard, adamic_adar, pref_attach) for every NON-adjacent
    pair with ≥1 common neighbor.

    - cn: |Γ(u) ∩ Γ(v)|            (CommonNeighborsIndex.cpp)
    - jaccard: cn / |Γ(u) ∪ Γ(v)|  (JaccardIndex.cpp)
    - adamic_adar: Σ_mid 1/ln(deg(mid))  (AdamicAdarIndex.cpp)
    - pref_attach: deg(u)·deg(v)   (PreferentialAttachmentIndex.cpp)
    - resource_alloc: Σ_mid 1/deg(mid)  (ResourceAllocationIndex.cpp)
    """
    w = _wedge_pairs(sym, max_deg)
    agg = w.groupby(["a", "b"]).aggregate(
        Count(alias_name="cn"), Sum("aaw", alias_name="aa"), Sum("raw", alias_name="ra")
    )
    # drop pairs that are already edges (canonical lo<hi matches a<b)
    cand = exchange_join(
        agg, canon, left_on=["a", "b"], right_on=["src", "dst"], join_type="left anti"
    )

    deg = sym.groupby("src").aggregate(Count(alias_name="deg"))
    da = deg.map_batches(
        lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"
    )
    db = deg.map_batches(
        lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"
    )
    j1 = exchange_join(cand, da, left_on=["a"])
    j2 = exchange_join(j1, db, left_on=["b"])

    def score(t: pa.Table) -> pa.Table:
        cn = t["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        aa = t["aa"].to_numpy(zero_copy_only=False)
        ra = t["ra"].to_numpy(zero_copy_only=False)
        du = t["da"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["db"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": t["a"],
                "v": t["b"],
                "cn": pa.array(cn),
                "jaccard": pa.array(cn.astype(np.float64) / (du + dv - cn)),
                "adamic_adar": pa.array(aa),
                "pref_attach": pa.array(du * dv),
                "resource_alloc": pa.array(ra),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


def same_community_index(
    pairs: ray.data.Dataset, labels: ray.data.Dataset
) -> ray.data.Dataset:
    """(u, v, same_community) — 1 when both endpoints share a partition
    label, else 0 (linkprediction/SameCommunityIndex.cpp)."""
    la = labels.map_batches(
        lambda t: pa.table({"u": t["v"], "lu": t["label"]}), batch_format="pyarrow"
    )
    lb = labels.map_batches(
        lambda t: pa.table({"v": t["v"], "lv": t["label"]}), batch_format="pyarrow"
    )
    j = exchange_join(pairs.select_columns(["u", "v"]), la, left_on=["u"])
    j = exchange_join(j, lb, left_on=["v"])

    def f(t: pa.Table) -> pa.Table:
        sc = (
            t["lu"].to_numpy(zero_copy_only=False)
            == t["lv"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"u": t["u"], "v": t["v"], "same_community": pa.array(sc)})

    return j.map_batches(f, batch_format="pyarrow")


def link_prediction_roc(
    preds: ray.data.Dataset,
    test_edges: ray.data.Dataset,
    score_col: str = "cn",
    *,
    decimals: int = 8,
) -> pa.Table:
    """(thresh, tp, fp, tpr, fpr) ROC points + trapezoid AUC row.

    Reference: linkprediction/ROCMetric.cpp + MissingLinksFinder.cpp
    evaluation flow — score candidate pairs on a TRAIN graph, rank by
    score, measure against held-out TEST edges.  Normative semantics
    (SQL-twinned): one ROC point per distinct (rounded) score, ties
    grouped; positives = candidates present in the test set; AUC by
    trapezoid over the (fpr, tpr) points with the (0,0) anchor.

    Scale shape: candidates are labeled with one hash join and collapsed
    to per-score (pos, neg) counts — the driver sees only the distinct-
    score histogram, never the candidate table.
    """
    from networkit_ray.common.hashing import round_half_away

    lbl = exchange_join(
        preds,
        test_edges.map_batches(
            lambda t: pa.table(
                {"u": t["src"].combine_chunks().cast(pa.int64()),
                 "v": t["dst"].combine_chunks().cast(pa.int64()),
                 "_pos": pa.array(np.ones(len(t), np.int64))}
            ),
            batch_format="pyarrow",
        ),
        left_on=["u", "v"],
        join_type="left outer",
    )

    def bucket(t: pa.Table) -> pa.Table:
        s = round_half_away(
            t[score_col].to_numpy(zero_copy_only=False).astype(np.float64), decimals
        )
        pos = (
            t["_pos"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "_pos" in t.column_names
            else np.zeros(len(t))
        )
        pos = np.where(np.isnan(pos), 0.0, pos).astype(np.int64)
        return pa.table(
            {"thresh": pa.array(s), "pos": pa.array(pos), "neg": pa.array(1 - pos)}
        )

    hist = (
        lbl.map_batches(bucket, batch_format="pyarrow")
        .groupby("thresh")
        .aggregate(Sum("pos", alias_name="p"), Sum("neg", alias_name="ng"))
        .to_pandas()
        .sort_values("thresh", ascending=False)
    )
    p = hist["p"].to_numpy().astype(np.int64)
    ng = hist["ng"].to_numpy().astype(np.int64)
    tp = np.cumsum(p)
    fp = np.cumsum(ng)
    P = max(int(tp[-1]) if len(tp) else 0, 1)
    N = max(int(fp[-1]) if len(fp) else 0, 1)
    tpr = tp / P
    fpr = fp / N
    # trapezoid AUC with the (0,0) anchor
    fx = np.concatenate([[0.0], fpr])
    ty = np.concatenate([[0.0], tpr])
    auc = float(np.sum((fx[1:] - fx[:-1]) * (ty[1:] + ty[:-1]) / 2.0))
    return pa.table(
        {
            "thresh": pa.array(hist["thresh"].to_numpy().astype(np.float64)),
            "tp": pa.array(tp),
            "fp": pa.array(fp),
            "tpr": pa.array(round_half_away(tpr, 8)),
            "fpr": pa.array(round_half_away(fpr, 8)),
            "auc": pa.array(round_half_away(np.full(len(tp), auc), 8)),
        }
    )
