"""FM distinct-count sketch: accuracy + parallelism invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.pipelines.events import approx_distinct_users


def _events(seed=1):
    rng = np.random.default_rng(seed)
    rows = []
    for et, nd, nr in [("a", 100, 2000), ("b", 1000, 5000), ("c", 5000, 9000)]:
        uids = rng.integers(0, nd, nr) + (0 if et == "a" else 10**6 * ord(et))
        rows.append(
            pa.table(
                {
                    "user_id": pa.array(uids.astype(np.int64)),
                    "event_type": pa.array([et] * nr),
                }
            )
        )
    return pa.concat_tables(rows)


class TestApproxDistinct:
    def test_relative_error_bounded(self):
        t = _events()
        ds = rd.from_arrow(t).repartition(6).materialize()
        got = approx_distinct_users(ds).to_pandas().set_index("event_type")
        exact = t.to_pandas().groupby("event_type")["user_id"].nunique()
        for et in ["a", "b", "c"]:
            rel = abs(got.loc[et, "approx_distinct"] - exact[et]) / exact[et]
            assert rel < 0.35, (et, rel)  # FM r=64: ~10% stderr, 3σ margin

    def test_parallelism_invariant(self):
        t = _events()
        a = (
            approx_distinct_users(rd.from_arrow(t).repartition(2).materialize())
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        b = (
            approx_distinct_users(rd.from_arrow(t).repartition(11).materialize())
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        # OR-fold union is order/partition independent → bit-identical
        assert a.equals(b)

    def test_single_user(self):
        t = pa.table(
            {
                "user_id": pa.array([7, 7, 7], pa.int64()),
                "event_type": pa.array(["x"] * 3),
            }
        )
        got = approx_distinct_users(rd.from_arrow(t)).to_pandas()
        assert len(got) == 1
        assert 0.5 < got["approx_distinct"].iloc[0] < 4


class TestTokenPercentiles:
    def test_matches_numpy_nearest_rank(self):
        from networkit_ray.text.analysis import token_count_percentiles

        rng = np.random.default_rng(3)
        langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 500)]
        texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 200, 500)]
        t = pa.table(
            {
                "lang": pa.array(langs.tolist()),
                "text": pa.array(texts),
            }
        )
        got = (
            token_count_percentiles(rd.from_arrow(t).repartition(5).materialize())
            .to_pandas()
            .set_index("lang")
        )
        import pandas as pd

        df = pd.DataFrame({"lang": langs, "n": [len(s.split()) for s in texts]})
        for lang, g in df.groupby("lang"):
            vals = np.sort(g["n"].to_numpy())
            for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
                rank = max(1, int(np.ceil(q * len(vals) - 1e-9)))
                assert got.loc[lang, col] == vals[rank - 1], (lang, col)


class TestTfidf:
    def test_matches_bruteforce(self):
        import collections
        import re

        from networkit_ray.text.analysis import tfidf_top_terms

        texts = [
            "the cat sat on the mat",
            "the dog ate the bone",
            "cat and dog play chess",
            "quantum flux capacitor hums",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts),
            }
        )
        got = (
            tfidf_top_terms(rd.from_arrow(t).repartition(3).materialize(), 4, k=2)
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        tok = re.compile(r"[a-z0-9]+")
        tfs = [collections.Counter(tok.findall(s.lower())) for s in texts]
        dfc = collections.Counter()
        for c in tfs:
            dfc.update(c.keys())
        exp = []
        for d, c in enumerate(tfs):
            scored = sorted(
                ((tf * np.log(4 / dfc[w]), w) for w, tf in c.items()),
                key=lambda x: (-x[0], x[1]),
            )[:2]
            exp.extend((d, w, s) for s, w in scored)
        exp = sorted(exp)
        assert len(got) == len(exp)
        for row, (d, w, s) in zip(got.itertuples(index=False), exp):
            assert (row.doc_id, row.term) == (d, w)
            assert abs(row.score - s) < 1e-12
