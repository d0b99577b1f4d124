"""Text analysis, dedup family, ANN, multimodal plumbing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from networkit_ray.ann.search import brute_force_topk, lsh_topk
from networkit_ray.dedup.embed import embedding_near_dups
from networkit_ray.dedup.exact import duplicate_stats, exact_dedup_keepers
from networkit_ray.dedup.minhash import jaccard, near_dup_clusters, near_dup_pairs
from networkit_ray.dedup.simhash import simhash64, simhash_near_dups
from networkit_ray.multimodal.decode import decode_media, synth_media
from networkit_ray.text.analysis import (
    fingerprints,
    langid,
    quality_scores,
    token_counts,
)


def docs_ds(texts, langs=None):
    n = len(texts)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
            }
        )
    )


class TestTextAnalysis:
    def test_token_counts_match_duckdb(self, sf_tiny):
        docs = ray.data.read_parquet(f"{sf_tiny}/documents.parquet")
        got = token_counts(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
        exp = duckdb.sql(
            f"""SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpeish
                FROM read_parquet('{sf_tiny}/documents.parquet') ORDER BY doc_id"""
        ).df()
        assert (got["n_tokens"].to_numpy() == exp["n_tokens"].to_numpy()).all()
        assert (got["n_bpeish"].to_numpy() == exp["n_bpeish"].to_numpy()).all()

    def test_fingerprints_match_duckdb_md5(self, sf_tiny):
        docs = ray.data.read_parquet(f"{sf_tiny}/documents.parquet")
        got = fingerprints(docs).to_pandas().sort_values("doc_id")
        exp = duckdb.sql(
            f"SELECT doc_id, md5(text) AS md5 FROM read_parquet('{sf_tiny}/documents.parquet') ORDER BY doc_id"
        ).df()
        assert list(got["md5"]) == list(exp["md5"])

    def test_quality_scores(self):
        docs = docs_ds(["Hello world. How are you?", "", "a b c!"])
        q = quality_scores(docs).to_pandas().sort_values("doc_id")
        assert list(q["n_words"]) == [5, 0, 3]
        assert list(q["n_sentences"]) == [2, 0, 1]

    def test_byte_class_counts_edge_cases(self):
        """The byte-LUT segment machinery vs Python regex on pathological
        inputs: unicode, trailing empty docs, nulls, sliced arrays."""
        import re

        import pyarrow as pa

        from networkit_ray.text.analysis import (
            _LUT_BPE_SINGLE,
            _LUT_CODEPOINT,
            _LUT_NONSPACE,
            _LUT_WORD,
            _class_counts,
            _run_counts,
            _utf8_view,
        )

        ws = re.compile(r"[\t\n\f\r ]+")  # RE2 \s
        bpe = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\t\n\f\r ]")
        cases = ["", "   ", "héllo wörld!", "aÃ©b", "x" * 5, "t\tb\nc",
                 "...", "ß?!", "日本語 text", "a_b c-d", "", ""]
        arr = pa.chunked_array([pa.array(cases[:4]), pa.array(cases[4:])])
        data, offs = _utf8_view(arr)
        assert list(_run_counts(data, offs, _LUT_NONSPACE)) == [
            0 if not s.strip() else len(ws.split(s.strip())) for s in cases
        ]
        assert list(
            _run_counts(data, offs, _LUT_WORD)
            + _class_counts(data, offs, _LUT_BPE_SINGLE)
        ) == [len(bpe.findall(s)) for s in cases]
        assert list(_class_counts(data, offs, _LUT_CODEPOINT)) == [
            len(s) for s in cases
        ]
        data, offs = _utf8_view(pa.array(["ab c", None, "d"]))
        assert list(_run_counts(data, offs, _LUT_NONSPACE)) == [2, 0, 1]
        data, offs = _utf8_view(pa.array(cases).slice(2, 8))
        assert list(_class_counts(data, offs, _LUT_CODEPOINT)) == [
            len(s) for s in cases[2:10]
        ]

    def test_repetition_scores(self):
        from networkit_ray.text.analysis import repetition_scores

        docs = docs_ds(
            [
                "a b c a b c a b c",  # 3 distinct words / 9; grams: abc bca cab ×>1
                "one two three four",  # all distinct, 2 grams distinct
                "",  # no tokens → 0, 0
                "x y",  # < 3 tokens → gram frac 0
                "w w w w",  # 1 distinct word of 4; grams all 'w w w'
            ]
        )
        got = (
            repetition_scores(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(
            got["dup_word_frac"], [1 - 3 / 9, 0.0, 0.0, 0.0, 1 - 1 / 4], atol=1e-6
        )
        # doc 0: 7 grams, 3 distinct (abc,bca,cab); doc 4: 2 grams 1 distinct
        np.testing.assert_allclose(
            got["dup_3gram_frac"], [1 - 3 / 7, 0.0, 0.0, 0.0, 1 - 1 / 2], atol=1e-6
        )

    def test_repetition_scores_match_duckdb(self, sf_tiny):
        import __ray_entry__ as E

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_tiny}/documents.parquet')"
        )
        df = (
            E.queries()["repetition_scores"](sf_tiny)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        o = (
            con.execute(E.oracle_sql()["repetition_scores"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert df.shape == o.shape
        assert np.all(df[sorted(df.columns)].values == o[sorted(o.columns)].values)

    def test_langid(self):
        docs = docs_ds(
            [
                "the cat sat on the mat and it was happy",
                "der Hund ist nicht auf der Straße und das ist gut",
                "le chat est dans la maison et il est content",
                "zzz qqq xxx",
            ]
        )
        got = langid(docs, concurrency=(1, 2)).to_pandas().sort_values("doc_id")
        assert list(got["lang_pred"]) == ["en", "de", "fr", "und"]


class TestDedup:
    def test_exact_dedup(self):
        docs = docs_ds(["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"])
        stats = duplicate_stats(docs)
        assert stats == {"total": 6, "distinct": 3, "duplicates": 3}
        keep = exact_dedup_keepers(docs).to_pandas()
        assert sorted(keep["doc_id"]) == [0, 1, 3]

    def test_minhash_finds_near_dups(self):
        base = (
            "the quick brown fox jumps over the lazy dog while the sun shines "
            "bright over the green hills and the river flows gently to the sea "
            "carrying leaves and small branches from the old oak tree"
        )
        variant = base.replace("small branches", "tiny branches")
        other = (
            "completely different content about database systems and query "
            "optimization with hash joins and sort merge strategies for "
            "distributed execution engines running on large clusters today"
        )
        docs = docs_ds([base, variant, other, base])
        pairs = near_dup_pairs(docs, threshold=0.5).to_pandas()
        keys = set(zip(pairs["a"], pairs["b"]))
        assert (0, 3) in keys  # identical
        assert (0, 1) in keys  # near-dup
        assert not any(2 in p for p in keys)
        cl = near_dup_clusters(docs, 4, threshold=0.5).to_pandas().sort_values("doc_id")
        assert list(cl["cluster"]) == [0, 0, 2, 0]
        assert jaccard(base, base) == 1.0

    def test_simhash(self):
        a = "the quick brown fox jumps over the lazy dog near the river bank today"
        b = "the quick brown fox jumps over the lazy dog near the river bank tonight"
        c = "entirely unrelated words about spacecraft navigation and orbital mechanics"
        assert simhash64(a) == simhash64(a)
        docs = docs_ds([a, b, c])
        nd = simhash_near_dups(docs, max_hamming=12).to_pandas()
        keys = set(zip(nd["a"], nd["b"]))
        assert (0, 1) in keys
        assert (0, 2) not in keys

    def test_embedding_near_dups(self, sf_tiny):
        emb = ray.data.read_parquet(f"{sf_tiny}/embeddings.parquet")
        dim = len(emb.take(1)[0]["embedding"])
        pairs = embedding_near_dups(emb, dim, threshold=0.99).to_pandas()
        # sanity: pairs (if any) are ordered and above threshold
        if len(pairs):
            assert (pairs["a"] < pairs["b"]).all()
            assert (pairs["cos"] >= 0.99).all()


class TestANN:
    def test_brute_force_vs_duckdb(self, sf_tiny):
        emb = ray.data.read_parquet(f"{sf_tiny}/embeddings.parquet")
        got = (
            brute_force_topk(emb, [0, 1, 2], k=5)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_tiny}/embeddings.parquet')"
        )
        exp = con.execute(
            """
            WITH nv AS (
              SELECT vec_id,
                     list_transform(embedding, x -> x / sqrt(list_sum(list_transform(embedding, y -> y*y)))) AS nvec
              FROM embeddings),
            q AS (SELECT vec_id AS query_id, nvec AS qv FROM nv WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT q.query_id, nv.vec_id,
                     list_dot_product(q.qv, nv.nvec) AS score
              FROM q CROSS JOIN nv),
            ranked AS (
              SELECT query_id, vec_id, score,
                     row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
              FROM scored)
            SELECT query_id, rank, vec_id, ROUND(score, 6) AS score
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
            """
        ).df()
        assert (got["vec_id"].to_numpy() == exp["vec_id"].to_numpy()).all()
        np.testing.assert_allclose(got["score"], exp["score"], atol=1e-6)
        # self is always rank 1 with score 1
        r1 = got[got["rank"] == 1]
        assert list(r1["vec_id"]) == [0, 1, 2]

    def test_lsh_recall(self, sf_tiny):
        emb = ray.data.read_parquet(f"{sf_tiny}/embeddings.parquet")
        exact = brute_force_topk(emb, [0, 1], k=5).to_pandas()
        approx = lsh_topk(emb, [0, 1], k=5).to_pandas()
        # recall@5 of the LSH path vs brute force
        e = set(zip(exact["query_id"], exact["vec_id"]))
        a = set(zip(approx["query_id"], approx["vec_id"]))
        recall = len(e & a) / len(e)
        assert recall >= 0.4  # self + near buckets; approximate by design


class TestMultimodal:
    def test_decode_plumbing(self):
        media = synth_media(50, kind="image")
        out = decode_media(media, real=False).to_pandas()
        assert len(out) == 50
        assert set(out.columns) == {"id", "height", "width", "channels", "features"}
        assert all(len(f) == 8 for f in out["features"])
        # deterministic across runs
        out2 = decode_media(synth_media(50, kind="image"), real=False).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("id").reset_index(drop=True),
            out2.sort_values("id").reset_index(drop=True),
        )

    def test_real_decode_raises_on_compressed(self):
        from networkit_ray.multimodal.decode import DecodeStub

        stub = DecodeStub(real=True)
        with pytest.raises(NotImplementedError):
            stub._decode_one(b"\x89PNG\r\n", "image")

    def test_real_image_decode(self):
        """PPM payloads from synth_media decode GENUINELY (known gradient)."""
        media = synth_media(20, kind="image")
        out = decode_media(media, real=True).to_pandas().sort_values("id")
        assert len(out) == 20
        # synth: height = 16 + id % 16, width = 16 + 7*id % 16
        for _, r in out.iterrows():
            assert r["height"] == 16 + r["id"] % 16
            assert r["width"] == 16 + (r["id"] * 7) % 16
            assert r["channels"] == 3
        # red channel is a vertical gradient → mean ≈ 0.5
        f0 = np.stack(out["features"].to_numpy())
        assert np.all(np.abs(f0[:, 0] - 0.5) < 0.1)

    def test_real_resize(self):
        from networkit_ray.multimodal.decode import decode_media as dm

        media = synth_media(8, kind="image")
        out = dm(media, real=True, resize_to=8).to_pandas()
        assert (out["height"] == 8).all() and (out["width"] == 8).all()

    def test_real_audio_decode(self):
        media = synth_media(10, kind="audio")
        out = decode_media(media, real=True).to_pandas().sort_values("id")
        assert (out["width"] == 8000).all()  # sample rate
        assert (out["channels"] == 1).all()
        f = np.stack(out["features"].to_numpy())
        # sine amplitude 8000/32768 = 0.244 → RMS ≈ 0.244/√2 ≈ 0.173
        assert np.all(np.abs(f[:, 0] - 0.173) < 0.02)


class TestVectorizedHashing:
    """The dedup hot path is whole-batch vectorized (dedup/tokenize.py);
    these tests pin it against a slow per-document reference with the same
    hash scheme (VERDICT r1 #4)."""

    CASES = [
        "hello world foo bar baz quux",
        "",
        "one two",
        "x",
        "a b c a b c a b c",
        "MiXeD CaSe, with.punct!and_under_scores 123 456",
        "   leading and trailing   ",
    ]

    @staticmethod
    def _ref_shingles(text, k=3):
        import re

        from networkit_ray.dedup.tokenize import _EMPTY_DOC, _GOLD, _splitmix

        ws = re.findall(r"[A-Za-z0-9_]+", text.lower())
        hs = (
            pd.util.hash_array(np.array(ws, dtype=object)).astype(np.uint64)
            if ws
            else np.empty(0, np.uint64)
        )
        if len(ws) < k:
            if not len(ws):
                return np.array([_EMPTY_DOC], np.uint64)
            acc = np.uint64(0)
            for h in hs:
                acc ^= h
            return _splitmix(np.array([acc], np.uint64))
        out = np.empty(len(ws) - k + 1, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(len(out)):
                acc = hs[i]
                for j in range(1, k):
                    acc = (acc * _GOLD) ^ hs[i + j]
                out[i] = _splitmix(np.array([acc], np.uint64))[0]
        return out

    def test_minhash_signatures_match_reference(self):
        from networkit_ray.dedup.minhash import (
            _perm_params,
            minhash_signatures_batch,
        )

        a, b = _perm_params(64, 42)
        got = minhash_signatures_batch(pa.array(self.CASES), a, b)
        for i, text in enumerate(self.CASES):
            sh = self._ref_shingles(text)
            with np.errstate(over="ignore"):
                exp = (a[:, None] * sh[None, :] + b[:, None]).min(axis=1)
            assert np.array_equal(got[i], exp), f"doc {i}"

    def test_simhash_matches_reference(self):
        import re

        from networkit_ray.dedup.simhash import simhash_batch

        got = simhash_batch(pa.array(self.CASES))
        for i, text in enumerate(self.CASES):
            ws = re.findall(r"[A-Za-z0-9_]+", text.lower())
            if not ws:
                assert got[i] == 0
                continue
            hs = pd.util.hash_array(np.array(ws, dtype=object)).astype(np.uint64)
            acc = np.zeros(64, np.int64)
            for h in hs:
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            exp = np.uint64(0)
            for j in np.flatnonzero(acc > 0):
                exp |= np.uint64(1) << np.uint64(j)
            assert got[i] == exp, f"doc {i}"


class TestEmptyBlockRegression:
    def test_enforce_schema_empty_pandas_group(self):
        """Ray 2.49 passes 0-row blocks through map_batches unconverted, so
        an empty pandas block from map_groups reaches enforce_schema as a
        DataFrame (CORRECTNESS r1: minhash/simhash driver crash)."""
        from networkit_ray.common.schema import enforce_schema

        def empty_groups(df):
            return df[df["x"] < 0]

        ds = (
            ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "x": [1, 2, 3]}))
            .groupby("k")
            .map_groups(empty_groups, batch_format="pandas")
        )
        out = enforce_schema(
            ds, pa.schema([("k", pa.int64()), ("x", pa.int64())])
        )
        assert out.count() == 0
        assert out.schema().base_schema.names == ["k", "x"]

    def test_exchange_join_p128_and_env_knob(self, monkeypatch):
        """The Dataset-side exchange honors wide partition counts: an
        explicit P=128 join matches the default-P result, and
        NKR_MAX_PARTS (the same deployment knob as graph.bsp) raises the
        _default_parts cap (VERDICT r2 #4)."""
        from networkit_ray.common.exchange import _default_parts, exchange_join

        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(np.arange(500) % 97, pa.int64()),
                    "a": pa.array(np.arange(500), pa.int64()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(np.arange(97), pa.int64()),
                    "b": pa.array(np.arange(97) * 10, pa.int64()),
                }
            )
        )
        wide = (
            exchange_join(left, right, left_on=["k"], num_parts=128)
            .to_pandas()
            .sort_values(["a"])
            .reset_index(drop=True)
        )
        dflt = (
            exchange_join(left, right, left_on=["k"])
            .to_pandas()
            .sort_values(["a"])
            .reset_index(drop=True)
        )
        assert len(wide) == 500
        pd.testing.assert_frame_equal(wide[["k", "a", "b"]], dflt[["k", "a", "b"]])

        monkeypatch.setenv("NKR_MAX_PARTS", "128")
        assert _default_parts(256) == min(
            128, max(2, int(ray.cluster_resources().get("CPU", 8)))
        )
        monkeypatch.setenv("NKR_MAX_PARTS", "2")
        assert _default_parts(256) == 2

    def test_exchange_unique_carries_weights(self):
        from networkit_ray.common.exchange import exchange_unique

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([1, 1, 2], pa.int64()),
                    "dst": pa.array([2, 2, 3], pa.int64()),
                    "w": [1.5, 2.5, 3.0],
                }
            )
        )
        got = (
            exchange_unique(ds, ["src", "dst"], agg=[("w", "sum")])
            .to_pandas()
            .sort_values(["src", "dst"])
        )
        assert list(got["w"]) == [4.0, 3.0]
        with pytest.raises(ValueError):
            exchange_unique(ds, ["src", "dst"])  # silent weight drop is a bug


class TestEmbeddingRecall:
    def test_multiband_recall_vs_bruteforce(self):
        """Planted near-dup clusters: multi-band LSH must recover ≥95% of
        true cosine≥0.9 pairs (VERDICT r1 #5 — single-band recall was ~8%)."""
        rng = np.random.default_rng(7)
        dim, n_clusters, per = 32, 40, 3
        base = rng.standard_normal((n_clusters, dim))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        vecs, ids = [], []
        vid = 0
        for c in range(n_clusters):
            for _ in range(per):
                v = base[c] + 0.05 * rng.standard_normal(dim)
                vecs.append(v / np.linalg.norm(v))
                ids.append(vid)
                vid += 1
        m = np.stack(vecs)
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in m], pa.list_(pa.float64())
                    ),
                }
            )
        )
        sim = m @ m.T
        iu, ju = np.triu_indices(len(ids), 1)
        true_pairs = {
            (int(a), int(b))
            for a, b, s in zip(iu, ju, sim[iu, ju])
            if s >= 0.9
        }
        got = embedding_near_dups(emb, dim, threshold=0.9).to_pandas()
        got_pairs = set(zip(got["a"], got["b"]))
        assert true_pairs, "fixture must plant true pairs"
        recall = len(true_pairs & got_pairs) / len(true_pairs)
        assert recall >= 0.95, f"recall {recall:.3f}"
        # no false positives: every reported pair really is >= threshold
        for a_, b_, c_ in zip(got["a"], got["b"], got["cos"]):
            assert abs(sim[a_, b_] - c_) < 1e-9 and c_ >= 0.9


class TestLangIdExpanded:
    def test_eight_languages(self):
        samples = {
            "en": "the cat sat on the mat and it was happy with that",
            "de": "der Hund ist nicht auf der Straße und das ist gut für ihn",
            "fr": "le chat est dans la maison et il est content pour les vacances",
            "es": "el perro está en la casa y no quiere salir para nada con ellos",
            "it": "il gatto è nella casa e non vuole uscire anche questo giorno",
            "pt": "o cachorro está em casa e não quer sair para a rua mais cedo",
            "nl": "de hond is niet op straat en dat is ook goed voor hem vandaag",
            "sv": "hunden är inte på gatan och det är bra för den som har det",
        }
        docs = docs_ds(list(samples.values()), langs=list(samples.keys()))
        got = langid(docs, concurrency=(1, 2)).to_pandas().sort_values("doc_id")
        assert list(got["lang_pred"]) == list(samples.keys())


class TestIVF:
    def test_ivf_recall_vs_bruteforce(self, sf_tiny):
        from networkit_ray.ann.search import brute_force_topk, ivf_topk

        emb = ray.data.read_parquet(f"{sf_tiny}/embeddings.parquet")
        exact = brute_force_topk(emb, [0, 1, 2], k=5).to_pandas()
        approx = ivf_topk(emb, [0, 1, 2], k=5, n_centroids=8, nprobe=4).to_pandas()
        e = set(zip(exact["query_id"], exact["vec_id"]))
        a = set(zip(approx["query_id"], approx["vec_id"]))
        recall = len(e & a) / len(e)
        assert recall >= 0.6  # nprobe=4 of 8 cells; approximate by design
        # self is always found (its own cell is always probed)
        r1 = approx[approx["rank"] == 1]
        assert list(r1["vec_id"]) == [0, 1, 2]

    def test_ivf_deterministic(self, sf_tiny):
        from networkit_ray.ann.search import ivf_topk

        emb = ray.data.read_parquet(f"{sf_tiny}/embeddings.parquet")
        a = ivf_topk(emb, [0, 1], k=5).to_pandas()
        b = ivf_topk(emb.repartition(5), [0, 1], k=5).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values(["query_id", "rank"]).reset_index(drop=True),
            b.sort_values(["query_id", "rank"]).reset_index(drop=True),
        )


class TestJaccardExact:
    def test_matches_bruteforce(self):
        """Exact inverted-index Jaccard == per-pair jaccard() on every pair."""
        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"
        )
        texts = [
            base,
            base.replace("sigma tau", "sigma tao"),
            base + " phi chi psi omega",
            "unrelated words entirely about cooking pasta with garlic and olive oil tonight",
            base,
        ]
        docs = docs_ds(texts)
        from networkit_ray.dedup.jaccard import jaccard_near_dups

        got = jaccard_near_dups(docs, threshold=0.3).to_pandas()
        got_map = {(a, b): j for a, b, j in zip(got["a"], got["b"], got["jaccard"])}
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                true_j = jaccard(texts[a], texts[b])
                if true_j >= 0.3:
                    assert (a, b) in got_map, (a, b, true_j)
                    assert abs(got_map[(a, b)] - true_j) < 1e-12
                else:
                    assert (a, b) not in got_map
        assert got_map[(0, 4)] == 1.0

    def test_max_df_drops_boilerplate(self):
        texts = ["common header " + w for w in ["aa bb", "cc dd", "ee ff", "gg hh"]]
        docs = docs_ds(texts)
        from networkit_ray.dedup.jaccard import jaccard_near_dups

        # every doc shares the 'common header <w1>' trigram; df cap 1 kills
        # all shared shingles so no pair survives any threshold
        got = jaccard_near_dups(docs, threshold=0.01, max_df=1).to_pandas()
        assert len(got) == 0


class TestEmbeddingExact:
    def test_block_pairs_match_bruteforce(self):
        rng = np.random.default_rng(11)
        n, dim = 90, 16
        m = rng.standard_normal((n, dim))
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in m], pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(5)
        from networkit_ray.dedup.embed import embedding_near_dups_exact

        got = embedding_near_dups_exact(emb, threshold=0.5).to_pandas()
        mn = m.astype(np.float32).astype(np.float64)
        mn /= np.linalg.norm(mn, axis=1, keepdims=True)
        sim = mn @ mn.T
        iu, ju = np.triu_indices(n, 1)
        true = {
            (int(a), int(b)): s
            for a, b, s in zip(iu, ju, sim[iu, ju])
            if s >= 0.5
        }
        got_pairs = {(a, b): c for a, b, c in zip(got["a"], got["b"], got["cos"])}
        assert set(got_pairs) == set(true)
        for k2, v in true.items():
            assert abs(got_pairs[k2] - v) < 1e-9

    def test_lsh_params_adapt_to_threshold(self):
        from networkit_ray.dedup.embed import lsh_params_for

        for thr in (0.95, 0.9, 0.7, 0.5, 0.4):
            bands, planes = lsh_params_for(thr)
            theta = np.arccos(thr)
            p = 1 - theta / np.pi
            recall = 1 - (1 - p**planes) ** bands
            assert recall >= 0.99, (thr, bands, planes, recall)


class TestKMeansAssign:
    def _emb(self, vecs):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs],
                        pa.list_(pa.float64()),
                    ),
                }
            )
        )

    def test_planted_clusters_separate(self):
        import numpy as np

        from networkit_ray.ann.search import kmeans_assign

        rng = np.random.default_rng(3)
        centers = np.eye(4)
        vecs = []
        truth = []
        for i in range(200):
            c = i % 4
            truth.append(c)
            vecs.append(centers[c] + rng.normal(0, 0.05, 4))
        out = kmeans_assign(self._emb(vecs), n_centroids=4, lloyd_iters=5).to_pandas()
        assert len(out) == 200
        # each planted group maps to exactly one k-means cluster
        import collections

        for c in range(4):
            labs = out[np.array(truth) == c]["cluster"]
            assert labs.nunique() == 1, c
        assert out["cluster"].nunique() == 4

    def test_deterministic_across_partitioning(self):
        import numpy as np

        from networkit_ray.ann.search import kmeans_assign

        rng = np.random.default_rng(5)
        vecs = rng.normal(0, 1, (150, 8))
        ds = self._emb(vecs).materialize()
        a = kmeans_assign(ds, n_centroids=6).to_pandas().sort_values("vec_id")
        b = (
            kmeans_assign(ds.repartition(7).materialize(), n_centroids=6)
            .to_pandas()
            .sort_values("vec_id")
        )
        assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()


def test_token_shards_matches_cumsum_replica(ray_session):
    import numpy as np
    import ray.data as rd

    from networkit_ray.text.analysis import token_counts, token_shards

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet").materialize()
    budget = 500
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in token_shards(docs, budget).take_all()
    }
    tc = sorted(
        (r["doc_id"], r["n_tokens"]) for r in token_counts(docs).take_all()
    )
    before = 0
    for doc_id, n in tc:
        assert got[doc_id] == (n, before // budget), doc_id
        before += n
    # shards are contiguous 0..max and roughly budget-sized
    shards = sorted({s for _, s in got.values()})
    assert shards == list(range(len(shards)))


def test_token_shards_partition_invariant(ray_session):
    import ray.data as rd

    from networkit_ray.text.analysis import token_shards

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet").materialize()
    a = sorted(map(tuple, token_shards(docs, 300).to_pandas().values.tolist()))
    b = sorted(
        map(
            tuple,
            token_shards(docs.repartition(7).materialize(), 300)
            .to_pandas()
            .values.tolist(),
        )
    )
    assert a == b


def test_sample_documents_deterministic(ray_session):
    import ray.data as rd

    from networkit_ray.text.analysis import sample_documents

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet").materialize()
    a = sorted(sample_documents(docs, 0.4, seed=3).to_pandas()["doc_id"])
    b = sorted(
        sample_documents(docs.repartition(5).materialize(), 0.4, seed=3).to_pandas()[
            "doc_id"
        ]
    )
    assert a == b
    n = docs.count()
    assert 0.25 * n < len(a) < 0.55 * n
    for d in a[:50]:
        assert (d * 2654435761 + 3) % 2**31 < int(0.4 * 2**31)


def test_contamination_check_planted_leak(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.dedup.jaccard import contamination_check

    bench_text = "the quick brown fox jumps over the lazy dog"
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "completely unrelated words about graphs and rivers",
                        "prefix then the quick brown fox appears here",
                        "alpha beta gamma delta epsilon zeta eta theta",
                    ]
                ),
            }
        )
    )
    bench = rd.from_arrow(
        pa.table({"doc_id": pa.array([100], pa.int64()), "text": pa.array([bench_text])})
    )
    got = {r["doc_id"]: r["hits"] for r in contamination_check(train, bench).take_all()}
    # doc 2 shares the trigrams "the quick brown" and "quick brown fox"
    assert got == {2: 2}


def test_lm_cross_entropy_matches_replica(ray_session):
    import collections
    import math
    import re as _re

    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.text.analysis import lm_cross_entropy

    texts = [
        "the cat sat on the mat",
        "the cat sat on the mat",
        "the dog ran in the park",
        "zxq qqq zxq",
        "one",
        "",
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).materialize()
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm_cross_entropy(docs).take_all()
    }

    tok = _re.compile(r"[a-z0-9]+")
    c12 = collections.Counter()
    c1 = collections.Counter()
    doc_bi = {}
    for d, s in enumerate(texts):
        ws = tok.findall(s.lower())
        bi = list(zip(ws, ws[1:]))
        doc_bi[d] = bi
        for g in bi:
            c12[g] += 1
            c1[g[0]] += 1
    V = len(c1) + 1
    for d, bi in doc_bi.items():
        if not bi:
            assert got[d] == (0, 0.0)
            continue
        ce = -sum(
            math.log((c12[g] + 1.0) / (c1[g[0]] + V)) for g in bi
        ) / len(bi)
        assert got[d][0] == len(bi)
        assert abs(got[d][1] - ce) < 1e-12, d
    # the repeated common doc is more predictable than the one-off gibberish
    assert got[0][1] < got[3][1]


class TestSegmentDedup:
    """dedup/lines.py — CCNet-style global first-wins segment dedup."""

    def test_lines_mode_first_wins(self):
        from networkit_ray.dedup.lines import segment_dedup

        texts = [
            "alpha beta\ncommon line\ngamma",     # doc 0: keeps all 3
            "common line\ndelta",                 # doc 1: loses line 0
            "common line",                        # doc 2: loses its only line
        ]
        out = segment_dedup(docs_ds(texts), mode="lines").to_pandas()
        got = dict(zip(out["doc_id"], out["clean_text"]))
        assert got == {
            0: "alpha beta\ncommon line\ngamma",
            1: "delta",
        }  # doc 2 dropped entirely

    def test_words_mode_window_rule(self):
        from networkit_ray.dedup.lines import segment_dedup

        # 4-word windows: doc1's first window duplicates doc0's second
        texts = [
            "a b c d e f g h",     # windows: "a b c d", "e f g h"
            "e f g h x y z w",     # windows: "e f g h" (dup), "x y z w"
        ]
        out = segment_dedup(docs_ds(texts), mode="words", seg_len=4).to_pandas()
        got = dict(zip(out["doc_id"], out["clean_text"]))
        assert got == {0: "a b c d e f g h", 1: "x y z w"}

    def test_first_wins_is_smallest_doc_seg(self):
        from networkit_ray.dedup.lines import explode_segments

        texts = ["dup\ndup", "dup"]
        segs = explode_segments(docs_ds(texts), mode="lines").to_pandas()
        # duplicates within one doc also collapse to the earliest seg_no
        from networkit_ray.dedup.lines import segment_dedup
        out = segment_dedup(docs_ds(texts), mode="lines").to_pandas()
        got = dict(zip(out["doc_id"], out["clean_text"]))
        assert got == {0: "dup"}
        assert len(segs) == 3


def test_hash_planes_gaussian_and_deterministic():
    """The splitmix64+Box-Muller plane draw is deterministic, seed-sensitive,
    and close enough to N(0,1) for LSH geometry (moments + sign balance)."""
    import numpy as np

    from networkit_ray.dedup.embed import _planes_hash, make_planes

    p1 = _planes_hash(64, 128, 42)
    p2 = _planes_hash(64, 128, 42)
    p3 = _planes_hash(64, 128, 7)
    assert p1.shape == (128, 64)
    np.testing.assert_array_equal(p1, p2)
    assert np.abs(p1 - p3).max() > 0.1
    flat = p1.ravel()
    assert abs(flat.mean()) < 0.02
    assert abs(flat.std() - 1.0) < 0.02
    assert abs((flat > 0).mean() - 0.5) < 0.02
    np.testing.assert_array_equal(make_planes(64, 8, 42, "hash"), _planes_hash(64, 8, 42))
    import pytest

    with pytest.raises(ValueError):
        make_planes(8, 8, 1, "bogus")


def test_md5_hasher_and_hash_perms():
    """The md5 token hasher equals DuckDB's md5_number_upper per token, and
    both dedup variants stay semantically equivalent to their defaults
    (hash values differ, but near-dup SETS on a seeded corpus agree)."""
    import hashlib

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pytest

    from networkit_ray.dedup.minhash import _perm_params
    from networkit_ray.dedup.tokenize import token_hashes

    h, counts = token_hashes(pa.array(["Hello WORLD_9 hello"]), hasher="md5")
    assert counts.tolist() == [3]
    exp = [
        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        for t in ("hello", "world_9", "hello")
    ]
    assert h.tolist() == exp
    con = duckdb.connect()
    got = con.execute(
        "SELECT md5_number_upper('hello'), md5_number_upper('world_9')"
    ).fetchone()
    assert [int(got[0]), int(got[1])] == exp[:2]
    with pytest.raises(ValueError):
        token_hashes(pa.array(["x"]), hasher="bogus")

    a, b = _perm_params(8, 42, perm_gen="hash")
    a2, b2 = _perm_params(8, 42, perm_gen="hash")
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(b, b2)
    assert (a % 2 == 1).all()  # affine multipliers must be odd (bijective)
    with pytest.raises(ValueError):
        _perm_params(8, 42, perm_gen="bogus")


class TestSubstringDedup:
    """ExactSubstr-style window dedup (dedup/substring.py) vs a dict
    brute force of the documented rule: token kept iff uncovered (doc
    shorter than the window) or some covering window is the corpus-wide
    first occurrence of its content."""

    @staticmethod
    def _brute(docs, L):
        toks = {d: t.split(" ") for d, t in docs}
        first = {}
        for d, tk in sorted(toks.items()):
            for p in range(max(0, len(tk) - L + 1)):
                first.setdefault(tuple(tk[p : p + L]), (d, p))
        out = {}
        for d, t in docs:
            tk = t.split(" ")
            T = len(tk)
            kept = []
            for i in range(T):
                if T < L:
                    kept.append(tk[i])
                    continue
                lo, hi = max(0, i - L + 1), min(i, T - L)
                if any(
                    first[tuple(tk[p : p + L])] == (d, p)
                    for p in range(lo, hi + 1)
                ):
                    kept.append(tk[i])
            if kept:
                out[d] = " ".join(kept)
        return out

    def test_matches_bruteforce_planted(self, ray_session):
        import ray.data as rd

        from networkit_ray.dedup.substring import substring_dedup

        rng = np.random.default_rng(1)
        vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", ""]
        shared = " ".join(rng.choice(vocab, 12))
        docs = []
        for d in range(40):
            k = int(rng.integers(0, 25))
            body = " ".join(rng.choice(vocab, k)) if k else ""
            if d % 3 == 0:
                body = body + " " + shared if body else shared
            docs.append((d, body))
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string()),
                }
            )
        )
        got = {
            r["doc_id"]: r["clean_text"]
            for r in substring_dedup(ds, min_len=5)
            .to_pandas()
            .to_dict("records")
        }
        assert got == self._brute(docs, 5)

    def test_first_copy_untouched_later_removed(self, ray_session):
        import ray.data as rd

        from networkit_ray.dedup.substring import substring_dedup

        body = "one two three four five six seven eight nine ten"
        docs = [(0, body), (1, body), (2, "unique words only here")]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string()),
                }
            )
        )
        got = {
            r["doc_id"]: r["clean_text"]
            for r in substring_dedup(ds, min_len=8)
            .to_pandas()
            .to_dict("records")
        }
        assert got[0] == body  # canonical copy keeps every token
        assert 1 not in got  # full duplicate vanishes entirely
        assert got[2] == "unique words only here"  # short doc untouched


class TestRedactPii:
    def test_patterns_and_counts(self, ray_session):
        import ray.data as rd

        from networkit_ray.text.redact import redact_pii

        docs = [
            (0, "mail me at jo.doe+x@sub.host.example thanks"),
            (1, "call +1-555-0199 or +1-555-0200 now"),
            (2, "server at 10.0.200.255 and 1.2.3.4"),
            (3, "clean text with no pii at all"),
            (4, "combo a@b.co +1-123-4567 9.9.9.9"),
            (5, ""),
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string()),
                }
            )
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_redactions"])
            for r in redact_pii(ds).to_pandas().to_dict("records")
        }
        assert got[0] == ("mail me at <EMAIL> thanks", 1)
        assert got[1] == ("call <PHONE> or <PHONE> now", 2)
        assert got[2] == ("server at <IP> and <IP>", 2)
        assert got[3] == ("clean text with no pii at all", 0)
        assert got[4] == ("combo <EMAIL> <PHONE> <IP>", 3)
        assert got[5] == ("", 0)
