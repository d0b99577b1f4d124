"""web.bigcorpus expansion + round-5 extractor memoization invariants."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestExpandDocuments:
    def test_deterministic_and_dense(self, ray_session, tmp_path):
        from networkit_ray.web.bigcorpus import expand_documents

        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        ia = expand_documents(SF, a, target_mb=2)
        ib = expand_documents(SF, b, target_mb=2)
        assert ia == ib
        ta = pq.read_table(f"{a}/documents.parquet").sort_by("doc_id")
        tb = pq.read_table(f"{b}/documents.parquet").sort_by("doc_id")
        assert ta.equals(tb)
        ids = ta["doc_id"].to_numpy()
        assert ids.min() == 0 and ids.max() == ia["n_docs"] - 1
        assert len(np.unique(ids)) == ia["n_docs"]
        # text payload accounting is exact (the MB/s denominator)
        got = int(pc.sum(pc.binary_length(ta["text"])).as_py())
        assert abs(got - ia["text_mb"] * 1e6) / got < 0.01

    def test_salts_unique_and_base_tiled(self, ray_session, tmp_path):
        from networkit_ray.web.bigcorpus import expand_documents

        out = str(tmp_path / "c")
        expand_documents(SF, out, target_mb=1, tile=3)
        t = pq.read_table(f"{out}/documents.parquet").sort_by("doc_id")
        base = pq.read_table(f"{SF}/documents.parquet").sort_by("doc_id")
        n_base = base.num_rows
        texts = t["text"].to_pylist()
        salts = {x.rsplit("uniq ", 1)[1] for x in texts}
        assert len(salts) == len(texts)  # globally unique remainders
        # copy r of base doc d tiles the base text 3x
        b0 = base["text"][0].as_py()
        for r in (0, 1):
            tx = texts[r * n_base]
            assert tx.count(b0) == 3

    def test_num_documents_handles_directories(self, ray_session, tmp_path):
        from networkit_ray.web.bigcorpus import expand_documents
        from networkit_ray.web.htmlgen import num_documents

        out = str(tmp_path / "d")
        info = expand_documents(SF, out, target_mb=1)
        assert num_documents(out) == info["n_docs"]
        assert num_documents(SF) == pq.read_metadata(
            f"{SF}/documents.parquet"
        ).num_rows


class TestUrlNormalizerMemo:
    CASES = [
        ("https://site0001.example/p/000123", "https://site0002.example/p/000456"),
        ("https://a.example/x", "HTTPS://B.EXAMPLE/y#frag"),
        ("https://a.example/x", "http://c.example/p?q=1#z"),
        ("https://a.example/dir/page", "/p/000007"),
        ("https://a.example/dir/page", "../up"),
        ("https://a.example/x", "ftp://c.example/skip"),
        ("https://a.example/x", "http:///no-authority"),
        ("https://a.example/x", "http://host"),
        ("https://a.example/x", ""),
        ("https://a.example/x", "relative/only"),
    ]

    def test_memo_matches_plain(self):
        from networkit_ray.web.extract import _UrlNormalizer, normalize_url

        norm = _UrlNormalizer()
        for base, href in self.CASES * 2:  # second pass exercises hits
            assert norm(base, href) == normalize_url(base, href), (base, href)

    def test_absolute_hrefs_base_independent(self):
        from networkit_ray.web.extract import _ABS_HTTP_RE, normalize_url

        for _, href in self.CASES:
            if not _ABS_HTTP_RE.match(href):
                continue
            a = normalize_url("https://one.example/p", href)
            b = normalize_url("http://other.test/deep/q?x=1", href)
            assert a == b, href

    def test_cache_reset_at_capacity(self):
        from networkit_ray.web.extract import _UrlNormalizer

        norm = _UrlNormalizer(max_size=4)
        for i in range(10):
            norm("https://b.example/", f"https://t{i}.example/p")
        assert len(norm._cache) <= 4
        assert (
            norm("https://b.example/", "https://t9.example/p")
            == "https://t9.example/p"
        )


class TestSegmentTableFuzz:
    def test_equivalent_to_python_split(self):
        """The buffer-level segmenter must exactly match the Python
        _segments loop — including empty tokens from repeated separators,
        empty texts, leading/trailing separators, and multibyte UTF-8."""
        from networkit_ray.dedup.lines import _segment_table, _segments

        rng = np.random.default_rng(3)
        words = ["alpha", "b", "ccc", "dd", "", "eé€", "zz"]
        for mode, L in [("words", 8), ("words", 3), ("lines", 1), ("lines", 5)]:
            sep = "\n" if mode == "lines" else " "
            texts = []
            for i in range(300):
                k = int(rng.integers(0, 40))
                texts.append(
                    sep.join(rng.choice(words, k)) if k else ("" if i % 3 else "x")
                )
            texts += ["", " ", "  ", "\n", "a  b", " lead", "trail ", "\n\n"]
            arr = pa.array(texts, pa.string())
            rep, sno, segs = _segment_table(arr, mode, L)
            segs_py = segs.to_pylist()
            pos = 0
            for i, t in enumerate(texts):
                ref = _segments(t, mode, L)
                assert segs_py[pos : pos + len(ref)] == ref, (mode, L, i, t)
                assert sno[pos : pos + len(ref)].tolist() == list(range(len(ref)))
                assert set(rep[pos : pos + len(ref)].tolist()) <= {i}
                pos += len(ref)
            assert pos == len(segs_py)

    def test_sliced_and_chunked_input(self):
        """Arrow slice offsets and chunked arrays must not shift buffers."""
        from networkit_ray.dedup.lines import _segment_table, _segments

        texts = ["a b c d e", "x", "", "p q", "lone"]
        arr = pa.array(texts * 3, pa.string()).slice(4, 7)
        chunked = pa.chunked_array([arr[:3], arr[3:]])
        for a in (arr, chunked):
            rep, sno, segs = _segment_table(a, "words", 2)
            expect = []
            vals = a.to_pylist()
            for t in vals:
                expect.extend(_segments(t, "words", 2))
            assert segs.to_pylist() == expect
