"""Bow-tie decomposition, SALSA, spam mass, power-law fit: structural
properties on known graphs plus partition invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.graph.bowtie import bowtie_decomposition
from networkit_ray.graph.powerlaw import hill_alpha
from networkit_ray.graph.salsa import salsa


def _ds(edges):
    src, dst = zip(*edges)
    return ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )


# core cycle {0,1,2}; 3 = IN; 4 = OUT; 5 = TUBE (3→5→4); 6 = TENDRIL off
# IN; 7 = TENDRIL into OUT; {8,9} = DISC 2-cycle (smaller than the core).
BOWTIE_EDGES = [
    (0, 1), (1, 2), (2, 0),
    (3, 0),
    (1, 4),
    (3, 5), (5, 4),
    (3, 6),
    (7, 4),
    (8, 9), (9, 8),
]
BOWTIE_EXPECT = {
    0: "CORE", 1: "CORE", 2: "CORE",
    3: "IN", 4: "OUT", 5: "TUBE",
    6: "TENDRIL", 7: "TENDRIL",
    8: "DISC", 9: "DISC",
}


class TestBowtie:
    def test_known_regions(self):
        ds, info = bowtie_decomposition(_ds(BOWTIE_EDGES), 10, num_parts=3)
        got = dict(zip(*[ds.to_pandas()[c] for c in ("v", "region")]))
        assert got == BOWTIE_EXPECT
        assert info["sizes"] == {
            "CORE": 3, "IN": 1, "OUT": 1, "TUBE": 1, "TENDRIL": 2, "DISC": 2,
        }

    def test_partition_invariance(self):
        a = bowtie_decomposition(_ds(BOWTIE_EDGES), 10, num_parts=2)[0]
        b = bowtie_decomposition(_ds(BOWTIE_EDGES), 10, num_parts=5)[0]
        pa_ = a.to_pandas().sort_values("v").reset_index(drop=True)
        pb = b.to_pandas().sort_values("v").reset_index(drop=True)
        assert (pa_["region"] == pb["region"]).all()

    def test_strongly_connected_is_all_core(self):
        ring = [(i, (i + 1) % 6) for i in range(6)]
        _, info = bowtie_decomposition(_ds(ring), 6, num_parts=2)
        assert info["sizes"]["CORE"] == 6
        assert sum(info["sizes"].values()) == 6


class TestSalsa:
    def test_star_authority(self):
        # 1..4 → 0: node 0 is the unique authority (L1 mass 1), the spokes
        # split the hub mass equally.
        res, _ = salsa(_ds([(1, 0), (2, 0), (3, 0), (4, 0)]), 5, iterations=5, num_parts=2)
        df = res.to_pandas().sort_values("v").reset_index(drop=True)
        assert np.isclose(df.loc[0, "auth"], 1.0)
        assert np.allclose(df.loc[1:4, "hub"], 0.25)
        assert np.isclose(df.loc[0, "hub"], 0.0)

    def test_l1_norms_are_one(self):
        edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(0, 5), (2, 6)]
        res, _ = salsa(_ds(edges), 7, iterations=10, num_parts=3)
        df = res.to_pandas()
        assert np.isclose(df["hub"].sum(), 1.0)
        assert np.isclose(df["auth"].sum(), 1.0)

    def test_partition_invariance(self):
        edges = [(i, (i * 5 + 2) % 11) for i in range(11)] + [(3, 7), (9, 1)]
        a = salsa(_ds(edges), 11, iterations=8, num_parts=2)[0].to_pandas().sort_values("v")
        b = salsa(_ds(edges), 11, iterations=8, num_parts=5)[0].to_pandas().sort_values("v")
        assert np.allclose(a["hub"].to_numpy(), b["hub"].to_numpy(), atol=1e-12)
        assert np.allclose(a["auth"].to_numpy(), b["auth"].to_numpy(), atol=1e-12)

    def test_degree_normalization_vs_numpy(self):
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1)]
        n = 4
        res, _ = salsa(_ds(edges), n, iterations=12, num_parts=2)
        df = res.to_pandas().sort_values("v").reset_index(drop=True)
        A = np.zeros((n, n))
        for s, d in edges:
            A[s, d] = 1.0
        od, ind = A.sum(1), A.sum(0)
        hub = np.full(n, 1.0 / n)
        for _ in range(12):
            with np.errstate(divide="ignore", invalid="ignore"):
                auth = (np.where(od > 0, hub / od, 0)[:, None] * A).sum(0)
            auth /= auth.sum()
            raw = (A * np.where(ind > 0, auth / ind, 0)[None, :]).sum(1)
            hub = raw / raw.sum()
        assert np.allclose(df["hub"].to_numpy(), hub, atol=1e-12)
        assert np.allclose(df["auth"].to_numpy(), auth, atol=1e-12)


class TestPowerlaw:
    def test_hill_alpha_closed_form(self):
        degs = [1, 1, 2, 3, 5, 8, 13, 21]
        ds = ray.data.from_arrow(pa.table({"deg": pa.array(degs, pa.int64())}))
        alpha, n_tail = hill_alpha(ds, dmin=2)
        tail = np.array([d for d in degs if d >= 2], float)
        expect = 1.0 + len(tail) / np.log(tail / 1.5).sum()
        assert n_tail == len(tail)
        assert np.isclose(alpha, expect, atol=1e-12)

    def test_pure_powerlaw_recovers_exponent(self):
        # Degrees drawn from the inverse-CDF of a continuous Pareto with
        # alpha=2.5 on a deterministic uniform grid: the MLE must land
        # close to the true exponent.
        alpha_true = 2.5
        u = (np.arange(1, 20001) - 0.5) / 20000
        d = np.floor(1.0 * u ** (-1.0 / (alpha_true - 1.0))).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"deg": pa.array(d)}))
        alpha, _ = hill_alpha(ds, dmin=3)
        assert abs(alpha - alpha_true) < 0.2


class TestSpamMass:
    def test_formula(self):
        from networkit_ray.web.hostgraph import spam_mass

        pr = ray.data.from_arrow(
            pa.table({"host": ["a", "b", "c"], "score": [0.5, 0.3, 0.2]})
        )
        tr = ray.data.from_arrow(
            pa.table({"host": ["a", "b", "c"], "score": [0.5, 0.06, 0.0]})
        )
        got = spam_mass(pr, tr).to_pandas().sort_values("host").reset_index(drop=True)
        assert np.allclose(got["spam_mass"].to_numpy(), [0.0, 0.8, 1.0])


class TestCocitation:
    def test_known_counts(self):
        from networkit_ray.graph.cocitation import (
            cocitation_scores,
            coupling_scores,
        )

        # 0→{2,3,4}, 1→{2,3}: cocitation (2,3)=2, (2,4)=1, (3,4)=1
        edges = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3)]
        got = (
            cocitation_scores(_ds(edges), num_parts=2)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert [tuple(r) for r in got.to_numpy()] == [
            (2, 3, 2), (2, 4, 1), (3, 4, 1),
        ]
        # coupling: (0,1) share {2,3} → 2
        got2 = coupling_scores(_ds(edges), num_parts=2).to_pandas()
        assert [tuple(r) for r in got2.to_numpy()] == [(0, 1, 2)]

    def test_max_degree_cap_drops_hub(self):
        from networkit_ray.graph.cocitation import cocitation_scores

        edges = [(0, d) for d in range(1, 6)] + [(9, 1), (9, 2)]
        got = (
            cocitation_scores(_ds(edges, ), max_degree=4, num_parts=2)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        # src 0 (out-degree 5 > 4) contributes nothing; only src 9's pair
        assert [tuple(r) for r in got.to_numpy()] == [(1, 2, 1)]

    def test_partition_invariance(self):
        from networkit_ray.graph.cocitation import cocitation_scores

        edges = [(i, (i * 3 + k) % 13) for i in range(13) for k in (1, 2, 5)]
        a = cocitation_scores(_ds(edges), num_parts=2).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        b = cocitation_scores(_ds(edges), num_parts=7).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert a.equals(b)


class TestRedirects:
    def test_chain_cap_and_cycle(self):
        from networkit_ray.web.redirects import resolve_chains

        # chain 0→1→…→10 (sources 0..9), plus an 11↔12 cycle
        mapping = [(i, i + 1) for i in range(10)] + [(11, 12), (12, 11)]
        mv, mt = zip(*mapping)
        m = ray.data.from_arrow(
            pa.table({"v": pa.array(mv, pa.int64()), "target": pa.array(mt, pa.int64())})
        )
        uni = ray.data.from_arrow(pa.table({"v": pa.array(range(13), pa.int64())}))
        got = (
            resolve_chains(uni, m, max_hops=8)
            .to_pandas().sort_values("src_doc").reset_index(drop=True)
        )
        final = dict(zip(got["src_doc"], got["final_doc"]))
        resolved = dict(zip(got["src_doc"], got["resolved"]))
        # 8 hops from 0 lands on 8 (still a source → unresolved)
        assert final[0] == 8 and resolved[0] == 0
        assert final[1] == 9 and resolved[1] == 0
        # 2 needs exactly 8 hops to the terminal 10 → resolved
        assert final[2] == 10 and resolved[2] == 1
        # cycle members never resolve; even hop count returns the start
        assert final[11] == 11 and resolved[11] == 0
        assert final[12] == 12 and resolved[12] == 0
        # terminal is its own fixpoint
        assert final[10] == 10 and resolved[10] == 1

    def test_partition_invariance(self):
        from networkit_ray.web.redirects import resolve_chains

        mapping = [(i, (i * 5 + 3) % 40) for i in range(0, 40, 3)]
        mv, mt = zip(*mapping)
        m = ray.data.from_arrow(
            pa.table({"v": pa.array(mv, pa.int64()), "target": pa.array(mt, pa.int64())})
        )
        uni = ray.data.from_arrow(pa.table({"v": pa.array(range(40), pa.int64())}))
        a = resolve_chains(uni, m, max_hops=8, num_parts=2).to_pandas().sort_values("src_doc").reset_index(drop=True)
        b = resolve_chains(uni, m, max_hops=8, num_parts=7).to_pandas().sort_values("src_doc").reset_index(drop=True)
        assert a.equals(b)


class TestGopherFilter:
    def _run(self, texts):
        from networkit_ray.text.analysis import gopher_filter

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        df = gopher_filter(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        return df["keep"].tolist(), df["fail_flags"].tolist()

    def test_rules_bitmask(self):
        base = "the and with that have more solid words here today " * 6  # 60 words
        texts = [
            base,                               # passes every rule
            "the and with",                     # too few words -> bit 0
            base + " ".join(["a"] * 200),       # mean word len < 3 -> bit 1
            base + "# " * 30,                   # symbol ratio -> bit 2
            "\n".join(["- " + base] * 10),      # bullets -> bit 3
            "\n".join([base + "..."] * 10),     # ellipses -> bit 4
            base + " ".join(["12345"] * 300),   # alpha frac < 0.8 -> bit 5 (+bit 0 via max? no, 360 words ok)
            " ".join(["solid"] * 60),           # no stopwords -> bit 6
        ]
        keep, flags = self._run(texts)
        assert keep[0] == 1 and flags[0] == 0
        assert flags[1] & 1
        assert flags[2] & 2
        assert flags[3] & 4
        assert flags[4] & 8
        assert flags[5] & 16
        assert flags[6] & 32
        assert flags[7] & 64
        # each crafted failure trips ONLY its rule (except the short doc,
        # which also lacks enough words for the ratios to matter)
        assert flags[2] == 2 and flags[3] == 4 and flags[4] == 8
        assert flags[5] == 16 and flags[6] == 32 and flags[7] == 64

    def test_empty_text(self):
        keep, flags = self._run([""])
        assert keep == [0]
        # no words: word count, mean length, alpha and stopword rules fail
        assert flags[0] & 1 and flags[0] & 2 and flags[0] & 32 and flags[0] & 64


class TestHitsSalsaCheckpoint:
    EDGES = [(i, (i * 5 + 2) % 11) for i in range(11)] + [(3, 7), (9, 1)]

    def test_salsa_resume_same_parts_bit_identical(self, tmp_path):
        from networkit_ray.graph.salsa import salsa

        full = salsa(_ds(self.EDGES), 11, iterations=9, num_parts=3)[0].to_pandas().sort_values("v")
        d = str(tmp_path / "ck")
        salsa(_ds(self.EDGES), 11, iterations=4, num_parts=3, checkpoint_dir=d)
        res, info = salsa(
            _ds(self.EDGES), 11, iterations=9, num_parts=3,
            checkpoint_dir=d, resume=True,
        )
        assert info["resumed_from"] == 4
        got = res.to_pandas().sort_values("v")
        assert (got["hub"].to_numpy() == full["hub"].to_numpy()).all()
        assert (got["auth"].to_numpy() == full["auth"].to_numpy()).all()

    def test_hits_resume_reshard(self, tmp_path):
        from networkit_ray.graph.hits import hits

        full = hits(_ds(self.EDGES), 11, iterations=8, num_parts=5)[0].to_pandas().sort_values("v")
        d = str(tmp_path / "ck")
        hits(_ds(self.EDGES), 11, iterations=3, num_parts=2, checkpoint_dir=d)
        res, info = hits(
            _ds(self.EDGES), 11, iterations=8, num_parts=5,
            checkpoint_dir=d, resume=True,
        )
        assert info["resumed_from"] == 3
        got = res.to_pandas().sort_values("v")
        assert np.allclose(got["hub"].to_numpy(), full["hub"].to_numpy(), atol=1e-12)
        assert np.allclose(got["auth"].to_numpy(), full["auth"].to_numpy(), atol=1e-12)


class TestBM25:
    def test_known_scores(self):
        from networkit_ray.text.analysis import bm25_topk

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(
                        ["cat dog cat", "dog dog dog dog", "bird"], pa.string()
                    ),
                }
            )
        )
        got = bm25_topk(docs, ["cat"], k1=1.2, b=0.75, k=3).to_pandas()
        # only doc 0 contains 'cat'
        assert got["doc_id"].tolist() == [0]
        n, df, tf, dl = 3, 1, 2.0, 3.0
        avgdl = (3 + 4 + 1) / 3
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        expect = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert np.isclose(got["score"][0], expect, atol=1e-8)

    def test_multi_term_ranking(self):
        from networkit_ray.text.analysis import bm25_topk

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(
                        ["x y x y", "x x x x x x", "y", "z z z"], pa.string()
                    ),
                }
            )
        )
        got = bm25_topk(docs, ["x", "y"], k=4).to_pandas()
        # doc 0 matches both terms and must outrank single-term docs;
        # doc 3 matches neither and is absent
        assert got["doc_id"].iloc[0] == 0
        assert 3 not in set(got["doc_id"])
