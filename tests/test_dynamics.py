"""GraphDifference edit list vs brute-force set algebra."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.dynamics import graph_difference


def _ds(rows, w=None):
    cols = {
        "src": pa.array([a for a, b in rows], pa.int64()),
        "dst": pa.array([b for a, b in rows], pa.int64()),
    }
    if w is not None:
        cols["w"] = pa.array(w, pa.float64())
    return rd.from_arrow(pa.table(cols))


def _oracle(e1, e2, w1=None, w2=None):
    s1, s2 = set(e1), set(e2)
    out = set()
    for a, b in s1 - s2:
        out.add(("edge_removal", a, b))
    for a, b in s2 - s1:
        out.add(("edge_addition", a, b))
    if w1 is not None:
        d1 = dict(zip(e1, w1))
        d2 = dict(zip(e2, w2))
        for k in s1 & s2:
            if d1[k] != d2[k]:
                out.add(("weight_update", k[0], k[1]))
    n1 = {v for e in s1 for v in e}
    n2 = {v for e in s2 for v in e}
    for v in n1 - n2:
        out.add(("node_removal", v, -1))
    for v in n2 - n1:
        out.add(("node_addition", v, -1))
    return out


class TestGraphDifference:
    def test_unweighted_random(self):
        rng = np.random.default_rng(3)
        e1 = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (80, 2)) if a != b})
        e2 = sorted({(int(a), int(b)) for a, b in rng.integers(5, 35, (80, 2)) if a != b})
        got = graph_difference(_ds(e1), _ds(e2)).to_pandas()
        exp = _oracle(e1, e2)
        assert {(r.kind, r.u, r.v) for r in got.itertuples(index=False)} == exp

    def test_weighted_updates(self):
        e1 = [(0, 1), (1, 2), (2, 3)]
        e2 = [(0, 1), (1, 2), (3, 4)]
        w1 = [1.0, 2.0, 1.0]
        w2 = [1.0, 5.0, 1.0]
        got = graph_difference(
            _ds(e1, w1), _ds(e2, w2), weighted=True
        ).to_pandas()
        exp = _oracle(e1, e2, w1, w2)
        assert {(r.kind, r.u, r.v) for r in got.itertuples(index=False)} == exp
        assert ("weight_update", 1, 2) in exp

    def test_identical_graphs_empty(self):
        e = [(0, 1), (1, 2)]
        assert graph_difference(_ds(e), _ds(e)).count() == 0


class TestApplyEvents:
    def test_roundtrip_law(self):
        from networkit_ray.graph.dynamics import apply_events

        rng = np.random.default_rng(9)
        e1 = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (90, 2)) if a != b})
        e2 = sorted({(int(a), int(b)) for a, b in rng.integers(5, 35, (90, 2)) if a != b})
        diff = graph_difference(_ds(e1), _ds(e2)).materialize()
        got = apply_events(_ds(e1), diff).to_pandas()
        assert {(r.src, r.dst) for r in got.itertuples(index=False)} == set(e2)

    def test_empty_stream_identity(self):
        from networkit_ray.graph.dynamics import apply_events

        e = [(0, 1), (1, 2)]
        diff = graph_difference(_ds(e), _ds(e)).materialize()
        got = apply_events(_ds(e), diff).to_pandas()
        assert {(r.src, r.dst) for r in got.itertuples(index=False)} == set(e)


class TestDGSRoundtrip:
    def test_write_read_apply(self, tmp_path):
        from networkit_ray.graph.dynamics import apply_events
        from networkit_ray.sources.dgs import read_dgs, write_dgs

        rng = np.random.default_rng(21)
        e1 = sorted({(int(a), int(b)) for a, b in rng.integers(0, 25, (70, 2)) if a != b})
        e2 = sorted({(int(a), int(b)) for a, b in rng.integers(3, 28, (70, 2)) if a != b})
        diff = graph_difference(_ds(e1), _ds(e2)).materialize()
        p = str(tmp_path / "stream.dgs")
        write_dgs(diff, p)
        back = read_dgs(p).materialize()
        # identical event multiset after the roundtrip
        a = {(r.kind, r.u, r.v) for r in diff.to_pandas().itertuples(index=False)}
        b = {(r.kind, r.u, r.v) for r in back.to_pandas().itertuples(index=False)}
        assert a == b
        got = apply_events(_ds(e1), back).to_pandas()
        assert {(r.src, r.dst) for r in got.itertuples(index=False)} == set(e2)

    def test_header_written(self, tmp_path):
        from networkit_ray.sources.dgs import write_dgs

        diff = graph_difference(_ds([(0, 1)]), _ds([(0, 1), (1, 2)])).materialize()
        p = str(tmp_path / "s.dgs")
        write_dgs(diff, p)
        lines = open(p).read().splitlines()
        assert lines[0] == "DGS004"
        assert any(l.startswith("ae 1-2") for l in lines)
