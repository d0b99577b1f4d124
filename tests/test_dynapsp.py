"""DynAPSP / DynTopHarmonicCloseness repair == full recompute.

Reference semantics: distance/DynAPSP.cpp (insert-event repair),
centrality/DynTopHarmonicCloseness.cpp (maintained top-k)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.bfs import apsp_table
from networkit_ray.graph.dynapsp import dyn_apsp_update, top_harmonic_from_apsp


def sym_ds(pairs):
    a = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    return rd.from_arrow(pa.table({"src": pa.array(a), "dst": pa.array(b)}))


def pairs_df(ds):
    return (
        ds.to_pandas()
        .sort_values(["s", "v"])
        .reset_index(drop=True)[["s", "v", "d"]]
    )


class TestDynAPSP:
    def test_repair_matches_full_recompute(self, ray_session):
        rng = np.random.default_rng(11)
        n = 24
        e = np.unique(rng.integers(0, n, size=(70, 2)), axis=0)
        full = [tuple(x) for x in e if x[0] != x[1]]
        # canonical dedup
        full = sorted({(min(a, b), max(a, b)) for a, b in full})
        held = [p for i, p in enumerate(full) if i % 5 == 0][:4]
        part = [p for p in full if p not in held]

        base = apsp_table(sym_ds(part).materialize(), n, num_parts=3)
        repaired = dyn_apsp_update(base, held, n)
        want = apsp_table(sym_ds(full).materialize(), n, num_parts=3)
        a, b = pairs_df(repaired), pairs_df(want)
        assert a.equals(b)

    def test_insert_reconnects_components(self, ray_session):
        # two disjoint paths 0-1-2 and 3-4; insert {2,3} merges them
        part = [(0, 1), (1, 2), (3, 4)]
        base = apsp_table(sym_ds(part).materialize(), 5, num_parts=2)
        repaired = dyn_apsp_update(base, [(2, 3)], 5)
        want = apsp_table(
            sym_ds(part + [(2, 3)]).materialize(), 5, num_parts=2
        )
        assert pairs_df(repaired).equals(pairs_df(want))

    def test_top_harmonic_matches_recompute(self, ray_session):
        part = [(0, 1), (1, 2), (2, 3), (4, 5)]
        base = apsp_table(sym_ds(part).materialize(), 6, num_parts=2)
        repaired = dyn_apsp_update(base, [(3, 4), (5, 0)], 6)
        got = top_harmonic_from_apsp(repaired, 3)
        full = apsp_table(
            sym_ds(part + [(3, 4), (5, 0)]).materialize(), 6, num_parts=2
        )
        want = top_harmonic_from_apsp(full, 3)
        assert list(got["v"]) == list(want["v"])
        np.testing.assert_allclose(got["harmonic"], want["harmonic"])


class TestDynAPSPBatch:
    def test_batch_fixpoint_equals_sequential_interacting(self, ray_session):
        # held-out edges form a chain 5-6, 6-7, 7-8: new shortest paths
        # use SEVERAL inserted edges, so a single joint pass is not
        # enough and the fixpoint rounds must kick in
        part = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]
        held = [(5, 6), (6, 7), (7, 8)]
        n = 10
        base = apsp_table(sym_ds(part).materialize(), n, num_parts=3)
        seq = dyn_apsp_update(base, held, n)
        bat = dyn_apsp_update(base, held, n, batch=True)
        want = apsp_table(sym_ds(part + held).materialize(), n, num_parts=3)
        assert pairs_df(bat).equals(pairs_df(want))
        assert pairs_df(seq).equals(pairs_df(want))

    def test_batch_random_equals_recompute(self, ray_session):
        rng = np.random.default_rng(5)
        n = 20
        e = np.unique(rng.integers(0, n, size=(60, 2)), axis=0)
        full = sorted({(min(a, b), max(a, b)) for a, b in e if a != b})
        held = [p for i, p in enumerate(full) if i % 4 == 0][:5]
        part = [p for p in full if p not in held]
        base = apsp_table(sym_ds(part).materialize(), n, num_parts=2)
        bat = dyn_apsp_update(base, held, n, batch=True, num_parts=3)
        want = apsp_table(sym_ds(full).materialize(), n, num_parts=2)
        assert pairs_df(bat).equals(pairs_df(want))
