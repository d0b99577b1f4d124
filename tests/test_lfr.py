"""LFR benchmark generator tests.

Reference behavior: generators/LFRGenerator.cpp (pipeline) and
generators/PowerlawDegreeSequence.cpp (discrete powerlaw sampling with
average-degree calibration); recovery-style assertions follow the
reference's community test pattern (community/test/CommunityGTest.cpp —
planted ground truth recovered by the detectors).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from networkit_ray.sources.lfr import (
    expected_average_degree,
    lfr_graph,
    min_degree_for_average,
    powerlaw_degrees,
    powerlaw_sequence,
    realized_mixing,
)

PARAMS = dict(mu=0.15, min_deg=4, max_deg=20, min_comm=20, max_comm=60, seed=42)


@pytest.fixture(scope="module")
def lfr600():
    edges, comms, info = lfr_graph(600, **PARAMS)
    return edges.materialize(), comms.materialize(), info


def test_powerlaw_expected_average_monotone():
    avgs = [expected_average_degree(-2.0, lo, 64) for lo in (2, 4, 8, 16)]
    assert all(a < b for a, b in zip(avgs, avgs[1:]))


def test_min_degree_for_average_calibrates():
    lo = min_degree_for_average(-2.0, 10.0, 64)
    got = expected_average_degree(-2.0, lo, 64)
    # integer bisection: nearest achievable average
    below = expected_average_degree(-2.0, max(1, lo - 1), 64)
    above = expected_average_degree(-2.0, min(64, lo + 1), 64)
    assert min(below, got, above) <= 10.0 <= max(below, got, above)


def test_powerlaw_sequence_bounds_and_determinism():
    s1 = powerlaw_sequence(500, -1.5, 10, 50, seed=7)
    s2 = powerlaw_sequence(500, -1.5, 10, 50, seed=7)
    assert (s1 == s2).all()
    assert s1.min() >= 10 and s1.max() <= 50
    # heavier mass at the low end for a decaying pmf
    assert (s1 <= 20).sum() > (s1 >= 40).sum()


def test_powerlaw_degrees_distributed_matches_pmf():
    ds = powerlaw_degrees(2000, -2.0, 4, 32, seed=3).materialize()
    deg = ds.to_pandas()["deg"].to_numpy()
    assert len(deg) == 2000
    assert deg.min() >= 4 and deg.max() <= 32
    exp = expected_average_degree(-2.0, 4, 32)
    assert abs(deg.mean() - exp) / exp < 0.1


def test_lfr_sizes_and_structure(lfr600):
    edges, comms, info = lfr600
    t = edges.to_pandas()
    # canonical simple graph
    assert (t["src"] < t["dst"]).all()
    assert not t.duplicated(["src", "dst"]).any()
    assert comms.count() == 600
    cp = comms.to_pandas()
    assert sorted(cp["v"]) == list(range(600))
    sizes = cp.groupby("c").size()
    assert sizes.sum() == 600
    assert info["communities"] == len(sizes)


def test_lfr_degree_sequence_close_to_target(lfr600):
    edges, _, info = lfr600
    from networkit_ray.graph.build import symmetrize

    deg = symmetrize(edges).groupby("src").count().to_pandas()
    assert deg["count()"].max() <= PARAMS["max_deg"]
    exp = expected_average_degree(-2.0, PARAMS["min_deg"], PARAMS["max_deg"])
    # duplicate-drop + odd-stub loss bounded: within 15% of the target mean
    assert abs(deg["count()"].mean() - exp) / exp < 0.15


def test_lfr_realized_mixing_near_mu(lfr600):
    edges, comms, _ = lfr600
    mu_hat = realized_mixing(edges, comms)
    # inter pairs that collide (same community / self) drop, so the
    # realized mixing sits at or slightly below the target
    assert PARAMS["mu"] - 0.07 <= mu_hat <= PARAMS["mu"] + 0.04


def test_lfr_deterministic(lfr600):
    edges, comms, _ = lfr600
    e2, c2, _ = lfr_graph(600, **PARAMS)
    d1 = edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    d2 = e2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert d1.equals(d2)
    p1 = comms.to_pandas().sort_values("v").reset_index(drop=True)
    p2 = c2.to_pandas().sort_values("v").reset_index(drop=True)
    assert p1.equals(p2)


def test_louvain_recovers_planted_lfr_communities(lfr600):
    """Ground-truth recovery on a low-mixing LFR graph — the reference's
    standard use of LFR (CommunityGTest.cpp)."""
    edges, comms, _ = lfr600
    from networkit_ray.graph.build import symmetrize
    from networkit_ray.graph.louvain import louvain
    from networkit_ray.graph.quality import nmi

    sym = symmetrize(edges).materialize()
    labels, _ = louvain(sym, 600)
    planted = comms.map_batches(
        lambda t: pa.table({"v": t["v"], "label": t["c"]}),
        batch_format="pyarrow",
    )
    score = nmi(labels, planted, 600)
    assert score > 0.6, f"NMI {score}"


def test_lfr_replayable_mode_deterministic_and_valid(ray_session):
    """replayable=True (the SQL-oracle-backing mode): bit-identical across
    runs, canonical structure intact, and mixing still lands near mu."""
    edges1, comms1, info1 = lfr_graph(400, replayable=True, **PARAMS)
    edges2, comms2, _ = lfr_graph(400, replayable=True, **PARAMS)
    e1 = edges1.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    e2 = edges2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert e1.equals(e2)
    c1 = comms1.to_pandas().sort_values("v").reset_index(drop=True)
    c2 = comms2.to_pandas().sort_values("v").reset_index(drop=True)
    assert c1.equals(c2)

    # canonical edge invariants
    assert (e1["src"] < e1["dst"]).all()
    assert not e1.duplicated(["src", "dst"]).any()
    assert set(c1["v"]) == set(range(400))

    # the mode changes intra-community wiring, not the contract: realized
    # mixing must still be near the target mu
    mix = realized_mixing(edges1, comms1)
    assert abs(mix - PARAMS["mu"]) < 0.10, mix
