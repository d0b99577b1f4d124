"""Exhausted-unroll guards in the fixture-pinned SQL twins must FAIL
loudly (duckdb error()) instead of silently diverging — round-4 advice.

The positive direction (default bounds produce exact matches) is covered
by the driver CORRECTNESS runs and tests/test_entry.py; here we shrink
each bound below what the fixture needs and assert the oracle raises."""

import os

import duckdb
import pytest

SF = os.environ.get("GRAFT_SF_TINY", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, t + ".parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _ring():
    from networkit_ray.sources.derive import SUPPLIER_RING_SQL

    return SUPPLIER_RING_SQL


def test_cutcluster_aug_rounds_guard(con):
    from __ray_entry__ import _cutcluster_sql

    with pytest.raises(Exception, match="aug_rounds=2.*unroll exhausted"):
        con.execute(_cutcluster_sql(aug_rounds=2).replace("{RING}", _ring()))


def test_cutcluster_slots_guard(con):
    from __ray_entry__ import _cutcluster_sql

    with pytest.raises(Exception, match="slots=1 unroll exhausted"):
        con.execute(_cutcluster_sql(slots=1).replace("{RING}", _ring()))


def test_lfm_cover_outer_guard(con):
    from __ray_entry__ import _lfm_cover_sql

    with pytest.raises(Exception, match="outer=1 unroll exhausted"):
        con.execute(_lfm_cover_sql(outer=1).replace("{RING}", _ring()))


def test_maxflow_aug_rounds_guard(con):
    import __ray_entry__ as e

    # a 4-cycle needs two edge-disjoint augmenting paths from 0, so a
    # 1-round unroll must trip the residual-path guard
    sym = ("SELECT src, dst FROM (VALUES (0, 1), (1, 0), (1, 2), (2, 1), "
           "(2, 3), (3, 2), (3, 0), (0, 3)) t(src, dst)")
    with pytest.raises(Exception, match="aug_rounds=1.*unroll exhausted"):
        con.execute(e._maxflow_sql(aug_rounds=1).replace("{SYM}", sym))


def test_lfr_hh_steps_guard(con):
    from __ray_entry__ import _lfr_parts

    p = _lfr_parts(hh_steps=2)
    sql = "WITH " + ",\n".join(p) + "\nSELECT src, dst FROM lfedges"
    with pytest.raises(Exception, match="hh_steps=2 unroll exhausted"):
        con.execute(sql)


def test_lfr_assign_rounds_guard(con):
    from __ray_entry__ import _lfr_parts

    p = _lfr_parts(assign_rounds=1)
    sql = "WITH " + ",\n".join(p) + "\nSELECT src, dst FROM lfedges"
    with pytest.raises(Exception, match="assign_rounds=1 unroll exhausted"):
        con.execute(sql)


def test_lfr_blk_follows_comm_args():
    """The community-size block is computed from min_comm/max_comm
    (round-4 advice: it was hardcoded n // 40 + 2)."""
    from __ray_entry__ import _lfr_parts

    p40 = "\n".join(_lfr_parts())
    p10 = "\n".join(_lfr_parts(min_comm=5, max_comm=15))
    assert "// 40 + 2" in p40
    assert "// 10 + 2" in p10
