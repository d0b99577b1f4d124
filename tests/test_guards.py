"""Bounded-group contract guards (common/guards.py): a pathological key
must raise a diagnosable error instead of silently hanging one task."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from networkit_ray.common.guards import check_group_rows


def test_check_group_rows_passes_and_raises():
    check_group_rows(100, 100, "site", "hint")  # at the limit: fine
    with pytest.raises(ValueError, match="site.*bounded-group.*pull this"):
        check_group_rows(101, 100, "site", "pull this lever")


def test_linkpred_giant_hub_raises(ray_session):
    from networkit_ray.graph.linkpred import link_prediction_scores

    # star with a 8193-degree hub: O(deg^2) wedge expansion must refuse
    n = 8193
    hub = np.zeros(n, np.int64)
    leaf = np.arange(1, n + 1, dtype=np.int64)
    sym = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.r_[hub, leaf]),
                "dst": pa.array(np.r_[leaf, hub]),
            }
        )
    )
    canon = rd.from_arrow(
        pa.table({"src": pa.array(hub), "dst": pa.array(leaf)})
    )
    with pytest.raises(Exception, match="bounded-group"):
        link_prediction_scores(sym, canon).materialize()
    # the documented lever works: capping hub degree skips the hub group
    out = link_prediction_scores(sym, canon, max_deg=64).to_pandas()
    assert len(out) == 0  # leaves have degree 1 -> no wedges
