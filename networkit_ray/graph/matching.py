"""Local-max matching — deterministic distributed rounds.

Reference: matching/ (LocalMaxMatcher / Suitor family).  Each round an
edge joins the matching iff it carries the minimum priority among the
remaining edges at BOTH endpoints (the "locally dominant" edge rule);
matched vertices leave, incident edges drop, repeat.  Terminates in
O(log m) expected rounds (the globally minimum edge always matches).

Priorities are collision-free by construction: p(e) = ((lo·n + hi + 1)
·GOLD) mod 2^64 is bijective in the packed edge id while n² < 2^64, so
no tie-breaking is needed and the DuckDB twin replays rounds exactly
(walks.py/mis.py determinism pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from networkit_ray.common.exchange import exchange_join

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def local_max_matching(
    canon: ray.data.Dataset,
    num_nodes: int,
    *,
    max_rounds: int = 64,
) -> tuple[ray.data.Dataset, dict]:
    """(src, dst) matched edges (canonical lo<hi) + info dict."""
    n = np.uint64(num_nodes)

    def with_prio(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (src * n + dst + np.uint64(1)) * _GOLD
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                # signed view shifted so int64 Min() preserves uint64 order
                "p": pa.array((p ^ np.uint64(1 << 63)).view(np.int64)),
            }
        )

    active = canon.select_columns(["src", "dst"]).map_batches(
        with_prio, batch_format="pyarrow"
    ).materialize()
    matched_parts: list[ray.data.Dataset] = []
    rounds = 0
    for _ in range(max_rounds):
        if active.count() == 0:
            break
        rounds += 1
        ends = active.map_batches(
            lambda t: pa.table(
                {
                    "v": pa.concat_arrays(
                        [
                            t["src"].combine_chunks().cast(pa.int64()),
                            t["dst"].combine_chunks().cast(pa.int64()),
                        ]
                    ),
                    "p": pa.concat_arrays(
                        [t["p"].combine_chunks(), t["p"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        vmin = ends.groupby("v").aggregate(Min("p", alias_name="mp"))
        j1 = exchange_join(
            active,
            vmin.map_batches(
                lambda t: pa.table({"src": t["v"], "mu": t["mp"]}),
                batch_format="pyarrow",
            ),
            left_on=["src"],
        )
        j2 = exchange_join(
            j1,
            vmin.map_batches(
                lambda t: pa.table({"dst": t["v"], "mv": t["mp"]}),
                batch_format="pyarrow",
            ),
            left_on=["dst"],
        )

        def dominant(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.and_(
                pc.equal(t["p"], t["mu"]), pc.equal(t["p"], t["mv"])
            )
            return t.filter(keep).select(["src", "dst"])

        won = j2.map_batches(dominant, batch_format="pyarrow").materialize()
        if won.count() == 0:
            break
        matched_parts.append(won)
        # drop edges incident to a matched vertex
        mv = won.map_batches(
            lambda t: pa.table(
                {
                    "v": pa.concat_arrays(
                        [
                            t["src"].combine_chunks().cast(pa.int64()),
                            t["dst"].combine_chunks().cast(pa.int64()),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        active = exchange_join(
            active, mv, left_on=["src"], right_on=["v"], join_type="left anti"
        )
        active = exchange_join(
            active, mv, left_on=["dst"], right_on=["v"], join_type="left anti"
        ).materialize()
    out = matched_parts[0] if matched_parts else ray.data.from_arrow(
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()
    )
    for p_ in matched_parts[1:]:
        out = out.union(p_)
    return out, {"rounds": rounds}
