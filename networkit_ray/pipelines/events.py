"""Stream-shaped ops over the ``events`` table (batch windowing).

Ray Data has no event-time watermarks; the reference's only "streaming" is
batch-replayed graph events (networkit/cpp/dynamics/GraphUpdater.cpp:65) with
no windows either.  For the training-data engine we treat ``events`` as an
ordered, partitioned log: partition by ``user_id``, order by (ts, event_id)
within the partition, and implement windows inside ``groupby.map_groups``.
Ordering assumption: per-user event streams fit one group; results are
independent of block layout because grouping is by key, not arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from networkit_ray.common.hashing import round_half_away
from networkit_ray.common.schema import enforce_schema

US_PER_HOUR = 3_600_000_000


def tumbling_window(
    events: ray.data.Dataset, *, window_us: int = US_PER_HOUR
) -> ray.data.Dataset:
    """(user_id, window, n_events, sum_value) per user per tumbling window.

    window = floor(epoch_us / window_us) as int64 (epoch-aligned).  Partial
    per-batch aggregation before the (user_id, window) shuffle.
    """

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = ts // window_us
        tt = pa.table(
            {
                "user_id": t["user_id"],
                "win": pa.array(win),
                "value": t["value"],
            }
        )
        g = tt.group_by(["user_id", "win"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "win": g["win"],
                "_n": pa.compute.cast(g["count_all"], pa.int64()),
                "_s": g["value_sum"],
            }
        )

    partials = events.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["user_id", "win"]).aggregate(
        Sum("_n", alias_name="n_events"), Sum("_s", alias_name="sum_value")
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "win": t["win"],
                "n_events": t["n_events"],
                "sum_value": pa.array(
                    round_half_away(t["sum_value"].to_numpy(zero_copy_only=False), 6)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def sliding_window(
    events: ray.data.Dataset,
    *,
    window_us: int = US_PER_HOUR,
    slide_us: int = US_PER_HOUR // 2,
) -> ray.data.Dataset:
    """(user_id, win, n_events, sum_value) per epoch-aligned SLIDING window.

    Window w covers [w·slide, w·slide + window); an event at ts belongs to
    every w in (ts − window, ts]·(1/slide] — i.e. window/slide assignments
    per event (the standard overlap factor).  Assignment fan-out happens
    per batch (vectorized repeat), partially aggregated before the one
    (user_id, win) shuffle — the same combiner discipline as tumbling.
    """
    if window_us % slide_us != 0:
        raise ValueError("window_us must be a multiple of slide_us")
    k = window_us // slide_us

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        last = ts // slide_us  # newest window containing the event
        offs = np.arange(k, dtype=np.int64)
        win = (last[:, None] - offs[None, :]).reshape(-1)
        keep = win >= 0
        tt = pa.table(
            {
                "user_id": pa.array(np.repeat(uid, k)[keep]),
                "win": pa.array(win[keep]),
                "value": pa.array(np.repeat(val, k)[keep]),
            }
        )
        g = tt.group_by(["user_id", "win"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "win": g["win"],
                "_n": pa.compute.cast(g["count_all"], pa.int64()),
                "_s": g["value_sum"],
            }
        )

    partials = events.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["user_id", "win"]).aggregate(
        Sum("_n", alias_name="n_events"), Sum("_s", alias_name="sum_value")
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "win": t["win"],
                "n_events": t["n_events"],
                "sum_value": pa.array(
                    round_half_away(t["sum_value"].to_numpy(zero_copy_only=False), 6)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def sessionize(
    events: ray.data.Dataset, *, gap_us: int = 30 * 60 * 1_000_000
) -> ray.data.Dataset:
    """(user_id, session, n_events, start_us, end_us) — session windows.

    A session breaks when the gap to the previous event (ordered by
    (ts, event_id)) exceeds ``gap_us``.  session = 0-based per-user index.
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        brk = np.zeros(len(ts), dtype=np.int64)
        if len(ts) > 1:
            brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sess = np.cumsum(brk)
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "session": sess, "ts": ts})
        agg = (
            out.groupby("session")
            .agg(n_events=("ts", "size"), start_us=("ts", "min"), end_us=("ts", "max"))
            .reset_index()
        )
        agg["user_id"] = g["user_id"].iloc[0]
        return agg[["user_id", "session", "n_events", "start_us", "end_us"]]

    out = events.groupby("user_id").map_groups(per_user, batch_format="pandas")
    return enforce_schema(
        out,
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("session", pa.int64()),
                ("n_events", pa.int64()),
                ("start_us", pa.int64()),
                ("end_us", pa.int64()),
            ]
        ),
    )


def event_type_histogram(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, n) global histogram."""
    return events.groupby("event_type").aggregate(Count(alias_name="n"))
