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


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str = "user_id",
    on: str = "ts_us",
    tiebreak: str = "event_id",
) -> ray.data.Dataset:
    """As-of join: each left row matches the LATEST right row of the same
    ``by`` key with right.on ≤ left.on (ties broken by max ``tiebreak``).

    Ray Data has no as-of join; the re-expression is a single hash exchange
    on ``by`` (both sides co-partitioned with the raw-task exchange) + a
    per-partition sorted ``searchsorted`` merge — no per-row Python, one
    binary search per left row inside each (partition, key) run.  Inner
    semantics: unmatched left rows are dropped.

    Expected columns: ``by``, ``on``, ``tiebreak`` int64 on both sides;
    other columns pass through with ``l_``/``r_`` prefixes.
    """
    from networkit_ray.common.exchange import partition_refs

    P = max(2, min(32, 8))
    lsl = partition_refs(left, [by], P)
    rsl = partition_refs(right, [by], P)

    @ray.remote
    def merge(n_left: int, *tables) -> pa.Table:
        lt = [t for t in tables[:n_left] if t is not None]
        rt = [t for t in tables[n_left:] if t is not None]
        out_schema = pa.schema(
            [
                (by, pa.int64()),
                (f"l_{tiebreak}", pa.int64()),
                (f"l_{on}", pa.int64()),
                (f"r_{tiebreak}", pa.int64()),
                (f"r_{on}", pa.int64()),
            ]
        )
        if not lt or not rt:
            return out_schema.empty_table()
        L = pa.concat_tables(lt, promote_options="default")
        R = pa.concat_tables(rt, promote_options="default")
        lk = L[by].to_numpy(zero_copy_only=False)
        lo_ = L[on].to_numpy(zero_copy_only=False)
        lid = L[tiebreak].to_numpy(zero_copy_only=False)
        rk = R[by].to_numpy(zero_copy_only=False)
        ro_ = R[on].to_numpy(zero_copy_only=False)
        rid = R[tiebreak].to_numpy(zero_copy_only=False)
        lorder = np.lexsort((lid, lo_, lk))
        rorder = np.lexsort((rid, ro_, rk))
        lk, lo_, lid = lk[lorder], lo_[lorder], lid[lorder]
        rk, ro_, rid = rk[rorder], ro_[rorder], rid[rorder]
        # per-key runs on the right side
        uk = np.unique(lk)
        r_lo = np.searchsorted(rk, uk, side="left")
        r_hi = np.searchsorted(rk, uk, side="right")
        l_lo = np.searchsorted(lk, uk, side="left")
        l_hi = np.searchsorted(lk, uk, side="right")
        out_k, out_li, out_lo, out_ri, out_ro = [], [], [], [], []
        for i, k in enumerate(uk):
            ra, rb = r_lo[i], r_hi[i]
            if ra == rb:
                continue
            la, lb = l_lo[i], l_hi[i]
            seg_t, seg_i = ro_[ra:rb], rid[ra:rb]
            pos = np.searchsorted(seg_t, lo_[la:lb], side="right") - 1
            ok = pos >= 0
            if not ok.any():
                continue
            out_k.append(np.full(int(ok.sum()), k, np.int64))
            out_li.append(lid[la:lb][ok])
            out_lo.append(lo_[la:lb][ok])
            out_ri.append(seg_i[pos[ok]])
            out_ro.append(seg_t[pos[ok]])
        if not out_k:
            return out_schema.empty_table()
        return pa.table(
            {
                by: pa.array(np.concatenate(out_k)),
                f"l_{tiebreak}": pa.array(np.concatenate(out_li)),
                f"l_{on}": pa.array(np.concatenate(out_lo)),
                f"r_{tiebreak}": pa.array(np.concatenate(out_ri)),
                f"r_{on}": pa.array(np.concatenate(out_ro)),
            }
        )

    out = [
        merge.remote(len(lsl), *[s[p] for s in lsl], *[s[p] for s in rsl])
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


def asof_click_to_view(events: ray.data.Dataset) -> ray.data.Dataset:
    """Each click joined to the user's most recent prior (or simultaneous)
    view — the canonical attribution as-of join."""

    def prep(kind):
        def f(t: pa.Table) -> pa.Table:
            mask = pa.compute.equal(t["event_type"], kind)
            s = t.filter(mask)
            ts = s["ts"].cast(pa.int64())
            return pa.table(
                {
                    "user_id": s["user_id"],
                    "event_id": s["event_id"],
                    "ts_us": ts,
                }
            )

        return f

    clicks = events.map_batches(prep("click"), batch_format="pyarrow")
    views = events.map_batches(prep("view"), batch_format="pyarrow")
    return asof_join(clicks, views)


def event_type_histogram(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, n) global histogram."""
    return events.groupby("event_type").aggregate(Count(alias_name="n"))


def approx_distinct_users(
    events: ray.data.Dataset, *, r: int = 64, seed: int = 42
) -> ray.data.Dataset:
    """(event_type, approx_distinct) — Flajolet–Martin distinct-user sketch.

    The streaming COUNT(DISTINCT user_id) GROUP BY event_type: each batch
    folds its users into r FM bitmasks per key (bitwise-OR union — the
    same sketch algebra as graph/diameter.py's ANF), so the shuffle moves
    r uint64 words per (batch, key) instead of the user set.  Estimate
    2^R̄ / 0.77351 with R̄ the mean least-zero-bit position over rows.
    Deterministic (splitmix64 counter hash) at any parallelism.
    """
    import numpy as np
    import pandas as pd

    from networkit_ray.sources.synth import _splitmix64

    rows64 = np.arange(r, dtype=np.uint64)

    def _trailing_ones(x: np.ndarray) -> np.ndarray:
        """Position of the least-significant ZERO bit (vectorized)."""
        inv = ~x
        lsb = inv & (~inv + np.uint64(1))
        safe = np.where(lsb == 0, np.uint64(1), lsb)  # all-ones word → 64
        out = np.log2(safe.astype(np.float64)).astype(np.int64)
        return np.where(lsb == 0, np.int64(64), out)

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        et = pd.Series(t["event_type"].to_pandas())
        ks, rws, bts = [], [], []
        for key, idx in et.groupby(et).groups.items():
            u = uid[np.asarray(idx)]
            # (users × r) hashes in one vectorized shot
            h = _splitmix64(
                u[:, None] * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(seed) * np.uint64(r)
                + rows64[None, :]
            )
            rho = np.minimum(_trailing_ones(h), 63).astype(np.uint64)
            masks = np.bitwise_or.reduce(
                (np.uint64(1) << rho).astype(np.uint64), axis=0
            )
            ks.extend([key] * r)
            rws.extend(range(r))
            bts.extend(masks.astype(np.int64).tolist())
        return pa.table(
            {
                "event_type": pa.array(ks, pa.string()),
                "row": pa.array(rws, pa.int64()),
                "bits": pa.array(bts, pa.int64()),
            }
        )

    def union_rows(df: pd.DataFrame) -> pd.DataFrame:
        b = np.bitwise_or.reduce(df["bits"].to_numpy().astype(np.uint64))
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "row": [df["row"].iloc[0]],
                "bits": [np.int64(b)],
            }
        )

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        b = df["bits"].to_numpy().astype(np.uint64)
        lz = _trailing_ones(b).astype(np.float64)
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "approx_distinct": [float(2.0 ** lz.mean() / 0.77351)],
            }
        )

    sk = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "row"])
        .map_groups(union_rows, batch_format="pandas")
    )
    return sk.groupby("event_type").map_groups(estimate, batch_format="pandas")
