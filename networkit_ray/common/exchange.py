"""Raw-task hash exchange for high-volume dedup / repartition / join.

Ray Data's hash-shuffle ``groupby``/``join`` operators pay per-group and
per-call aggregator-actor overhead that is pathological for edge-table work
(tens of millions of 1-row groups; seconds of actor-pool spin-up per join).
These helpers run the same logical exchange as the BSP engine's build:

- input blocks are COALESCED into ~P map tasks (per-task arg-resolution cost
  scales with the number of object refs, so a blocks×P exchange with many
  small blocks is dominated by fetch overhead — measured 19s → <2s at 33M
  rows by batching);
- each map task splits its rows by key hash with ``num_returns=P`` so every
  reduce task fetches exactly P slices;
- reduce is one vectorized Arrow ``group_by`` / ``Table.join`` per partition.

Keys must be integer-valued columns (the hash casts to uint64).  Output row
order is undefined (as with any shuffle); the row SET is deterministic and
partition-count-invariant.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.common.hashing import vpart

_GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _key_hash(t: pa.Table, key_cols: list[str]) -> np.ndarray:
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for c in key_cols:
        col = t[c]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # vectorized FNV-ish over utf8 bytes via pandas hashing
            import pandas as pd

            v = pd.util.hash_array(
                col.to_pandas().to_numpy(dtype=object), categorize=False
            ).astype(np.uint64)
        else:
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (h * _GOLD2) ^ (v * np.uint64(0x9E3779B97F4A7C15))
    return h


def _default_parts(n_refs: int | None = None) -> int:
    """Exchange width: CPU-bound, but never wider than the input block
    count — tiny inputs otherwise pay P× fixed reduce-task overhead.

    Same deployment knob as ``graph.bsp.default_parts``: the 64-part cap is
    sandbox-tuned and raised per cluster via ``NKR_MAX_PARTS`` (e.g. 256
    nodes × 16 slots → ``NKR_MAX_PARTS=4096``)."""
    max_parts = int(os.environ.get("NKR_MAX_PARTS", "64"))
    p = max(2, min(max_parts, int(ray.cluster_resources().get("CPU", 8))))
    if n_refs is not None:
        p = max(2, min(p, n_refs))
    return p


def _num_blocks(ds: ray.data.Dataset) -> int | None:
    """Block count when cheaply known (materialized datasets only)."""
    try:
        nb = ds.num_blocks()
        return nb if isinstance(nb, int) and nb > 0 else None
    except NotImplementedError:
        return None


def _chunks(refs: list, k: int) -> list[list]:
    """Split refs into ≤k contiguous groups."""
    k = max(1, min(k, len(refs)))
    step = -(-len(refs) // k)
    return [refs[i : i + step] for i in range(0, len(refs), step)]


def _group_agg(t: pa.Table, key_cols: list[str], aggs: list[tuple]) -> pa.Table:
    out = t.group_by(key_cols).aggregate(aggs)
    # group_by names aggregated columns "<col>_<fn>"; restore the originals
    # so the output schema matches the input (keys come first in the result).
    return out.rename_columns(key_cols + [c for c, _ in aggs])


@ray.remote
def _ex_map(key_cols: list[str], num_parts: int, pre_unique, *tables) -> tuple:
    # len(t) counts rows for both pa.Table and pd.DataFrame: Ray 2.49
    # forwards all-empty blocks past map_batches UNCONVERTED, so an empty
    # pandas block from an upstream map_groups can arrive here.
    ts = [
        t
        for t in tables
        if t is not None
        and len(t)
        and not set(key_cols) - set(t.column_names if isinstance(t, pa.Table) else t.columns)
    ]
    if not ts:
        return tuple([None] * num_parts)
    t = pa.concat_tables(ts, promote_options="default")
    if pre_unique is not None:
        t = _group_agg(t, key_cols, pre_unique)  # per-task combiner
    parts = vpart(_key_hash(t, key_cols), num_parts)
    order = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[order], np.arange(num_parts + 1))
    idx = pa.array(order)
    return tuple(
        t.take(idx.slice(bounds[p], bounds[p + 1] - bounds[p]))
        if bounds[p + 1] > bounds[p]
        else None
        for p in range(num_parts)
    )


@ray.remote
def _ex_unique(
    key_cols: list[str], schema: pa.Schema, aggs: list[tuple], *tables
) -> pa.Table:
    ts = [t for t in tables if t is not None]
    if not ts:
        return schema.empty_table()
    t = pa.concat_tables(ts, promote_options="default")
    return _group_agg(t, key_cols, aggs)


def partition_refs(
    ds: ray.data.Dataset,
    key_cols: list[str],
    num_parts: int,
    *,
    pre_unique: list[tuple] | None = None,
) -> list[list]:
    """Hash-partition a Dataset by key; returns [map_task][partition] refs.

    ``pre_unique`` — when not None, each map task runs a per-task combiner
    ``group_by(key_cols).aggregate(pre_unique)`` before the exchange (pass
    ``[]`` for plain distinct; aggregates must be associative: sum/min/max).
    """
    refs = ds.to_arrow_refs()
    groups = _chunks(refs, num_parts)
    return [
        _ex_map.options(num_returns=num_parts).remote(
            key_cols, num_parts, pre_unique, *g
        )
        for g in groups
    ]


def exchange_unique(
    ds: ray.data.Dataset,
    key_cols: list[str],
    *,
    num_parts: int | None = None,
    agg: list[tuple] | None = None,
    schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Distinct rows of ``key_cols`` via the raw-task hash exchange.

    Non-key columns must either be covered by ``agg`` (associative pyarrow
    aggregates, e.g. ``[("w", "sum")]``) or absent — silently dropping a
    weight column is a bug, so extra columns fail loudly.

    ``schema`` — explicit input schema; required when ``ds`` can be entirely
    empty (Ray then reports ``schema() is None``).
    """
    P = num_parts or _default_parts(_num_blocks(ds))
    ds_schema = ds.schema()
    in_schema = schema if ds_schema is None else ds_schema.base_schema
    extra = [c for c in in_schema.names if c not in key_cols]
    agg = agg or []
    covered = [c for c, _ in agg]
    if set(extra) != set(covered):
        raise ValueError(
            f"exchange_unique: non-key columns {extra} must be aggregated "
            f"explicitly (agg covers {covered})"
        )
    # Empty partitions must carry the same schema as real ones (mixed
    # int64/uint64 block schemas crash downstream concat/joins).
    schema = pa.schema(
        [in_schema.field(c) for c in key_cols] + [in_schema.field(c) for c in covered]
    )
    slices = partition_refs(ds, key_cols, P, pre_unique=agg)
    out = [
        _ex_unique.remote(key_cols, schema, agg, *[s[p] for s in slices])
        for p in range(P)
    ]
    return ray.data.from_arrow_refs(out)


@ray.remote
def _ex_join(
    left_keys: list[str],
    right_keys: list[str],
    join_type: str,
    n_left: int,
    *tables,
) -> pa.Table:
    # varargs so Ray dereferences every slice ref (refs nested in lists are
    # NOT auto-resolved)
    lt = [t for t in tables[:n_left] if t is not None]
    rt = [t for t in tables[n_left:] if t is not None]
    if not lt:
        return None
    left = pa.concat_tables(lt, promote_options="default")
    if not rt:
        # empty right side: outer and ANTI joins keep every left row
        # (returning None here silently dropped whole partitions of a
        # left-anti — e.g. active matching edges whose hash partition had
        # no matched vertex that round)
        if join_type.startswith("left outer") or join_type == "left anti":
            return left
        return None
    right = pa.concat_tables(rt, promote_options="default")
    return left.join(
        right, keys=left_keys, right_keys=right_keys, join_type=join_type
    )


@ray.remote
def _nonnull(t) -> bool:
    return t is not None


def exchange_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Hash-partitioned join via raw tasks + per-partition Arrow joins.

    join_type is pyarrow's ("inner", "left outer", "left semi", ...).
    The key hash is identical on both sides, so matching keys co-locate.
    """
    right_on = right_on or left_on
    P = num_parts or _default_parts(_num_blocks(left))
    lsl = partition_refs(left, left_on, P)
    rsl = partition_refs(right, right_on, P)
    out = [
        _ex_join.remote(
            left_on, right_on, join_type, len(lsl),
            *[s[p] for s in lsl], *[s[p] for s in rsl],
        )
        for p in range(P)
    ]
    keep = [r for r, ok in zip(out, ray.get([_nonnull.remote(o) for o in out])) if ok]
    if not keep:
        return ray.data.from_arrow(
            pa.table({c: pa.array([], pa.int64()) for c in left_on})
        )
    return ray.data.from_arrow_refs(keep)
