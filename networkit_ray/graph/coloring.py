"""Greedy distributed graph coloring (Jones–Plassmann rounds).

Reference: the Python-only networkit/coloring.py module (sequential
greedy); the distributed schedule is Jones–Plassmann: a vertex colors
itself in the round where its priority is the strict maximum among its
still-uncolored neighbors, taking the mex (smallest unused color) of its
already-colored neighborhood.  Local maxima in a round are mutually
non-adjacent, so simultaneous coloring against PREVIOUS rounds' colors
is race-free and the result is deterministic.

Priorities are the fixed bijective draw p(v) = ((v+1)·GOLD) mod 2^64 —
no ties, and the DuckDB twin replays the rounds exactly (mis.py
pattern).  Expected rounds ≈ O(log n / log log n) on random priorities.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max

from networkit_ray.common.exchange import exchange_join
from networkit_ray.common.schema import enforce_schema

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _prio_i64(v: np.ndarray) -> np.ndarray:
    return (
        ((v.astype(np.uint64) + np.uint64(1)) * _GOLD) ^ np.uint64(1 << 63)
    ).view(np.int64)


def _sequential_greedy(edges: pa.Table, num_nodes: int) -> pa.Table:
    """Sequential greedy in strictly decreasing priority order — provably
    identical output to the Jones–Plassmann rounds (a vertex's JP color is
    the mex over exactly its higher-priority neighbors, which is exactly
    the set already processed when greedy reaches it)."""
    src = edges["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(-_prio_i64(np.arange(num_nodes, dtype=np.int64)), kind="stable")
    # CSR adjacency
    deg = np.bincount(src, minlength=num_nodes)
    off = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(deg, out=off[1:])
    adj = dst[np.argsort(src, kind="stable")]
    color = np.full(num_nodes, -1, dtype=np.int64)
    for v in order:
        nc = color[adj[off[v] : off[v + 1]]]
        nc = np.unique(nc[nc >= 0])
        m = 0
        for c in nc:
            if c == m:
                m += 1
            elif c > m:
                break
        color[v] = m
    return pa.table(
        {"v": pa.array(np.arange(num_nodes, dtype=np.int64)), "color": pa.array(color)}
    )


def greedy_coloring(
    sym: ray.data.Dataset,
    num_nodes: int,
    *,
    max_rounds: int = 64,
    single_task_threshold: int = 5_000_000,
) -> tuple[ray.data.Dataset, dict]:
    """(v, color) proper coloring of every vertex + info dict.

    Graphs whose symmetric edge table fits one worker (≤
    ``single_task_threshold`` edges) run the sequential-greedy twin in a
    single remote task — same output, none of the JP round latency.  The
    distributed JP rounds are the scale path."""
    m_edges = sym.count()
    if m_edges <= single_task_threshold:
        refs = sym.select_columns(["src", "dst"]).to_arrow_refs()

        @ray.remote(num_cpus=1)
        def _run(*blocks):
            tbls = [
                b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
                for b in blocks
            ]
            tbl = (
                pa.concat_tables(tbls, promote_options="default")
                if tbls
                else pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
            )
            return _sequential_greedy(tbl, num_nodes)

        out_ref = _run.remote(*refs)
        return ray.data.from_arrow_refs([out_ref]), {"rounds": 1, "mode": "single_task"}
    active = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(num_nodes, dtype=np.int64))})
    ).materialize()
    edges_full = sym.select_columns(["src", "dst"]).materialize()
    edges = edges_full
    colored_parts: list[ray.data.Dataset] = []
    colored_all: ray.data.Dataset | None = None
    rounds = 0
    for _ in range(max_rounds):
        if active.count() == 0:
            break
        rounds += 1
        # edges among active vertices
        e1 = exchange_join(edges, active, left_on=["src"], right_on=["v"], join_type="left semi")
        ea = exchange_join(e1, active, left_on=["dst"], right_on=["v"], join_type="left semi").materialize()

        def with_prio(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"dst": t["dst"], "p": pa.array(_prio_i64(src))}
            )

        nbr_max = (
            ea.map_batches(with_prio, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Max("p", alias_name="nbr_max"))
        )
        j = exchange_join(
            active,
            nbr_max.map_batches(
                lambda t: pa.table({"v": t["dst"], "nbr_max": t["nbr_max"]}),
                batch_format="pyarrow",
            ),
            left_on=["v"],
            join_type="left outer",
        )

        def pick(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            own = _prio_i64(v)
            if "nbr_max" in t.column_names:
                nm = (
                    pc.fill_null(t["nbr_max"], np.iinfo(np.int64).min)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                win = own > nm
            else:
                win = np.ones(len(v), dtype=bool)
            return pa.table({"v": pa.array(v[win])})

        winners = j.map_batches(pick, batch_format="pyarrow").materialize()

        # mex over ALREADY-colored neighbors of each winner — against the
        # FULL edge table (the active-filtered one has no edges to
        # colored vertices, which are exactly the ones mex needs)
        we = exchange_join(
            edges_full, winners, left_on=["src"], right_on=["v"], join_type="left semi"
        )
        if colored_all is not None:
            wc = exchange_join(
                we,
                colored_all.map_batches(
                    lambda t: pa.table({"dst": t["v"], "ncol": t["color"]}),
                    batch_format="pyarrow",
                ),
                left_on=["dst"],
            ).map_batches(
                lambda t: pa.table({"v": t["src"], "ncol": t["ncol"]}),
                batch_format="pyarrow",
            )
        else:
            wc = ray.data.from_arrow(
                pa.table(
                    {"v": pa.array([], pa.int64()), "ncol": pa.array([], pa.int64())}
                )
            )

        def mex(g: pd.DataFrame) -> pd.DataFrame:
            from networkit_ray.common.guards import check_group_rows

            check_group_rows(
                len(g), 1 << 26, "coloring.mex",
                "a vertex with >2^26 colored neighbors needs hub splitting "
                "(partial mex per shard, min-combine) before JP coloring.",
            )
            cols = np.unique(g["ncol"].to_numpy())
            m = 0
            for c in cols:
                if c == m:
                    m += 1
                elif c > m:
                    break
            return pd.DataFrame({"v": [int(g["v"].iloc[0])], "color": [m]})

        with_nbrs = wc.groupby("v").map_groups(mex, batch_format="pandas")
        # materialize: consumed by the anti-join AND the union below
        with_nbrs = enforce_schema(
            with_nbrs, pa.schema([("v", pa.int64()), ("color", pa.int64())])
        ).materialize()
        # winners with NO colored neighbor get color 0
        lonely = exchange_join(
            winners, with_nbrs, left_on=["v"], join_type="left anti"
        ).map_batches(
            lambda t: t.append_column(
                "color", pa.array(np.zeros(len(t), np.int64))
            ),
            batch_format="pyarrow",
        )
        new_colored = with_nbrs.union(lonely).materialize()
        colored_parts.append(new_colored)
        colored_all = (
            new_colored
            if colored_all is None
            else colored_all.union(new_colored).materialize()
        )
        active = exchange_join(
            active, winners, left_on=["v"], join_type="left anti"
        ).materialize()
        edges = ea
    out = colored_all if colored_all is not None else ray.data.from_arrow(
        pa.schema([("v", pa.int64()), ("color", pa.int64())]).empty_table()
    )
    return out, {"rounds": rounds}
