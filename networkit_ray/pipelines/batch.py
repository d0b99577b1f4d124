"""workflows.batch analog (networkit/workflows.py:35-62): apply a graph
function to every graph file matching a pattern in a directory and write
one CSV row per graph.

The reference loops serially; here each graph is processed through the
engine (the per-graph function typically builds Datasets itself), and
only the one-row-per-graph result table is driver-side — output stays
tiny regardless of graph sizes.
"""

from __future__ import annotations

import fnmatch
import os

import pyarrow as pa
import ray.data


def batch_run(
    graph_dir: str,
    match: str,
    fmt: str,
    fn,
    out_path: str | None = None,
) -> ray.data.Dataset:
    """Apply ``fn(edges_or_tuple, path) -> dict`` to every matching graph.

    ``fmt`` goes through sources.edgelist.read_graph dispatch.  Returns a
    Dataset of one row per graph (columns = dict keys + ``graph``); when
    ``out_path`` is given, also writes a single CSV (driver-side — the
    result is #graphs rows, never data-sized)."""
    from networkit_ray.sources.edgelist import read_graph

    rows = []
    for name in sorted(os.listdir(graph_dir)):
        if not fnmatch.fnmatch(name, match):
            continue
        path = os.path.join(graph_dir, name)
        loaded = read_graph(path, fmt)
        res = fn(loaded, path)
        rows.append({"graph": name, **res})
    if not rows:
        out = ray.data.from_arrow(
            pa.schema([("graph", pa.string())]).empty_table()
        )
    else:
        cols = {k: [r.get(k) for r in rows] for k in rows[0]}
        out = ray.data.from_arrow(pa.table(cols))
    if out_path and rows:
        import csv

        tmp = out_path + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        os.replace(tmp, out_path)
    return out
