"""Per-iteration vertex-state checkpoints with lineage (manifest-last, atomic).

The reference has no checkpoint/resume anywhere (SURVEY.md §4.1); the north
rule requires every superstep's vertex state to be resumable.  Layout:

    <dir>/<tag>/iter=<k>/part=<p>.parquet     one file per state partition
    <dir>/<tag>/manifest-<k>.json             written LAST (tmp + atomic rename)

The manifest records iteration, partition count, vertex count, per-partition
files + row counts (lineage), and kernel counters (residual / changed count).
Resume = read the highest complete manifest.  A crash between part files and
manifest leaves a dangling iter directory that is simply ignored/overwritten —
writes are idempotent.

If the resuming run uses the same partition count, each partition reads
exactly its own file; a run with a different P re-shards by the new graph's
range bounds (the files are small vertex tables, re-sharding is one pass).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote
def _save_part(vids: np.ndarray, values: np.ndarray, path: str, col: str) -> int:
    t = pa.table({"v": pa.array(vids.astype(np.int64)), col: pa.array(values)})
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return t.num_rows


def save(
    base_dir: str,
    tag: str,
    iteration: int,
    g,
    state_refs: list,
    col: str,
    counters: dict,
) -> str:
    d = os.path.join(base_dir, tag, f"iter={iteration}")
    os.makedirs(d, exist_ok=True)
    paths = [os.path.join(d, f"part={p}.parquet") for p in range(g.num_parts)]
    rows = ray.get(
        [
            _save_part.remote(g.vid_refs[p], state_refs[p], paths[p], col)
            for p in range(g.num_parts)
        ]
    )
    manifest = {
        "tag": tag,
        "iteration": iteration,
        "num_parts": g.num_parts,
        "num_nodes": g.num_nodes,
        "column": col,
        "files": [{"part": p, "path": paths[p], "rows": rows[p]} for p in range(g.num_parts)],
        "counters": counters,
    }
    mpath = os.path.join(base_dir, tag, f"manifest-{iteration}.json")
    fd, tmp = tempfile.mkstemp(dir=os.path.join(base_dir, tag))
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return mpath


def latest_manifest(base_dir: str, tag: str) -> dict | None:
    d = os.path.join(base_dir, tag)
    if not os.path.isdir(d):
        return None
    best = None
    for name in os.listdir(d):
        if name.startswith("manifest-") and name.endswith(".json"):
            it = int(name[len("manifest-") : -len(".json")])
            if best is None or it > best[0]:
                best = (it, os.path.join(d, name))
    if best is None:
        return None
    with open(best[1]) as f:
        return json.load(f)


@ray.remote
def _load_part_direct(path: str, col: str) -> np.ndarray:
    return pq.read_table(path)[col].to_numpy()


@ray.remote
def _load_part_reshard(
    paths: list, col: str, part: int, num_nodes: int, num_parts: int, n_expect: int
) -> np.ndarray:
    from networkit_ray.graph.bsp import vplace

    pieces_u, pieces_x = [], []
    for p in paths:
        t = pq.read_table(p)
        v = t["v"].to_numpy().astype(np.uint64)
        owner, local = vplace(v, num_nodes, num_parts)
        mask = owner == part
        pieces_u.append(local[mask])
        pieces_x.append(t[col].to_numpy()[mask])
    u = np.concatenate(pieces_u)
    x = np.concatenate(pieces_x)
    order = np.argsort(u)  # local-index order = state array order
    u = u[order]
    assert len(u) == n_expect and (len(u) == 0 or (u[0] == 0 and u[-1] == n_expect - 1)), (
        "checkpoint vertex set mismatch"
    )
    return x[order]


def load_latest(base_dir: str, tag: str, g) -> tuple[list, dict] | None:
    """Load the newest checkpoint as per-partition state refs for ``g``."""
    m = latest_manifest(base_dir, tag)
    if m is None:
        return None
    col = m["column"]
    if m["num_parts"] == g.num_parts and m["num_nodes"] == g.num_nodes:
        refs = [_load_part_direct.remote(f["path"], col) for f in m["files"]]
    else:
        from networkit_ray.graph.bsp import part_size

        paths = [f["path"] for f in m["files"]]
        refs = [
            _load_part_reshard.remote(
                paths, col, p, g.num_nodes, g.num_parts,
                part_size(g.num_nodes, p, g.num_parts),
            )
            for p in range(g.num_parts)
        ]
    return refs, m
