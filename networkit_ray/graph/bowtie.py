"""Bow-tie decomposition of a directed (web) graph.

Broder et al.'s map of the web ("Graph structure in the Web", WWW 2000):
every vertex falls into exactly one region relative to the largest strongly
connected component —

    CORE      the largest SCC
    IN        reaches CORE but is not in it
    OUT       reachable from CORE but not in it
    TUBE      on an IN→OUT path that avoids CORE
    TENDRIL   hangs off IN (forward) or into OUT (backward) without
              touching CORE
    DISC      everything else (disconnected from the bow tie)

The reference computes SCCs shared-memory (components/StronglyConnected
Components.cpp:1); the bow-tie classification is the standard web-scale
consumer of that kernel plus four set-reachability sweeps.

Execution shape: one FW-BW SCC run (graph/scc.py, reused refs-level), a
state-sized exchange to pick the largest SCC root, then four frontier
reachability fixpoints (forward/backward from CORE, forward from IN,
backward from OUT) on the two pinned CSR graphs.  Each reachability
superstep pushes one byte per frontier edge — the cheapest message the BSP
engine ships — and the per-partition classification is pure vectorized
boolean algebra; nothing vertex-sized ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from networkit_ray.graph import bsp
from networkit_ray.graph.bsp import PGraph, build_pgraph, _reduceat_messages
from networkit_ray.graph.build import transpose
from networkit_ray.graph.scc import strongly_connected_components_refs

REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISC")


@ray.remote
def _seed_eq(labels: np.ndarray, value: int) -> np.ndarray:
    return labels == value


@ray.remote
def _reach_init(seed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return seed.copy(), seed.copy()


@ray.remote
def _reach_map(block: dict, state: tuple, chunk: int) -> tuple:
    _, frontier = state
    sl = bsp.grouped_src(block, chunk)
    per_edge = frontier[sl].astype(np.uint8)
    return tuple(_reduceat_messages(block, per_edge, chunk, np.maximum))


@ray.remote(num_returns=2)
def _reach_reduce(state: tuple, *partials):
    reached, _ = state
    hit = np.zeros(len(reached), dtype=bool)
    for idx, vals in partials:
        if len(idx):
            hit[idx[vals > 0]] = True
    frontier = hit & ~reached
    return (reached | frontier, frontier), int(frontier.sum())


@ray.remote
def _reach_out(state: tuple) -> np.ndarray:
    return state[0]


def reach_refs(g: PGraph, seed_refs: list) -> list:
    """Per-partition bool arrays: vertex is seed-or-reachable from the seed
    set along g's edges.  Frontier-based — each superstep ships only the
    newly reached vertices' out-edges' bytes."""
    P = g.num_parts
    state = [_reach_init.remote(m) for m in seed_refs]
    units = g.map_units()
    while True:
        map_out = [
            _reach_map.options(num_returns=P).remote(g.block_refs[p], state[p], c)
            for p, c in units
        ]
        new_state, counts = [], []
        for q in range(P):
            s, c = _reach_reduce.remote(state[q], *[mo[q] for mo in map_out])
            new_state.append(s)
            counts.append(c)
        grew = sum(ray.get(counts))
        state = new_state
        if grew == 0:
            break
    return [_reach_out.remote(s) for s in state]


@ray.remote
def _and_not(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return x & ~y


@ray.remote(num_returns=2)
def _classify(
    vids: np.ndarray,
    f: np.ndarray,
    b: np.ndarray,
    fi: np.ndarray,
    bo: np.ndarray,
) -> tuple[pa.Table, np.ndarray]:
    code = np.full(len(vids), 5, dtype=np.int8)  # DISC
    rest = ~f & ~b
    code[rest & (fi | bo)] = 4  # TENDRIL
    code[rest & fi & bo] = 3  # TUBE
    code[f & ~b] = 2  # OUT
    code[b & ~f] = 1  # IN
    code[f & b] = 0  # CORE
    region = pa.array(np.array(REGIONS, dtype=object)[code])
    t = pa.table({"v": pa.array(vids.astype(np.int64)), "region": region})
    return t, np.bincount(code, minlength=6)


def bowtie_decomposition(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Directed edge table → (v, region) over the dense universe
    0..num_nodes-1, plus a region-size info dict.

    CORE is the largest SCC (ties broken by smallest FW-BW root id); the
    four reachability sweeps then partition the rest per Broder's
    definitions.
    """
    from ray.data.aggregate import Count

    edges = edges.materialize()
    g_f = build_pgraph(edges, num_nodes, num_parts=num_parts)
    P = g_f.num_parts
    g_b = build_pgraph(transpose(edges), num_nodes, num_parts=P)

    root_refs, scc_info = strongly_connected_components_refs(g_f, g_b)
    roots = bsp.state_to_dataset(g_f, root_refs, "root")
    top = (
        roots.groupby("root")
        .aggregate(Count(alias_name="cnt"))
        .sort(["cnt", "root"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    core_root = int(top[0]["root"])

    core = [_seed_eq.remote(root_refs[p], core_root) for p in range(P)]
    f = reach_refs(g_f, core)
    b = reach_refs(g_b, core)

    in_seed = [_and_not.remote(b[p], f[p]) for p in range(P)]
    out_seed = [_and_not.remote(f[p], b[p]) for p in range(P)]
    fi = reach_refs(g_f, in_seed)
    bo = reach_refs(g_b, out_seed)

    out = [
        _classify.remote(g_f.vid_refs[p], f[p], b[p], fi[p], bo[p])
        for p in range(P)
    ]
    tables = [o[0] for o in out]
    sizes = sum(ray.get([o[1] for o in out]))
    info = {
        "core_root": core_root,
        "sizes": {r: int(sizes[i]) for i, r in enumerate(REGIONS)},
        **scc_info,
    }
    return ray.data.from_arrow_refs(tables), info
