"""Partitioned-CSR BSP engine for the iterative link-graph kernels.

The reference runs PageRank / connected components / PLP as OpenMP loops over
a shared-memory adjacency (e.g. networkit/cpp/centrality/PageRank.cpp:54-64,
community/PLP.cpp:77-107).  The distributed re-expression is bulk-synchronous
supersteps over hash-partitioned CSR blocks:

- the dense vertex universe 0..n-1 is partitioned by PERMUTED round-robin:
  vertex v lives in partition π(v) % P at local index π(v) // P, where π
  is a seeded bijective bit-mixer (see "placement permutation" below).
  Both maps are O(1) vectorized arithmetic, so the build NEVER ships
  vertex-id lookup tables anywhere (round 1 materialized the whole
  universe on the driver: ~8 TB at 10^12 vertices; now nothing
  vertex-sized ever reaches the driver), and π spreads the structured
  hotness of dense id spaces (R-MAT low bits, crawl-order high bits) so
  per-partition edge loads stay balanced.  Partition sizes are balanced
  to ±1 by construction; residual EDGE skew (single hot sources) is
  absorbed by chunked map units, not by the vertex map;
- edges are partitioned by partition(src) into P CSR blocks, built ONCE
  and pinned in the Ray object store (consumed by every superstep — never
  re-read from Parquet, never re-shuffled);
- vertex state is partitioned by the same map, so the "gather state
  along out-edges" join is partition-local (zero shuffle);
- each superstep: P map tasks compute per-destination partial aggregates
  (combiner — the message to partition q is at most one value per distinct
  destination vertex, so hub in-degree skew is absorbed in the combiners,
  the distributed analog of the reference's guided scheduling,
  Graph.hpp:1788), addressed via ``num_returns=P`` so each of the P reduce
  tasks fetches only its own slice — an explicit P×P exchange through the
  object store;
- reduce tasks fold messages into the co-partitioned state and emit small
  per-partition stats (residuals, changed counts) — the only thing the
  driver ever materializes.

Why not the Dataset API: a Dataset-expressed superstep (state ⋈ edges →
``groupby(dst).sum``) re-shuffles the full edge table on every iteration and
cannot pin the CSR layout between iterations.  This module is the documented
"raw Ray tasks where the Dataset API genuinely can't express the semantics"
escape hatch; everything non-iterative in the engine stays on Datasets.

Partitioning assumption (documented per the custom-operator contract): all
placement — CSR blocks, state, message routing — uses the single range map
:func:`vowner`/:func:`vlocal`; results are invariant to P and to ``num_cpus``
(tested), because per-superstep aggregation is exact, not approximate.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data


def default_num_parts(num_edges: int | None = None) -> int:
    """Partition count: capped by CPUs, scaled to ~2M edges per partition.

    Per-superstep overhead is O(P²) exchange objects + 2P tasks; with tiny
    per-partition compute, oversized P makes fixed task overhead dominate
    (measured: scale-20 R-MAT ran FASTER at P=8 than P=32 on 32 CPUs).  At
    100 TB scale num_edges/2M hits the CPU cap and P = cluster parallelism.

    Deployment knob: the cap defaults to 64 (sandbox-tuned: the exchange is
    O(P²) object-store slices) and is raised per cluster via the
    ``NKR_MAX_PARTS`` environment variable — e.g. 256 nodes × 16 slots →
    ``NKR_MAX_PARTS=4096``.  A P=128 build is covered by tests.
    """
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    max_parts = int(os.environ.get("NKR_MAX_PARTS", "64"))
    cap = max(2, min(max_parts, n_cpus))
    if num_edges is None:
        return cap
    return max(2, min(cap, -(-num_edges // 2_000_000)))


# ---- placement permutation -------------------------------------------------
# Dense graph ids carry structure that both contiguous-range and plain-modulo
# assignment turn into load skew: R-MAT hotness lives in the LOW bits (v % P
# with P=16 put 32% of scale-20 edges in one partition — measured), crawl
# order lives in the HIGH bits.  Placement therefore goes through a seeded
# BIJECTIVE bit-mixing permutation π on [0, 2^k) (xorshift-multiply rounds,
# each invertible mod 2^k) with cycle-walking down to [0, n): vertex v lives
# in partition π(v) % P at local index π(v) // P.  Both maps stay O(1)
# vectorized arithmetic — no lookup tables ever cross the network — and the
# permutation touches only build-time and state-sized paths, never the
# per-superstep inner loops (src_local/dst_local are precomputed in the CSR).

_MIX_A = np.uint64(0x9E3779B97F4A7C15)  # odd → invertible mod 2^k
_MIX_B = np.uint64(0xBF58476D1CE4E5B9)  # odd (splitmix64 constant)
_MIX_A_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
_MIX_B_INV = np.uint64(pow(0xBF58476D1CE4E5B9, -1, 1 << 64))


def _dom_bits(num_nodes: int) -> int:
    return max(1, (num_nodes - 1).bit_length()) if num_nodes > 1 else 1


def _unxorshift(u: np.ndarray, s: np.uint64, k: int) -> np.ndarray:
    x = u.copy()
    for _ in range(-(-k // int(s))):
        x = u ^ (x >> s)
    return x


def _mix_fwd(u: np.ndarray, k: int) -> np.ndarray:
    mask = np.uint64((1 << k) - 1)
    s = np.uint64(max(1, k // 2))
    u = u & mask
    u ^= u >> s
    u = (u * _MIX_A) & mask
    u ^= u >> s
    u = (u * _MIX_B) & mask
    u ^= u >> s
    return u


def _mix_inv(u: np.ndarray, k: int) -> np.ndarray:
    mask = np.uint64((1 << k) - 1)
    s = np.uint64(max(1, k // 2))
    u = _unxorshift(u & mask, s, k)
    u = (u * _MIX_B_INV) & mask
    u = _unxorshift(u, s, k)
    u = (u * _MIX_A_INV) & mask
    u = _unxorshift(u, s, k)
    return u


def vperm(v: np.ndarray, num_nodes: int) -> np.ndarray:
    """π(v) — bijection on [0, num_nodes); cycle-walks the 2^k mixer."""
    k = _dom_bits(num_nodes)
    u = _mix_fwd(np.asarray(v).astype(np.uint64), k)
    bad = u >= num_nodes
    while bad.any():  # expected <2 rounds (2^k < 2n); deterministic
        u[bad] = _mix_fwd(u[bad], k)
        bad = u >= num_nodes
    return u


def vperm_inv(u: np.ndarray, num_nodes: int) -> np.ndarray:
    """π⁻¹(u) — inverse cycle-walk with the inverse mixer."""
    k = _dom_bits(num_nodes)
    v = _mix_inv(np.asarray(u).astype(np.uint64), k)
    bad = v >= num_nodes
    while bad.any():
        v[bad] = _mix_inv(v[bad], k)
        bad = v >= num_nodes
    return v


def vowner(v: np.ndarray, num_nodes: int, num_parts: int) -> np.ndarray:
    """Owning partition per dense vertex id (permuted round-robin, O(1))."""
    return (vperm(v, num_nodes) % np.uint64(num_parts)).astype(np.int64)


def vlocal(v: np.ndarray, num_nodes: int, num_parts: int) -> np.ndarray:
    """Local state index per dense vertex id within its owner (O(1))."""
    return (vperm(v, num_nodes) // np.uint64(num_parts)).astype(np.int64)


def vplace(v: np.ndarray, num_nodes: int, num_parts: int) -> tuple[np.ndarray, np.ndarray]:
    """(owner, local) with a single permutation pass."""
    u = vperm(v, num_nodes)
    P = np.uint64(num_parts)
    return (u % P).astype(np.int64), (u // P).astype(np.int64)


def part_size(num_nodes: int, part: int, num_parts: int) -> int:
    """Number of vertices owned by ``part`` (= len(range(part, n, P)))."""
    return max(0, (num_nodes - part + num_parts - 1) // num_parts)


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _mod_vids(part: int, num_nodes: int, num_parts: int) -> np.ndarray:
    """Partition vertex-id slice — generated in-place, never shipped.

    UNSORTED: vids[i] = π⁻¹(part + i · num_parts), aligned with the local
    state index i.
    """
    return vperm_inv(
        np.arange(part, num_nodes, num_parts, dtype=np.uint64), num_nodes
    )


@ray.remote
def _shuffle_edges(num_nodes: int, num_parts: int, weighted: bool, *tables) -> tuple:
    """Split a GROUP of Arrow edge blocks by owner(src) → P slices.

    Varargs tables: the build coalesces input blocks into ~P groups so the
    exchange ships G×P ≈ P² large objects instead of n_blocks×P small ones
    — measured 5-10× faster block assembly on this sandbox (the consumers'
    per-object fetch/first-touch overhead dominates with 100+ small slices
    each), and at cluster scale it bounds object-store metadata per build.

    0-row blocks can arrive with a stale schema (Ray passes empty blocks
    through map_batches untouched); treat them as empty edge sets.
    """
    live = [t for t in tables if t.num_rows and "src" in t.column_names]
    if not live:
        empty = (np.empty(0, np.uint64), np.empty(0, np.uint64), None)
        return tuple([empty] * num_parts)
    t = pa.concat_tables(live, promote_options="default")
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
    w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64) if weighted else None
    parts = vowner(src, num_nodes, num_parts)
    # introsort: ~4x a stable sort on the tiny 0..P-1 key range; within-part
    # edge order is re-sorted downstream in _build_block, so stability buys
    # nothing here (float message sums are order-tolerant at 1e-12)
    order = np.argsort(parts)
    part_edges = np.searchsorted(parts[order], np.arange(num_parts + 1))
    out = []
    for p in range(num_parts):
        sl = order[part_edges[p] : part_edges[p + 1]]
        out.append((src[sl], dst[sl], w[sl] if w is not None else None))
    return tuple(out)


def _make_chunks(
    group_starts: np.ndarray,
    uniq_dst_local: np.ndarray,
    dst_part_per_group: np.ndarray,
    num_edges: int,
    num_parts: int,
    chunk_size: int,
) -> list[dict]:
    """Split a block's grouped edge range into ~chunk_size-edge chunks.

    This is the explicit skew control: a partition that owns web-hub
    vertices (or any over-full partition) is processed by MULTIPLE map tasks
    per superstep — the distributed analog of splitting a hot vertex into
    virtual sub-vertices with salted partial aggregates; the reduce side
    already combines any number of partials per destination, so correctness
    is unaffected by the chunk count (tested).  Chunk boundaries land on
    (dst_part, dst_local) group boundaries so per-chunk reduceat stays exact.
    """
    if num_edges <= chunk_size + chunk_size // 2 or not len(group_starts):
        return []
    edge_ends = np.append(group_starts[1:], num_edges)
    chunks = []
    g0 = 0
    while g0 < len(group_starts):
        start_edge = group_starts[g0]
        g1 = int(np.searchsorted(edge_ends, start_edge + chunk_size, side="left")) + 1
        g1 = min(g1, len(group_starts))
        end_edge = int(edge_ends[g1 - 1])
        gs_abs = group_starts[g0:g1]
        dstp = dst_part_per_group[g0:g1]
        gb = np.searchsorted(dstp, np.arange(num_parts + 1))
        chunks.append(
            {
                "start": int(start_edge),
                "end": end_edge,
                "gs_rel": (gs_abs - start_edge).astype(np.int64),
                "uniq": uniq_dst_local[g0:g1],
                "gb": gb,
            }
        )
        g0 = g1
    return chunks


@ray.remote
def _build_block(part: int, num_nodes: int, num_parts: int, chunk_size: int, *slices) -> dict:
    """Assemble partition ``part``'s CSR block from its shuffle slices.

    Pre-computes everything per-edge that is superstep-invariant: local src
    index expansion, destination partition + local index, and the grouped
    ordering (sorted by (dst_part, dst_local)) that lets every superstep
    aggregate messages with one ``np.add.reduceat`` — no per-superstep sort
    for the sum/min kernels.  All id→partition / id→local maps are O(1)
    modulo arithmetic — no vertex-id lookup tables cross the network.
    """
    n_v = part_size(num_nodes, part, num_parts)
    vids = vperm_inv(
        np.arange(part, num_nodes, num_parts, dtype=np.uint64), num_nodes
    )
    srcs = [s for s, _, _ in slices if len(s)]
    dsts = [d for _, d, _ in slices if len(d)]
    ws = [w for s, _, w in slices if w is not None and len(s)]
    src = np.concatenate(srcs) if srcs else np.empty(0, np.uint64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.uint64)
    w = np.concatenate(ws) if ws else None

    # CSR over owned vertices, rows sorted by local src index
    src_local = vlocal(src, num_nodes, num_parts)
    order = np.argsort(src_local, kind="stable")
    src_local = src_local[order]
    dst = dst[order]
    if w is not None:
        w = w[order]
    indptr = np.zeros(n_v + 1, dtype=np.int64)
    if len(src_local):
        # src_local is sorted; bincount is ~10x np.add.at for histograms
        indptr[1:] = np.bincount(src_local, minlength=n_v)
    np.cumsum(indptr, out=indptr)

    dst_part, dst_local = vplace(dst, num_nodes, num_parts)

    # superstep-invariant grouped ordering by (dst_part, dst_local) — pack
    # both into one int64 key so a single introsort + one diff replaces the
    # two-key lexsort + two-array group detection (~2x on the build path;
    # grouped sums/mins are order-independent within a group)
    n_loc_max = part_size(num_nodes, 0, num_parts) + 1
    if len(dst_local) and num_parts * n_loc_max < 2**62:
        key = dst_part * n_loc_max + dst_local
        edge_order = np.argsort(key)
        ks = key[edge_order]
        dp_sorted = ks // n_loc_max
        dl_sorted = ks - dp_sorted * n_loc_max
        key_change = np.empty(len(ks), dtype=bool)
        key_change[0] = True
        key_change[1:] = ks[1:] != ks[:-1]
        group_starts = np.flatnonzero(key_change).astype(np.int64)
        uniq_dst_local = dl_sorted[group_starts]
        part_bounds = np.searchsorted(dp_sorted, np.arange(num_parts + 1))
        group_bounds = np.searchsorted(
            dp_sorted[group_starts], np.arange(num_parts + 1)
        )
    elif len(dst_local):
        edge_order = np.lexsort((dst_local, dst_part))
        dp_sorted = dst_part[edge_order]
        dl_sorted = dst_local[edge_order]
        part_bounds = np.searchsorted(dp_sorted, np.arange(num_parts + 1))
        key_change = np.empty(len(dl_sorted), dtype=bool)
        key_change[0] = True
        key_change[1:] = (dl_sorted[1:] != dl_sorted[:-1]) | (
            dp_sorted[1:] != dp_sorted[:-1]
        )
        group_starts = np.flatnonzero(key_change).astype(np.int64)
        uniq_dst_local = dl_sorted[group_starts]
        group_bounds = np.searchsorted(dp_sorted[group_starts], np.arange(num_parts + 1))
    else:
        edge_order = np.empty(0, np.int64)
        dp_sorted = np.empty(0, np.int64)
        dl_sorted = np.empty(0, np.int64)
        part_bounds = np.searchsorted(dp_sorted, np.arange(num_parts + 1))
        group_starts = np.empty(0, np.int64)
        uniq_dst_local = np.empty(0, np.int64)
        group_bounds = np.zeros(num_parts + 1, np.int64)

    chunks = _make_chunks(
        group_starts, uniq_dst_local, dp_sorted[group_starts] if len(group_starts) else np.empty(0, np.int64),
        len(dl_sorted), num_parts, chunk_size,
    )

    # pre-gathered grouped-order locals: supersteps slice these contiguously
    # instead of re-gathering src_local/dst_local through edge_order every
    # iteration (two E-sized fancy gathers saved per map task per superstep).
    # Kept at np.intp: numpy converts any other integer dtype to intp on
    # EVERY fancy index — int32 here measured 3-4× slower per gather.
    src_grouped = src_local[edge_order].astype(np.intp, copy=False)
    dst_grouped = dl_sorted.astype(np.intp, copy=False)

    return {
        "chunks": chunks,
        "part": part,
        "vids": vids,
        "indptr": indptr,
        "src_local": src_local,
        "dst": dst,
        "dst_part": dst_part,
        "dst_local": dst_local,
        "w": w,
        "edge_order": edge_order,
        "src_grouped": src_grouped,
        "dst_grouped": dst_grouped,
        "part_bounds": part_bounds,
        "group_starts": group_starts,
        "uniq_dst_local": uniq_dst_local,
        "group_bounds": group_bounds,
        "out_deg": np.diff(indptr),
    }


@dataclass
class PGraph:
    """A round-robin-partitioned graph pinned in the object store."""

    num_parts: int
    num_nodes: int
    vid_refs: list  # P refs → sorted uint64 vertex ids per partition
    block_refs: list  # P refs → CSR block dicts (see _build_block)
    weighted: bool
    chunk_counts: list | None = None  # per-partition map-task count (skew splitting)
    msg_idx: list | None = None  # [unit][q] pinned destination-index refs
    msg_bundles: list | None = None  # [q] pinned per-reduce index bundles

    def part_sizes(self) -> list[int]:
        return [part_size(self.num_nodes, p, self.num_parts) for p in range(self.num_parts)]

    def map_units(self) -> list[tuple[int, int]]:
        """(partition, chunk) pairs — one map task per unit per superstep.

        chunk = -1 means the whole partition (no skew splitting needed).
        """
        if self.chunk_counts is None:
            self.chunk_counts = ray.get(
                [_block_chunk_count.remote(b) for b in self.block_refs]
            )
        units = []
        for p, c in enumerate(self.chunk_counts):
            if c == 0:
                units.append((p, -1))
            else:
                units.extend((p, i) for i in range(c))
        return units

    def msg_index_refs(self) -> list:
        """Pinned per-(map unit, dest partition) message-index arrays.

        The destination LOCAL indices a map unit's combined messages land on
        are superstep-INVARIANT (fixed by the grouped CSR ordering), yet the
        legacy message tuples re-shipped them every superstep — half the
        exchange bytes for a float64 kernel, ⅔ for float32.  Pin them ONCE
        per unit (``num_returns=P`` slices, np.intp so reduce-side fancy
        indexing pays no per-superstep dtype conversion) and ship only the
        aggregated VALUES each superstep (see :func:`message_values`).
        """
        if self.msg_idx is None:
            units = self.map_units()
            self.msg_idx = [
                _unit_value_index.options(num_returns=self.num_parts).remote(
                    self.block_refs[p], c, self.num_parts
                )
                for p, c in units
            ]
        return self.msg_idx

    def msg_bundle_refs(self) -> list:
        """P pinned index BUNDLES: element q is one object holding every map
        unit's destination-index slice for reduce partition q, in map-unit
        order.  One extra task arg per reduce instead of one per map unit —
        the form the kernels pass to their reduce tasks."""
        if self.msg_bundles is None:
            midx = self.msg_index_refs()
            self.msg_bundles = [
                _bundle_idx.remote(*[mi[q] for mi in midx])
                for q in range(self.num_parts)
            ]
        return self.msg_bundles


@ray.remote
def _block_chunk_count(block: dict) -> int:
    return len(block["chunks"])


def build_pgraph(
    edges: ray.data.Dataset,
    num_nodes: int,
    *,
    num_parts: int | None = None,
    weighted: bool = False,
    chunk_size: int | None = None,
) -> PGraph:
    """Build the partitioned CSR representation of an edge Dataset.

    ``edges``: (src, dst[, w]) — directed as given; pass a symmetrized table
    for undirected kernels.  ``num_nodes``: dense universe 0..num_nodes-1
    (hash-derived sparse universes go through compact_ids first or pass an
    explicit vertex Dataset — see build.compact_ids).  ``chunk_size``
    overrides the skew-splitting threshold (tests; default ≈ mean edge load).
    """
    edge_refs = edges.to_arrow_refs()
    m = sum(ray.get([_block_rows.remote(r) for r in edge_refs]))
    P = num_parts if num_parts else default_num_parts(m)
    # skew splitting: a partition gets multiple map tasks once it exceeds
    # ~1.5× the mean edge load (hot web-hub sources concentrate out-edges)
    if chunk_size is None:
        chunk_size = max(200_000, -(-m // P))
    vid_refs = [_mod_vids.remote(p, num_nodes, P) for p in range(P)]
    # coalesce input blocks into ~max(P, cpus/2) shuffle groups: enough
    # map parallelism to keep the shuffle stage wide, few enough slice
    # objects (G×P) that block assembly isn't dominated by per-object cost
    n_groups = max(P, int(ray.cluster_resources().get("CPU", 8)) // 2)
    n_groups = min(len(edge_refs), n_groups)
    groups: list[list] = [[] for _ in range(max(1, n_groups))]
    for i, r in enumerate(edge_refs):
        groups[i % len(groups)].append(r)
    slice_refs = [
        _shuffle_edges.options(num_returns=P).remote(num_nodes, P, weighted, *grp)
        for grp in groups
        if grp
    ]
    block_refs = [
        _build_block.remote(p, num_nodes, P, chunk_size, *[s[p] for s in slice_refs])
        for p in range(P)
    ]
    return PGraph(P, num_nodes, vid_refs, block_refs, weighted)


@ray.remote
def _state_to_table(vids: np.ndarray, values: np.ndarray, col: str) -> pa.Table:
    return pa.table({"v": pa.array(vids.astype(np.int64)), col: pa.array(values)})


def state_to_dataset(g: PGraph, state_refs: list, col: str) -> ray.data.Dataset:
    """Expose per-partition state arrays as a vertex-table Dataset (v, col)."""
    refs = [
        _state_to_table.remote(g.vid_refs[p], state_refs[p], col)
        for p in range(g.num_parts)
    ]
    return ray.data.from_arrow_refs(refs)


def grouped_src(block: dict, chunk: int) -> np.ndarray:
    """Grouped-order local src ids for (block, chunk) — a contiguous SLICE
    of the build-time pre-gather, replacing ``src_local[chunk_edge_index]``
    (an E-sized fancy gather) in per-superstep map tasks."""
    if chunk < 0:
        return block["src_grouped"]
    c = block["chunks"][chunk]
    return block["src_grouped"][c["start"] : c["end"]]


def grouped_dst(block: dict, chunk: int) -> np.ndarray:
    """Grouped-order local dst ids for (block, chunk) (contiguous slice)."""
    if chunk < 0:
        return block["dst_grouped"]
    c = block["chunks"][chunk]
    return block["dst_grouped"][c["start"] : c["end"]]


def chunk_edge_index(block: dict, chunk: int) -> np.ndarray:
    """Original-order edge indices handled by (block, chunk)."""
    if chunk < 0:
        return block["edge_order"]
    c = block["chunks"][chunk]
    return block["edge_order"][c["start"] : c["end"]]


def _reduceat_messages(block: dict, edge_values_ordered: np.ndarray, chunk: int, op) -> list:
    """Shared grouped-aggregation core; ``edge_values_ordered`` is already in
    the (chunk's) grouped edge order."""
    P = len(block["part_bounds"]) - 1
    if chunk < 0:
        gs, uniq, gb = block["group_starts"], block["uniq_dst_local"], block["group_bounds"]
    else:
        c = block["chunks"][chunk]
        gs, uniq, gb = c["gs_rel"], c["uniq"], c["gb"]
    if not len(gs):
        empty = np.empty(0, np.int64), np.empty(0, np.float64)
        return [empty] * P
    agg = op.reduceat(edge_values_ordered, gs)
    return [(uniq[gb[q] : gb[q + 1]], agg[gb[q] : gb[q + 1]]) for q in range(P)]


def aggregate_messages(block: dict, edge_values_ordered: np.ndarray, chunk: int = -1) -> list:
    """Sum per destination vertex, split by destination partition.

    ``edge_values_ordered`` must be indexed by :func:`chunk_edge_index`
    (grouped order).  O(E) adds via reduceat — no per-superstep sort.
    """
    return _reduceat_messages(block, edge_values_ordered, chunk, np.add)


def min_messages(block: dict, edge_values_ordered: np.ndarray, chunk: int = -1) -> list:
    """Min per destination vertex, split by destination partition."""
    return _reduceat_messages(block, edge_values_ordered, chunk, np.minimum)


# ---- values-only messages (pinned destination indices) ----------------------
# The (idx, values) message tuples above ship the destination indices every
# superstep even though they never change.  The narrow-message path splits
# them: PGraph.msg_index_refs() pins each map unit's P index slices in the
# object store once, supersteps ship ONLY the aggregated value arrays, and
# the reduce task zips values against the pinned indices.  PageRank measured
# exchange-bandwidth-bound (BASELINE.md f32-vs-f64 A/B), so halving message
# bytes is a direct superstep-throughput lever.


@ray.remote
def _bundle_idx(*unit_slices) -> list:
    return list(unit_slices)


@ray.remote
def _unit_value_index(block: dict, chunk: int, num_parts: int) -> tuple:
    """P superstep-invariant destination-index slices for one map unit."""
    if chunk < 0:
        uniq, gb = block["uniq_dst_local"], block["group_bounds"]
    else:
        c = block["chunks"][chunk]
        uniq, gb = c["uniq"], c["gb"]
    return tuple(
        np.ascontiguousarray(uniq[gb[q] : gb[q + 1]], dtype=np.intp)
        for q in range(num_parts)
    )


def message_values(
    block: dict, edge_values_ordered: np.ndarray, chunk: int = -1, op=np.add
) -> list:
    """Per-destination aggregated VALUES only, split by destination partition.

    Companion of :meth:`PGraph.msg_index_refs`: element q lines up 1:1 with
    the pinned index slice [unit][q].  Same reduceat core as
    :func:`aggregate_messages`, minus the per-superstep index shipping.
    """
    P = len(block["part_bounds"]) - 1
    if chunk < 0:
        gs, gb = block["group_starts"], block["group_bounds"]
    else:
        c = block["chunks"][chunk]
        gs, gb = c["gs_rel"], c["gb"]
    if not len(gs):
        empty = np.empty(0, edge_values_ordered.dtype)
        return [empty] * P
    agg = op.reduceat(edge_values_ordered, gs)
    return [agg[gb[q] : gb[q + 1]] for q in range(P)]
