"""Exotic binary graph interchange formats.

Closes the last SURVEY §2.1 rows: graph-tool binary (gt), Thrill binary,
DibaP, ESRI-ASCII raster point extraction, and fixed-width binary
partition files.

Reference semantics (behavior only, independent implementation):
  io/GraphToolBinaryReader.cpp:35-131 / GraphToolBinaryWriter.cpp:36-129
  io/ThrillGraphBinaryReader.cpp:14-97 / ThrillGraphBinaryWriter.cpp:14-57
  io/DibapGraphReader.cpp:32-179
  io/RasterReader.cpp:20-102
  io/BinaryPartitionReader.cpp:14-48 / BinaryPartitionWriter.cpp

Scale note: these are *interchange* formats — each is a single sequential
file whose record boundaries depend on every previous record (varint /
degree-prefixed runs), so reading is inherently one task and writing
gathers the edge table to the writer task.  The scale path for graph
state is partitioned Parquet (`state/checkpoint.py`) and the byte-range
parallel binary edge list (`sources/edgelist.py:700`); these readers
exist so a reference user can carry their existing files in and out.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _adjacency_width(n: int) -> int:
    """Neighbor-id byte width, GraphToolBinaryReader.cpp:88-98."""
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def _gather_edges(edges: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Pull an edge Dataset to the writer as two int64 arrays (see module
    scale note: single-file interchange writes are inherently one task)."""
    import ray as _ray

    srcs, dsts = [], []
    for ref in edges.to_arrow_refs():
        t = _ray.get(ref)
        if t is not None and len(t):
            srcs.append(t["src"].to_numpy(zero_copy_only=False).astype(np.int64))
            dsts.append(t["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
    if not srcs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(srcs), np.concatenate(dsts)


def _scatter_multibyte(
    out: np.ndarray, pos: np.ndarray, vals: np.ndarray, width: int, little: bool
) -> None:
    """Scatter `vals` as `width`-byte integers at byte offsets `pos` into the
    uint8 buffer `out` — one vectorized byte-plane store per byte lane."""
    v = vals.astype(np.uint64)
    for b in range(width):
        lane = b if little else width - 1 - b
        out[pos + b] = ((v >> np.uint64(8 * lane)) & np.uint64(0xFF)).astype(np.uint8)


def write_graphtool_binary(
    edges: ray.data.Dataset,
    num_nodes: int,
    path: str,
    *,
    directed: bool = True,
    little_endian: bool = True,
    comment: str = "",
) -> None:
    """graph-tool binary (gt) writer, GraphToolBinaryWriter.cpp:19-129.

    Layout: 6-byte magic + version 0x01 + endianness byte; uint64 comment
    length + bytes; directed byte; uint64 n; then per node a uint64 degree
    followed by width-sized neighbor ids (width from n, :36-46).
    Undirected graphs store each edge once in the *higher* endpoint's list
    (neighbors v <= u, :73-76), so `edges` must be the canonical (lo, hi)
    table; directed graphs store out-neighbors as-is.
    """
    src, dst = _gather_edges(edges)
    if directed:
        owner, nbr = src, dst
    else:
        # canonical (lo, hi): hi owns lo so that stored neighbors are <= u
        owner, nbr = np.maximum(src, dst), np.minimum(src, dst)
    order = np.lexsort((nbr, owner))
    owner, nbr = owner[order], nbr[order]

    n, m = int(num_nodes), len(owner)
    width = _adjacency_width(n)
    deg = np.bincount(owner, minlength=n).astype(np.uint64)

    body = np.zeros(8 * n + width * m, np.uint8)
    # degree field of node u starts after u earlier degree fields and all
    # earlier neighbor runs; neighbor k (globally sorted by owner) lands
    # after owner_k+1 degree fields and k earlier neighbors
    cumdeg = np.zeros(n, np.int64)
    if n > 1:
        cumdeg[1:] = np.cumsum(deg.astype(np.int64))[:-1]
    deg_pos = 8 * np.arange(n, dtype=np.int64) + width * cumdeg
    _scatter_multibyte(body, deg_pos, deg, 8, little_endian)
    if m:
        nbr_pos = 8 * (owner + 1) + width * np.arange(m, dtype=np.int64)
        _scatter_multibyte(body, nbr_pos, nbr, width, little_endian)

    cb = comment.encode()
    head = bytearray()
    head += _GT_MAGIC + bytes([0x01, 0x00 if little_endian else 0x01])
    head += len(cb).to_bytes(8, "little" if little_endian else "big") + cb
    head += bytes([1 if directed else 0])
    head += n.to_bytes(8, "little" if little_endian else "big")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(head))
        f.write(body.tobytes())
    os.replace(tmp, path)


def read_graphtool_binary(path: str) -> tuple[ray.data.Dataset, int, bool]:
    """graph-tool binary reader, GraphToolBinaryReader.cpp:15-131.

    Returns (edges, n, directed); undirected files yield the canonical
    (lo, hi) edge table (stored neighbors are <= u, so (nbr, u) is already
    (lo, hi)).  Degree prefixes make record boundaries sequential — the
    walk is one pass with a vectorized frombuffer per neighbor run.
    """
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:6] != _GT_MAGIC or buf[6] != 0x01 or buf[7] not in (0, 1):
        raise ValueError("bad graph-tool binary header")
    little = buf[7] == 0
    bo = "little" if little else "big"
    off = 8
    clen = int.from_bytes(buf[off : off + 8], bo)
    off += 8 + clen
    directed = buf[off] == 1
    off += 1
    n = int.from_bytes(buf[off : off + 8], bo)
    off += 8
    width = _adjacency_width(n)
    ndt = np.dtype(f"{'<' if little else '>'}u{width}")

    owners, runs = [], []
    for u in range(n):
        deg = int.from_bytes(buf[off : off + 8], bo)
        off += 8
        if deg:
            runs.append(np.frombuffer(buf, ndt, deg, off).astype(np.int64))
            owners.append(np.full(deg, u, np.int64))
            off += width * deg
    if owners:
        u_arr = np.concatenate(owners)
        v_arr = np.concatenate(runs)
    else:
        u_arr = v_arr = np.empty(0, np.int64)
    if directed:
        t = pa.table({"src": u_arr, "dst": v_arr})
    else:
        t = pa.table({"src": v_arr, "dst": u_arr})  # stored v <= u → (lo, hi)
    return ray.data.from_arrow(t), n, directed


def write_thrill_binary(edges: ray.data.Dataset, num_nodes: int, path: str) -> None:
    """Thrill binary writer, ThrillGraphBinaryWriter.cpp:14-57.

    Per node in id order: varint degree (7-bit groups, little-first,
    0x80 continuation; degree 0 is a single 0x00) then uint32-LE
    neighbors.  Each undirected edge is stored once in the *lower*
    endpoint's list (u <= v, :28), so `edges` is the canonical (lo, hi)
    table.  Node ids must fit uint32 (:15-17).
    """
    if num_nodes > 0xFFFFFFFF:
        raise ValueError("Thrill binary supports at most 2^32-1 nodes")
    src, dst = _gather_edges(edges)
    owner, nbr = np.minimum(src, dst), np.maximum(src, dst)
    order = np.lexsort((nbr, owner))
    owner, nbr = owner[order], nbr[order]
    n, m = int(num_nodes), len(owner)
    deg = np.bincount(owner, minlength=n).astype(np.uint64)

    # varint length per degree (≥1 byte even for 0): count 7-bit groups
    # with a ≤10-lane shift loop — exact for uint64, no float rounding
    vlen = np.ones(n, np.int64)
    rem = deg >> np.uint64(7)
    while rem.any():
        vlen += (rem > 0).astype(np.int64)
        rem = rem >> np.uint64(7)

    cumdeg = np.zeros(n, np.int64)
    cumvlen = np.zeros(n, np.int64)
    if n > 1:
        cumdeg[1:] = np.cumsum(deg.astype(np.int64))[:-1]
        cumvlen[1:] = np.cumsum(vlen)[:-1]
    total = int(vlen.sum()) + 4 * m
    body = np.zeros(total, np.uint8)
    deg_pos = cumvlen + 4 * cumdeg
    # varint byte lanes (at most 10 for u64), vectorized per lane
    maxlen = int(vlen.max()) if n else 1
    val = deg.copy()
    for b in range(maxlen):
        lane_mask = vlen > b
        if not lane_mask.any():
            break
        byte = (val & np.uint64(0x7F)).astype(np.uint8)
        cont = vlen > b + 1
        byte[cont] |= 0x80
        body[deg_pos[lane_mask] + b] = byte[lane_mask]
        val = val >> np.uint64(7)
    if m:
        run_start = cumvlen + vlen + 4 * cumdeg  # first neighbor byte per node
        nbr_pos = run_start[owner] + 4 * (
            np.arange(m, dtype=np.int64) - cumdeg[owner]
        )
        _scatter_multibyte(body, nbr_pos, nbr, 4, little=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(body.tobytes())
    os.replace(tmp, path)


def read_thrill_binary(
    paths: str | list[str], n: int | None = None
) -> tuple[ray.data.Dataset, int]:
    """Thrill binary reader, ThrillGraphBinaryReader.cpp:25-97.

    Node ids are implicit (sequential across the concatenated files);
    returns the canonical (lo, hi) edge table plus the node count (records
    read, or `n` when given and larger).  Varint boundaries force a
    sequential walk; each neighbor run decodes with one frombuffer.
    """
    if isinstance(paths, str):
        paths = [paths]
    buf = b"".join(open(p, "rb").read() for p in paths)
    off, u = 0, 0
    owners, runs = [], []
    max_id = -1
    while off < len(buf):
        # decode one varint
        deg, shift = 0, 0
        while True:
            byte = buf[off]
            off += 1
            if shift == 63 and (byte & 0xFE):
                raise OverflowError("varint64 overflow")
            deg |= (byte & 0x7F) << shift
            if not (byte & 0x80):
                break
            shift += 7
        if deg:
            run = np.frombuffer(buf, "<u4", deg, off).astype(np.int64)
            off += 4 * deg
            owners.append(np.full(deg, u, np.int64))
            runs.append(run)
            max_id = max(max_id, int(run.max()))
        u += 1
    num = max(u, n or 0)
    if max_id >= num:
        raise ValueError("neighbor id exceeds number of nodes read")
    if owners:
        t = pa.table({"src": np.concatenate(owners), "dst": np.concatenate(runs)})
    else:
        t = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    return ray.data.from_arrow(t), num


def write_dibap(
    edges: ray.data.Dataset,
    num_nodes: int,
    path: str,
    *,
    weights: bool = False,
    coords: np.ndarray | None = None,
) -> None:
    """DibaP 'GI' writer (engine extra — the reference ships only the
    reader, DibapGraphReader.cpp; this writer exists for round-trips).

    Big-endian int32 layout: 'GI' magic, V, dvw(=0), of[V+1] CSR offsets
    over the *symmetric* adjacency, to[2m], dew (0/1, int weights), dxy
    (0/2, float32 coords).  `edges` is the canonical (lo, hi) table; when
    `weights`, a 'w' column is written (cast to int32, both directions).
    """
    import ray as _ray

    srcs, dsts, ws = [], [], []
    for ref in edges.to_arrow_refs():
        t = _ray.get(ref)
        if t is not None and len(t):
            srcs.append(t["src"].to_numpy(zero_copy_only=False).astype(np.int64))
            dsts.append(t["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
            if weights:
                ws.append(t["w"].to_numpy(zero_copy_only=False).astype(np.int64))
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    w = np.concatenate(ws) if ws else np.empty(0, np.int64)

    # symmetric adjacency: both directions of every canonical edge
    owner = np.concatenate([src, dst])
    nbr = np.concatenate([dst, src])
    eww = np.concatenate([w, w]) if weights else None
    order = np.lexsort((nbr, owner))
    owner, nbr = owner[order], nbr[order]
    V = int(num_nodes)
    deg = np.bincount(owner, minlength=V)
    of = np.zeros(V + 1, np.int64)
    of[1:] = np.cumsum(deg)

    out = [np.array([V, 0], ">i4")]  # V, dvw=0
    out.append(of.astype(">i4"))
    out.append(nbr.astype(">i4"))
    if weights:
        out.append(np.array([1], ">i4"))
        out.append(eww[order].astype(">i4"))
    else:
        out.append(np.array([0], ">i4"))
    if coords is not None:
        dxy = coords.shape[1]
        out.append(np.array([dxy], ">i4"))
        out.append(coords.astype(">f4").reshape(-1))
    else:
        out.append(np.array([0], ">i4"))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"GI")
        for a in out:
            f.write(a.tobytes())
    os.replace(tmp, path)


def read_dibap(
    path: str,
) -> tuple[ray.data.Dataset, int, np.ndarray | None]:
    """DibaP 'GI' reader, DibapGraphReader.cpp:32-179 — fully vectorized
    (fixed-width big-endian fields decode with frombuffer, no walk).

    Returns (edges, n, coords): canonical (lo, hi) undirected edges (the
    reference keeps v <= to[e], :161-175), with a 'w' column when edge
    weights are present (ew[e] indexing, exactly as :164), and the
    V×dxy float32 coordinate block when present (:138-153).
    """
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] != b"GI":
        raise ValueError("bad DibaP header (expected 'GI')")

    def ints(count: int, off: int) -> tuple[np.ndarray, int]:
        return (
            np.frombuffer(buf, ">i4", count, off).astype(np.int64),
            off + 4 * count,
        )

    off = 2
    (hdr, off) = ints(2, off)
    V, dvw = int(hdr[0]), int(hdr[1])
    if dvw > 0:
        _, off = ints(V * dvw, off)  # vertex weights read and ignored (:157)
    of, off = ints(V + 1, off)
    numE2 = int(of[V])
    to, off = ints(numE2, off)
    (dew_a, off) = ints(1, off)
    dew = int(dew_a[0])
    ew = None
    if dew > 0:
        ew_all, off = ints(numE2 * dew, off)
        ew = ew_all[:numE2]  # ew[e] indexing as in the reference (:164)
    (dxy_a, off) = ints(1, off)
    dxy = int(dxy_a[0])
    coords = None
    if dxy > 0:
        coords = (
            np.frombuffer(buf, ">f4", V * dxy, off).astype(np.float32).reshape(V, dxy)
        )

    src = np.repeat(np.arange(V, dtype=np.int64), np.diff(of))
    keep = src <= to
    cols = {"src": src[keep], "dst": to[keep]}
    if ew is not None:
        cols["w"] = ew[keep].astype(np.float64)
    return ray.data.from_arrow(pa.table(cols)), V, coords


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def read_raster(
    path: str, normalization_factor: float = 1.0, *, seed: int = 1
) -> ray.data.Dataset:
    """ESRI-ASCII raster → 2D point cloud, RasterReader.cpp:20-102.

    Header: 6 lines (`ncols`, `nrows`, then 4 ignored), then nrows lines of
    ncols population values.  Each cell (row, col) spawns
    round(val * normalization_factor) points uniform in its unit cell
    x ∈ [col, col+1), y ∈ [-row, 1-row) (:56-98).  The reference draws from
    a global RNG; this implementation is *seeded and deterministic* —
    point i of cell c uses splitmix64(seed, c, i) — so runs are
    reproducible at any parallelism.
    """
    with open(path) as f:
        lines = [ln for ln in (l.strip() for l in f) if ln]
    ncols = int(float(lines[0].split()[1]))
    nrows = int(float(lines[1].split()[1]))
    vals = np.concatenate(
        [
            np.array(ln.split(), dtype=np.float64)[:ncols]
            for ln in lines[6 : 6 + nrows]
        ]
    ).reshape(nrows, ncols)

    counts = np.round(vals * normalization_factor).astype(np.int64).reshape(-1)
    counts[counts < 0] = 0
    cell = np.repeat(np.arange(nrows * ncols, dtype=np.uint64), counts)
    idx = np.arange(len(cell), dtype=np.int64)
    start = np.zeros(nrows * ncols, np.int64)
    start[1:] = np.cumsum(counts)[:-1]
    within = idx - start[cell.astype(np.int64)]
    base = _splitmix64(
        cell * np.uint64(0x100000001) + within.astype(np.uint64) + np.uint64(seed)
    )
    ux = (base >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    uy = (_splitmix64(base) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    row = (cell.astype(np.int64)) // ncols
    col = (cell.astype(np.int64)) % ncols
    x = col + ux
    y = (1.0 - row) - 1.0 + uy  # ylb = -row, yub = 1-row
    return ray.data.from_arrow(pa.table({"x": x, "y": y}))


def write_binary_partition(
    labels: ray.data.Dataset, path: str, *, width: int = 8
) -> None:
    """Fixed-width little-endian partition file, BinaryPartitionWriter.cpp:
    one `width`-byte unsigned label per node, node id = record index.
    `labels` must have columns (v, label) covering 0..n-1."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    import ray as _ray

    vs, ls = [], []
    for ref in labels.to_arrow_refs():
        t = _ray.get(ref)
        if t is not None and len(t):
            vs.append(t["v"].to_numpy(zero_copy_only=False).astype(np.int64))
            ls.append(t["label"].to_numpy(zero_copy_only=False).astype(np.int64))
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    lab = np.concatenate(ls) if ls else np.empty(0, np.int64)
    out = np.zeros(len(v), dtype=f"<u{width}")
    out[v] = lab.astype(f"<u{width}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.tobytes())
    os.replace(tmp, path)


def read_binary_partition(path: str, *, width: int = 8) -> ray.data.Dataset:
    """BinaryPartitionReader.cpp:14-48: file length must be a multiple of
    `width`; record u is node u's label.  Returns a (v, label) Dataset."""
    if width not in (4, 8):
        raise ValueError("Only 4 and 8 are supported widths")
    size = os.path.getsize(path)
    if size % width:
        raise ValueError("partition file length must be a multiple of the width")
    lab = np.fromfile(path, dtype=f"<u{width}").astype(np.int64)
    return ray.data.from_arrow(
        pa.table({"v": np.arange(len(lab), dtype=np.int64), "label": lab})
    )
