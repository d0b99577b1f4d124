"""Edge-list / METIS / SNAP / KONECT readers and writers.

Parquet is this engine's native graph format (the analog of the reference's
NetworkitBinary chunked format, io/NetworkitBinaryGraph.md); these readers
cover the reference's text formats for fixture conformance:

- :func:`read_edge_list` — EdgeListReader semantics
  (networkit/cpp/io/EdgeListReader.cpp:38-168): ``u<sep>v[<sep>w]`` lines,
  comment prefix, ``first_node`` offset, weight sniffing from the first data
  line; distributed via ``read_text`` + vectorized parse (the mmap parse of
  the reference maps to Arrow CSV blocks).
- :func:`read_edge_list_keyed` — the reference's ``continuous=false``
  string→id map (EdgeListReader.cpp:30-35,75-83).  A serial id map cannot
  scale, so keys get stable ``hash64`` ids and are then compacted to a
  dense 0..n-1 universe (sorted-hash order — deterministic across runs,
  partitioning, and cluster sizes).
- :func:`read_snap` — SNAPGraphReader (io/SNAPGraphReader.cpp:20-80):
  ``#`` comments, arbitrary integer ids remapped to consecutive
  (:44-51), duplicate edges dropped.
- :func:`read_konect` — KONECTGraphReader (io/KONECTGraphReader.cpp):
  ``%`` comments/format header, 1-based ids, optional weight column.
- :func:`read_metis` — METISGraphReader (io/METISGraphReader.cpp:20-118):
  line *i* lists the 1-based neighbors of node *i-1*; the line-number ⇒
  node-id coupling makes this inherently sequential, so it parses in ONE
  task (conformance fixtures only — not a scale path).
- :func:`write_edge_list` — EdgeListWriter (io/EdgeListWriter.cpp:15-43);
  :func:`write_snap` — SNAPGraphWriter (io/SNAPGraphWriter.cpp);
  :func:`write_metis` — METISGraphWriter (io/METISGraphWriter.cpp:17-58,
  single-task for the same line-number reason as the reader).
- :func:`read_graph` / :func:`write_graph` — the ``readGraph``/
  ``writeGraph`` format dispatch of networkit/graphio.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def read_edge_list(
    path: str,
    *,
    sep: str = None,
    comment: str = "#",
    first_node: int = 0,
    weighted: bool | None = None,
) -> ray.data.Dataset:
    """Parse ``u<sep>v[<sep>w]`` lines into an edge Dataset.

    ``weighted=None`` sniffs from the data (EdgeListReader.cpp:44-45):
    3 fields ⇒ weighted.  ``first_node`` is subtracted (1-based formats).

    The parse is whole-batch Arrow kernels (trim/filter/split/cast) — no
    per-line Python in the hot path.
    """
    import pyarrow.compute as pc

    lines = ray.data.read_text(path)

    def parse(t: pa.Table) -> pa.Table:
        s = pc.utf8_trim_whitespace(t["text"].combine_chunks())
        keep = pc.and_(
            pc.invert(pc.starts_with(s, pattern=comment)), pc.not_equal(s, "")
        )
        s = s.filter(keep)
        if sep is None:
            parts = pc.split_pattern_regex(s, pattern=r"\s+")
        else:
            parts = pc.split_pattern(s, pattern=sep)
        src = pc.subtract(
            pc.cast(pc.list_element(parts, 0), pa.int64()), first_node
        )
        dst = pc.subtract(
            pc.cast(pc.list_element(parts, 1), pa.int64()), first_node
        )
        cols = {"src": src, "dst": dst}
        nfields = pc.list_value_length(parts)
        has_w = weighted or (
            weighted is None
            and len(nfields)
            and int(pc.min(nfields).as_py() or 0) > 2
        )
        if has_w:
            cols["w"] = pc.cast(pc.list_element(parts, 2), pa.float32())
        return pa.table(cols)

    return lines.map_batches(parse, batch_format="pyarrow")


def read_edge_list_keyed(
    path: str,
    *,
    sep: str = None,
    comment: str = "#",
    weighted: bool | None = None,
    compact: bool = True,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """String-keyed edge list → (edges, mapping).

    Keys are hashed with the stable ``hash64`` (EdgeListReader's serial
    string→id map is inherently sequential; stable hashing is the scale
    path, the same scheme the web extractor uses for urls).  With
    ``compact=True`` ids are then remapped to dense 0..n-1 in ascending
    hash order and ``mapping`` is (key: string, v: int64); otherwise ids
    are the raw hashes and ``mapping`` is (key, v=hash).  A 64-bit hash
    collision merges two vertices (birthday bound ≈ k²/2⁶⁵ — ~3% chance of
    ONE collision anywhere at 10⁹ keys); detect by comparing the mapping
    row count against a distinct-key count when that matters.
    """
    from networkit_ray.common.hashing import hash64_array

    lines = ray.data.read_text(path)

    def parse(t: pa.Table) -> pa.Table:
        sk, dk, w = [], [], []
        for line in t["text"].to_pylist():
            s = line.strip()
            if not s or s.startswith(comment):
                continue
            parts = s.split(sep)
            sk.append(parts[0])
            dk.append(parts[1])
            if weighted or (weighted is None and len(parts) > 2):
                w.append(float(parts[2]))
        h1 = hash64_array(sk).view(np.int64)
        h2 = hash64_array(dk).view(np.int64)
        cols = {
            "src": pa.array(h1),
            "dst": pa.array(h2),
            "skey": pa.array(sk, pa.string()),
            "dkey": pa.array(dk, pa.string()),
        }
        if w:
            cols["w"] = pa.array(np.asarray(w, np.float64))
        return pa.table(cols)

    parsed = lines.map_batches(parse, batch_format="pyarrow").materialize()
    keys = parsed.map_batches(
        lambda t: pa.table(
            {
                "h": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "key": pa.concat_arrays(
                    [t["skey"].combine_chunks(), t["dkey"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Min

    key_map = keys.groupby("h").aggregate(Min("key", alias_name="key"))
    edge_cols = ["src", "dst"] + (["w"] if "w" in parsed.schema().names else [])
    edges = parsed.select_columns(edge_cols)
    if not compact:
        mapping = key_map.map_batches(
            lambda t: pa.table({"key": t["key"], "v": t["h"]}),
            batch_format="pyarrow",
        )
        return edges, mapping
    from networkit_ray.common.exchange import exchange_join
    from networkit_ray.graph.build import compact_ids

    id_map, remapped = compact_ids(edges.select_columns(["src", "dst"]))
    if "w" in edge_cols:
        # re-run the remap keeping w (compact_ids drops non-key columns)
        e1 = exchange_join(edges, id_map, left_on=["src"], right_on=["v"])
        e1 = e1.map_batches(
            lambda t: pa.table({"si": t["idx"], "dst": t["dst"], "w": t["w"]}),
            batch_format="pyarrow",
        )
        e2 = exchange_join(e1, id_map, left_on=["dst"], right_on=["v"])
        remapped = e2.map_batches(
            lambda t: pa.table({"src": t["si"], "dst": t["idx"], "w": t["w"]}),
            batch_format="pyarrow",
        )
    km = exchange_join(key_map, id_map, left_on=["h"], right_on=["v"])
    mapping = km.map_batches(
        lambda t: pa.table({"key": t["key"], "v": t["idx"]}),
        batch_format="pyarrow",
    )
    return remapped, mapping


def read_snap(path: str) -> tuple[ray.data.Dataset, ray.data.Dataset, int]:
    """SNAP text graph → (remapped edges, mapping(orig:int64, v:int64), n).

    Arbitrary (non-continuous) integer ids are remapped to consecutive
    0..n-1 in ascending original-id order (SNAPGraphReader.cpp:44-51);
    duplicate edges are dropped.
    """
    from networkit_ray.graph.build import compact_ids, dedup_edges

    raw = read_edge_list(path, comment="#")
    id_map, remapped = compact_ids(raw.select_columns(["src", "dst"]))
    mapping = id_map.map_batches(
        lambda t: pa.table({"orig": t["v"], "v": t["idx"]}),
        batch_format="pyarrow",
    ).materialize()
    edges = dedup_edges(remapped).materialize()
    return edges, mapping, mapping.count()


def read_konect(path: str) -> ray.data.Dataset:
    """KONECT out.* file: ``%`` comments, 1-based ids, optional weight."""
    return read_edge_list(path, comment="%", first_node=1)


def read_metis(path: str) -> tuple[ray.data.Dataset, int]:
    """METIS adjacency file → (canonical (lo,hi) edge Dataset, num_nodes).

    Single-task parse: node id = line number, which cannot be recovered after
    distributed line splitting.  Returns each undirected edge once.
    """
    with open(path) as f:
        raw = [ln.strip() for ln in f if not ln.startswith("%")]
    header = raw[0].split()
    n = int(header[0])
    src, dst = [], []
    for i, line in enumerate(raw[1 : n + 1]):
        for tok in line.split():
            j = int(tok) - 1  # 1-based neighbors
            if i < j:
                src.append(i)
                dst.append(j)
    t = pa.table(
        {"src": pa.array(np.asarray(src, np.int64)), "dst": pa.array(np.asarray(dst, np.int64))}
    )
    return ray.data.from_arrow(t), n


def write_edge_list(edges: ray.data.Dataset, out_dir: str, *, sep: str = " ") -> None:
    """Serialize an edge Dataset as headerless text edge-list part files
    (EdgeListWriter format: one ``u<sep>v[<sep>w]`` line per edge)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_part(t: pa.Table, path: str) -> int:
        src = t["src"].to_pylist()
        dst = t["dst"].to_pylist()
        if "w" in t.column_names:
            ws = t["w"].to_pylist()
            lines = [f"{a}{sep}{b}{sep}{w}" for a, b, w in zip(src, dst, ws)]
        else:
            lines = [f"{a}{sep}{b}" for a, b in zip(src, dst)]
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, path)
        return len(lines)

    refs = edges.to_arrow_refs()
    ray.get(
        [
            write_part.remote(r, os.path.join(out_dir, f"part-{i:05d}.txt"))
            for i, r in enumerate(refs)
        ]
    )


def write_snap(edges: ray.data.Dataset, out_dir: str) -> None:
    """SNAPGraphWriter format: ``# Nodes/Edges`` comment header then
    tab-separated directed edge lines (io/SNAPGraphWriter.cpp)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    m = edges.count()
    src_max = edges.max("src")
    dst_max = edges.max("dst")
    n = int(max(src_max or 0, dst_max or 0)) + 1
    header = f"# Directed graph\n# Nodes: {n} Edges: {m}\n"
    with open(os.path.join(out_dir, "header.txt"), "w") as f:
        f.write(header)
    write_edge_list(edges, out_dir, sep="\t")


def write_metis(
    sym_edges: ray.data.Dataset, num_nodes: int, path: str
) -> None:
    """METISGraphWriter (io/METISGraphWriter.cpp:17-58): header ``n m``,
    then line i = 1-based neighbors of node i-1.

    Single-task serialization (line number ⇒ node id), conformance only.
    """
    t = pa.concat_tables(
        list(sym_edges.select_columns(["src", "dst"]).iter_batches(batch_format="pyarrow"))
    )
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    m = len(src) // 2  # symmetric table: each undirected edge twice
    bounds = np.searchsorted(src, np.arange(num_nodes + 1))
    lines = [f"{num_nodes} {m}"]
    for i in range(num_nodes):
        lines.append(" ".join(str(x + 1) for x in dst[bounds[i] : bounds[i + 1]]))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    import os

    os.replace(tmp, path)


def read_matrix_market(path: str) -> tuple[ray.data.Dataset, int]:
    """MatrixMarketReader (io/MatrixMarketReader.cpp): coordinate format,
    ``%`` comments, 1-based indices; symmetric matrices emit each stored
    entry once as a canonical (lo, hi) edge.  Single-task parse
    (the one dims line cannot be distinguished from data after distributed
    line-splitting) — conformance fixtures only, like read_metis.
    """
    with open(path) as f:
        first = f.readline()
        sym = "symmetric" in first.lower()
        lines = [ln for ln in f if ln.strip() and not ln.startswith("%")]
    n, _m, _nnz = (int(x) for x in lines[0].split()[:3])
    src, dst, w = [], [], []
    has_w = False
    for ln in lines[1:]:
        parts = ln.split()
        i, j = int(parts[0]) - 1, int(parts[1]) - 1
        if sym and i > j:
            i, j = j, i
        src.append(i)
        dst.append(j)
        if len(parts) > 2:
            has_w = True
            w.append(float(parts[2]))
    cols = {
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64)),
    }
    if has_w:
        cols["w"] = pa.array(np.asarray(w, np.float64))
    return ray.data.from_arrow(pa.table(cols)), n


def write_matrix_market(
    canon_edges: ray.data.Dataset, num_nodes: int, path: str
) -> None:
    """MatrixMarket coordinate writer (symmetric pattern), 1-based."""
    import os

    t = pa.concat_tables(
        list(canon_edges.iter_batches(batch_format="pyarrow"))
    )
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    lines = [
        "%%MatrixMarket matrix coordinate pattern symmetric",
        f"{num_nodes} {num_nodes} {len(src)}",
    ]
    lines += [f"{src[i] + 1} {dst[i] + 1}" for i in order]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def read_gml(path: str) -> tuple[ray.data.Dataset, int]:
    """Minimal GMLGraphReader (io/GMLGraphParser.cpp): ``node [ id N ]`` and
    ``edge [ source A target B ]`` blocks; attributes ignored.  Single-task
    conformance parse."""
    import re as _re

    text = open(path).read()
    node_ids = [int(x) for x in _re.findall(r"node\s*\[[^]]*?\bid\s+(\d+)", text)]
    edges = _re.findall(
        r"edge\s*\[[^]]*?\bsource\s+(\d+)[^]]*?\btarget\s+(\d+)", text
    )
    remap = {v: i for i, v in enumerate(sorted(node_ids))}
    src = np.asarray([remap[int(a)] for a, _ in edges], np.int64)
    dst = np.asarray([remap[int(b)] for _, b in edges], np.int64)
    return (
        ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})),
        len(node_ids),
    )


def write_gml(edges: ray.data.Dataset, num_nodes: int, path: str) -> None:
    """Minimal GMLGraphWriter (io/GMLGraphWriter.cpp)."""
    import os

    t = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    parts = ["graph ["]
    parts += [f"  node [ id {i} ]" for i in range(num_nodes)]
    parts += [f"  edge [ source {src[i]} target {dst[i]} ]" for i in order]
    parts.append("]")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(parts) + "\n")
    os.replace(tmp, path)


def write_partition(labels: ray.data.Dataset, path: str) -> None:
    """PartitionWriter (io/PartitionWriter.cpp): line i = subset id of node
    i.  Single-file text (line number ⇒ node id); conformance only — the
    scale path is the (v, label) parquet vertex table itself."""
    import os

    t = pa.concat_tables(
        list(labels.select_columns(["v", "label"]).iter_batches(batch_format="pyarrow"))
    )
    v = t["v"].to_numpy(zero_copy_only=False)
    lab = t["label"].to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(str(x) for x in lab[order]) + "\n")
    os.replace(tmp, path)


def read_partition(path: str) -> ray.data.Dataset:
    """PartitionReader (io/PartitionReader.cpp): one subset id per line."""
    with open(path) as f:
        lab = [int(x) for x in f.read().split()]
    return ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.arange(len(lab), dtype=np.int64)),
                "label": pa.array(np.asarray(lab, np.int64)),
            }
        )
    )


def read_graph(path: str, fmt: str, **kw):
    """readGraph format dispatch (networkit/graphio.py Format enum)."""
    fmt = fmt.lower()
    if fmt in ("edgelist", "edgelisttab", "edgelistspace"):
        return read_edge_list(path, **kw)
    if fmt == "edgelistkeyed":
        return read_edge_list_keyed(path, **kw)
    if fmt == "snap":
        return read_snap(path, **kw)
    if fmt == "konect":
        return read_konect(path, **kw)
    if fmt == "metis":
        return read_metis(path, **kw)
    if fmt in ("mtx", "matrixmarket"):
        return read_matrix_market(path, **kw)
    if fmt == "gml":
        return read_gml(path, **kw)
    if fmt == "graphml":
        return read_graphml(path, **kw)
    if fmt == "gexf":
        return read_gexf(path, **kw)
    if fmt == "parquet":
        return ray.data.read_parquet(path, **kw)
    raise ValueError(f"unknown graph format: {fmt}")


def write_graph(edges: ray.data.Dataset, path: str, fmt: str, **kw) -> None:
    """writeGraph format dispatch."""
    fmt = fmt.lower()
    if fmt in ("edgelist", "edgelisttab", "edgelistspace"):
        sep = "\t" if fmt == "edgelisttab" else " "
        return write_edge_list(edges, path, sep=kw.pop("sep", sep), **kw)
    if fmt == "snap":
        return write_snap(edges, path, **kw)
    if fmt == "metis":
        return write_metis(edges, kw.pop("num_nodes"), path, **kw)
    if fmt in ("mtx", "matrixmarket"):
        return write_matrix_market(edges, kw.pop("num_nodes"), path, **kw)
    if fmt == "gml":
        return write_gml(edges, kw.pop("num_nodes"), path, **kw)
    if fmt == "graphml":
        return write_graphml(edges, kw.pop("num_nodes"), path, **kw)
    if fmt == "gexf":
        return write_gexf(edges, kw.pop("num_nodes"), path, **kw)
    if fmt == "dot":
        return write_dot(edges, path, **kw)
    if fmt == "parquet":
        return edges.write_parquet(path, **kw)
    raise ValueError(f"unknown graph format: {fmt}")


def read_graphml(path: str) -> tuple[ray.data.Dataset, int]:
    """GraphMLReader (networkit/GraphMLIO.py GraphMLSAX semantics): ``node``
    ids remapped to dense 0..n-1 in document order, one row per ``edge``
    element.  Single-task conformance parse (XML has no safe line split)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.index("}") + 1]
    remap: dict[str, int] = {}
    src, dst, w = [], [], []
    has_w = False
    for node in root.iter(f"{ns}node"):
        nid = node.get("id")
        if nid not in remap:
            remap[nid] = len(remap)
    for edge in root.iter(f"{ns}edge"):
        a, b = edge.get("source"), edge.get("target")
        for x in (a, b):
            if x not in remap:
                remap[x] = len(remap)
        src.append(remap[a])
        dst.append(remap[b])
        dat = edge.find(f"{ns}data")
        if dat is not None and dat.text is not None:
            has_w = True
            w.append(float(dat.text))
        else:
            w.append(1.0)
    cols = {
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64)),
    }
    if has_w:
        cols["w"] = pa.array(np.asarray(w, np.float64))
    return ray.data.from_arrow(pa.table(cols)), len(remap)


def write_graphml(
    edges: ray.data.Dataset, num_nodes: int, path: str, *, directed: bool = False
) -> None:
    """GraphMLWriter (networkit/GraphMLIO.py): nodes n0..n{n-1}, optional
    ``w`` column emitted as an edge data key."""
    import os

    t = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    has_w = "w" in t.column_names
    w = t["w"].to_numpy(zero_copy_only=False) if has_w else None
    order = np.lexsort((dst, src))
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
    ]
    if has_w:
        parts.append(
            '  <key id="d1" for="edge" attr.name="weight" attr.type="double"/>'
        )
    parts.append(
        f'  <graph id="G" edgedefault="{"directed" if directed else "undirected"}">'
    )
    parts += [f'    <node id="n{i}"/>' for i in range(num_nodes)]
    for i in order:
        if has_w:
            parts.append(
                f'    <edge source="n{src[i]}" target="n{dst[i]}">'
                f'<data key="d1">{w[i]!r}</data></edge>'
            )
        else:
            parts.append(f'    <edge source="n{src[i]}" target="n{dst[i]}"/>')
    parts += ["  </graph>", "</graphml>"]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(parts) + "\n")
    os.replace(tmp, path)


def read_gexf(path: str) -> tuple[ray.data.Dataset, int]:
    """GEXFReader (networkit/GEXFIO.py): node/edge elements of the GEXF 1.2
    schema; ids remapped dense; ``weight`` attribute honored."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    ns = root.tag[: root.tag.index("}") + 1] if root.tag.startswith("{") else ""
    remap: dict[str, int] = {}
    for node in root.iter(f"{ns}node"):
        nid = node.get("id")
        if nid not in remap:
            remap[nid] = len(remap)
    src, dst, w = [], [], []
    has_w = False
    for edge in root.iter(f"{ns}edge"):
        a, b = edge.get("source"), edge.get("target")
        for x in (a, b):
            if x not in remap:
                remap[x] = len(remap)
        src.append(remap[a])
        dst.append(remap[b])
        wt = edge.get("weight")
        has_w = has_w or wt is not None
        w.append(float(wt) if wt is not None else 1.0)
    cols = {
        "src": pa.array(np.asarray(src, np.int64)),
        "dst": pa.array(np.asarray(dst, np.int64)),
    }
    if has_w:
        cols["w"] = pa.array(np.asarray(w, np.float64))
    return ray.data.from_arrow(pa.table(cols)), len(remap)


def write_gexf(
    edges: ray.data.Dataset, num_nodes: int, path: str, *, directed: bool = False
) -> None:
    """GEXFWriter (networkit/GEXFIO.py), GEXF 1.2 draft layout."""
    import os

    t = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    has_w = "w" in t.column_names
    w = t["w"].to_numpy(zero_copy_only=False) if has_w else None
    order = np.lexsort((dst, src))
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">',
        f'  <graph defaultedgetype="{"directed" if directed else "undirected"}">',
        "    <nodes>",
    ]
    parts += [f'      <node id="{i}"/>' for i in range(num_nodes)]
    parts += ["    </nodes>", "    <edges>"]
    for k, i in enumerate(order):
        wa = f' weight="{w[i]!r}"' if has_w else ""
        parts.append(
            f'      <edge id="{k}" source="{src[i]}" target="{dst[i]}"{wa}/>'
        )
    parts += ["    </edges>", "  </graph>", "</gexf>"]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(parts) + "\n")
    os.replace(tmp, path)


def write_dot(edges: ray.data.Dataset, path: str, *, directed: bool = False) -> None:
    """DotGraphWriter (io/DotGraphWriter.cpp): ``graph { a -- b; }``."""
    import os

    t = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    kind, arrow = ("digraph", "->") if directed else ("graph", "--")
    lines = [f"{kind} G {{"]
    lines += [f"  {src[i]} {arrow} {dst[i]};" for i in order]
    lines.append("}")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def write_cover(cover: ray.data.Dataset, path: str) -> None:
    """CoverWriter (io/CoverWriter.cpp): line s = the node ids of subset s.

    Input: (v, label) rows, one row per membership (a node may appear in
    several subsets — that is what distinguishes a Cover from a Partition).
    """
    import os

    t = pa.concat_tables(
        list(cover.select_columns(["v", "label"]).iter_batches(batch_format="pyarrow"))
    )
    v = t["v"].to_numpy(zero_copy_only=False)
    lab = t["label"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, lab))
    v, lab = v[order], lab[order]
    lines = []
    for s in range(int(lab.max()) + 1 if len(lab) else 0):
        members = v[lab == s]
        lines.append(" ".join(str(x) for x in members))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def read_cover(path: str) -> ray.data.Dataset:
    """CoverReader (io/CoverReader.cpp): line s lists subset s's members."""
    v, lab = [], []
    with open(path) as f:
        for s, line in enumerate(f):
            for x in line.split():
                v.append(int(x))
                lab.append(s)
    return ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(np.asarray(v, np.int64)),
                "label": pa.array(np.asarray(lab, np.int64)),
            }
        )
    )


@ray.remote
def _bin_range(path: str, offset: int, n_records: int, width: int, first_node: int) -> pa.Table:
    dt = np.dtype("<u4") if width == 4 else np.dtype("<u8")
    arr = np.fromfile(path, dtype=dt, count=n_records * 2, offset=offset)
    arr = arr.astype(np.int64).reshape(-1, 2) - first_node
    return pa.table({"src": pa.array(arr[:, 0]), "dst": pa.array(arr[:, 1])})


def read_binary_edge_list(
    path: str,
    *,
    width: int = 8,
    first_node: int = 0,
    records_per_task: int = 4_000_000,
) -> ray.data.Dataset:
    """Little-endian fixed-width (src, dst) pairs → edge Dataset.

    Reference: io/BinaryEdgeListPartitionReader.cpp:8-60 (width 4 or 8,
    little-endian, multi-file).  ``path`` is one file or a directory of
    part files.  Each file is split into record-aligned BYTE RANGES read
    by independent tasks (np.fromfile with offset), so a single huge file
    still parallelizes — the binary-format scale path next to the text
    reader's Arrow-kernel parse.
    """
    import os

    if width not in (4, 8):
        raise ValueError("width must be 4 or 8")
    rec = 2 * width
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".")
        )
        if os.path.isdir(path)
        else [path]
    )
    refs = []
    for f in files:
        size = os.path.getsize(f)
        if size % rec:
            raise ValueError(f"{f}: size {size} not a multiple of {rec}")
        n = size // rec
        for start in range(0, n, records_per_task):
            cnt = min(records_per_task, n - start)
            refs.append(_bin_range.remote(f, start * rec, cnt, width, first_node))
    if not refs:
        return ray.data.from_arrow(
            pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()
        )
    return ray.data.from_arrow_refs(refs)


def write_binary_edge_list(
    edges: ray.data.Dataset, out_dir: str, *, width: int = 8
) -> list[str]:
    """Edge Dataset → directory of little-endian binary part files.

    One part file per input block (parallel, resumable — a re-run skips
    nothing but each part is independently valid); pairs are written in
    block order.  Returns the part paths.
    """
    import os

    if width not in (4, 8):
        raise ValueError("width must be 4 or 8")
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _write(t: pa.Table, p: str, width: int) -> str:
        dt = np.dtype("<u4") if width == 4 else np.dtype("<u8")
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        arr = np.empty(2 * len(s), dtype=dt)
        arr[0::2] = s.astype(dt)
        arr[1::2] = d.astype(dt)
        arr.tofile(p)
        return p

    paths = [
        _write.remote(r, os.path.join(out_dir, f"part-{i:05d}.bin"), width)
        for i, r in enumerate(edges.to_arrow_refs())
    ]
    return ray.get(paths)
