"""Edge-list / METIS readers and writers (conformance surface).

Parquet is this engine's native graph format (the analog of the reference's
NetworkitBinary chunked format, io/NetworkitBinaryGraph.md); these readers
cover the reference's text formats for fixture conformance:

- :func:`read_edge_list` — EdgeListReader semantics
  (networkit/cpp/io/EdgeListReader.cpp:38-168): ``u<sep>v[<sep>w]`` lines,
  comment prefix, ``first_node`` offset, weight sniffing from the first data
  line; distributed via ``read_text`` + vectorized parse (the mmap parse of
  the reference maps to Arrow CSV blocks).
- :func:`read_metis` — METISGraphReader (io/METISGraphReader.cpp:20-118):
  line *i* lists the 1-based neighbors of node *i-1*; the line-number ⇒
  node-id coupling makes this inherently sequential, so it parses in ONE
  task (conformance fixtures only — not a scale path).
- :func:`write_edge_list` — EdgeListWriter (io/EdgeListWriter.cpp:15-43).
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
    """
    lines = ray.data.read_text(path)

    def parse(t: pa.Table) -> pa.Table:
        src, dst, w = [], [], []
        for line in t["text"].to_pylist():
            s = line.strip()
            if not s or s.startswith(comment):
                continue
            parts = s.split(sep)
            src.append(int(parts[0]) - first_node)
            dst.append(int(parts[1]) - first_node)
            if weighted or (weighted is None and len(parts) > 2):
                w.append(float(parts[2]))
        cols = {
            "src": pa.array(np.asarray(src, np.int64)),
            "dst": pa.array(np.asarray(dst, np.int64)),
        }
        if w:
            cols["w"] = pa.array(np.asarray(w, np.float32))
        return pa.table(cols)

    return lines.map_batches(parse, batch_format="pyarrow")


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
