"""DGS event-stream IO (DGS004 text format).

Reference: dynamics/DGSWriter.cpp:15-60 emits ``an u`` / ``dn u`` /
``ae u-v u v weight=w`` / ``de u-v`` / ``ce u-v weight=w`` lines under a
``DGS004`` cookie + description header; dynamics/DGSStreamParser.cpp
parses them back into a GraphEvent stream.  The event tables here use
the ``graph_difference`` schema (kind, u, v) with v = -1 for node
events, so read → ``dynamics.apply_events`` replays a written stream.

An event stream is ordered by definition, so the writer emits ONE file
(reference semantics); the parse side is whole-batch Arrow string
kernels over ``read_text`` blocks — order within the table does not
matter to ``apply_events`` (set semantics), which is what makes the
parallel read sound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_KIND_TO_TAG = {
    "node_addition": "an",
    "node_removal": "dn",
    "edge_addition": "ae",
    "edge_removal": "de",
    "weight_update": "ce",
}


def write_dgs(events: ray.data.Dataset, path: str) -> None:
    """Write a (kind, u, v[, w]) event table as a DGS004 stream."""
    df = events.to_pandas()
    with open(path, "w") as f:
        f.write("DGS004\nnoname 0 0\n")
        for r in df.itertuples(index=False):
            tag = _KIND_TO_TAG[r.kind]
            w = getattr(r, "w", 1.0)
            if tag == "an" or tag == "dn":
                f.write(f"{tag} {r.u}\n")
            elif tag == "ae":
                f.write(f"ae {r.u}-{r.v} {r.u} {r.v} weight={w}\n")
            elif tag == "ce":
                f.write(f"ce {r.u}-{r.v} weight={w}\n")
            else:
                f.write(f"de {r.u}-{r.v}\n")


def read_dgs(path: str) -> ray.data.Dataset:
    """Parse a DGS004 stream back into a (kind, u, v) event table."""
    lines = ray.data.read_text(path)

    def parse(t: pa.Table) -> pa.Table:
        s = pc.utf8_trim_whitespace(t["text"].combine_chunks())
        keep = pc.and_(
            pc.invert(pc.starts_with(s, pattern="DGS")),
            pc.and_(
                pc.invert(pc.starts_with(s, pattern="noname")),
                pc.and_(
                    pc.invert(pc.starts_with(s, pattern="st")),
                    pc.not_equal(s, ""),
                ),
            ),
        )
        s = s.filter(keep)
        if len(s) == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        parts = pc.split_pattern_regex(s, pattern=r"\s+")
        tag = pc.list_element(parts, 0).to_numpy(zero_copy_only=False)
        arg1 = pc.list_element(parts, 1).to_numpy(zero_copy_only=False)
        tag_to_kind = {v: k for k, v in _KIND_TO_TAG.items()}
        kind = np.array([tag_to_kind[x] for x in tag], dtype=object)
        is_edge = np.isin(tag, ["ae", "de", "ce"])
        u = np.empty(len(tag), np.int64)
        v = np.full(len(tag), -1, np.int64)
        if (~is_edge).any():
            u[~is_edge] = np.array(
                [int(x) for x in arg1[~is_edge]], np.int64
            )
        if is_edge.any():
            uv = np.array(
                [x.split("-") for x in arg1[is_edge]], dtype=object
            )
            u[is_edge] = np.array([int(a) for a, _ in uv], np.int64)
            v[is_edge] = np.array([int(b) for _, b in uv], np.int64)
        return pa.table(
            {
                "kind": pa.array(kind.astype(str)),
                "u": pa.array(u),
                "v": pa.array(v),
            }
        )

    return lines.map_batches(parse, batch_format="pyarrow")
