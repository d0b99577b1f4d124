"""Exotic binary graph IO: graph-tool / Thrill / DibaP / raster / binary
partition files — byte-level layout checks against the reference formats
(io/GraphToolBinary*.cpp, ThrillGraphBinary*.cpp, DibapGraphReader.cpp,
RasterReader.cpp, BinaryPartitionReader.cpp) plus round-trips.
"""

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.sources.binary_graph import (
    read_binary_partition,
    read_dibap,
    read_graphtool_binary,
    read_raster,
    read_thrill_binary,
    write_binary_partition,
    write_dibap,
    write_graphtool_binary,
    write_thrill_binary,
)


def _edges_ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in rows], pa.int64()),
                "dst": pa.array([v for u, v in rows], pa.int64()),
            }
        )
    )


def _rows(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[["src", "dst"]].itertuples(index=False)))


def _rand_canonical(seed, n, m):
    rng = np.random.default_rng(seed)
    return sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, (m, 2))
            if a != b
        }
    )


# ------------------------------------------------------------ graph-tool
class TestGraphTool:
    def test_directed_roundtrip(self, tmp_path):
        rows = [(0, 1), (1, 2), (2, 0), (3, 1), (0, 3)]
        p = str(tmp_path / "g.gt")
        write_graphtool_binary(_edges_ds(rows), 4, p, directed=True)
        ds, n, directed = read_graphtool_binary(p)
        assert (n, directed) == (4, True)
        assert _rows(ds) == sorted(rows)

    def test_undirected_roundtrip_width2(self, tmp_path):
        # n = 300 forces the 2-byte adjacency width (reader.cpp:88-98)
        rows = _rand_canonical(7, 300, 900)
        p = str(tmp_path / "g.gt")
        write_graphtool_binary(_edges_ds(rows), 300, p, directed=False)
        ds, n, directed = read_graphtool_binary(p)
        assert (n, directed) == (300, False)
        assert _rows(ds) == rows

    def test_big_endian_roundtrip(self, tmp_path):
        rows = _rand_canonical(11, 50, 120)
        p = str(tmp_path / "g.gt")
        write_graphtool_binary(
            _edges_ds(rows), 50, p, directed=False, little_endian=False
        )
        ds, n, _ = read_graphtool_binary(p)
        assert n == 50 and _rows(ds) == rows

    def test_byte_layout(self, tmp_path):
        # one directed edge 0->1, n=2: hand-check every byte of the file
        p = str(tmp_path / "g.gt")
        write_graphtool_binary(_edges_ds([(0, 1)]), 2, p, directed=True)
        buf = open(p, "rb").read()
        assert buf[:6] == bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])
        assert buf[6] == 0x01 and buf[7] == 0x00  # version, little-endian
        assert struct.unpack("<Q", buf[8:16])[0] == 0  # empty comment
        assert buf[16] == 1  # directed
        assert struct.unpack("<Q", buf[17:25])[0] == 2  # n
        assert struct.unpack("<Q", buf[25:33])[0] == 1  # deg(0)
        assert buf[33] == 1  # neighbor id, width 1 (n < 256)
        assert struct.unpack("<Q", buf[34:42])[0] == 0  # deg(1)
        assert len(buf) == 42

    def test_undirected_stores_low_neighbors_once(self, tmp_path):
        # writer.cpp:73-76 keeps v <= u in u's list: edge (0,1) lives in
        # node 1's record, node 0's degree field is 0
        p = str(tmp_path / "g.gt")
        write_graphtool_binary(_edges_ds([(0, 1)]), 2, p, directed=False)
        buf = open(p, "rb").read()
        assert struct.unpack("<Q", buf[25:33])[0] == 0  # deg(0), no neighbors
        assert struct.unpack("<Q", buf[33:41])[0] == 1  # deg(1)
        assert buf[41] == 0  # stored neighbor of node 1 is 0


# ------------------------------------------------------------------ Thrill
class TestThrill:
    def test_roundtrip(self, tmp_path):
        rows = _rand_canonical(3, 40, 100)
        p = str(tmp_path / "g.thrill")
        write_thrill_binary(_edges_ds(rows), 40, p)
        ds, n = read_thrill_binary(p)
        assert n == 40
        assert _rows(ds) == rows

    def test_multibyte_varint_degree(self, tmp_path):
        # star center 0 with 200 leaves: degree 200 needs a 2-byte varint
        rows = [(0, v) for v in range(1, 201)]
        p = str(tmp_path / "g.thrill")
        write_thrill_binary(_edges_ds(rows), 201, p)
        buf = open(p, "rb").read()
        assert buf[0] == (200 & 0x7F) | 0x80 and buf[1] == 200 >> 7
        ds, n = read_thrill_binary(p)
        assert n == 201 and _rows(ds) == rows

    def test_multi_file_concat(self, tmp_path):
        # node records continue across file boundaries (reader.cpp:52-89)
        rows = _rand_canonical(5, 30, 60)
        whole = str(tmp_path / "w.thrill")
        write_thrill_binary(_edges_ds(rows), 30, whole)
        buf = open(whole, "rb").read()
        cut = len(buf) // 3
        # split at a record boundary: find it by re-walking the varint runs
        off, recs = 0, []
        while off < len(buf):
            deg, shift, start = 0, 0, off
            while True:
                b = buf[off]
                off += 1
                deg |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
            off += 4 * deg
            recs.append((start, off))
        split = next(e for s, e in recs if e >= cut)
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        open(p1, "wb").write(buf[:split])
        open(p2, "wb").write(buf[split:])
        ds, n = read_thrill_binary([p1, p2])
        assert n == 30 and _rows(ds) == rows

    def test_zero_degree_single_zero_byte(self, tmp_path):
        p = str(tmp_path / "g.thrill")
        write_thrill_binary(_edges_ds([]), 3, p)
        assert open(p, "rb").read() == b"\x00\x00\x00"


# ------------------------------------------------------------------- DibaP
class TestDibap:
    def test_roundtrip_unweighted(self, tmp_path):
        rows = _rand_canonical(9, 25, 60)
        p = str(tmp_path / "g.dibap")
        write_dibap(_edges_ds(rows), 25, p)
        ds, n, coords = read_dibap(p)
        assert n == 25 and coords is None
        assert _rows(ds) == rows

    def test_roundtrip_weighted_with_coords(self, tmp_path):
        rows = [(0, 1), (0, 2), (1, 2), (2, 3)]
        w = {r: float(i + 1) for i, r in enumerate(rows)}
        ds_in = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([u for u, v in rows], pa.int64()),
                    "dst": pa.array([v for u, v in rows], pa.int64()),
                    "w": pa.array([w[r] for r in rows], pa.float64()),
                }
            )
        )
        xy = np.arange(8, dtype=np.float32).reshape(4, 2)
        p = str(tmp_path / "g.dibap")
        write_dibap(ds_in, 4, p, weights=True, coords=xy)
        ds, n, coords = read_dibap(p)
        assert n == 4
        np.testing.assert_array_equal(coords, xy)
        df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert list(map(tuple, df[["src", "dst"]].itertuples(index=False))) == rows == sorted(rows)
        # weights survive int32 round-trip per reference ew[e] semantics
        assert df["w"].tolist() == [w[r] for r in sorted(rows)]

    def test_handcrafted_bytes(self, tmp_path):
        # triangle 0-1-2, CSR offsets [0,2,4,6], big-endian throughout
        of = [0, 2, 4, 6]
        to = [1, 2, 0, 2, 0, 1]
        buf = b"GI" + np.array([3, 0] + of + to + [0, 0], ">i4").tobytes()
        p = tmp_path / "g.dibap"
        p.write_bytes(buf)
        ds, n, coords = read_dibap(str(p))
        assert n == 3 and coords is None
        assert _rows(ds) == [(0, 1), (0, 2), (1, 2)]

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad"
        p.write_bytes(b"XX" + b"\x00" * 16)
        try:
            read_dibap(str(p))
            assert False
        except ValueError:
            pass


# ------------------------------------------------------------------ raster
class TestRaster:
    def _grid(self, tmp_path, rows):
        nrows, ncols = len(rows), len(rows[0])
        lines = [
            f"ncols         {ncols}",
            f"nrows         {nrows}",
            "xllcorner     0.0",
            "yllcorner     0.0",
            "cellsize      1.0",
            "NODATA_value  -9999",
        ] + [" ".join(str(v) for v in r) for r in rows]
        p = tmp_path / "g.asc"
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_counts_and_bounds(self, tmp_path):
        grid = [[2.0, 0.0], [1.0, 3.0]]
        ds = read_raster(self._grid(tmp_path, grid), 1.0, seed=5)
        df = ds.to_pandas()
        assert len(df) == 6  # sum of round(val * nf)
        # cell (row=0, col=0) holds 2 points with x in [0,1), y in [0,1)
        in_cell = df[(df.x < 1) & (df.y >= 0)]
        assert len(in_cell) == 2
        # cell (row=1, col=1): x in [1,2), y in [-1,0)
        c11 = df[(df.x >= 1) & (df.y < 0)]
        assert len(c11) == 3
        assert ((c11.x >= 1) & (c11.x < 2) & (c11.y >= -1) & (c11.y < 0)).all()

    def test_normalization_and_determinism(self, tmp_path):
        grid = [[10.0, 4.0], [0.0, 6.0]]
        p = self._grid(tmp_path, grid)
        a = read_raster(p, 0.5, seed=9).to_pandas()
        b = read_raster(p, 0.5, seed=9).to_pandas()
        assert len(a) == 5 + 2 + 3  # round(val * 0.5) per cell
        assert np.array_equal(a.values, b.values)
        c = read_raster(p, 0.5, seed=10).to_pandas()
        assert not np.array_equal(a.values, c.values)


# -------------------------------------------------------- binary partition
class TestBinaryPartition:
    def _labels(self, lab):
        return rd.from_arrow(
            pa.table(
                {
                    "v": pa.array(range(len(lab)), pa.int64()),
                    "label": pa.array(lab, pa.int64()),
                }
            )
        )

    def test_roundtrip_widths(self, tmp_path):
        lab = [3, 3, 0, 7, 7, 1]
        for width in (4, 8):
            p = str(tmp_path / f"p{width}.bin")
            write_binary_partition(self._labels(lab), p, width=width)
            assert len(open(p, "rb").read()) == width * len(lab)
            out = read_binary_partition(p, width=width).to_pandas()
            assert out.sort_values("v")["label"].tolist() == lab

    def test_length_validation(self, tmp_path):
        p = tmp_path / "bad.bin"
        p.write_bytes(b"\x00" * 10)  # not a multiple of 8
        try:
            read_binary_partition(str(p), width=8)
            assert False
        except ValueError:
            pass
