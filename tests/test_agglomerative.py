"""ParallelAgglomerativeClusterer analog: partition validity + quality."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.agglomerative import (
    _handshake_matching,
    agglomerative_communities,
)


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, b in rows], pa.int64()),
                "dst": pa.array([b for a, b in rows], pa.int64()),
            }
        )
    )


def _two_cliques(k):
    e = []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                e.append((base + i, base + j))
    e.append((0, k))  # one bridge
    return e


class TestHandshakeMatching:
    def test_is_valid_matching(self):
        rng = np.random.default_rng(4)
        rows = sorted(
            {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, 20, (50, 2)) if a != b}
        )
        scored = rd.from_arrow(
            pa.table(
                {
                    "u": pa.array([a for a, b in rows], pa.int64()),
                    "v": pa.array([b for a, b in rows], pa.int64()),
                    "score": pa.array(
                        [float((a * 7 + b * 13) % 19 + 1) for a, b in rows]
                    ),
                }
            )
        )
        m = _handshake_matching(scored).to_pandas()
        seen = set()
        eset = set(rows)
        for r in m.itertuples(index=False):
            assert (r.u, r.v) in eset
            assert r.u not in seen and r.v not in seen
            seen.add(r.u)
            seen.add(r.v)
        assert len(m) >= 1

    def test_deterministic(self):
        rng = np.random.default_rng(9)
        rows = sorted(
            {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, 15, (35, 2)) if a != b}
        )
        scored = rd.from_arrow(
            pa.table(
                {
                    "u": pa.array([a for a, b in rows], pa.int64()),
                    "v": pa.array([b for a, b in rows], pa.int64()),
                    "score": pa.array([1.0] * len(rows)),
                }
            )
        )
        a = _handshake_matching(scored, num_parts=3).to_pandas()
        b = _handshake_matching(scored.repartition(5).materialize(), num_parts=9).to_pandas()
        sa = a.sort_values(["u", "v"]).reset_index(drop=True)
        sb = b.sort_values(["u", "v"]).reset_index(drop=True)
        assert sa.equals(sb)


class TestAgglomerative:
    def test_two_cliques(self):
        e = _two_cliques(6)
        labels, info = agglomerative_communities(_ds(e), 12)
        df = labels.to_pandas().sort_values("v")
        # valid partition over all 12 vertices
        assert set(df["v"]) == set(range(12))
        # communities respect the clique split reasonably: the bridge may
        # merge, but most vertices of each clique share a label
        left = df[df.v < 6]["label"].value_counts().iloc[0]
        right = df[df.v >= 6]["label"].value_counts().iloc[0]
        assert left >= 4 and right >= 4
        assert info["levels"] >= 1

    def test_deterministic(self):
        e = _two_cliques(5)
        a, _ = agglomerative_communities(_ds(e), 10)
        b, _ = agglomerative_communities(_ds(e).repartition(4).materialize(), 10)
        pa_ = a.to_pandas().sort_values("v")["label"].to_numpy()
        pb = b.to_pandas().sort_values("v")["label"].to_numpy()
        assert np.array_equal(pa_, pb)
