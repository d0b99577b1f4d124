"""Sfigality / Laplacian centrality / local partition coverage vs numpy oracles."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.vertexmeasures import (
    laplacian_centrality,
    local_partition_coverage,
    sfigality,
)


def _sym_ds(both):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in both], pa.int64()),
                "dst": pa.array([b for _, b in both], pa.int64()),
            }
        )
    ).materialize()


def _random_graph(seed, n, m):
    rng = np.random.default_rng(seed)
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n - 2, (m, 2)) if a != b}
    )  # vertices n-2, n-1 stay isolated
    both = canon + [(b, a) for a, b in canon]
    adj = {v: set() for v in range(n)}
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    return _sym_ds(both), adj


class TestSfigality:
    def test_matches_oracle(self):
        n = 40
        sym, adj = _random_graph(3, n, 120)
        got = sfigality(sym, n).to_pandas().set_index("v")["sfigality"].to_dict()
        for v in range(n):
            d = len(adj[v])
            exp = 0.0 if d == 0 else sum(1 for u in adj[v] if len(adj[u]) > d) / d
            assert abs(got[v] - exp) < 1e-7, (v, got[v], exp)
        assert len(got) == n  # isolated vertices present


class TestLaplacianCentrality:
    def test_matches_closed_form(self):
        n = 35
        sym, adj = _random_graph(7, n, 100)
        got = laplacian_centrality(sym, n).to_pandas().set_index("v")["lc"].to_dict()
        for v in range(n):
            d = len(adj[v])
            exp = d * d + d + 2 * sum(len(adj[u]) for u in adj[v])
            assert got[v] == exp, (v, got[v], exp)

    def test_normalized_sums_sane(self):
        n = 30
        sym, adj = _random_graph(5, n, 80)
        got = laplacian_centrality(sym, n, normalized=True).to_pandas()
        total = sum(len(a) ** 2 for a in adj.values()) + sum(
            len(a) for a in adj.values()
        )
        raw = laplacian_centrality(sym, n).to_pandas()
        assert np.allclose(got["lc"], raw["lc"] / total)


class TestLocalPartitionCoverage:
    def test_matches_oracle(self):
        n = 40
        sym, adj = _random_graph(11, n, 120)
        labels = rd.from_arrow(
            pa.table(
                {
                    "v": pa.array(np.arange(n, dtype=np.int64)),
                    "label": pa.array(np.arange(n, dtype=np.int64) % 4),
                }
            )
        )
        got = (
            local_partition_coverage(sym, labels, n)
            .to_pandas()
            .set_index("v")["lpc"]
            .to_dict()
        )
        for v in range(n):
            d = len(adj[v])
            exp = 0.0 if d == 0 else sum(1 for u in adj[v] if u % 4 == v % 4) / d
            assert abs(got[v] - exp) < 1e-7, (v, got[v], exp)

    def test_parallelism_invariant(self):
        n = 40
        sym, _ = _random_graph(3, n, 120)
        a = sfigality(sym, n).to_pandas().sort_values("v").reset_index(drop=True)
        b = (
            sfigality(sym.repartition(7).materialize(), n)
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        assert a.equals(b)
