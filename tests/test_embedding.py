"""SGNS embedding training: pair extraction replica + planted-cluster quality."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_skipgram_pairs_match_replica(ray_session):
    from networkit_ray.graph.embedding import skipgram_pairs

    walks = [(0, [5, 6, 7, 8]), (1, [9, 10, 11])]
    rows = [(w, i, v) for w, seq in walks for i, v in enumerate(seq)]
    ds = rd.from_arrow(
        pa.table(
            {
                "walker": pa.array([r[0] for r in rows], pa.int64()),
                "step": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).materialize()
    got = sorted(
        (r["center"], r["context"]) for r in skipgram_pairs(ds, window=2).take_all()
    )
    want = []
    for _, seq in walks:
        for i in range(len(seq)):
            for off in (1, 2):
                if i + off < len(seq):
                    want.append((seq[i], seq[i + off]))
                    want.append((seq[i + off], seq[i]))
    assert got == sorted(want)


def test_sgns_separates_planted_clusters(ray_session):
    from networkit_ray.graph.embedding import sgns_embeddings
    from networkit_ray.graph.walks import random_walks
    from networkit_ray.sources.synth import planted_partition

    n, k = 40, 2
    canon, labels = planted_partition(n, k, p_in=0.9, p_out=0.02, seed=3)
    both = canon.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    walks = random_walks(both, n, n_walkers=40, length=8, seed=5).materialize()
    emb = sgns_embeddings(walks, n, dim=8, epochs=8, lr=0.1, seed=7)
    df = emb.to_pandas().sort_values("v")
    E = df[[f"e{j}" for j in range(8)]].to_numpy()
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    sim = E @ E.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(n, dtype=bool)
    intra = sim[same & off_diag].mean()
    inter = sim[~same].mean()
    assert intra > inter + 0.1, (intra, inter)

    # deterministic
    emb2 = sgns_embeddings(walks, n, dim=8, epochs=8, lr=0.1, seed=7)
    df2 = emb2.to_pandas().sort_values("v")
    np.testing.assert_allclose(
        df[[f"e{j}" for j in range(8)]].to_numpy(),
        df2[[f"e{j}" for j in range(8)]].to_numpy(),
    )


def test_sgns_lattice_mode_reblocking_invariant(ray_session):
    """lattice=True: gradients quantize to 2^-24 multiples that sum exactly,
    so the trained weights are bit-identical under any walk re-blocking —
    the property the sgns_embeddings SQL oracle relies on."""
    from networkit_ray.graph.embedding import sgns_embeddings
    from networkit_ray.graph.walks import random_walks
    from networkit_ray.sources.synth import planted_partition

    n = 30
    canon, labels = planted_partition(n, 2, p_in=0.9, p_out=0.05, seed=11)
    both = canon.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    walks = random_walks(both, n, n_walkers=30, length=6, seed=9).materialize()

    cols = [f"e{j}" for j in range(6)]

    def train(w):
        df = (
            sgns_embeddings(w, n, dim=6, epochs=3, lr=0.1, seed=13, lattice=True)
            .to_pandas()
            .sort_values("v")
        )
        return df[cols].to_numpy()

    a = train(walks.repartition(1).materialize())
    b = train(walks.repartition(8).materialize())
    np.testing.assert_array_equal(a, b)  # bit-exact, not allclose

    # quality parity: the lattice mode still separates the planted clusters
    E = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    sim = E @ E.T
    same = labels[:, None] == labels[None, :]
    off = ~np.eye(n, dtype=bool)
    assert sim[same & off].mean() > sim[~same].mean(), "lattice mode lost signal"
