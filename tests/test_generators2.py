"""Ring-lattice / SBM / Havel–Hakimi / Dorogovtsev–Mendes generators."""

import collections

import numpy as np
import pytest


def _pairs(ds):
    return [(r["src"], r["dst"]) for r in ds.take_all()]


def test_ring_lattice_structure(ray_session):
    from networkit_ray.sources.synth import ring_lattice_edges

    n, k = 20, 3
    ds, nn = ring_lattice_edges(n, k)
    got = sorted(_pairs(ds))
    want = sorted(
        (min(i, (i + j) % n), max(i, (i + j) % n))
        for i in range(n)
        for j in range(1, k + 1)
    )
    assert nn == n
    assert got == want                      # distinct, complete
    deg = collections.Counter()
    for a, b in got:
        deg[a] += 1
        deg[b] += 1
    assert all(deg[v] == 2 * k for v in range(n))


def test_ring_lattice_parallelism_invariant(ray_session):
    from networkit_ray.sources.synth import ring_lattice_edges

    a, _ = ring_lattice_edges(50, 4)
    b, _ = ring_lattice_edges(50, 4)
    assert sorted(_pairs(a)) == sorted(_pairs(b.repartition(7)))


def test_sbm_blocks_denser_inside(ray_session):
    from networkit_ray.sources.synth import stochastic_blockmodel_edges

    n, B = 120, 4
    ds, _ = stochastic_blockmodel_edges(n, B, 0.5, 0.02, seed=7)
    pairs = _pairs(ds)
    assert len(pairs) == len(set(pairs))
    intra = sum(1 for u, v in pairs if u % B == v % B)
    inter = len(pairs) - intra
    # expected intra ≈ 0.5 · B·(n/B choose 2) = 0.5·4·435 = 870,
    # inter ≈ 0.02 · (n choose 2 − 1740) ≈ 107
    assert intra > 5 * inter
    # deterministic replica of the splitmix64 coin
    from networkit_ray.sources.synth import _splitmix64

    base = np.uint64(7) * np.uint64(0x100000001B3)
    for u, v in pairs[:50]:
        p = 0.5 if u % B == v % B else 0.02
        h = _splitmix64(np.array([u * n + v], np.uint64) + base)[0]
        assert h < np.uint64(int(p * 2**64))


def test_havel_hakimi_realizes_sequence(ray_session):
    from networkit_ray.sources.synth import havel_hakimi_edges

    rng = np.random.default_rng(3)
    seq = rng.integers(1, 6, 40)
    if seq.sum() % 2:
        seq[0] += 1
    ds, n = havel_hakimi_edges(seq)
    pairs = _pairs(ds)
    assert len(pairs) == len(set(pairs))            # simple graph
    assert all(a != b for a, b in pairs)            # no self loops
    deg = collections.Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    assert [deg[v] for v in range(n)] == list(seq)  # exact realization


def test_havel_hakimi_rejects_nongraphical(ray_session):
    from networkit_ray.sources.synth import havel_hakimi_edges

    # [3,3,1,1] fails Erdős–Gallai at k=2 (6 > 2 + 1 + 1)
    with pytest.raises(ValueError):
        havel_hakimi_edges(np.array([3, 3, 1, 1]))[0].take_all()
    with pytest.raises(ValueError):
        havel_hakimi_edges(np.array([1, 1, 1]))


def test_dorogovtsev_mendes_structure(ray_session):
    from networkit_ray.sources.synth import dorogovtsev_mendes_edges

    n = 30
    ds, nn = dorogovtsev_mendes_edges(n, seed=5)
    pairs = _pairs(ds)
    assert nn == n
    assert len(pairs) == 3 + 2 * (n - 3)
    assert len(pairs) == len(set(pairs))
    # every node ≥ 3 has degree ≥ 2 (attached to an edge's two endpoints)
    deg = collections.Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    assert all(deg[v] >= 2 for v in range(n))
    # deterministic
    again, _ = dorogovtsev_mendes_edges(n, seed=5)
    assert sorted(_pairs(again)) == sorted(pairs)


def test_barabasi_albert_matches_sequential_batagelj(ray_session):
    from networkit_ray.sources.synth import _splitmix64, barabasi_albert_edges

    n, k, seed = 60, 3, 9
    ds, nn = barabasi_albert_edges(n, k, seed=seed)
    got = sorted(_pairs(ds))

    # sequential Batagelj replica with the same hash draws
    base = np.uint64(seed) * np.uint64(0x100000001B3)
    S = list(np.repeat(np.arange(k), 2)[1:-1])
    m = (n - k) * k
    i = np.arange(m, dtype=np.uint64)
    r = (_splitmix64(i + base) % (np.uint64(len(S)) + np.uint64(2) * i)).astype(int)
    A = list(S)
    edges = [(j - 1, j) for j in range(1, k)]
    for j in range(m):
        u = j // k + k
        tgt = A[r[j]]
        A.append(u)
        A.append(tgt)
        edges.append((u, tgt))
    want = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    assert got == want
    # scale-free-ish: some node far exceeds the attachment degree
    deg = collections.Counter()
    for a, b in got:
        deg[a] += 1
        deg[b] += 1
    assert max(deg.values()) >= 3 * k


def test_hyperbolic_edges_match_replica(ray_session):
    from networkit_ray.sources.synth import _splitmix64, hyperbolic_edges

    n, R, alpha, seed = 80, 4.0, 0.75, 11
    ds, nn = hyperbolic_edges(n, R, alpha, seed=seed)
    got = sorted(_pairs(ds))

    base = np.uint64(seed) * np.uint64(0x100000001B3)
    ids = np.arange(n, dtype=np.uint64)
    theta = (_splitmix64(ids * np.uint64(2) + base).astype(np.float64) / 2.0**64) * 2 * np.pi
    u = _splitmix64(ids * np.uint64(2) + np.uint64(1) + base).astype(np.float64) / 2.0**64
    r = np.arccosh(1.0 + u * (np.cosh(alpha * R) - 1.0)) / alpha
    want = []
    for a in range(n):
        for b in range(a + 1, n):
            cosh_d = np.cosh(r[a]) * np.cosh(r[b]) - np.sinh(r[a]) * np.sinh(
                r[b]
            ) * np.cos(theta[a] - theta[b])
            if cosh_d <= np.cosh(R):
                want.append((a, b))
    assert got == sorted(want)
    # heavy-tailed degrees: hub well above the average
    deg = collections.Counter()
    for a, b in got:
        deg[a] += 1
        deg[b] += 1
    avg = 2 * len(got) / n
    assert max(deg.values()) > 2.0 * avg
    # deterministic across partitionings (counter draws)
    again, _ = hyperbolic_edges(n, R, alpha, seed=seed)
    assert sorted(_pairs(again.repartition(7))) == got
