"""Partition dissimilarity/fragmentation/expansion measures vs numpy replicas.

Reference semantics: community/JaccardMeasure.cpp,
NodeStructuralRandMeasure.cpp, GraphStructuralRandMeasure.cpp,
PartitionFragmentation.cpp, IsolatedInterpartitionExpansion.cpp.
"""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd


def _labels_ds(lab):
    return rd.from_arrow(
        pa.table(
            {
                "v": pa.array(range(len(lab)), pa.int64()),
                "label": pa.array([int(x) for x in lab], pa.int64()),
            }
        )
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


def _rand_graph(seed, n, m):
    rng = np.random.default_rng(seed)
    return sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )


def _c2(x):
    return x * (x - 1) // 2


def _sums(n, l1, l2):
    si = sum(_c2(c) for c in collections.Counter(zip(l1, l2)).values())
    sz = sum(_c2(c) for c in collections.Counter(l1).values())
    se = sum(_c2(c) for c in collections.Counter(l2).values())
    return si, sz, se


def test_jaccard_and_node_rand_match_replica(ray_session):
    from networkit_ray.graph.quality import jaccard_measure, node_structural_rand

    n = 60
    rng = np.random.default_rng(3)
    l1 = rng.integers(0, 5, n)
    l2 = rng.integers(0, 4, n)
    si, sz, se = _sums(n, l1, l2)
    s00 = n * (n - 1) / 2 + si - (sz + se)
    div = n * (n - 1) - 2 * s00
    want_j = 1.0 - 2.0 * si / div if div > 0 else 0.0
    a = n * (n - 1) / 2 + 2 * si - (sz + se)
    want_r = 1.0 - 2.0 * a / (n * (n - 1))

    got_j = jaccard_measure(_labels_ds(l1), _labels_ds(l2), n)
    got_r = node_structural_rand(_labels_ds(l1), _labels_ds(l2), n)
    assert abs(got_j - want_j) < 1e-12
    assert abs(got_r - want_r) < 1e-12


def test_graph_structural_rand_match_replica(ray_session):
    from networkit_ray.graph.quality import graph_structural_rand

    n = 60
    canon = _rand_graph(5, n, 240)
    rng = np.random.default_rng(7)
    l1 = rng.integers(0, 5, n)
    l2 = rng.integers(0, 4, n)
    e11 = sum(1 for u, v in canon if l1[u] == l1[v] and l2[u] == l2[v])
    e00 = sum(1 for u, v in canon if l1[u] != l1[v] and l2[u] != l2[v])
    want = 1.0 - (e11 + e00) / len(canon)
    got = graph_structural_rand(_edges_ds(canon), _labels_ds(l1), _labels_ds(l2))
    assert abs(got - want) < 1e-12


def test_partition_fragmentation_match_replica(ray_session):
    from networkit_ray.graph.quality import partition_fragmentation

    n = 50
    rng = np.random.default_rng(11)
    lab = rng.integers(0, 4, n)
    cc = rng.integers(0, 6, n)
    cells = collections.Counter(zip(lab, cc))
    sizes = collections.Counter(lab)
    want = {
        int(c): 1.0 - max(v for (cl, _), v in cells.items() if cl == c) / sizes[c]
        for c in sizes
    }
    got = {
        r["label"]: r["fragmentation"]
        for r in partition_fragmentation(_labels_ds(lab), _labels_ds(cc)).take_all()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_expansion_table_match_replica(ray_session):
    from networkit_ray.graph.quality import expansion_table

    n = 50
    canon = _rand_graph(13, n, 200)
    rng = np.random.default_rng(17)
    lab = rng.integers(0, 5, n)
    cut = collections.Counter()
    for u, v in canon:
        if lab[u] != lab[v]:
            cut[int(lab[u])] += 1
            cut[int(lab[v])] += 1
    sizes = collections.Counter(int(x) for x in lab)
    want = {
        c: cut[c] / min(sizes[c], n - sizes[c]) if min(sizes[c], n - sizes[c]) > 0 else 0.0
        for c in sizes
    }
    got = {
        r["label"]: r["expansion"]
        for r in expansion_table(_edges_ds(canon), _labels_ds(lab), n).take_all()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_map_equation_matches_replica(ray_session):
    from networkit_ray.graph.quality import map_equation

    n = 50
    canon = _rand_graph(19, n, 200)
    rng = np.random.default_rng(23)
    lab = rng.integers(0, 5, n)
    got = map_equation(_edges_ds(canon), _labels_ds(lab))

    deg = collections.Counter()
    cut = collections.Counter()
    vol = collections.Counter()
    for u, v in canon:
        deg[u] += 1
        deg[v] += 1
        if lab[u] != lab[v]:
            cut[int(lab[u])] += 1
            cut[int(lab[v])] += 1
    for v in range(n):
        vol[int(lab[v])] += deg[v]
    tv = 2.0 * len(canon)

    def plogp(w):
        return (w / tv) * np.log(w / tv) if w > 0 else 0.0

    labels = set(int(x) for x in lab)
    total_cut = sum(cut.values())
    want = (
        plogp(total_cut)
        - 2 * sum(plogp(cut[c]) for c in labels)
        + sum(plogp(cut[c] + vol[c]) for c in labels)
        - sum(plogp(vol[c]) for c in labels)
    )
    assert abs(got - want) < 1e-12


def test_map_equation_prefers_good_partition(ray_session):
    from networkit_ray.graph.quality import map_equation

    # two cliques: the true 2-cluster partition has a lower codelength
    # than a random split
    canon = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    canon += [(a, b) for a in range(6, 12) for b in range(a + 1, 12)]
    canon.append((0, 6))
    truth = [0] * 6 + [1] * 6
    rng = np.random.default_rng(1)
    rand = rng.integers(0, 2, 12)
    good = map_equation(_edges_ds(canon), _labels_ds(truth))
    bad = map_equation(_edges_ds(canon), _labels_ds(rand))
    assert good < bad
