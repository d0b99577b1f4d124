"""Cover F1 similarity and hub dominance vs brute-force replicas."""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd


def _cover_ds(memb):
    return rd.from_arrow(
        pa.table(
            {
                "v": pa.array([v for v, c in memb], pa.int64()),
                "c": pa.array([c for v, c in memb], pa.int64()),
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


def _rand_cover(seed, n, k, extra_p):
    rng = np.random.default_rng(seed)
    memb = [(v, int(v % k)) for v in range(n)]
    for v in range(n):
        if rng.random() < extra_p:
            memb.append((v, int(k + rng.integers(0, 3))))
    return sorted(set(memb))


def test_cover_f1_similarity_matches_replica(ray_session):
    from networkit_ray.graph.cover import cover_f1_similarity

    n = 60
    C = _rand_cover(1, n, 5, 0.4)
    R = _rand_cover(2, n, 4, 0.3)
    got = {r["c"]: r["f1"] for r in cover_f1_similarity(_cover_ds(C), _cover_ds(R)).take_all()}

    csets = collections.defaultdict(set)
    rsets = collections.defaultdict(set)
    for v, c in C:
        csets[c].add(v)
    for v, s in R:
        rsets[s].add(v)
    want = {}
    for c, mem in csets.items():
        best = 0.0
        for s, rm in rsets.items():
            ol = len(mem & rm)
            if ol:
                best = max(best, 2.0 * ol / (len(mem) + len(rm)))
        want[c] = best
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_cover_hub_dominance_matches_replica(ray_session):
    from networkit_ray.graph.cover import cover_hub_dominance

    n = 50
    rng = np.random.default_rng(5)
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (200, 2)) if a != b}
    )
    C = _rand_cover(7, n, 4, 0.5)
    got = {
        r["c"]: r["dominance"]
        for r in cover_hub_dominance(_edges_ds(canon), _cover_ds(C)).take_all()
    }

    adj = collections.defaultdict(set)
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    csets = collections.defaultdict(set)
    for v, c in C:
        csets[c].add(v)
    want = {}
    for c, mem in csets.items():
        if len(mem) == 1:
            want[c] = 1.0
        else:
            md = max(len(adj[u] & mem) for u in mem)
            want[c] = md / (len(mem) - 1)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_overlapping_nmi_identical_and_symmetry(ray_session):
    from networkit_ray.graph.cover import overlapping_nmi_distance

    n = 50
    C = _rand_cover(3, n, 5, 0.4)
    R = _rand_cover(4, n, 4, 0.3)
    assert abs(overlapping_nmi_distance(_cover_ds(C), _cover_ds(C), n)) < 1e-12
    d1 = overlapping_nmi_distance(_cover_ds(C), _cover_ds(R), n)
    d2 = overlapping_nmi_distance(_cover_ds(R), _cover_ds(C), n)
    assert abs(d1 - d2) < 1e-12
    assert 0.0 < d1 <= 1.0


def test_overlapping_nmi_matches_replica(ray_session):
    """Independent scalar replica of the McDaid adjusted-conditional-entropy
    formula (community/OverlappingNMIDistance.cpp)."""
    import math

    from networkit_ray.graph.cover import overlapping_nmi_distance

    n = 40
    C = _rand_cover(7, n, 4, 0.5)
    R = _rand_cover(8, n, 3, 0.4)

    def h(w):
        return -w * math.log2(w / n) if w > 0 else 0.0

    def ent(sz):
        return h(sz) + h(n - sz)

    csets = collections.defaultdict(set)
    rsets = collections.defaultdict(set)
    for v, c in C:
        csets[c].add(v)
    for v, s in R:
        rsets[s].add(v)

    def cond(xsets, ysets):
        tot = 0.0
        for i, xi in xsets.items():
            best = ent(len(xi))
            for j, yj in ysets.items():
                ol = len(xi & yj)
                if ol == 0:
                    continue
                a = n + ol - len(xi) - len(yj)
                b = len(yj) - ol
                c = len(xi) - ol
                d = ol
                if h(a) + h(d) >= h(b) + h(c):
                    best = min(best, h(a) + h(b) + h(c) + h(d) - ent(len(yj)))
            tot += best
        return tot

    hx = sum(ent(len(s)) for s in csets.values())
    hy = sum(ent(len(s)) for s in rsets.values())
    mi = 0.5 * (hx - cond(csets, rsets) + hy - cond(rsets, csets))
    want = 1.0 - min(max(mi / max(hx, hy), 0.0), 1.0)
    got = overlapping_nmi_distance(_cover_ds(C), _cover_ds(R), n)
    assert abs(got - want) < 1e-10


def test_link_prediction_roc_matches_replica(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from networkit_ray.graph.linkpred import link_prediction_roc

    # synthetic candidate scores + test labels
    rng = np.random.default_rng(77)
    m = 200
    u = np.arange(m, dtype=np.int64)
    v = u + 1000
    score = rng.integers(0, 10, m).astype(np.int64)
    is_pos = rng.random(m) < 0.3
    preds = rd.from_arrow(
        pa.table({"u": pa.array(u), "v": pa.array(v), "cn": pa.array(score)})
    )
    test = rd.from_arrow(
        pa.table(
            {"src": pa.array(u[is_pos]), "dst": pa.array(v[is_pos])}
        )
    )
    t = link_prediction_roc(preds, test, "cn")
    # numpy replica
    P, N = int(is_pos.sum()), int((~is_pos).sum())
    threshs = np.sort(np.unique(score))[::-1]
    tp = np.array([(is_pos & (score >= th)).sum() for th in threshs])
    fp = np.array([(~is_pos & (score >= th)).sum() for th in threshs])
    tpr, fpr = tp / P, fp / N
    fx = np.concatenate([[0.0], fpr])
    ty = np.concatenate([[0.0], tpr])
    auc = float(np.sum((fx[1:] - fx[:-1]) * (ty[1:] + ty[:-1]) / 2.0))
    assert t["thresh"].to_pylist() == [float(x) for x in threshs]
    assert t["tp"].to_pylist() == tp.tolist()
    assert t["fp"].to_pylist() == fp.tolist()
    assert abs(t["auc"][0].as_py() - auc) < 1e-8
    # random scores → AUC near 0.5, sanity
    assert 0.2 < auc < 0.8
