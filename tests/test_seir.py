"""SEIR simulation vs a pure-python replay of the same determinism contract."""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from networkit_ray.graph.seir import _GOLD, _MIX, seir


def _graph(seed, n, m):
    rng = np.random.default_rng(seed)
    canon = sorted(
        {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )
    both = canon + [(b, a) for a, b in canon]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in both], pa.int64()),
                "dst": pa.array([e[1] for e in both], pa.int64()),
            }
        )
    ).materialize()
    adj = collections.defaultdict(list)
    for a, b in both:
        adj[a].append(b)
    return ds, adj


def _replay(adj, n, t_max, trans_p, e_time, i_time, zero):
    st = {v: 0 for v in range(n)}
    ts = {v: 0 for v in range(n)}
    st[zero] = 2
    thresh = int(trans_p * 2**64)
    nn = np.uint64(n)
    rows = []
    for t in range(t_max):
        contacted = set()
        for u in (v for v in range(n) if st[v] == 2):
            for v in adj[u]:
                h = int(
                    (np.uint64(u) * nn + np.uint64(v) + np.uint64(1)) * _GOLD
                    + np.uint64(t + 1) * _MIX
                )
                if h <= thresh:
                    contacted.add(v)
        new_st, new_ts = dict(st), dict(ts)
        for v in range(n):
            if st[v] == 0 and v in contacted:
                new_st[v], new_ts[v] = 1, t
            elif st[v] == 1 and t - ts[v] >= e_time:
                new_st[v], new_ts[v] = 2, t
            elif st[v] == 2 and t - ts[v] >= i_time:
                new_st[v], new_ts[v] = 3, t
        st, ts = new_st, new_ts
        c = collections.Counter(st.values())
        rows.append((t, c.get(0, 0), c.get(1, 0), c.get(2, 0), c.get(3, 0)))
    return rows


class TestSeir:
    def test_matches_replay(self):
        n = 120
        ds, adj = _graph(1, n, 500)
        got = seir(ds, n, t_max=8, trans_p=0.3, e_time=2, i_time=3, zero=0).to_pandas()
        exp = _replay(adj, n, 8, 0.3, 2, 3, 0)
        assert [tuple(r) for r in got.astype(int).itertuples(index=False)] == exp

    def test_conservation_and_monotone_r(self):
        n = 100
        ds, _ = _graph(5, n, 400)
        got = seir(ds, n, t_max=10, trans_p=0.5, e_time=1, i_time=2, zero=0).to_pandas()
        assert ((got.s + got.e + got.i + got.r) == n).all()
        assert (got.r.diff().fillna(0) >= 0).all()  # removed never shrinks
        assert (got.s.diff().fillna(0) <= 0).all()  # susceptible never grows

    def test_zero_transmission(self):
        n = 50
        ds, _ = _graph(2, n, 200)
        got = seir(ds, n, t_max=6, trans_p=0.0, e_time=1, i_time=2, zero=0).to_pandas()
        assert (got.e == 0).all()
        # only patient zero ever leaves S
        assert ((got.s == n - 1)).all()

    def test_parallelism_invariant(self):
        n = 120
        ds, _ = _graph(1, n, 500)
        a = seir(ds, n, t_max=6, trans_p=0.3, e_time=2, i_time=3, zero=0).to_pandas()
        b = seir(
            ds.repartition(5).materialize(), n, t_max=6, trans_p=0.3, e_time=2,
            i_time=3, zero=0,
        ).to_pandas()
        assert a.astype(int).equals(b.astype(int))
