"""Selective community detection: GCE seed expansion + SetConductance.

Reference: scd/GCE.cpp (greedy community expansion, objective M =
internal-edge-weight / cut, add the shell node with the largest positive
ΔM until none improves) and scd/SetConductance.cpp (conductance of a
GIVEN set: cut(S) / min(vol(S), vol(V∖S))).

Engine shape: SCD is local by contract — one batched multi-source BFS
tags every vertex within ``radius`` of each seed, two hash-exchange
joins collect each seed's region edges (plus true global degrees so
shell exterior-degree is exact), and a (seed) groupby runs the
inherently sequential greedy loop once per seed in parallel.  The
community may grow only within ``radius − 1`` of the seed (shell needs
one more hop of edges); that cap is the locality contract the SCD
family is built on — raise ``radius`` for pathological seeds.

Deviation from the reference: ΔM ties break to the SMALLEST node id
(the reference picks uniformly at random among ties;
GCE.cpp:92-105) — deterministic and parallelism-invariant here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from networkit_ray.common.schema import enforce_schema

_OUT_SCHEMA = pa.schema([("seed", pa.int64()), ("v", pa.int64())])


def _gce_group(max_size: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        deg = dict(
            zip(
                np.concatenate([u, w]).tolist(),
                np.concatenate(
                    [df["du"].to_numpy(), df["dv"].to_numpy()]
                ).astype(np.int64).tolist(),
            )
        )
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        if seed not in adj:
            return pd.DataFrame({"seed": [seed], "v": [seed]})

        com = {seed}
        int_w = 0.0
        cut = float(deg[seed])
        # shell intDeg map: edges from shell node into com
        int_deg = {v: 1 for v in adj[seed]}
        cur_q = int_w / cut if cut > 0 else float("inf")
        while len(com) < max_size and int_deg:
            best_v, best_dq = None, 0.0
            for v in sorted(int_deg):
                idg = int_deg[v]
                edg = deg[v] - idg
                denom = cut - idg + edg
                q = (int_w + idg) / denom if denom > 0 else float("inf")
                dq = q - cur_q
                if dq > best_dq:
                    best_v, best_dq = v, dq
            if best_v is None:
                break
            v = best_v
            com.add(v)
            int_w += int_deg.pop(v)
            cut = sum(deg[x] for x in com) - 2.0 * int_w
            cur_q = int_w / cut if cut > 0 else float("inf")
            for nbr in adj.get(v, ()):  # region cap: nbrs beyond radius absent
                if nbr not in com:
                    int_deg[nbr] = int_deg.get(nbr, 0) + 1
            if cut <= 0:
                break
        return pd.DataFrame(
            {"seed": np.full(len(com), seed, np.int64), "v": sorted(com)}
        )

    return fn


def _expand_seeds(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    group_fn,
    *,
    radius: int,
    num_parts: int | None,
) -> ray.data.Dataset:
    """Shared SCD driver: region extraction + per-seed greedy group run."""
    from networkit_ray.common.exchange import exchange_join
    from networkit_ray.graph.bfs import multi_bfs_refs
    from networkit_ray.graph.bsp import build_pgraph
    from networkit_ray.graph.build import degree_table

    g = build_pgraph(sym_edges, num_nodes, num_parts=num_parts)
    P = g.num_parts
    src_arr = np.asarray(seeds, dtype=np.int64)

    # region membership (seed, v) for dist <= radius, in K-seed batches
    member_parts: list = []
    import ray as _ray

    @_ray.remote
    def _region(vids, dist, batch):
        rows_v, rows_s = [], []
        for k in range(dist.shape[1]):
            hit = (dist[:, k] >= 0) & (dist[:, k] <= radius)
            rows_v.append(vids[hit].astype(np.int64))
            rows_s.append(np.full(int(hit.sum()), batch[k], np.int64))
        return pa.table(
            {
                "seed": pa.array(np.concatenate(rows_s)),
                "rv": pa.array(np.concatenate(rows_v)),
            }
        )

    for i in range(0, len(src_arr), 16):
        batch = src_arr[i : i + 16]
        dist_refs = multi_bfs_refs(g, batch)
        member_parts += [
            _region.remote(g.vid_refs[p], dist_refs[p], batch)
            for p in range(P)
        ]
    members = ray.data.from_arrow_refs(member_parts).materialize()

    deg = degree_table(sym_edges, key="src", out_name="deg")

    # canonical region edges per seed with both endpoints in the region
    canon = sym_edges.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
    )
    m_src = members.map_batches(
        lambda t: pa.table({"seed": t["seed"], "src": t["rv"]}),
        batch_format="pyarrow",
    )
    e1 = exchange_join(canon, m_src, left_on=["src"])  # adds seed per src hit
    m_dst = members.map_batches(
        lambda t: pa.table({"seed": t["seed"], "dst": t["rv"]}),
        batch_format="pyarrow",
    )
    e2 = exchange_join(e1, m_dst, left_on=["seed", "dst"])

    d_src = deg.map_batches(
        lambda t: pa.table({"src": t["v"], "du": t["deg"]}),
        batch_format="pyarrow",
    )
    d_dst = deg.map_batches(
        lambda t: pa.table({"dst": t["v"], "dv": t["deg"]}),
        batch_format="pyarrow",
    )
    e3 = exchange_join(exchange_join(e2, d_src, left_on=["src"]), d_dst, left_on=["dst"])
    region_edges = e3.map_batches(
        lambda t: pa.table(
            {
                "seed": t["seed"],
                "u": t["src"],
                "v2": t["dst"],
                "du": t["du"],
                "dv": t["dv"],
            }
        ),
        batch_format="pyarrow",
    )

    def guarded_group_fn(df):
        from networkit_ray.common.guards import check_group_rows

        check_group_rows(
            len(df), 1 << 24, "scd region map_groups",
            "a seed region with >2^24 edges means the BFS radius swallowed "
            "a hub neighborhood; reduce `radius` or pre-cap hub degrees.",
        )
        return group_fn(df)

    out = region_edges.groupby("seed").map_groups(
        guarded_group_fn, batch_format="pandas"
    )
    out = enforce_schema(out, _OUT_SCHEMA)
    # a seed with no region edges produces no group at all; every
    # community contains its seed, so union + distinct restores exactly
    # the trivial {seed} rows without touching the rest
    trivial = ray.data.from_arrow(
        pa.table(
            {
                "seed": pa.array(src_arr),
                "v": pa.array(src_arr),
            }
        )
    )
    from ray.data.aggregate import Count

    distinct = (
        out.union(trivial)
        .groupby(["seed", "v"])
        .aggregate(Count(alias_name="_c"))
    )
    return distinct.map_batches(
        lambda t: t.select(["seed", "v"]), batch_format="pyarrow"
    )


def set_conductance(
    sym_edges: ray.data.Dataset,
    community: ray.data.Dataset,
) -> float:
    """Conductance of a GIVEN vertex set: cut(S) / min(vol(S), vol(V∖S)).

    Reference: scd/SetConductance.cpp:12-45 (unweighted here; 1.0 when a
    side has zero volume).  One broadcast membership lookup per batch —
    no shuffle; ``community`` is the small side (a (v) table).
    """
    import ray as _ray

    mem = set(
        community.select_columns(["v"]).to_pandas()["v"].astype(np.int64)
    )
    mem_ref = _ray.put(np.fromiter(mem, np.int64, len(mem)))

    def tally(t: pa.Table) -> pa.Table:
        arr = np.asarray(_ray.get(mem_ref))
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        sin = np.isin(s, arr)
        din = np.isin(d, arr)
        # sym table: each undirected edge appears twice; vol(S) counts
        # every incidence, the cut every (in, out) ordered pair once
        return pa.table(
            {
                "cut": pa.array([int((sin & ~din).sum())]),
                "vol_s": pa.array([int(sin.sum())]),
                "vol_all": pa.array([len(t)]),
            }
        )

    agg = (
        sym_edges.map_batches(tally, batch_format="pyarrow")
        .aggregate(
            Sum("cut", alias_name="cut"),
            Sum("vol_s", alias_name="vol_s"),
            Sum("vol_all", alias_name="vol_all"),
        )
    )
    cut = agg["cut"] or 0
    vol_s = agg["vol_s"] or 0
    rest = (agg["vol_all"] or 0) - vol_s
    denom = min(vol_s, rest)
    return float(cut) / denom if denom > 0 else 1.0


def gce_communities(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    radius: int = 3,
    max_size: int = 10**9,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) membership rows — GCE objective-M expansion per seed.

    ``sym_edges``: symmetrized unweighted edge table (both directions).
    """
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _gce_group(max_size),
        radius=radius,
        num_parts=num_parts,
    )


def _lfm_group(alpha: float, max_size: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        deg = dict(
            zip(
                np.concatenate([u, w]).tolist(),
                np.concatenate([df["du"].to_numpy(), df["dv"].to_numpy()])
                .astype(np.int64)
                .tolist(),
            )
        )
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        if seed not in adj:
            return pd.DataFrame({"seed": [seed], "v": [seed]})

        def fitness(int_w, cut):
            tot = 2.0 * int_w + cut
            return (2.0 * int_w) / tot**alpha if tot > 0 else 0.0

        com = {seed}

        def stats():
            iw = sum(
                1 for x in com for y in adj.get(x, ()) if y in com and x < y
            )
            ct = sum(deg[x] for x in com) - 2 * iw
            return float(iw), float(ct)

        int_w, cut = stats()
        if int_w + cut == 0:
            return pd.DataFrame({"seed": [seed], "v": [seed]})
        cur_q = fitness(int_w, cut)
        while len(com) < max_size:
            shell = sorted(
                {y for x in com for y in adj.get(x, ()) if y not in com}
            )
            best_v, best_dq = None, 0.0
            for v in shell:
                idg = sum(1 for y in adj[v] if y in com)
                edg = deg[v] - idg
                dq = fitness(int_w + idg, cut - idg + edg) - cur_q
                if dq > best_dq:
                    best_v, best_dq = v, dq
            if best_v is None:
                break
            com.add(best_v)
            int_w, cut = stats()
            cur_q = fitness(int_w, cut)
            # purge loop: remove any non-seed member whose removal improves
            while True:
                worst_v, worst_dq = None, 0.0
                for x in sorted(com):
                    if x == seed:
                        continue
                    idg = sum(1 for y in adj.get(x, ()) if y in com)
                    edg = deg[x] - idg
                    dq = cur_q - fitness(int_w - idg, cut + idg - edg)
                    if dq < worst_dq:
                        worst_v, worst_dq = x, dq
                if worst_v is None:
                    break
                com.discard(worst_v)
                int_w, cut = stats()
                cur_q = fitness(int_w, cut)
        return pd.DataFrame(
            {"seed": np.full(len(com), seed, np.int64), "v": sorted(com)}
        )

    return fn


def lfm_communities(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    alpha: float = 1.0,
    radius: int = 3,
    max_size: int = 10**9,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — LFMLocal fitness expansion with purge steps.

    Reference: scd/LFMLocal.cpp:12-98 — fitness f(C) = 2·intW /
    (2·intW + cut)^alpha; greedily add the shell node with the largest
    positive Δf, then repeatedly remove any non-seed member whose removal
    raises f, until no addition improves.  Ties break to the smallest id
    (the reference draws uniformly; deterministic here).
    """
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _lfm_group(alpha, max_size),
        radius=radius,
        num_parts=num_parts,
    )


def _clique_group():
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nbrs = sorted(adj.get(seed, ()))
        if not nbrs:
            return pd.DataFrame({"seed": [seed], "v": [seed]})
        nset = set(nbrs)
        sub = {v: (adj[v] & nset) for v in nbrs}
        best: list = []

        def bron(r, p, x):
            nonlocal best
            if not p and not x:
                cand = sorted(r)
                if len(cand) > len(best) or (
                    len(cand) == len(best) and cand < best
                ):
                    best = cand
                return
            pivot = max(p | x, key=lambda v: (len(sub[v] & p), -v))
            for v in sorted(p - sub[pivot]):
                bron(r | {v}, p & sub[v], x & sub[v])
                p = p - {v}
                x = x | {v}

        bron(set(), set(nbrs), set())
        com = sorted([seed] + best)
        return pd.DataFrame(
            {"seed": np.full(len(com), seed, np.int64), "v": com}
        )

    return fn


def clique_detect(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — seed plus the maximum clique among its neighbors.

    Reference: scd/CliqueDetect.cpp:17-40 — the community of s is
    {s} ∪ C where C is a maximum-cardinality clique of the subgraph
    induced on N(s) (the reference picks uniformly among maximum cliques;
    here the lexicographically smallest wins, deterministic).  The
    radius-1 region driver ships exactly N(s)'s induced edges to one
    Bron–Kerbosch task per seed.
    """
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _clique_group(),
        radius=1,
        num_parts=num_parts,
    )


def scd_ground_truth_comparison(
    found: ray.data.Dataset,
    truth: ray.data.Dataset,
) -> ray.data.Dataset:
    """(seed, jaccard, f1, precision, recall) per found community.

    Reference: scd/SCDGroundTruthComparison.cpp:40-115 (ignoreSeeds
    semantics): for each found community F_seed, overlap it with every
    ground-truth subset T and report the BEST value of each metric
    independently — max Jaccard |F∩T|/|F∪T|, max F1, max precision
    |F∩T|/|F|, max recall |F∩T|/|T|.

    ``found``: (seed, v) membership rows; ``truth``: (v, label) rows.
    One hash join on v + three groupby aggregates — fully SQL-twinned.
    """
    from networkit_ray.common.exchange import exchange_join
    from ray.data.aggregate import Count, Max

    fs = found.groupby("seed").aggregate(Count(alias_name="fsize")).materialize()
    ts = truth.groupby("label").aggregate(Count(alias_name="tsize")).materialize()
    j = exchange_join(found, truth, left_on=["v"])
    ov = (
        j.groupby(["seed", "label"])
        .aggregate(Count(alias_name="ov"))
        .materialize()
    )
    o1 = exchange_join(ov, fs, left_on=["seed"])
    o2 = exchange_join(o1, ts, left_on=["label"])

    def score(t: pa.Table) -> pa.Table:
        ovr = t["ov"].to_numpy(zero_copy_only=False).astype(np.float64)
        f = t["fsize"].to_numpy(zero_copy_only=False).astype(np.float64)
        tt = t["tsize"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = ovr / (f + tt - ovr)
        prec = ovr / f
        rec = ovr / tt
        f1 = np.where(
            (prec > 0) & (rec > 0), 2 * prec * rec / (prec + rec), 0.0
        )
        return pa.table(
            {
                "seed": t["seed"],
                "jaccard": pa.array(jac),
                "f1": pa.array(f1),
                "precision": pa.array(prec),
                "recall": pa.array(rec),
            }
        )

    return (
        o2.map_batches(score, batch_format="pyarrow")
        .groupby("seed")
        .aggregate(
            Max("jaccard", alias_name="jaccard"),
            Max("f1", alias_name="f1"),
            Max("precision", alias_name="precision"),
            Max("recall", alias_name="recall"),
        )
    )


def _tce_group(max_size: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        deg = dict(
            zip(
                np.concatenate([u, w]).tolist(),
                np.concatenate([df["du"].to_numpy(), df["dv"].to_numpy()])
                .astype(np.int64)
                .tolist(),
            )
        )
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        if seed not in adj:
            return pd.DataFrame({"seed": [seed], "v": [seed]})

        result = {seed}
        score: dict[int, float] = {}
        cut_edges: dict[int, float] = {}
        active: set = set()

        def add_member_scores(x: int):
            # accumulate score(v) += (1 + |N(x) ∩ N(v)|) / (min(deg) * deg(v))
            # and (re-)activate v — the reference's addressable heap update
            # reinserts previously popped nodes (TCE.cpp updateShell)
            for v in adj.get(x, ()):
                if v in result:
                    continue
                tri = len(adj[x] & adj.get(v, set()))
                nom = 1.0 + tri
                denom = min(deg[v], deg[x]) * deg[v]
                if denom > 0:
                    score[v] = score.get(v, 0.0) + nom / denom
                cut_edges[v] = cut_edges.get(v, 0.0) + 1.0
                active.add(v)

        volume = float(deg[seed])
        add_member_scores(seed)
        num_cut = sum(
            1.0 for v in adj[seed] if v not in result
        )
        while active and len(result) < max_size:
            # pop max score, ties -> smallest id (reference pops heap order)
            vmax = min(active, key=lambda v: (-score.get(v, 0.0), v))
            active.discard(vmax)
            ce = cut_edges.get(vmax, 0.0)
            vol_u = float(deg[vmax])
            cut_new = num_cut + vol_u - 2.0 * ce
            vol_new = volume + vol_u
            if volume > 0 and (cut_new / vol_new) < (num_cut / volume):
                result.add(vmax)
                score.pop(vmax, None)
                cut_edges.pop(vmax, None)
                add_member_scores(vmax)
                num_cut = cut_new
                volume = vol_new
        return pd.DataFrame(
            {
                "seed": np.full(len(result), seed, np.int64),
                "v": sorted(result),
            }
        )

    return fn


def tce_communities(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    radius: int = 3,
    max_size: int = 10**9,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — Triadic Closure Expansion per seed.

    Reference: scd/TCE.cpp:46-230 (unweighted, refine=False,
    useJaccard=False): shell nodes accumulate per-member edge scores
    (1 + common-neighbor count) / (min(deg)·deg(v)); the best-scoring
    shell node is popped and ADDED only if the community's conductance
    improves, else permanently discarded; loop until the shell drains.
    Ties pop the smallest id (the reference's heap order is unspecified).
    """
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _tce_group(max_size),
        radius=radius,
        num_parts=num_parts,
    )


def random_bfs_community(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seed: int,
    size: int,
    *,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — BFS-order community of ``size`` nodes around the seed.

    Reference: scd/RandomBFS.cpp:11-60 — the SCD baseline: expand BFS
    level by level until the target size (there, the seed's ground-truth
    community size; level overflow resolved by random sampling).  Here
    overflow resolves by SMALLEST ID — deterministic and SQL-twinnable:
    the community is exactly the first ``size`` vertices ordered by
    (hop distance, id).
    """
    from networkit_ray.graph.bfs import bfs_distances

    dist, _ = bfs_distances(sym_edges, num_nodes, seed, num_parts=num_parts)
    reach = dist.map_batches(
        lambda t: t.filter(pc.greater_equal(t["dist"], pa.scalar(0, pa.int64()))),
        batch_format="pyarrow",
    )
    top = reach.sort(["dist", "v"]).limit(size)
    return top.map_batches(
        lambda t: pa.table(
            {
                "seed": pa.array(np.full(len(t), seed, np.int64)),
                "v": t["v"],
            }
        ),
        batch_format="pyarrow",
    )


def _gce_set_group(max_size: int, init_sets: dict):
    """GCE objective-M expansion from a SEED SET per seed (GCE.cpp:28-35
    initializes LocalCommunity with every seed before expanding)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        init = sorted(set(init_sets.get(seed, [seed])))
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        deg = dict(
            zip(
                np.concatenate([u, w]).tolist(),
                np.concatenate([df["du"].to_numpy(), df["dv"].to_numpy()])
                .astype(np.int64)
                .tolist(),
            )
        )
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        com = {v for v in init if v in adj} or set(init[:1])
        if not any(v in adj for v in com):
            return pd.DataFrame(
                {"seed": np.full(len(com), seed, np.int64), "v": sorted(com)}
            )
        int_w = sum(
            1 for x in com for y in adj.get(x, ()) if y in com and x < y
        )
        cut = float(sum(deg.get(x, 0) for x in com) - 2 * int_w)
        int_deg: dict[int, int] = {}
        for x in com:
            for y in adj.get(x, ()):
                if y not in com:
                    int_deg[y] = int_deg.get(y, 0) + 1
        cur_q = int_w / cut if cut > 0 else float("inf")
        while len(com) < max_size and int_deg:
            best_v, best_dq = None, 0.0
            for v in sorted(int_deg):
                idg = int_deg[v]
                edg = deg[v] - idg
                denom = cut - idg + edg
                q = (int_w + idg) / denom if denom > 0 else float("inf")
                dq = q - cur_q
                if dq > best_dq:
                    best_v, best_dq = v, dq
            if best_v is None:
                break
            v = best_v
            com.add(v)
            int_w += int_deg.pop(v)
            cut = sum(deg[x] for x in com) - 2.0 * int_w
            cur_q = int_w / cut if cut > 0 else float("inf")
            for nbr in adj.get(v, ()):
                if nbr not in com:
                    int_deg[nbr] = int_deg.get(nbr, 0) + 1
            if cut <= 0:
                break
        return pd.DataFrame(
            {"seed": np.full(len(com), seed, np.int64), "v": sorted(com)}
        )

    return fn


def combined_scd(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    radius: int = 3,
    max_size: int = 10**9,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — CliqueDetect then GCE expansion from the clique.

    Reference: scd/CombinedSCD.cpp composes two detectors: the first's
    community becomes the second's seed set.  This is the reference's
    recommended clique+GCE pairing: the max clique around the seed anchors
    the expansion so single-edge bridges don't derail it.
    """
    first = clique_detect(
        sym_edges, num_nodes, seeds, num_parts=num_parts
    ).to_pandas()
    init_sets = {
        int(s): g["v"].tolist() for s, g in first.groupby("seed")
    }
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _gce_set_group(max_size, init_sets),
        radius=radius,
        num_parts=num_parts,
    )


def _l_group(max_size: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        deg = dict(
            zip(
                np.concatenate([u, w]).tolist(),
                np.concatenate([df["du"].to_numpy(), df["dv"].to_numpy()])
                .astype(np.int64)
                .tolist(),
            )
        )
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        if seed not in adj:
            return pd.DataFrame({"seed": [seed], "v": [seed]})

        com = {seed}

        def stats(c):
            iw = sum(1 for x in c for y in adj.get(x, ()) if y in c and x < y)
            cut = float(sum(deg.get(x, 0) for x in c) - 2 * iw)
            boundary = sum(
                1 for x in c if any(y not in c for y in adj.get(x, ()))
            )
            lin = 2.0 * iw / len(c) if c else 0.0
            lex = cut / boundary if boundary > 0 else float("inf")
            return lin, lex

        # phase 1: add while some shell node strictly raises lin AND L
        while len(com) < max_size:
            lin, lex = stats(com)
            cur_l = lin / lex if lex > 0 and np.isfinite(lex) else 0.0
            shell = sorted(
                {y for x in com for y in adj.get(x, ()) if y not in com}
            )
            best_v, best_l = None, cur_l
            for v in shell:
                cand = com | {v}
                nlin, nlex = stats(cand)
                nl = nlin / nlex if nlex > 0 and np.isfinite(nlex) else 0.0
                if nlin > lin and nl > best_l:
                    best_v, best_l = v, nl
            if best_v is None:
                break
            com.add(best_v)
        # phase 2: remove nodes whose removal does NOT (reduce lin AND raise lex)
        for v in sorted(com):
            if v not in com or len(com) <= 1:
                continue
            lin, lex = stats(com)
            nlin, nlex = stats(com - {v})
            if not (lin > nlin and lex < nlex):
                com.discard(v)
        if seed not in com or not com:
            com = {seed}  # deviation: the reference returns {} when a seed
            # is purged; a membership table keeps the trivial community
        return pd.DataFrame(
            {"seed": np.full(len(com), seed, np.int64), "v": sorted(com)}
        )

    return fn


def two_phase_l_communities(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    radius: int = 3,
    max_size: int = 10**9,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — TwoPhaseL expansion (L = Lin/Lex metric).

    Reference: scd/TwoPhaseL.cpp:13-110 — phase 1 greedily adds the shell
    node maximizing L = (2·intW/|C|) / (cut/|boundary|) among those that
    strictly raise Lin; phase 2 removes members (ascending id here) whose
    removal fails to strictly reduce Lin and raise Lex.  Ties → smallest
    id; a purged seed yields the trivial {seed} row (the reference
    returns the empty set).
    """
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _l_group(max_size),
        radius=radius,
        num_parts=num_parts,
    )


def _localt_group(max_size: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        if seed not in adj:
            return pd.DataFrame({"seed": [seed], "v": [seed]})

        def tri_split(v, com):
            """(both_in, semi, both_out) triangle counts at v."""
            nb = sorted(adj.get(v, ()))
            bi = se = bo = 0
            for i, x in enumerate(nb):
                ax = adj.get(x, set())
                for y in nb[i + 1 :]:
                    if y in ax:
                        k = (x in com) + (y in com)
                        if k == 2:
                            bi += 1
                        elif k == 1:
                            se += 1
                        else:
                            bo += 1
            return bi, se, bo

        def totals(com):
            int_t = ext_t = 0
            for x in com:
                bi, se, bo = tri_split(x, com - {x})
                # categorize by the OTHER two vertices' membership
                int_t += bi
                ext_t += bo
            return int_t // 3, ext_t

        def score(i, e):
            return max(0, i * (i - e))

        com = {seed}
        while len(com) < max_size:
            int_t, ext_t = totals(com)
            best = score(int_t, ext_t)
            best_v, best_ext = None, None
            shell = sorted(
                {y for x in com for y in adj.get(x, ()) if y not in com}
            )
            for v in shell:
                bi, se, bo = tri_split(v, com)
                ni = int_t + bi
                ne = ext_t + bo - se
                ns = score(ni, ne)
                if ns > best or (
                    ns == best and (best_ext is None or ne < best_ext)
                ):
                    best_v, best, best_ext = v, ns, ne
            if best_v is None:
                break
            com.add(best_v)
        return pd.DataFrame(
            {"seed": np.full(len(com), seed, np.int64), "v": sorted(com)}
        )

    return fn


def localt_communities(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    radius: int = 3,
    max_size: int = 300,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — LocalT triangle-score expansion per seed.

    Reference: scd/LocalT.cpp:14-190 — community score = max(0,
    intT·(intT − extT)) where intT counts fully-internal triangles and
    extT triangles with exactly one member; each step adds the shell node
    giving the best (score, then fewest external triangles) — equal-score
    adds are accepted, so ``max_size`` bounds growth on triangle-poor
    graphs (remaining ties → smallest id; the reference's shell iteration
    order is unspecified).
    """
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _localt_group(max_size),
        radius=radius,
        num_parts=num_parts,
    )


def _lte_group(alpha: float, max_size: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        seed = int(df["seed"].iloc[0])
        u = df["u"].to_numpy().astype(np.int64)
        w = df["v2"].to_numpy().astype(np.int64)
        deg = dict(
            zip(
                np.concatenate([u, w]).tolist(),
                np.concatenate([df["du"].to_numpy(), df["dv"].to_numpy()])
                .astype(np.int64)
                .tolist(),
            )
        )
        adj: dict[int, set] = {}
        for a, b in zip(u.tolist(), w.tolist()):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        if seed not in adj:
            return pd.DataFrame({"seed": [seed], "v": [seed]})

        import math

        def sim(a, b):
            tri = len(adj[a] & adj[b])
            return (2.0 + tri) / (
                math.sqrt(1.0 + deg[a]) * math.sqrt(1.0 + deg[b])
            )

        com = {seed}
        active: set = set(adj[seed])

        def split_sim(v):
            si = se = 0.0
            for x in adj.get(v, ()):
                s_ = sim(v, x)
                if x in com:
                    si += s_
                else:
                    se += s_
            return si, se

        while active and len(com) < max_size:
            # pop max internal similarity, ties -> smallest id
            scored = {v: split_sim(v) for v in active}
            vmax = min(scored, key=lambda v: (-scored[v][0], v))
            si, se = scored.pop(vmax)
            active.discard(vmax)
            if si <= 0:
                continue
            X = sum(
                sim(x, y)
                for x in com
                for y in adj.get(x, ())
                if y in com
            )
            E = sum(
                sim(x, y)
                for x in com
                for y in adj.get(x, ())
                if y not in com
            )
            ratio = (E / X) if X > 0 else float("inf")
            if ratio - (alpha * se - si) / (2.0 * si) > 0:
                com.add(vmax)
                for nbr in adj.get(vmax, ()):  # heap update re-inserts
                    if nbr not in com:
                        active.add(nbr)
        return pd.DataFrame(
            {"seed": np.full(len(com), seed, np.int64), "v": sorted(com)}
        )

    return fn


def lte_communities(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    seeds: list[int],
    *,
    alpha: float = 1.0,
    radius: int = 3,
    max_size: int = 10**9,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(seed, v) — LocalTightnessExpansion per seed.

    Reference: scd/LocalTightnessExpansion.cpp:100-330 (unweighted): edge
    similarity s(u,v) = (2 + |N(u)∩N(v)|) / √(1+deg u)·√(1+deg v) (the
    adjacency-cosine with unit self-loops); the shell node with the
    largest internal similarity is popped and added iff
    E/X − (α·ext(v) − int(v)) / (2·int(v)) > 0 where X/E are the
    community's internal/external similarity mass; popped nodes re-enter
    when a later member touches them.  Ties → smallest id.
    """
    return _expand_seeds(
        sym_edges,
        num_nodes,
        seeds,
        _lte_group(alpha, max_size),
        radius=radius,
        num_parts=num_parts,
    )


def lfm_cover(
    sym_edges: ray.data.Dataset,
    num_nodes: int,
    *,
    alpha: float = 1.0,
    seeds_per_round: int = 8,
    max_rounds: int = 200,
    seed: int = 42,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(c, v) — the full LFM overlapping cover (community/LFM.cpp).

    The reference repeatedly picks a RANDOM unassigned node, expands an
    LFMLocal community from it, and marks its members assigned, until all
    nodes are covered.  Deterministic distributed re-expression: each
    round expands the ``seeds_per_round`` unassigned nodes of smallest
    ``splitmix64(v + round·FNV + seed)`` rank IN PARALLEL (expansions are
    independent given the graph — the documented deviation from the
    strictly sequential reference), community id = its seed node.
    Communities may overlap, as in the reference; coverage is complete
    when the loop ends.

    Scale shape: seed selection is a sort+limit over the unassigned set
    (vertex-sized, shrinking), each round's expansions run in one batched
    :func:`lfm_communities` call; assignment tracking is one anti-join.
    """
    from networkit_ray.sources.synth import _splitmix64

    unassigned = ray.data.from_arrow(
        pa.table({"v": pa.array(np.arange(num_nodes, dtype=np.int64))})
    ).materialize()
    parts: list[ray.data.Dataset] = []
    for r in range(max_rounds):
        if unassigned.count() == 0:
            break

        def rank(t: pa.Table, _r=r) -> pa.Table:
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = _splitmix64(v + np.uint64(_r) * np.uint64(0x100000001B3) + np.uint64(seed))
            return t.append_column("h", pa.array(h.astype(np.int64)))

        seeds = [
            int(row["v"])
            for row in unassigned.map_batches(rank, batch_format="pyarrow")
            .sort(["h", "v"])
            .limit(seeds_per_round)
            .take_all()
        ]
        memb = lfm_communities(
            sym_edges, num_nodes, seeds, alpha=alpha, num_parts=num_parts
        ).materialize()
        parts.append(memb)
        covered = memb.map_batches(
            lambda t: pa.table({"v": t["v"].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow",
        )
        from networkit_ray.common.exchange import exchange_join

        unassigned = exchange_join(
            unassigned.select_columns(["v"]),
            covered,
            left_on=["v"],
            join_type="left anti",
        ).materialize()
    out = parts[0]
    for t in parts[1:]:
        out = out.union(t)
    return out.map_batches(
        lambda t: pa.table(
            {
                "c": t["seed"].combine_chunks().cast(pa.int64()),
                "v": t["v"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
