"""Benchmark driver — prints ONE JSON line on stdout.

Headline metric: wall seconds for the benchmark battery (unit "sec"), with
the north-rule numbers carried alongside:
- pagerank_edges_per_sec_superstep: directed R-MAT (scale 20, ef 16 by
  default → 1.05M vertices / 16.8M edges), fixed supersteps on the pinned
  partitioned-CSR graph — the metric BASELINE.md tracks;
- pagerank_iters_to_1e6: iterations to L1 ≤ 1e-6 on the same graph;
- per-query seconds for the sf-dir pipelines (extraction, kernels,
  dedup, ANN) in "queries".

Noise protocol (the sandbox is a shared box; identical code has measured
4-5× swings run-to-run):
- every stage is timed best-of-N (default 2; kernels 3) — reruns within
  one invocation, so the best leg reflects code, not tenant drift;
- TWO CONTENTION SENTINELS run before each stage: a cache-resident 768²
  matmul ("sentinel_ms", sees driver-core CPU load) and a 64 MB best-of-3
  memcpy ("sentinel_bw_gbps", sees memory-BUS load — the exchange kernels
  are bus-bound, and bus contention does not move the matmul probe);
  quiet box ≈ matmul minimum + ~11-13 GB/s;
- "minhash_ab" carries an in-process A/B of the vectorized MinHash
  signature kernel vs the round-1 per-gram hashlib loop on the same
  fixture (speedup = loop_sec / vectorized_sec).

Usage:
    python bench.py                 # full battery; ALSO runs the embedded
                                    # 2→8-CPU scaling legs at the end so
                                    # the driver-recorded json carries the
                                    # north-rule efficiency ("scaling" key)
    python bench.py --scaling       # scaling legs only (default 2,8,32)

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS,
GRAFT_RMAT_SCALE (default 20; scaling legs force 23 unless overridden),
GRAFT_BENCH_SUPERSTEPS (default 10), GRAFT_BENCH_REPS (default 2),
GRAFT_SCALING_CPUS / GRAFT_SCALING_CYCLES, GRAFT_SKIP_SCALING=1 to skip
the embedded legs on quick local iterations.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_SENT = None
_SENT_BW = None


def _sentinel_ms() -> float:
    """Fixed-work contention probe: one 768² matmul on the driver core.
    ~10-30 ms quiet; inflates with external CPU load on the shared box.
    Cache-resident (4.7 MB), so it does NOT see memory-BUS contention —
    that is ``_sentinel_bw``'s job."""
    global _SENT
    import numpy as np

    if _SENT is None:
        _SENT = np.random.default_rng(0).random((768, 768))
    t0 = time.perf_counter()
    (_SENT @ _SENT).sum()
    return (time.perf_counter() - t0) * 1000.0


def _sentinel_bw() -> float:
    """Memory-bandwidth probe: copy a 64 MB array, report GB/s.  The
    exchange kernels are bus-bound, so a stage that is slow while the
    matmul sentinel is quiet but THIS number is depressed is suffering
    external memory-bus contention (an effect measured repeatedly on
    this box: identical PLP code at 0.85 s standalone vs 7.8 s
    mid-battery with ~65 ms matmul sentinels both times)."""
    global _SENT_BW
    import numpy as np

    if _SENT_BW is None:
        src = np.ones(8 << 20, dtype=np.float64)  # 64 MB, touched
        dst = np.ones(8 << 20, dtype=np.float64)  # preallocated + touched
        _SENT_BW = (src, dst)
    src, dst = _SENT_BW
    best = float("inf")
    for _ in range(3):  # best-of-3: one descheduled slice otherwise owns it
        t0 = time.perf_counter()
        np.copyto(dst, src)
        best = min(best, time.perf_counter() - t0)
    return round((2 * src.nbytes / best) / 1e9, 2)  # read+write bytes


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _minhash_ab(sf_dir: str, n_docs: int = 4000) -> dict:
    """A/B the vectorized signature kernel against the round-1 per-gram
    hashlib loop on the same documents (identical H=64 permutations);
    run on the driver so the ratio is pure kernel, not scheduling."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from networkit_ray.dedup.minhash import _perm_params, minhash_signatures_batch

    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].combine_chunks()[:n_docs]
    a, b = _perm_params(64, 42)

    # warm both sides (Arrow regex compile + allocator first-touch dominate a
    # cold call), then best-of-2 — same discipline as the battery stages
    minhash_signatures_batch(texts[:200], a, b)
    vec = min(
        _timed(lambda: minhash_signatures_batch(texts, a, b)) for _ in range(2)
    )

    # round-1 shape: per-doc Python loop, hashlib.blake2b per shingle
    def _loop_side():
        for s in texts.to_pylist():
            toks = s.lower().split()
            grams = (
                [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
                if len(toks) >= 3
                else [" ".join(toks)]
            )
            hs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
                    )
                    for g in grams
                ),
                np.uint64,
                len(grams),
            ) if grams else np.array([0], np.uint64)
            (a[:, None] * hs[None, :] + b[:, None]).min(axis=1)

    loop = min(_timed(_loop_side) for _ in range(2))
    return {
        "n_docs": n_docs,
        "vectorized_sec": round(vec, 3),
        "pergram_loop_sec": round(loop, 3),
        "speedup": round(loop / vec, 1) if vec > 0 else None,
    }


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rmat_scale = int(os.environ.get("GRAFT_RMAT_SCALE", "20"))
    supersteps = int(os.environ.get("GRAFT_BENCH_SUPERSTEPS", "10"))
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from networkit_ray.graph.bsp import build_pgraph
    from networkit_ray.graph.build import canonicalize, degree_table, symmetrize
    from networkit_ray.graph.components import connected_components_refs
    from networkit_ray.graph.pagerank import pagerank_refs
    from networkit_ray.graph.plp import plp_refs
    from networkit_ray.graph.triangles import triangle_count
    from networkit_ray.sources.derive import derived_edges
    from networkit_ray.sources.synth import rmat_edges
    from networkit_ray.web.extract import extract_edges
    from networkit_ray.web.htmlgen import num_documents, pages_dataset

    queries: dict[str, float] = {}
    sentinel: dict[str, float] = {}
    sentinel_bw: dict[str, float] = {}
    t_total = time.perf_counter()

    def stage(name: str, fn, n_rep: int = reps):
        """best-of-n_rep wall time + pre-stage contention sentinel.
        fn() must be re-runnable; the LAST run's return value is kept."""
        sentinel[name] = round(_sentinel_ms(), 1)
        sentinel_bw[name] = _sentinel_bw()
        best, result = float("inf"), None
        for _ in range(max(1, n_rep)):
            t0 = time.perf_counter()
            result = fn()
            best = min(best, time.perf_counter() - t0)
        queries[name] = best
        return result

    # Worker-pool warmup: the first task wave on fresh workers pays
    # process spawn + numpy/pyarrow imports (~1s per worker — measured
    # 3-5x inflation of the first timed stage).  The north metrics are
    # steady-state throughput, so spin the pool up before timing.
    @ray.remote
    def _warm():
        import numpy as _np
        import pyarrow as _pa  # noqa: F401

        return float(_np.zeros(4).sum())

    ray.get([_warm.remote() for _ in range(num_cpus * 2)])

    # ---- R-MAT kernel throughput (the north-rule metric) -------------
    log(f"generating R-MAT scale={rmat_scale} ef=16 ...")
    edges = stage(
        "rmat_generate", lambda: rmat_edges(rmat_scale, 16)[0].materialize(), 1
    )
    n = rmat_edges(rmat_scale, 16)[1]
    m = edges.count()
    log(f"R-MAT: n={n} m={m} in {queries['rmat_generate']:.1f}s")

    def build_and_warm():
        g = build_pgraph(edges, n)
        pagerank_refs(g, tol=0.0, max_iterations=1)
        return g

    # kernels-only (scaling-leg) mode: ONE build — the leg's metric is
    # superstep throughput, and best-of-2 builds doubles the slowest
    # (2-CPU) leg's wall for no statistical gain on that metric
    g = stage(
        "csr_build_plus_warmup",
        build_and_warm,
        1 if os.environ.get("GRAFT_KERNELS_ONLY") else reps,
    )

    # steady-state superstep rate: best of N timed runs (the first run
    # after a build still touches cold object-store pages)
    n_rep = max(5, reps)  # north-metric kernels: ~1s/rep warm, so 5 reps buys real immunity to multi-second tenant spikes
    stage(
        "pagerank_supersteps",
        lambda: pagerank_refs(g, tol=0.0, max_iterations=supersteps),
        n_rep,
    )
    dt = queries["pagerank_supersteps"]
    pr_eps = m * supersteps / dt
    log(f"pagerank: {supersteps} supersteps in {dt:.2f}s → {pr_eps/1e6:.1f}M edges/s/superstep")

    # float32 state/message option (halved exchange volume; same scores
    # within 1e-6 — see graph/pagerank.py dtype)
    stage(
        "pagerank_supersteps_f32",
        lambda: pagerank_refs(g, tol=0.0, max_iterations=supersteps, dtype="float32"),
        n_rep,
    )
    pr_eps_f32 = m * supersteps / queries["pagerank_supersteps_f32"]
    log(f"pagerank f32: {queries['pagerank_supersteps_f32']:.2f}s → {pr_eps_f32/1e6:.1f}M edges/s/superstep")

    if os.environ.get("GRAFT_KERNELS_ONLY"):
        # scaling mode: only the north-rule kernel numbers matter; the
        # sf-dir pipelines would add ~min of unrelated load per leg
        total = time.perf_counter() - t_total
        ray.shutdown()
        return {
            "metric": "kernels-only bench (scaling mode)",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in queries.items()},
            "sentinel_ms": sentinel,
            "sentinel_bw_gbps": sentinel_bw,
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "rmat": {"scale": rmat_scale, "n": n, "m": m},
            "pagerank_edges_per_sec_superstep": round(pr_eps, 0),
            "pagerank_edges_per_sec_superstep_f32": round(pr_eps_f32, 0),
        }

    pr_info = stage(
        "pagerank_converge",
        lambda: pagerank_refs(g, tol=1e-6, norm="l1", check_every=5)[1],
    )
    pr_iters = pr_info["iterations"]
    log(f"pagerank converged (L1≤1e-6) in {pr_iters} iters, {queries['pagerank_converge']:.2f}s")

    sym = stage("symmetrize", lambda: symmetrize(edges).materialize())

    def build_sym():
        gs = build_pgraph(sym, n)
        ray.get(gs.block_refs)  # force the (lazy) build
        return gs

    gs = stage("csr_build_sym", build_sym)

    cc_info = stage(
        "connected_components", lambda: connected_components_refs(gs)[1]
    )
    log(f"cc: {cc_info['iterations']} supersteps, {queries['connected_components']:.2f}s")

    stage(
        "plp_5_iters",
        lambda: plp_refs(gs, max_iterations=5, update_threshold=0),
        max(5, reps),
    )
    dt = queries["plp_5_iters"]
    sym_m = sym.count()
    plp_eps = sym_m * 5 / dt
    log(f"plp: 5 iters in {dt:.2f}s → {plp_eps/1e6:.1f}M edge-scans/s/iter")

    # delta-superstep effective rate: past the churny first sweeps the
    # delta path ships only the changed boundary, so the EFFECTIVE
    # per-iteration edge-scan rate over a convergence-length run is the
    # deployment-relevant number (m·iters / wall)
    plp_holder = {}

    def plp_long():
        _, info = plp_refs(gs, max_iterations=25, update_threshold=0)
        plp_holder["timing"] = info["timing"]
        return info

    stage("plp_25_iters", plp_long, max(3, reps))
    plp_eff = sym_m * 25 / queries["plp_25_iters"]
    log(f"plp 25 iters: {queries['plp_25_iters']:.2f}s → effective "
        f"{plp_eff/1e6:.0f}M edge-scans/s/iter "
        f"(decay {['%.3f' % t for t in plp_holder['timing'][:6]]}…)")

    # ---- sf-dir pipelines -------------------------------------------
    e2holder = {}

    def derive():
        e, n2 = derived_edges(sf_dir)
        e2holder["e"], e2holder["n"] = e.materialize(), n2
        return e2holder["e"]

    e2 = stage("derive_edges", derive)
    n2 = e2holder["n"]

    stage("degree_table", lambda: degree_table(e2).materialize())

    def tri():
        canon = canonicalize(e2).materialize()
        return triangle_count(canon, n2)

    tc = stage("triangles", tri)
    log(f"triangles on derived sf graph: {tc} in {queries['triangles']:.2f}s")

    from networkit_ray.graph.louvain import louvain

    sym2 = symmetrize(e2).materialize()

    def run_louvain():
        lv, lv_info = louvain(sym2, n2)
        lv.materialize()
        return lv_info

    lv_info = stage("louvain", run_louvain)
    log(f"louvain: {len(lv_info['levels'])} levels in {queries['louvain']:.2f}s")

    from networkit_ray.graph.core import core_decomposition

    def run_core():
        cores, core_info = core_decomposition(sym2, n2)
        cores.materialize()
        return core_info

    core_info = stage("core_decomposition", run_core)
    log(f"k-core: {core_info['rounds']} h-index rounds in {queries['core_decomposition']:.2f}s")

    nd = num_documents(sf_dir)

    def web():
        pages = pages_dataset(sf_dir)
        return extract_edges(pages, ids="hash").materialize()

    web_edges = stage("web_extract", web)
    log(f"web extract: {web_edges.count()} edges from {nd} pages in {queries['web_extract']:.2f}s")

    # round-3 web-tier stages: WARC ingestion, robots admission, CCNet dedup
    import shutil

    import ray.data

    from networkit_ray.sources.warc import read_warc, write_warc
    from networkit_ray.web.htmlgen import D_DOMAINS, pages_dataset
    from networkit_ray.web.robots import robots_filter, robots_table

    warc_dir = "/tmp/nkr_bench_warc"

    def warc_cycle():
        shutil.rmtree(warc_dir, ignore_errors=True)  # time the full write+read
        write_warc(pages_dataset(sf_dir), warc_dir, shards=32).materialize()
        return read_warc(warc_dir).count()

    nw = stage("warc_roundtrip", warc_cycle)
    warc_bytes = sum(
        os.path.getsize(os.path.join(warc_dir, f)) for f in os.listdir(warc_dir)
    )
    log(f"warc: wrote+read {nw} pages ({warc_bytes/1e6:.1f} MB) "
        f"in {queries['warc_roundtrip']:.2f}s")

    stage(
        "robots_filter",
        lambda: robots_filter(pages_dataset(sf_dir), robots_table(D_DOMAINS)).count(),
    )

    from networkit_ray.dedup.lines import segment_dedup

    docs_sd = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    nsd = stage("segment_dedup", lambda: segment_dedup(docs_sd).count())
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    sd_bytes = int(
        _pc.sum(
            _pc.binary_length(
                _pq.read_table(
                    f"{sf_dir}/documents.parquet", columns=["text"]
                )["text"]
            )
        ).as_py()
    )
    log(f"segment_dedup: {nsd} docs kept ({sd_bytes/1e6:.1f} MB text) "
        f"in {queries['segment_dedup']:.2f}s")

    import ray.data

    from networkit_ray.dedup.minhash import candidate_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cp = stage("minhash_candidates", lambda: candidate_pairs(docs).count())
    log(f"minhash: {cp} candidate pairs in {queries['minhash_candidates']:.2f}s")

    from networkit_ray.ann.search import brute_force_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    stage(
        "ann_topk", lambda: brute_force_topk(emb, list(range(8)), k=10).to_pandas()
    )

    # ---- GB-scale corpus legs -----------------------------------------
    # The sf corpus is ~1.5 MB: its MB/s numbers are fixed-overhead, not
    # throughput (round-4 finding).  Expand deterministically to ≥1 GB
    # (web.bigcorpus) and measure the corpus stages where streaming rate
    # is the cost.  GRAFT_BIGCORPUS_MB overrides (e.g. 256 for quick
    # local iterations).
    from networkit_ray.web.bigcorpus import expand_documents

    big_mb = int(os.environ.get("GRAFT_BIGCORPUS_MB", "1024"))
    big_dir = "/tmp/nkr_bench_bigcorpus"
    shutil.rmtree(big_dir, ignore_errors=True)
    big_info = stage(
        "bigcorpus_generate",
        lambda: expand_documents(sf_dir, big_dir, target_mb=big_mb),
        1,
    )
    big_text_mb = big_info["text_mb"]
    log(f"bigcorpus: {big_info['n_docs']} docs, {big_text_mb} MB text "
        f"in {queries['bigcorpus_generate']:.1f}s")

    big_docs = ray.data.read_parquet(
        f"{big_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    nkept = stage("bigcorpus_segment_dedup", lambda: segment_dedup(big_docs).count())
    log(f"bigcorpus segment_dedup: {queries['bigcorpus_segment_dedup']:.1f}s → "
        f"{big_text_mb/queries['bigcorpus_segment_dedup']:.0f} MB/s ({nkept} kept)")

    from networkit_ray.dedup.substring import substring_dedup

    nss = stage(
        "bigcorpus_substring_dedup",
        lambda: substring_dedup(big_docs, min_len=8).count(),
        1,
    )
    log(f"bigcorpus substring_dedup: {queries['bigcorpus_substring_dedup']:.1f}s → "
        f"{big_text_mb/queries['bigcorpus_substring_dedup']:.0f} MB/s ({nss} kept)")

    bm = stage(
        "bigcorpus_web_extract",
        lambda: extract_edges(pages_dataset(big_dir), ids="hash").count(),
    )
    log(f"bigcorpus web_extract: {queries['bigcorpus_web_extract']:.1f}s → "
        f"{big_text_mb/queries['bigcorpus_web_extract']:.0f} MB/s text ({bm} edges)")

    big_warc_dir = "/tmp/nkr_bench_warc_big"

    def big_warc_cycle():
        shutil.rmtree(big_warc_dir, ignore_errors=True)
        write_warc(pages_dataset(big_dir), big_warc_dir, shards=64).materialize()
        return read_warc(big_warc_dir).count()

    stage("bigcorpus_warc_roundtrip", big_warc_cycle, 1)
    big_warc_bytes = sum(
        os.path.getsize(os.path.join(big_warc_dir, f))
        for f in os.listdir(big_warc_dir)
    )
    log(f"bigcorpus warc: {big_warc_bytes/1e6:.0f} MB written+read in "
        f"{queries['bigcorpus_warc_roundtrip']:.1f}s")
    shutil.rmtree(big_warc_dir, ignore_errors=True)
    shutil.rmtree(big_dir, ignore_errors=True)

    log("minhash signature kernel A/B (vectorized vs round-1 per-gram loop) ...")
    ab = _minhash_ab(sf_dir)
    log(f"minhash A/B: vectorized {ab['vectorized_sec']}s vs per-gram "
        f"{ab['pergram_loop_sec']}s → {ab['speedup']}×")

    total = time.perf_counter() - t_total
    result = {
        "metric": (
            "bench battery wall time (R-MAT kernels + sf pipelines; every "
            "stage best-of-2 with a per-stage contention sentinel — compare "
            "per-query times, not totals, across rounds)"
        ),
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sentinel_ms": sentinel,
        "sentinel_bw_gbps": sentinel_bw,
        "minhash_ab": ab,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rmat": {"scale": rmat_scale, "n": n, "m": m},
        "pagerank_edges_per_sec_superstep": round(pr_eps, 0),
        "pagerank_edges_per_sec_superstep_f32": round(pr_eps_f32, 0),
        "plp_edge_scans_per_sec_iter": round(plp_eps, 0),
        "plp_edge_scans_per_sec_iter_effective": round(plp_eff, 0),
        "plp_superstep_decay_sec": [round(t, 4) for t in plp_holder["timing"]],
        "pagerank_iters_to_1e6": pr_iters,
        # corpus-side stages in MB/s measured on the ≥1 GB expanded
        # corpus (load-bearing streaming rates; the sf-0.1 corpus is
        # ~1.5 MB so its numbers — kept below for round-over-round
        # comparability — are fixed-overhead, not throughput)
        "corpus_mb_per_sec": {
            "corpus_text_mb": big_text_mb,
            "segment_dedup": round(
                big_text_mb / queries["bigcorpus_segment_dedup"], 1
            ),
            "substring_dedup": round(
                big_text_mb / queries["bigcorpus_substring_dedup"], 1
            ),
            "web_extract_text": round(
                big_text_mb / queries["bigcorpus_web_extract"], 1
            ),
            "warc_roundtrip": round(
                big_warc_bytes / 1e6 / queries["bigcorpus_warc_roundtrip"], 1
            ),
            "generate": round(big_text_mb / queries["bigcorpus_generate"], 1),
        },
        "corpus_mb_per_sec_sf01_overhead_bound": {
            "warc_roundtrip": round(warc_bytes / 1e6 / queries["warc_roundtrip"], 2),
            "segment_dedup": round(sd_bytes / 1e6 / queries["segment_dedup"], 2),
        },
    }
    ray.shutdown()

    # ---- two-cluster-size scaling legs (north-rule evidence), embedded
    # so the driver-recorded BENCH json itself carries the numbers.
    # Runs AFTER ray.shutdown() — each leg owns the box in a fresh
    # process.  GRAFT_SKIP_SCALING=1 skips (quick local iterations).
    if not os.environ.get("GRAFT_SKIP_SCALING"):
        try:
            result["scaling"] = _scaling_summary(
                [
                    int(x)
                    for x in os.environ.get(
                        "GRAFT_SCALING_CPUS", "2,8,32"
                    ).split(",")
                ],
                # 2 interleaved cycles by default: the r4 driver artifact
                # showed a single-cycle leg pair drifting with tenant load
                # (2-CPU f64 leg depressed); per-leg best-of-2 across
                # interleaved cycles keeps one noisy window from skewing
                # the ratio, and the kernels-only single-build change
                # keeps the added wall ≈ neutral
                cycles=int(os.environ.get("GRAFT_SCALING_CYCLES", "2")),
            )
        except Exception as exc:  # a failed leg must not void the battery
            result["scaling"] = {"error": f"{type(exc).__name__}: {exc}"}
    return result


def run_scaling() -> None:
    """Two-cluster-size evidence: the same kernels-only job at N and 4N
    CPUs in fresh processes (north-rule criterion; the e.g. pairs in the
    driver brief are 8→32 or N→4N).

    The headline pair is 2→8: the round-4 kernels saturate this box's
    shared memory bus (~420M f64 edges/s/superstep) well before 16 CPUs,
    so any pair ending at >=16 CPUs measures the bus ceiling, not the
    engine — a BIGGER-node wall, not a more-nodes wall (per-node exchange
    volume is constant in node count; each real node brings its own
    memory system).  2→8 stays under the wall on both legs.  The 32-CPU
    leg is still measured and reported as context.
    """
    res = _scaling_summary(
        [
            int(x)
            for x in os.environ.get("GRAFT_SCALING_CPUS", "2,8,32").split(",")
        ],
        cycles=int(os.environ.get("GRAFT_SCALING_CYCLES", "2")),
    )
    res["metric"] = (
        f"pagerank superstep throughput scaling "
        f"{res['lo_cpus']}→{res['hi_cpus']} CPUs"
    )
    res["value"] = res["scaling_efficiency"]
    res["unit"] = "efficiency"
    print(json.dumps(res))


def _scaling_summary(legs: list[int], cycles: int) -> dict:
    """Run the kernels-only job at each CPU count in fresh processes and
    report per-leg best throughput + N→4N efficiency.

    The sandbox is shared: tenant load drifts on a minutes scale, i.e.
    ACROSS legs.  Interleave the legs over several cycles and keep each
    leg's best throughput so one noisy window can't skew the ratio."""
    out = {}
    best_f32: dict = {}
    for cy in range(cycles):
        for ncpu in legs:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            # strong-scaling evidence needs enough per-superstep compute that
            # parallelism, not fixed task overhead, is the bottleneck: scale-23
            # R-MAT (8.4M vertices / 134M edges) unless the caller overrides
            env.setdefault("GRAFT_RMAT_SCALE", "23")
            env["GRAFT_KERNELS_ONLY"] = "1"
            env["GRAFT_SKIP_SCALING"] = "1"
            log(f"--- scaling run (cycle {cy + 1}/{cycles}): num_cpus={ncpu} ---")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            sys.stderr.write(proc.stderr)
            leg = json.loads(proc.stdout.strip().splitlines()[-1])
            best = out.get(ncpu)
            if (
                best is None
                or leg["pagerank_edges_per_sec_superstep"]
                > best["pagerank_edges_per_sec_superstep"]
            ):
                out[ncpu] = leg
            f32 = leg.get("pagerank_edges_per_sec_superstep_f32")
            if f32 is not None:
                best_f32[ncpu] = max(best_f32.get(ncpu, 0.0), f32)
    lo, hi = legs[0], legs[1]
    eps_lo = out[lo]["pagerank_edges_per_sec_superstep"]
    eps_hi = out[hi]["pagerank_edges_per_sec_superstep"]
    eff = (eps_hi / eps_lo) / (hi / lo)
    res = {
        "lo_cpus": lo,
        "hi_cpus": hi,
        "context_cpus": legs[2:],
        "scaling_efficiency": round(eff, 3),
        "rmat_scale": int(os.environ.get("GRAFT_RMAT_SCALE", "23")),
        "cycles": cycles,
        "legs": {
            str(c): {
                "edges_per_sec": out[c]["pagerank_edges_per_sec_superstep"],
                "edges_per_sec_f32": best_f32.get(c),
                "sec": out[c]["queries"]["pagerank_supersteps"],
            }
            for c in legs
        },
        "protocol": (
            f"efficiency pair {lo}→{hi} CPUs (N→4N): both legs sit under "
            "this host's shared-memory-bus ceiling — the BASELINE.md "
            "sweeps show the superstep saturating past ~8-16 CPUs "
            "(round-4 wall ~420-480M f64 edges/s; round-5 kernels lift "
            "it to ~785M, with 8→32 CPUs yielding only ~1.7× for 4× the "
            "cores), so pairs ending ≥16 measure the bus, not the "
            "engine; a real 4N-node cluster adds memory buses with the "
            "nodes while per-node exchange volume stays constant.  Legs "
            "beyond the pair (context_cpus) are measured and reported "
            "as saturated-context evidence, not used in the ratio."
        ),
    }
    # the f32 exchange path is the deployment configuration (half the
    # message bytes); report its N->4N efficiency alongside the f64 one
    if best_f32.get(lo) and best_f32.get(hi):
        res["scaling_efficiency_f32"] = round(
            (best_f32[hi] / best_f32[lo]) / (hi / lo), 3
        )
    if cycles < 2:
        res["note"] = (
            "single-cycle legs on a shared box drift with tenant load "
            "(either direction); the interleaved 2-cycle idle-box "
            "measurement is recorded in BASELINE.md"
        )
    return res


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
