"""``ray job submit``-able batch driver for the link-graph kernels.

The north rule runs the engine "via ray job submit on fixed N-node and
4N-node clusters"; this module is that job script.  On a real cluster:

    ray job submit --working-dir . -- \\
        python -m networkit_ray.pipelines.job --algo pagerank \\
        --edges s3://bucket/edges/ --output s3://bucket/pr_out \\
        --checkpoint-dir s3://bucket/pr_ckpt --resume

In this sandbox the same command runs against a local parquet directory
(``RAY_ADDRESS=local``).  Properties the north rule asks for:

- **resumable**: kernel state checkpoints per-partition with lineage
  (state/checkpoint.py) every ``--checkpoint-every`` iterations, and
  ``--resume`` continues mid-algorithm; the OUTPUT is written through
  the resumable bucketed sink (state/sink.py), so a rerun after a crash
  rewrites only missing buckets.
- **metrics**: one JSON line on stdout (iterations, rows, wall seconds,
  buckets skipped), the job-log analog of bench.py's contract.
- **no ray.init() when driven by a harness**: init is guarded, so the
  driver/pytest session owns the Ray session; standalone runs
  auto-connect to RAY_ADDRESS (the posture ``ray job submit`` needs).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _edges_dataset(path: str, weighted: bool):
    import ray.data

    cols = ["src", "dst"] + (["w"] if weighted else [])
    return ray.data.read_parquet(path, columns=cols)


def _num_nodes(edges) -> int:
    """max id + 1, computed distributed (no driver-side materialize)."""
    return int(max(edges.max("src"), edges.max("dst"))) + 1


def run_job(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="networkit_ray.pipelines.job")
    p.add_argument("--algo", required=True,
                   choices=["pagerank", "cc", "plp", "triangles", "core"])
    p.add_argument("--edges", required=True,
                   help="parquet file/dir with (src, dst[, w]) int64 columns")
    p.add_argument("--output", required=True,
                   help="output directory for the resumable bucketed sink")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-nodes", type=int, default=None,
                   help="vertex universe size; computed from the edges if omitted")
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--symmetrize", action="store_true",
                   help="undirect the edge table before the kernel (cc/plp/core expect it)")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iterations", type=int, default=100)
    p.add_argument("--num-buckets", type=int, default=16)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init()  # ray job submit / RAY_ADDRESS decides the cluster

    from networkit_ray.graph.build import symmetrize
    from networkit_ray.state.sink import write_partitioned

    t0 = time.perf_counter()
    edges = _edges_dataset(args.edges, args.weighted)
    n = args.num_nodes if args.num_nodes is not None else _num_nodes(edges)
    if args.symmetrize:
        edges = symmetrize(edges).materialize()

    ck = dict(checkpoint_dir=args.checkpoint_dir,
              checkpoint_every=args.checkpoint_every, resume=args.resume)
    info: dict = {}
    if args.algo == "pagerank":
        from networkit_ray.graph.pagerank import pagerank

        out, info = pagerank(edges, n, weighted=args.weighted, tol=args.tol,
                             max_iterations=args.max_iterations, **ck)
        key = ["v"]
    elif args.algo == "cc":
        from networkit_ray.graph.components import connected_components

        out, info = connected_components(edges, n, **ck)
        key = ["v"]
    elif args.algo == "plp":
        from networkit_ray.graph.plp import plp

        out, info = plp(edges, n, max_iterations=args.max_iterations, **ck)
        key = ["v"]
    elif args.algo == "core":
        from networkit_ray.graph.core import core_decomposition

        out, info = core_decomposition(edges, n, **ck)
        key = ["v"]
    else:  # triangles
        from networkit_ray.graph.build import canonicalize
        from networkit_ray.graph.triangles import triangles_per_vertex

        out = triangles_per_vertex(canonicalize(edges).materialize(), n)
        key = ["v"]

    sink = write_partitioned(out, args.output, key, num_buckets=args.num_buckets)
    result = {
        "algo": args.algo,
        "num_nodes": n,
        "iterations": info.get("iterations", info.get("rounds")),
        "rows_written": sink["rows_written"],
        "buckets_skipped": sink["buckets_skipped"],
        "output": args.output,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    run_job(sys.argv[1:])
