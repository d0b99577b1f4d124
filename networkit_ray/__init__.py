"""networkit_ray — a from-scratch Ray-Data-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of the reference
(marufdsi/networkit, a shared-memory C++/OpenMP graph toolkit) as idiomatic
Ray Data pipelines:

- edge tables are ``ray.data.Dataset`` of Arrow batches (src:uint64, dst:uint64[, w]);
- per-record transforms are ``map_batches`` over zero-copy Arrow;
- stateful stages (HTML parsing, CSR kernels) are actor pools;
- wide steps are ``groupby``/``aggregate``/``sort``/``join`` shuffles;
- the iterative kernels (PageRank, connected components, PLP) run on a
  partitioned-CSR BSP engine (``graph/bsp.py``) built from raw Ray tasks —
  the one place the Dataset API cannot express per-superstep co-partitioned
  state exchange without re-shuffling the edge set every iteration.

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver, pytest fixture, bench.py).
"""

__version__ = "0.1.0"
