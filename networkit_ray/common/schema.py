"""Block-schema normalization helpers (Ray 2.49 workarounds).

Ray 2.49's ``groupby().map_groups`` emits EMPTY blocks that still carry a
stale or bare schema when a hash partition has no groups; such blocks crash
downstream hash joins and aggregations with ArrowInvalid/KeyError.

``map_batches`` with an Arrow or pandas ``batch_format`` never calls the UDF
on 0-row blocks (they are forwarded unconverted — see Ray's
``plan_udf_map_op.py``: "For empty input blocks, we directly output them
without calling the UDF"), so a plain Arrow-format rewrite pass cannot fix
them.  ``batch_format="numpy"`` sidesteps that: the batch arrives as a
Mapping (dict of numpy arrays), which is exempt from the skip, so the UDF
sees every block — including empty ones — and can rewrite them to the
declared schema.  The pass is fully streaming: no materialization, no
driver-side block filtering, no barrier.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def enforce_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Normalize every block of ``ds`` to ``schema``, streaming.

    Empty or stale-schema blocks (missing declared columns) are rewritten to
    ``schema.empty_table()``; nonempty blocks are projected to the declared
    columns and cast to the declared types.  The result is lazy — callers
    that consume it more than once (e.g. a two-sided join reuse) must
    ``.materialize()`` explicitly to avoid lineage re-execution.
    """
    names = list(schema.names)
    needed = set(names)

    def fix(batch: dict) -> pa.Table:
        if not batch or needed - set(batch.keys()):
            return schema.empty_table()
        n = len(next(iter(batch.values())))
        if n == 0:
            return schema.empty_table()
        cols = {}
        for name in names:
            typ = schema.field(name).type
            arr = pa.array(batch[name], from_pandas=True)
            cols[name] = arr if arr.type == typ else arr.cast(typ)
        return pa.table(cols)

    # batch_size=None → one UDF call per block, no re-batching copy.
    fixed = ds.map_batches(fix, batch_format="numpy", batch_size=None)
    # A map task whose input blocks are ALL empty forwards one raw block
    # without calling the UDF at all (BlocksToBatchesMapTransformFn), so an
    # all-empty dataset would end with no typed block and a None schema.
    # Union one well-typed empty seed block so schema() is always declared.
    return fixed.union(ray.data.from_arrow(schema.empty_table()))
