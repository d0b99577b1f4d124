"""Block-schema normalization helpers (Ray 2.49 workarounds).

Ray passes 0-row blocks through ``map_batches`` untouched, so a block can
carry a stale schema from earlier in the lineage (typically a join or
map_groups); such blocks crash downstream hash joins and aggregations with
ArrowInvalid/KeyError.  ``enforce_schema`` casts nonempty blocks to the
declared schema and drops empty blocks entirely.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def enforce_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Normalize every block to ``schema``.

    Ray 2.49's ``groupby().map_groups`` emits EMPTY blocks that still carry
    the *input* schema when a hash partition has no groups; feeding those to
    a downstream join raises ArrowInvalid (key field not found).  This pass
    rewrites empty blocks to the declared schema and casts nonempty ones.
    """

    def fix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or set(schema.names) - set(t.column_names):
            return schema.empty_table()
        return pa.table({n: t[n].cast(schema.field(n).type) for n in schema.names})

    fixed = ds.map_batches(fix, batch_format="pyarrow")
    # Ray passes 0-row blocks through map_batches untouched (they can carry a
    # stale or empty schema); rebuild from the nonempty blocks only.
    mat = fixed.materialize()

    @ray.remote
    def _rows(t) -> int:
        # Ray 2.49 passes 0-row blocks through map_batches UNCONVERTED, so an
        # empty block emitted by map_groups(batch_format="pandas") arrives
        # here still as a pandas DataFrame.  len() counts rows for both
        # pa.Table and pd.DataFrame.
        return len(t)

    refs = mat.to_arrow_refs()
    keep = [r for r, n in zip(refs, ray.get([_rows.remote(r) for r in refs])) if n > 0]
    if not keep:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(keep)
