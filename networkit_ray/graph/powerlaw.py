"""Power-law exponent fit for a degree sequence (Hill / discrete-MLE).

The reference fits and samples power-law degree sequences in
generators/PowerlawDegreeSequence.cpp (setGamma/getGamma over [minDeg,
maxDeg]); this is the matching *estimation* half a web-graph pipeline needs
— web host in/out-degree distributions are the canonical power-law corpus
statistic (Broder et al., WWW 2000, §3).

Estimator (Clauset-Shalizi-Newman continuous-MLE / Hill form):

    alpha = 1 + n_tail / sum_{d >= dmin} ln(d / (dmin - 1/2))

over the tail d >= dmin, with the standard -1/2 discreteness correction.

Scale shape: one pruned pass over the degree table — per-batch (count,
sum-log) partials via ``map_batches``, a dataset-level sum of the two
scalars, and an O(1) driver-side closed form.  Nothing vertex-sized leaves
the cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from networkit_ray.common.hashing import round_half_away


def hill_alpha(
    degrees: ray.data.Dataset, col: str = "deg", dmin: int = 1
) -> tuple[float, int]:
    """(alpha, n_tail) MLE power-law exponent of ``degrees[col]`` over the
    tail ``col >= dmin``."""
    shift = float(dmin) - 0.5

    def partial(t: pa.Table) -> pa.Table:
        d = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        d = d[d >= dmin]
        return pa.table(
            {
                "cnt": pa.array([len(d)], pa.int64()),
                "slog": pa.array([float(np.log(d / shift).sum())], pa.float64()),
            }
        )

    parts = degrees.map_batches(partial, batch_format="pyarrow")
    agg = parts.sum(["cnt", "slog"])
    n_tail = int(agg["sum(cnt)"])
    slog = float(agg["sum(slog)"])
    if n_tail == 0 or slog <= 0:
        return float("nan"), n_tail
    return 1.0 + n_tail / slog, n_tail


def hill_alpha_table(
    degrees: ray.data.Dataset, col: str = "deg", dmin: int = 1
) -> pa.Table:
    """One-row (alpha, n_tail) result table (alpha rounded half-away to 8,
    matching DuckDB ROUND for the SQL twin)."""
    alpha, n_tail = hill_alpha(degrees, col=col, dmin=dmin)
    return pa.table(
        {
            "alpha": pa.array(
                [float(round_half_away(np.array([alpha]), 8)[0])], pa.float64()
            ),
            "n_tail": pa.array([n_tail], pa.int64()),
        }
    )
