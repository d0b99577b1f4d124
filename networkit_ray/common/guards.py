"""Bounded-group contract guards for ``map_groups`` stages.

Several operators run a vectorized per-group callback under a documented
*bounded-group* contract (per-parent-community subgraphs, per-ego
neighborhoods, per-seed regions, per-vertex neighbor lists).  The insides
are numpy-vectorized, but the contract is an assumption: a pathological
key (one giant community, a 10^8-degree hub) would silently turn into a
single enormous task and hang or OOM a worker at 100x scale.  These
guards convert that silent hang into an immediate, diagnosable error
that names the site and the sharding/capping lever to pull.
"""

from __future__ import annotations


def check_group_rows(n_rows: int, limit: int, site: str, hint: str) -> None:
    """Raise if a map_groups group exceeds its documented bound."""
    if n_rows > limit:
        raise ValueError(
            f"{site}: map_groups group of {n_rows:,} rows exceeds the "
            f"bounded-group contract ({limit:,}). {hint}"
        )
