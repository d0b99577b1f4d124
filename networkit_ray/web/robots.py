"""robots.txt parsing + URL admission — crawl-plumbing for the page corpus.

The parser implements the de-facto (Google/REP, RFC 9309) semantics a
crawl pipeline needs:

- group selection: the ``User-agent`` group matching the crawler name
  (case-insensitive EXACT token; ``*`` as fallback; multiple UA lines
  share a group — no longest-product-token-prefix fallback);
- rule matching: RFC 9309 wildcard rules — ``*`` in a rule matches any
  character sequence and a trailing ``$`` anchors end-of-path (a ``$``
  elsewhere is literal); among all matching ``Allow``/``Disallow``
  rules the LONGEST rule string wins (most octets = most specific); on
  a length tie the ``Allow`` wins; no matching rule (or an empty
  ``Disallow:``) = allowed.

Scale shape: robots bodies are per-HOST (tiny side table next to a huge
page table) — ``RobotsFilter`` is an actor-pool ``map_batches`` stage
that receives the robots table ONCE via ``ray.put`` broadcast, parses
every host's rules in ``__init__`` (once per actor, not per batch), and
evaluates URLs vectorized-per-batch.  No shuffle: admission is a pure
per-row function given the broadcast side table.

The synthesized corpus twin (``synth_robots``) derives each host's rules
from its host id by fixed arithmetic, so driver-level admission results
are independently expressible in SQL (see ``robots_allowed`` oracle).
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit

import pyarrow as pa
import ray
import ray.data


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt body → [(path_prefix, is_allow)] for ``agent``.

    Groups are selected per REP: all rules from groups whose UA token
    matches ``agent`` exactly (case-insensitive), else the ``*`` groups.
    """
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                cur_rules.append((val, key == "allow"))
            # empty Disallow: == allow everything (no rule)
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    agent = agent.lower()
    exact = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


@lru_cache(maxsize=8192)
def _rule_matcher(pattern: str) -> re.Pattern | None:
    """Compile an RFC 9309 rule.  ``None`` = plain prefix (fast path);
    else a start-anchored regex where ``*`` → ``.*`` and a trailing
    ``$`` anchors end-of-path."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in body.split("*"))
    return re.compile(rx + (r"\Z" if anchored else ""))


def is_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """RFC 9309 longest-match (``*``/``$`` wildcards honored); Allow
    wins length ties; default allow."""
    best_len, best_allow = -1, True
    for pattern, allow in rules:
        m = _rule_matcher(pattern)
        hit = path.startswith(pattern) if m is None else m.match(path) is not None
        if hit:
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len, best_allow = ln, allow
    return best_allow


def synth_robots(host_id: int) -> str:
    """Deterministic per-host robots twin (SQL-expressible admission):

    - host_id % 7 == 3 → everything under /p/ disallowed;
    - host_id % 7 == 5 → /p/ disallowed but /p/0000 re-allowed (pages
      with doc_id < 100 survive via Allow-longest-match);
    - otherwise        → allow all (empty Disallow).
    A decoy ``badbot`` group exercises user-agent group selection."""
    base = "User-agent: badbot\nDisallow: /\n\n"
    if host_id % 7 == 3:
        return base + "User-agent: *\nDisallow: /p/\n"
    if host_id % 7 == 5:
        return base + "User-agent: *\nDisallow: /p/\nAllow: /p/0000\n"
    return base + "User-agent: *\nDisallow:\n"


def robots_table(num_hosts: int) -> ray.data.Dataset:
    """(host, robots) side table for the synthesized corpus."""
    return ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array(
                    [f"site{h:04d}.example" for h in range(num_hosts)], pa.string()
                ),
                "robots": pa.array(
                    [synth_robots(h) for h in range(num_hosts)], pa.string()
                ),
            }
        )
    )


class RobotsFilter:
    """Actor-pool batch UDF: pages(url, ...) → + allowed:bool.

    ``robots_ref`` is a ``ray.put`` handle to the (host, robots) table —
    fetched and parsed ONCE per actor in ``__init__``."""

    def __init__(self, robots_ref, agent: str = "*"):
        t = ray.get(robots_ref)
        self.rules = {
            h: parse_robots(r, agent)
            for h, r in zip(t["host"].to_pylist(), t["robots"].to_pylist())
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        allowed = []
        for url in t["url"].to_pylist():
            parts = urlsplit(url)
            rules = self.rules.get(parts.netloc.lower(), [])
            allowed.append(is_allowed(parts.path or "/", rules))
        return t.append_column("allowed", pa.array(allowed, pa.bool_()))


def robots_filter(
    pages: ray.data.Dataset,
    robots: ray.data.Dataset,
    *,
    agent: str = "*",
    concurrency: int | tuple = (1, 4),
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Annotate pages with robots admission (broadcast side table)."""
    rows = robots.take_all()  # tiny per-host side table; broadcast once
    robots_ref = ray.put(
        pa.Table.from_pydict(
            {
                "host": [r["host"] for r in rows],
                "robots": [r["robots"] for r in rows],
            }
        )
    )
    return pages.map_batches(
        RobotsFilter,
        fn_constructor_kwargs={"robots_ref": robots_ref, "agent": agent},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
