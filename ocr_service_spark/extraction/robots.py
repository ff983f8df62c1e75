"""robots.txt parsing + rule matching (RFC 9309 subset).

The fetch-policy layer of a crawl pipeline: before a URL enters the
frontier (or a page enters a training corpus with crawl-compliance
guarantees) its host's robots.txt decides fetchability. The reference
service has no crawl surface — beyond-reference, like the link/charset
layers.

Implemented per RFC 9309:

- line syntax ``field: value`` with ``#`` comments; fields are
  case-insensitive; unknown fields are ignored;
- **groups**: consecutive ``User-agent`` lines open a group whose
  ``Allow``/``Disallow`` rules follow; a ``User-agent`` line after
  rules starts a new group;
- **group selection**: the group whose user-agent token is the
  longest case-insensitive prefix of the product token wins; else the
  ``*`` group; a matched specific group REPLACES ``*`` (rules never
  merge across groups);
- **rule matching**: patterns are path prefixes; ``*`` matches any
  run of characters, a trailing ``$`` anchors the end. The rule with
  the longest pattern (octet length) wins; on a tie Allow wins.
  No matching rule -> allowed. An empty Disallow value matches
  nothing (allow all).

``rules_for_agent`` returns a flat rule list shaped for relational
evaluation: the Spark side explodes (host, rule) rows and resolves
longest-match precedence with one ``max(struct(...))`` aggregation —
parsing stays in Python on the tiny robots side, matching is a plain
join + agg that scales with the pages table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class RobotsRule:
    allow: bool
    pattern: str  # raw pattern text, as written
    regex: str  # anchored Java/RE2-portable regex equivalent


def _pattern_to_regex(pattern: str) -> str:
    """Robots pattern -> anchored regex. ``*`` -> ``.*``; a trailing
    ``$`` anchors; everything else is escaped literally. The regex is
    portable: no lookarounds, no engine-specific classes."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts)
    return rx + "$" if anchored else rx


def parse_robots(text: str) -> list[tuple[list[str], list[RobotsRule]]]:
    """robots.txt text -> list of (user-agent tokens, rules) groups."""
    groups: list[tuple[list[str], list[RobotsRule]]] = []
    agents: list[str] = []
    rules: list[RobotsRule] = []
    in_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                in_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agents = False
            if not agents:
                continue  # rules before any user-agent line: ignored
            if value == "":
                if field == "disallow":
                    continue  # "Disallow:" == allow all == no rule
                continue  # empty Allow matches nothing either
            rules.append(
                RobotsRule(field == "allow", value, _pattern_to_regex(value))
            )
        else:
            in_agents = False  # sitemap / crawl-delay / unknown
    if agents:
        groups.append((agents, rules))
    return groups


def rules_for_agent(text: str, agent: str) -> list[RobotsRule]:
    """The rule list RFC 9309 group selection yields for ``agent``:
    the group with the longest user-agent token that is a prefix of
    ``agent`` (case-insensitive), else the ``*`` group, else nothing.
    When several ``User-agent`` lines share a group, the group's best
    token decides; duplicate matching groups concatenate (RFC 9309
    §2.2.1: multiple groups for the same agent are combined)."""
    agent = agent.lower()
    best_len = -1
    star: list[RobotsRule] = []
    specific: list[RobotsRule] = []
    for agents, rules in parse_robots(text):
        group_best = -1
        for token in agents:
            if token == "*":
                group_best = max(group_best, 0)
            elif agent.startswith(token):
                group_best = max(group_best, len(token))
        if group_best == 0 and best_len <= 0:
            star.extend(rules)
            best_len = max(best_len, 0)
        elif group_best > 0:
            if group_best > best_len:
                specific = list(rules)
                best_len = group_best
            elif group_best == best_len:
                specific.extend(rules)
    return specific if specific else star


def is_allowed(rules: list[RobotsRule], path: str) -> bool:
    """Longest-match decision for one path (driver-side twin of the
    relational max(struct) evaluation; tests cross-check the two)."""
    best: tuple[int, int] | None = None  # (pattern_len, allow)
    for r in rules:
        if re.match(r.regex, path):
            key = (len(r.pattern), 1 if r.allow else 0)
            if best is None or key > best:
                best = key
    return True if best is None else bool(best[1])


def sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` declarations, in file order — RFC 9309 §2.3 "other
    records": group-independent (they belong to no user-agent group and
    may appear anywhere), field name case-insensitive, value an
    ABSOLUTE URL per sitemaps.org (non-absolute values are dropped —
    there is no base to resolve a robots.txt-relative path against).
    The discovery rung feeding sitemap ingest (q77): robots.txt is
    where a crawler learns the sitemap locations in the first place."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() != "sitemap":
            continue
        value = value.strip()
        if value.lower().startswith(("http://", "https://")):
            out.append(value)
    return out
