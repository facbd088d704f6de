"""robots.txt parsing + per-host politeness budgets.

The reference has NO robots handling (SURVEY.md §7.3 gap list) — its
politeness is emergent from one-browser-per-worker sequencing + sleeps
(crawler/src/crawler.ts:80-97). The north rule adds explicit robots.txt
honoring + crawl-delay budgets; semantics follow RFC 9309 (subset: the
``User-agent: *`` group; ``Allow``/``Disallow`` longest-match-wins;
non-standard but conventional ``Crawl-delay``).

Budget model (W2): within one scheduling wave of virtual duration
``wave_seconds``, a host may be fetched ``max(1, floor(wave_seconds /
crawl_delay))`` times; hosts without robots or without a delay get
``default_budget``. This mirrors the reference's hard sequencing (one URL
at a time per site) generalized to wave granularity.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache


@lru_cache(maxsize=4096)
def _rule_regex(pattern: str) -> re.Pattern:
    """RFC 9309 rule pattern → anchored regex: ``*`` matches any run of
    characters, a trailing ``$`` anchors at end-of-path; everything else
    is literal. Plain prefixes compile to plain anchored literals, so the
    common case costs the same as startswith."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    parts = [re.escape(seg) for seg in body.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchored_end else ""))


@dataclass(frozen=True)
class RobotsPolicy:
    allows: tuple[tuple[str, bool], ...]  # (path_pattern, is_allow), as read
    crawl_delay: float | None

    def is_allowed(self, path: str) -> bool:
        """Most-specific (longest-pattern) match wins; tie → allow wins
        (RFC 9309 §2.2.2). Patterns support ``*`` / trailing ``$``."""
        best_len = -1
        best_allow = True
        for pattern, is_allow in self.allows:
            if pattern == "":
                continue
            if _rule_regex(pattern).match(path) and len(pattern) >= best_len:
                if len(pattern) > best_len or is_allow:
                    best_allow = is_allow
                best_len = len(pattern)
        return best_allow

    def budget(self, wave_seconds: float, default_budget: int) -> int:
        if self.crawl_delay is None or self.crawl_delay <= 0:
            return default_budget
        return max(1, int(wave_seconds // self.crawl_delay))


EMPTY_POLICY = RobotsPolicy(allows=(), crawl_delay=None)


def parse_robots(body: str | None) -> RobotsPolicy:
    """Parse the ``User-agent: *`` group (we present one UA)."""
    if not body:
        return EMPTY_POLICY
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    in_star_group = False
    group_open = False  # current group head still accepting UA lines
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # RFC 9309 §2.1: consecutive user-agent lines form ONE group
            # head; membership of '*' ORs in. A user-agent line after any
            # rule starts a NEW group.
            if group_open:
                in_star_group = in_star_group or val == "*"
            else:
                in_star_group = val == "*"
                group_open = True
        else:
            group_open = False
            if key in ("disallow", "allow") and in_star_group:
                rules.append((val, key == "allow"))
            elif key == "crawl-delay" and in_star_group:
                try:
                    delay = float(val)
                except ValueError:
                    pass
    return RobotsPolicy(allows=tuple(rules), crawl_delay=delay)


@lru_cache(maxsize=4096)
def policy_for(body: str | None) -> RobotsPolicy:
    """Cached parse — executors see few distinct robots bodies per task
    batch, so the per-row gate amortizes to a dict lookup."""
    return parse_robots(body)


def host_budgets(robots_rows: list[tuple[str, str]], wave_seconds: float,
                 default_budget: int) -> dict[str, int]:
    """host → per-wave admission budget. The robots table is a tiny
    dimension (one row per host) — at cluster scale this dict rides a
    Spark broadcast variable; the big frontier never shuffles for it."""
    out = {}
    for host, body in robots_rows:
        out[host] = parse_robots(body).budget(wave_seconds, default_budget)
    return out


def disallowed_checker(robots_rows: list[tuple[str, str]]):
    policies = {h: parse_robots(b) for h, b in robots_rows}

    def check(host: str, path: str) -> bool:
        pol = policies.get(host)
        return bool(pol) and not pol.is_allowed(path)

    return check
