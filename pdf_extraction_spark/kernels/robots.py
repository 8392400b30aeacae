"""robots.txt parsing + matching (REP, RFC 9309): crawl-policy kernel.

A crawl pipeline decides per (host, path) whether fetching was/is allowed;
at 10^12 documents that is a broadcast-joined policy table built from
parsed robots.txt files. Pure stdlib, deterministic, total.

* :func:`parse_robots` — one payload → grouped rules, crawl-delay,
  sitemap URLs;
* :func:`is_allowed` — RFC 9309 matching: most-specific (longest) rule
  wins, allow wins ties, ``*`` wildcards and ``$`` anchors supported,
  absent group ⇒ allowed.
"""

from __future__ import annotations


def parse_robots(payload: bytes | str) -> dict:
    """Parse robots.txt into ``{"groups": {agent_lower: [(rule, path)...]},
    "crawl_delay": {agent_lower: float}, "sitemaps": [url...]}``.

    Grouping per RFC 9309: consecutive ``User-agent`` lines share the rule
    block that follows; rules before any User-agent line are ignored;
    comments (#) stripped; unknown directives skipped. Never raises."""
    try:
        if isinstance(payload, bytes):
            # utf-8-sig: a BOM would otherwise survive into the first
            # 'user-agent' key and silently drop that whole group
            text = payload.decode("utf-8-sig", errors="replace")
        else:
            text = payload.lstrip("﻿")
        groups: dict[str, list] = {}
        delays: dict[str, float] = {}
        sitemaps: list[str] = []
        current: list[str] = []
        last_was_agent = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                agent = val.lower()
                if last_was_agent:
                    current.append(agent)
                else:
                    current = [agent]
                last_was_agent = True
                for a in current:
                    groups.setdefault(a, [])
                continue
            last_was_agent = False
            if key == "sitemap":
                if val:
                    sitemaps.append(val)
            elif key in ("allow", "disallow") and current:
                for a in current:
                    groups.setdefault(a, []).append((key, val))
            elif key == "crawl-delay" and current:
                try:
                    d = float(val)
                except ValueError:
                    continue
                for a in current:
                    delays.setdefault(a, d)
        return {"groups": groups, "crawl_delay": delays, "sitemaps": sitemaps}
    except Exception:
        return {"groups": {}, "crawl_delay": {}, "sitemaps": []}


def _rule_matches(pattern: str, path: str) -> int:
    """Return the match specificity (pattern length) if ``pattern`` matches
    ``path`` per RFC 9309 (* wildcard, $ end anchor), else -1."""
    if not pattern:
        return -1
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    parts = pat.split("*")
    # first segment must match at the start
    if not path.startswith(parts[0]):
        return -1
    pos = len(parts[0])
    # middle segments: leftmost match (greedy-safe — leaves the most path
    # for later segments); empty middles are consecutive '**', zero-width
    for seg in parts[1:-1]:
        if not seg:
            continue
        i = path.find(seg, pos)
        if i == -1:
            return -1
        pos = i + len(seg)
    if len(parts) > 1:
        last = parts[-1]
        if not last:
            pos = len(path)  # trailing * consumes the rest
        elif anchored:
            # the FINAL segment of an anchored pattern must match at the
            # END — leftmost matching made '/*.php$' miss '/a.php.php'
            if not path.endswith(last) or len(path) - len(last) < pos:
                return -1
            pos = len(path)
        else:
            i = path.find(last, pos)
            if i == -1:
                return -1
            pos = i + len(last)
    if anchored and pos != len(path):
        return -1
    return len(pattern)


def is_allowed(rules: dict, agent: str, path: str) -> bool:
    """RFC 9309 decision for ``agent`` fetching ``path``: pick the group
    (exact agent token, else ``*``; no group ⇒ allowed), then the
    most-specific matching rule — longest pattern wins, allow wins ties,
    empty Disallow allows everything."""
    groups = rules.get("groups", {})
    g = groups.get(agent.lower())
    if g is None:
        g = groups.get("*")
    if not g:
        return True
    best_len = -1
    best_allow = True
    for rule, pattern in g:
        if rule == "disallow" and pattern == "":
            continue  # empty Disallow: explicit allow-all, matches nothing
        spec = _rule_matches(pattern, path)
        if spec > best_len or (spec == best_len >= 0 and rule == "allow"):
            if spec >= 0:
                best_len = spec
                best_allow = rule == "allow"
    return True if best_len < 0 else best_allow
