"""Sequential pure-Python reference-semantics crawler (the trace oracle).

Implements exactly the behaviors cited in SURVEY.md §2/§3 from the Go
reference, single-threaded and deterministic:

* seed injection at depth 0           (colly.go:108-118)
* depth cap                           (colly.MaxDepth, config.go:49)
* same-host / allowlist restriction   (AllowedDomains, colly.go:174)
* visited-set dedup at enqueue        (colly.go:92-97)
* status≠200 pages fetched, not expanded (OnError path, colly.go:64-71)
* per-host per-round politeness budget (LimitRule, colly.go:201-207)
* robots.txt disallow prefixes        (temoto/robotstxt dep, go.mod:59)

The Spark engine's distributed output must equal this oracle's traces:
per-round popped sets, final seen set (url → first-enqueue depth), and
per-document span sequences.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from goprowl_spark import corpus


def robots_allowed(rules, path: str) -> bool:
    """REP rule matching (temoto/robotstxt + RFC 9309 semantics): rules are
    (prefix, allow) pairs — bare strings mean Disallow — with ``*`` and
    trailing ``$`` wildcards; the matching rule with the longest prefix
    wins, Allow winning length ties; no match → allowed."""
    best_len, best_allow = -1, True
    for r in rules:
        prefix, allow = (r, False) if isinstance(r, str) else r
        anchored = prefix.endswith("$")
        base = prefix[:-1] if anchored else prefix
        pat = "^" + re.escape(base).replace(r"\*", ".*") + ("$" if anchored else "")
        if re.match(pat, path):
            pl = len(prefix)
            if pl > best_len:
                best_len, best_allow = pl, allow
            elif pl == best_len:
                best_allow = best_allow or allow
    return best_len < 0 or best_allow


def crawl_oracle(
    n: int,
    seeds: list[str],
    max_depth: int,
    allowed_hosts: set[str] | None = None,
    host_budget: dict[str, int] | None = None,
    default_budget: int | None = None,
    robots: dict[str, list[str]] | None = None,
    max_rounds: int | None = None,
    priority_fn=None,
):
    """Returns (rounds, seen, documents):
    rounds    — list of sorted url-lists popped per round (round 1..R)
    seen      — {url: (depth, first_seen_round)}
    documents — {url: span-tuple-list} for successfully fetched pages
    """
    pages = {corpus.url(i): i for i in range(n)}
    frontier: dict[str, tuple[int, float]] = {}  # url -> (depth, priority)
    seen: dict[str, tuple[int, int]] = {}
    documents: dict[str, list] = {}
    for u in seeds:
        frontier[u] = (0, 0.0)
        seen[u] = (0, 0)

    rounds: list[list[str]] = []
    r = 0
    while frontier and (max_rounds is None or r < max_rounds):
        r += 1
        # pop: per host, order by (priority desc, depth asc, url asc), top-budget
        by_host: dict[str, list[str]] = {}
        for u in frontier:
            by_host.setdefault(urlsplit(u).hostname, []).append(u)
        popped: list[str] = []
        for h, urls in by_host.items():
            urls.sort(key=lambda u: (-frontier[u][1], frontier[u][0], u))
            b = None
            if host_budget and h in host_budget:
                b = host_budget[h]
            elif default_budget is not None:
                b = default_budget
            popped.extend(urls if b is None else urls[:b])
        rounds.append(sorted(popped))

        candidates: dict[str, int] = {}
        for u in popped:
            depth = frontier.pop(u)[0]
            i = pages.get(u)
            if i is None or corpus.status(i) != 200:
                continue
            documents[u] = corpus.expected_spans(i, n)
            if depth + 1 > max_depth:
                continue
            for link in corpus.out_links(i, n):
                d = depth + 1
                if link not in candidates or d < candidates[link]:
                    candidates[link] = d

        for link in candidates:
            host = urlsplit(link).hostname
            if allowed_hosts is not None and host not in allowed_hosts:
                continue
            if robots and host in robots:
                path = urlsplit(link).path or "/"
                if not robots_allowed(robots[host], path):
                    continue
            if link in seen:
                continue
            d = candidates[link]
            seen[link] = (d, r)
            prio = priority_fn(link, host, d) if priority_fn else -float(d)
            frontier[link] = (d, prio)

    return rounds, seen, documents
