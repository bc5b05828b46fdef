"""Single-process reference crawler — the T2 ordering oracle.

Implements the BFS semantics of the reference
(/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:74-198: level queue,
visited-set dedup on the deep-normalized URL, per-host politeness quota,
stable priority order (score DESC, depth ASC, url ASC)) directly in Python
over the same synthetic site, using the same pure functions the Spark engine
runs inside its UDFs. The Spark frontier loop must schedule exactly the same
URL set per generation.
"""

from __future__ import annotations

import urllib.robotparser

from crawl4ai_spark import urls as U
from crawl4ai_spark.html.scraper import scrape
from crawl4ai_spark.sources.pagesgen import build_html, host_name, page_url, robots_rules


def oracle_bfs(n_hosts: int, pages_per_host: int, *, max_depth: int = 3,
               max_pages: int = 10_000, per_host_quota: int = 10,
               robots: bool = True) -> list[dict]:
    """Run the reference-semantics BFS; return per-generation records:
    [{generation, scheduled: set, completed: set, blocked: set}]."""
    pages = {
        page_url(h, p): build_html(h, p, n_hosts, pages_per_host)
        for h in range(n_hosts) for p in range(pages_per_host)
    }
    parsers: dict[str, urllib.robotparser.RobotFileParser | None] = {}
    for h in range(n_hosts):
        host = host_name(h)
        if h % 7 == 1 and h > 0:
            parsers[host] = None  # no robots row → fail-open
        else:
            rp = urllib.robotparser.RobotFileParser()
            rp.parse(robots_rules(h, n_hosts).splitlines())
            parsers[host] = rp

    def allowed(url: str) -> bool:
        if not robots:
            return True
        rp = parsers.get(U.host_of(url))
        return True if rp is None else rp.can_fetch("*", url)

    # frontier: url -> (depth, score); seen = every url ever enqueued
    frontier: dict[str, tuple[int, float]] = {}
    status: dict[str, str] = {}
    for h in range(n_hosts):
        u = U.normalize_url(page_url(h, 0), page_url(h, 0))
        frontier[u] = (0, 0.0)
        status[u] = "QUEUED"

    generations: list[dict] = []
    pages_done = 0
    gen = 0
    while pages_done < max_pages:
        queued = [(u, d, s) for u, (d, s) in frontier.items() if status[u] == "QUEUED"]
        if not queued:
            break
        min_depth = min(d for _, d, _ in queued)
        level = [(u, d, s) for u, d, s in queued if d == min_depth]

        # per-host quota, priority order (score DESC, depth ASC, url ASC)
        by_host: dict[str, list] = {}
        for u, d, s in level:
            by_host.setdefault(U.host_of(u), []).append((u, d, s))
        batch: list[tuple[str, int, float]] = []
        for host in by_host:
            rows = sorted(by_host[host], key=lambda x: (-x[2], x[1], x[0]))
            batch.extend(rows[:per_host_quota])
        # global budget cap in the same priority order
        batch.sort(key=lambda x: (-x[2], x[1], x[0]))
        batch = batch[: max_pages - pages_done]

        scheduled = {u for u, _, _ in batch}
        completed, blocked = set(), set()
        # per-generation discoveries: url → (depth, max score) — matches the
        # engine's dedup rule (max score wins across duplicate discoveries)
        disc: dict[str, tuple[int, float]] = {}
        for u, d, s in batch:
            if not allowed(u):
                blocked.add(u)
                status[u] = "FAILED"
                continue
            html = pages.get(u)
            if html is None:
                status[u] = "FAILED"
                continue
            completed.add(u)
            status[u] = "COMPLETED"
            if d + 1 <= max_depth:
                res = scrape(u, html)
                for link in res["links"]["internal"]:
                    nu = U.normalize_url_deep(link["href"], u)
                    if (not nu or not U.is_valid_url(nu)
                            or U.is_nonsense_url(nu) or nu in frontier):
                        continue
                    sc = float(link["intrinsic_score"])
                    prev = disc.get(nu)
                    if prev is None or sc > prev[1]:
                        disc[nu] = (d + 1, sc)
        for nu, (nd, sc) in disc.items():
            frontier[nu] = (nd, sc)
            status[nu] = "QUEUED"
        generations.append({
            "generation": gen, "scheduled": scheduled,
            "completed": completed, "blocked": blocked,
        })
        pages_done += len(scheduled)
        gen += 1
    return generations


def oracle_policy(n_hosts: int, pages_per_host: int, *, policy: str,
                  max_depth: int = 3, max_pages: int = 10_000,
                  per_host_quota: int = 10,
                  batch_size: int | None = None) -> list[dict]:
    """Generalized ordering oracle for the dfs / best_first policies.

    Mirrors the engine's scheduling semantics (a deterministic equivalence
    class of the reference's asyncio strategies, SURVEY.md §7 risk 2):
    - best_first: no depth gate; global priority (score DESC, depth ASC,
      url ASC) after the per-host quota; optional batch_size per generation
      (ref bff_strategy.py:19 BATCH_SIZE pops).
    - dfs: only the DEEPEST queued depth runs each generation
      (ref dfs_strategy.py:27-131 LIFO stack semantics, level-collapsed).
    """
    pages = {
        page_url(h, p): build_html(h, p, n_hosts, pages_per_host)
        for h in range(n_hosts) for p in range(pages_per_host)
    }
    frontier: dict[str, tuple[int, float]] = {}
    status: dict[str, str] = {}
    for h in range(n_hosts):
        u = U.normalize_url(page_url(h, 0), page_url(h, 0))
        frontier[u] = (0, 0.0)
        status[u] = "QUEUED"

    generations: list[dict] = []
    pages_done = 0
    gen = 0
    while pages_done < max_pages:
        queued = [(u, d, s) for u, (d, s) in frontier.items() if status[u] == "QUEUED"]
        if not queued:
            break
        if policy == "dfs":
            gate = max(d for _, d, _ in queued)
            queued = [(u, d, s) for u, d, s in queued if d == gate]
        by_host: dict[str, list] = {}
        for u, d, s in queued:
            by_host.setdefault(U.host_of(u), []).append((u, d, s))
        batch: list[tuple[str, int, float]] = []
        for host in by_host:
            rows = sorted(by_host[host], key=lambda x: (-x[2], x[1], x[0]))
            batch.extend(rows[:per_host_quota])
        batch.sort(key=lambda x: (-x[2], x[1], x[0]))
        cap = max_pages - pages_done
        if batch_size is not None:
            cap = min(cap, batch_size)
        batch = batch[:cap]

        scheduled = {u for u, _, _ in batch}
        disc: dict[str, tuple[int, float]] = {}
        for u, d, s in batch:
            html = pages.get(u)
            status[u] = "COMPLETED" if html is not None else "FAILED"
            if html is None or d + 1 > max_depth:
                continue
            res = scrape(u, html)
            for link in res["links"]["internal"]:
                nu = U.normalize_url_deep(link["href"], u)
                if (not nu or not U.is_valid_url(nu)
                        or U.is_nonsense_url(nu) or nu in frontier):
                    continue
                sc = float(link["intrinsic_score"])
                prev = disc.get(nu)
                if prev is None or sc > prev[1]:
                    disc[nu] = (d + 1, sc)
        for nu, (nd, sc) in disc.items():
            frontier[nu] = (nd, sc)
            status[nu] = "QUEUED"
        generations.append({"generation": gen, "scheduled": scheduled})
        pages_done += len(scheduled)
        gen += 1
    return generations
