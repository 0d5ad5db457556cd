"""Sequential reference model of the crawl — single-threaded Python with
plain dicts/lists, mirroring the reference engine's execution style
(earCrawler/core/ear_crawler.py:133-201: one loop, one seen dict, fixed
politeness). The Spark crawler must reproduce this model's visit order
and URL-seen set exactly, at any parallelism.
"""

from __future__ import annotations

import hashlib

from earcrawler_spark.crawler import synth
from earcrawler_spark.crawler.canonicalize import canonicalize_one
from earcrawler_spark.crawler.fetch import content_hash_of
from earcrawler_spark.crawler.robots import parse_robots_txt
from earcrawler_spark.crawler.spans import parse_html


def _host_of(url: str) -> str:
    return url.split("/")[2].split(":")[0].lower()


def crawl_sequential(
    seeds: list[tuple[str, int, int]],
    max_iters: int,
    wave_seconds: float = 20.0,
    transport=None,
    robots_fetcher=synth.robots_txt,
    default_delay: float = 1.0,
):
    """→ (visits, seen_hashes, documents)

    visits: list of dicts in deterministic total order
            (iter, -priority, host, seq)
    seen_hashes: set of sha256(canonical url)
    documents: {content_hash: (doc_url, spans)} — first occurrence wins
    """
    if transport is None:
        def transport(url):
            if not synth.page_exists(url):
                return 404, ""
            return 200, synth.page_html(url)

    # init: canonicalize + dedup seeds (min seq wins)
    best = {}
    for url, priority, seq in seeds:
        cu = canonicalize_one(url)
        h = hashlib.sha256(cu.encode()).hexdigest()
        if h not in best or seq < best[h][3]:
            best[h] = (cu, h, priority, seq)
    frontier = sorted(best.values(), key=lambda r: r[3])  # (url, hash, prio, seq)
    seen = {r[1] for r in frontier}
    max_seq = max((r[3] for r in frontier), default=-1)
    robots: dict[str, tuple[list[str], float]] = {}
    content_seen: set[str] = set()
    documents: dict[str, tuple[str, list]] = {}
    visits = []

    for it in range(1, max_iters + 1):
        if not frontier:
            break
        for r in frontier:
            h = _host_of(r[0])
            if h not in robots:
                robots[h] = parse_robots_txt(robots_fetcher(h), default_delay)
        # robots filter
        allowed, budget_of = [], {}
        for url, uh, prio, seq in frontier:
            host = _host_of(url)
            path = url.split(host, 1)[1]
            dis, delay = robots[host]
            if any(path.startswith(p) for p in dis):
                continue  # denied permanently
            allowed.append((url, uh, host, prio, seq))
            budget_of[host] = max(1, int(wave_seconds // delay))
        # politeness dequeue per host
        by_host: dict[str, list] = {}
        for row in allowed:
            by_host.setdefault(row[2], []).append(row)
        selected, remainder = [], []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (-r[3], r[4]))
            b = budget_of[host]
            selected += rows[:b]
            remainder += rows[b:]
        # visit order within wave
        selected.sort(key=lambda r: (-r[3], r[2], r[4]))
        wave_links = []
        wave_docs = []
        for url, uh, host, prio, seq in selected:
            status, html = transport(url)
            spans, links = parse_html(html) if status == 200 else ([], [])
            ch = content_hash_of(spans)
            visits.append(
                dict(iter=it, url=url, url_hash=uh, host=host,
                     priority=prio, seq=seq, status=status, content_hash=ch)
            )
            if status == 200:
                wave_docs.append((seq, ch, url, spans))
                for li, raw in enumerate(links):
                    wave_links.append((prio, seq, li, raw))
        # content dedup: first-by-seq within wave, then vs content_seen
        wave_docs.sort(key=lambda d: d[0])
        taken = set()
        for seq, ch, url, spans in wave_docs:
            if ch in content_seen or ch in taken:
                continue
            taken.add(ch)
            documents[ch] = (url, spans)
        content_seen |= taken
        # link expansion: argmin (parent_seq, link_idx) per url_hash
        cand: dict[str, tuple] = {}
        for prio, pseq, li, raw in wave_links:
            cu = canonicalize_one(raw)
            h = hashlib.sha256(cu.encode()).hexdigest()
            key = (pseq, li)
            if h not in cand or key < (cand[h][4], cand[h][5]):
                cand[h] = (cu, h, _host_of(cu), max(prio - 1, 1), pseq, li)
        news = sorted(
            (c for c in cand.values() if c[1] not in seen),
            key=lambda c: (c[4], c[5], c[1]),
        )
        frontier = [(r[0], r[1], r[3], r[4]) for r in remainder]
        for url, uh, host, prio, pseq, li in news:
            max_seq += 1
            seen.add(uh)
            frontier.append((url, uh, prio, max_seq))
    return visits, seen, documents
