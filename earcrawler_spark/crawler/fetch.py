"""Fetch + parse stage — one ``mapInPandas`` pass per wave.

The dequeued, host-salted frontier arrives already repartitioned by
``part_key`` (host ⊕ salt); inside each partition rows are processed in
per-host ``seq`` order, which preserves per-host FIFO (the reference's
sequential visit order, earCrawler/core/ear_crawler.py:133-201) while
hosts run in parallel across partitions.

Politeness: the per-host dequeue budget (wave_seconds / crawl_delay) is
enforced relationally *before* this stage, so the stage itself stays
deterministic; when ``politeness_sleep`` is on (real crawling, not
benchmarks) a token bucket additionally spaces requests inside the
partition — wall-clock behavior that deliberately has no effect on
outputs.

Transport is pluggable: the synthetic web in this sandbox, batched HTTP
(requests.Session per partition, retry w/ exponential backoff — reference
S9, api_clients/tradegov_client.py:144-150) in production. HTML is parsed
once per page: spans + outgoing links ride the same pass (spans.py).
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from earcrawler_spark.crawler import spans as spans_mod
from earcrawler_spark.crawler import synth

FETCH_OUTPUT_SCHEMA = (
    "url string, url_hash string, host string, priority int, seq bigint, "
    "status int, attempts int, content_hash string, "
    f"spans {spans_mod.SPANS_SCHEMA}, links array<string>"
)


def content_hash_of(spans: list[dict]) -> str:
    """Order-sensitive fingerprint of the span sequence (identity.py:9-12
    precedent: sha256 over a canonical serialization)."""
    payload = json.dumps(
        [[s["kind"], s["text"], s["media_ref"]] for s in spans],
        separators=(",", ":"),
        ensure_ascii=False,
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def synthetic_fetch_one(url: str, etag: str | None = None) -> tuple[int, str]:
    """Synthetic transport with conditional-GET support: when the caller
    presents a validator (If-None-Match) that still matches the page's
    current content fingerprint, the server answers 304 with no body —
    the reference's revalidation round-trip (http_cache.py:107-141)."""
    if not synth.page_exists(url):
        return 404, ""
    html = synth.page_html(url)
    if etag is not None and etag == synthetic_etag(html):
        return 304, ""
    return 200, html


def synthetic_etag(html: str) -> str:
    """Deterministic validator for the synthetic server: fingerprint of
    the parsed span sequence (equals the row's content_hash, so the cache
    can use content_hash as the stored etag)."""
    spans, _ = spans_mod.parse_html(html)
    return content_hash_of(spans)


def retrying(transport, max_attempts: int = 3, backoff_base: float = 0.0):
    """Retry + exponential backoff wrapper (reference S9:
    tenacity stop_after_attempt(3) / wait_exponential —
    api_clients/tradegov_client.py:144-150). Retries 5xx; 4xx, 304 and
    200 return immediately. backoff_base=0 keeps tests/benchmarks
    deterministic; a real deployment sets it to ~1.0.

    → transport'(url, etag) -> (status, html, attempts)

    Transports may be conditional (url, etag) or simple (url) — simple
    ones never answer 304 and are wrapped transparently.
    """
    import inspect

    try:
        conditional = len(inspect.signature(transport).parameters) >= 2
    except (TypeError, ValueError):
        conditional = False

    def fetch(url: str, etag: str | None = None):
        attempts = 0
        status, html = 599, ""
        while attempts < max_attempts:
            attempts += 1
            status, html = (
                transport(url, etag) if conditional else transport(url)
            )
            if status < 500:
                break
            if backoff_base and attempts < max_attempts:
                time.sleep(backoff_base * (2 ** (attempts - 1)))
        return status, html, attempts

    return fetch


def www_alternate(url: str) -> str:
    """The reference's alternate-host rewrite (_build_alt_url,
    federalregister_client.py:152-163): same scheme/path against the
    www. host; already-www URLs are returned unchanged."""
    if "://" not in url:
        return url
    scheme, rest = url.split("://", 1)
    host, slash, path = rest.partition("/")
    if host.startswith("www.") or not host:
        return url
    return f"{scheme}://www.{host}{slash}{path}"


def host_fallback(fetch, is_invalid, build_alt=www_alternate):
    """S10 host-fallback (federalregister_client.py:213-241): when a
    response is invalid content (anti-bot HTML where JSON was expected),
    retry ONCE against the www. variant — outside the retry wrapper, so
    the alternate gets exactly one shot. The alternate's response is
    returned whether or not it is valid (the reference re-raises on a
    second failure; here the invalid page simply parses to its own
    spans, and the caller's quality gates drop it)."""

    def wrapped(url: str, etag: str | None = None):
        status, html, attempts = fetch(url, etag)
        if is_invalid(status, html):
            alt = build_alt(url)
            if alt != url:
                status2, html2, attempts2 = fetch(alt, etag)
                return status2, html2, attempts + attempts2
        return status, html, attempts

    return wrapped


def fetch_and_parse(
    selected: DataFrame,
    politeness_sleep: bool = False,
    transport=synthetic_fetch_one,
    max_attempts: int = 3,
    backoff_base: float = 0.0,
    invalid_content=None,
) -> DataFrame:
    """Run the fetch+parse wave. ``selected`` needs columns
    (url, url_hash, host, priority, seq, crawl_delay).

    ``invalid_content(status, html) -> bool`` enables the S10 host
    fallback: invalid pages retry once against the www. host."""
    retry_fetch = retrying(transport, max_attempts, backoff_base)
    if invalid_content is not None:
        retry_fetch = host_fallback(retry_fetch, invalid_content)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # per-host FIFO inside the partition
            pdf = pdf.sort_values(["host", "seq"], kind="mergesort")
            out = {
                "url": [], "url_hash": [], "host": [], "priority": [],
                "seq": [], "status": [], "attempts": [], "content_hash": [],
                "spans": [], "links": [],
            }
            last_hit: dict[str, float] = {}
            for row in pdf.itertuples(index=False):
                if politeness_sleep:
                    delay = float(getattr(row, "crawl_delay", 1.0) or 1.0)
                    now = time.monotonic()
                    wait = last_hit.get(row.host, -1e9) + delay - now
                    if wait > 0:
                        time.sleep(wait)
                    last_hit[row.host] = time.monotonic()
                etag = getattr(row, "etag", None)
                status, html, attempts = retry_fetch(
                    row.url, etag if isinstance(etag, str) and etag else None
                )
                spans, links = (
                    spans_mod.parse_html(html) if status == 200 else ([], [])
                )
                out["url"].append(row.url)
                out["url_hash"].append(row.url_hash)
                out["host"].append(row.host)
                out["priority"].append(row.priority)
                out["seq"].append(row.seq)
                out["status"].append(status)
                out["attempts"].append(attempts)
                out["content_hash"].append(content_hash_of(spans))
                out["spans"].append(
                    [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
                )
                out["links"].append(links)
            yield pd.DataFrame(out)

    return selected.mapInPandas(run, schema=FETCH_OUTPUT_SCHEMA)
