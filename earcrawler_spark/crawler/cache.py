"""HTTP fetch cache — conditional-GET semantics as a table.

Reference: earCrawler/utils/http_cache.py:65-197 — a disk cache keyed by
sha256(url‖params‖vary-headers) holding {etag, last_modified, body} with
TTL expiry and 304 revalidation. Here the cache is a checkpointed table:

    fetch_cache(url_hash, etag, body_sha, content_hash, fetched_iter)

and the join shape replaces the per-request branch logic:

  frontier(dequeued) ──left join cache──▶ rows with fresh cache entries
  (age ≤ ttl_iters) skip the network and replay the cached parse;
  stale/missing rows fetch (sending If-None-Match in a real transport);
  the cache is then MERGE'd: new/changed entries upsert, 304s refresh
  fetched_iter. Iceberg MERGE INTO in production; delta-rewrite here.

Scale: the join is url_hash-keyed — identical bucketing to the seen-set,
so it co-partitions with the frontier's other joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CACHE_SCHEMA = "url_hash string, etag string, content_hash string, fetched_iter int"


def split_by_cache(
    dequeued: DataFrame, cache: DataFrame | None, it: int, ttl_iters: int
) -> tuple[DataFrame, DataFrame]:
    """→ (to_fetch, cache_hits).

    cache_hits are dequeued rows whose cache entry is fresh
    (it - fetched_iter <= ttl_iters): they bypass the fetch stage and
    carry the cached content_hash. Everything else fetches.
    """
    if cache is None:
        return dequeued, None
    fresh = cache.filter((F.lit(it) - F.col("fetched_iter")) <= ttl_iters).select(
        "url_hash", F.col("content_hash").alias("cached_content_hash")
    )
    joined = dequeued.join(F.broadcast(fresh), "url_hash", "left")
    to_fetch = joined.filter(F.col("cached_content_hash").isNull()).drop(
        "cached_content_hash"
    )
    hits = joined.filter(F.col("cached_content_hash").isNotNull())
    return to_fetch, hits


def merge_cache(
    old: DataFrame | None, fetched: DataFrame, it: int
) -> DataFrame:
    """Upsert fetched results into the cache (hash-gated MERGE semantics:
    loaders/ear_parts_loader.py:187-202 only writes on content change).
    fetched needs (url_hash, content_hash, status)."""
    new_entries = (
        fetched.filter(F.col("status") == 200)
        .select(
            "url_hash",
            F.sha2(F.concat_ws("|", "url_hash", "content_hash"), 256).alias("etag"),
            "content_hash",
            F.lit(it).alias("fetched_iter"),
        )
    )
    if old is None:
        return new_entries
    kept = old.join(new_entries.select("url_hash"), "url_hash", "left_anti")
    return kept.unionByName(new_entries)
