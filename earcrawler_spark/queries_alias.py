"""Query batch 5 — alias resolution (P10), sliding windows, Jaro-Winkler
reconcile scoring (rows-only), approximate distinct for seen-set metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# canonical alias map (transforms/canonical.py:41-106: casefolded keys →
# canonical names, title-case fallback for unknowns)
ALIASES = {
    "machinery": "Machinery & Equipment",
    "household": "Household Goods",
    "automobile": "Automotive",
}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_alias_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 canonical alias resolution: broadcast-map lookup on the
    casefolded key with initcap fallback (canonical.py:41-110)."""
    cust = _t(spark, sf_dir, "customer")
    amap = F.create_map(
        *[F.lit(x) for kv in ALIASES.items() for x in kv]
    )
    key = F.lower("c_mktsegment")
    return (
        cust.select(
            "c_custkey",
            F.coalesce(amap[key], F.initcap(key)).alias("segment_canonical"),
        )
        .groupBy("segment_canonical")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment_canonical")
    )


def _alias_sql() -> str:
    cases = " ".join(
        f"WHEN lower(c_mktsegment) = '{k}' THEN '{v}'" for k, v in ALIASES.items()
    )
    # initcap equivalent: DuckDB has no initcap — single-word segments, so
    # upper(first) || lower(rest) is exactly Spark's initcap here
    return f"""
SELECT CASE {cases}
            ELSE upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2)
       END AS segment_canonical,
       count(*) AS n_customers
FROM customer
GROUP BY 1
ORDER BY segment_canonical
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window, 30 min slide): each event lands in two
    epoch-aligned windows — the streaming F.window(ts,'1 hour','30
    minutes') semantics expressed relationally so DuckDB can replay it."""
    ev = _t(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    starts = F.array(
        (F.floor(epoch / 1800) * 1800 - 1800).cast("long"),
        (F.floor(epoch / 1800) * 1800).cast("long"),
    )
    return (
        ev.select(F.explode(starts).alias("win_start_s"), "ts", "value")
        .filter(
            (F.unix_timestamp("ts") >= F.col("win_start_s"))
            & (F.unix_timestamp("ts") < F.col("win_start_s") + 3600)
        )
        .groupBy(F.timestamp_seconds("win_start_s").alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("window_start")
    )


_SQL_SLIDING = """
WITH e AS (
  SELECT ts, value, CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS w1
  FROM events
), exploded AS (
  SELECT ts, value, unnest([w1 - 1800, w1]) AS win_start_s FROM e
)
SELECT CAST(to_timestamp(win_start_s) AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM exploded
WHERE epoch(ts) >= win_start_s AND epoch(ts) < win_start_s + 3600
GROUP BY win_start_s
ORDER BY window_start
"""


def q_reconcile_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 Jaro-Winkler pair feature (reconcile.py:165) via an
    Arrow-batched pandas UDF over blocked part-name pairs. Rows-only
    driver check (JW variants differ across engines); canonical vectors
    are pytest-verified."""
    from earcrawler_spark.functions.similarity_udfs import jaro_winkler_udf
    from earcrawler_spark.operators.reconcile import blocking_pairs

    parts = _t(spark, sf_dir, "part")
    pairs = blocking_pairs(
        parts, "p_partkey", "p_name",
        [F.concat_ws("|", "p_brand", "p_type")], max_bucket=64,
    )
    return (
        pairs.withColumn("jw", F.round(jaro_winkler_udf("name_a", "name_b"), 6))
        .filter(F.col("jw") >= 0.85)
        .select("id_a", "id_b", "name_a", "name_b", "jw")
        .orderBy("id_a", "id_b")
    )


def q_seen_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-set metrics with approx_count_distinct (HLL) next to the exact
    count — the cheap cardinality monitor a 10^10-URL seen set reports
    per shard (SURVEY §2.5 note). Rows-only: HLL estimates are
    engine-specific; the pytest bound-checks the estimate."""
    docs = _t(spark, sf_dir, "documents")
    hashed = docs.select(F.sha2("text", 256).alias("h"))
    return hashed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("h").alias("exact_distinct"),
        F.approx_count_distinct("h", 0.02).alias("approx_distinct"),
    )


ALIAS_QUERIES = {
    "alias_resolution": q_alias_resolution,
    "sliding_window": q_sliding_window,
    "reconcile_jw": q_reconcile_jw,
    "seen_set_cardinality": q_seen_set_cardinality,
}

ALIAS_ORACLES = {
    "alias_resolution": _alias_sql(),
    "sliding_window": _SQL_SLIDING,
    # reconcile_jw / seen_set_cardinality: rows-only by design
}
