"""Query batch 4 — window-frame / sessionization / multi-dim aggregation
coverage (§2.6 frame windows and grouping sets have no reference
counterpart; Spark provides them natively and a 100 TB pipeline uses
them constantly, so they're first-class here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame window: per-user running event-value sum + 3-row moving
    average, ordered by time."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 4).alias(
            "running_sum"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    ).orderBy("event_id")


_SQL_RUNNING = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
FROM events
ORDER BY event_id
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds 30 min (lag + cumulative
    flag-sum — the standard relational sessionizer; Structured Streaming
    covers the same with session windows)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_min = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ) / 60.0
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_min.isNull() | (gap_min > SESSION_GAP_MIN), 1).otherwise(0),
    ).withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )


_SQL_SESSIONIZATION = f"""
WITH flagged AS (
  SELECT user_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR (epoch(ts) - epoch(lag(ts) OVER w)) / 60.0 > {SESSION_GAP_MIN}
              THEN 1 ELSE 0 END AS new_session,
         ts, event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no, count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM sess GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


def q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional aggregation: ROLLUP over (returnflag, linestatus)
    — subtotals + grand total in one pass (no reference counterpart;
    §2.5 notes it as a Spark-native extension)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "total_price",
        )
        .orderBy("returnflag", "linestatus")
    )


_SQL_ROLLUP = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_items,
       round(sum(l_extendedprice), 4) AS total_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread over event-type columns."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("user_id")
    )


_SQL_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'view')     AS view,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'error')    AS error
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO-family coverage: INTERSECT/EXCEPT over customer key sets —
    buyers of high-priority orders vs low-priority orders."""
    orders = _t(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_orderpriority") <= "2-HIGH").select("o_custkey").distinct()
    lo = (
        orders.filter(F.col("o_orderpriority") >= "4-NOT SPECIFIED")
        .select("o_custkey")
        .distinct()
    )
    both = hi.intersect(lo).withColumn("segment", F.lit("both"))
    hi_only = hi.subtract(lo).withColumn("segment", F.lit("hi_only"))
    return (
        both.unionByName(hi_only)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment")
    )


_SQL_SET_OPS = """
WITH hi AS (SELECT o_custkey FROM orders WHERE o_orderpriority <= '2-HIGH'),
lo AS (SELECT o_custkey FROM orders WHERE o_orderpriority >= '4-NOT SPECIFIED'),
both_seg AS (SELECT DISTINCT o_custkey FROM hi INTERSECT SELECT DISTINCT o_custkey FROM lo),
hi_only AS (
  SELECT DISTINCT o_custkey FROM hi
  EXCEPT SELECT DISTINCT o_custkey FROM lo
)
SELECT 'both' AS segment, count(*) AS n_customers FROM both_seg
UNION ALL
SELECT 'hi_only', count(*) FROM hi_only
ORDER BY segment
"""


WINDOW_QUERIES = {
    "running_totals": q_running_totals,
    "sessionization": q_sessionization,
    "sales_rollup": q_sales_rollup,
    "event_pivot": q_event_pivot,
    "set_operations": q_set_operations,
}

WINDOW_ORACLES = {
    "running_totals": _SQL_RUNNING,
    "sessionization": _SQL_SESSIONIZATION,
    "sales_rollup": _SQL_ROLLUP,
    "event_pivot": _SQL_PIVOT,
    "set_operations": _SQL_SET_OPS,
}
