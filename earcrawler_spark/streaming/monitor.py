"""Streaming operators.

The reference has no streaming engine — its incremental behaviors are
re-crawl loops with persisted state (monitor/state.py:35-73 change
detection; ear_crawler.py:87-109 resumable seen-set). Here the same
semantics run as Structured Streaming plans, so a deployment can choose
batch-iterative (crawler/runner.py) or continuous ingestion with
identical logic:

- ``hourly_rollup``    — tumbling-window counts/sums with a watermark for
                         late data (same aggregation as the batch query
                         queries.q_hourly_event_rollup).
- ``streaming_dedup``  — content-hash dropDuplicates within the watermark
                         horizon (the streaming analog of the seen-set
                         anti-join; exactly-once per key inside the
                         horizon, the checkpointed seen table handles
                         cross-horizon exactness).
- ``change_detection`` — per (user, type) latest-value hash maintained by
                         a stateful flatMapGroupsWithState-style pandas
                         stage; emits only changed rows (monitor delta).
- ``incident_attribution`` — watermarked stream-stream time-range join
                         (continuous twin of the batch
                         interval_attribution query).

All transformations are source-agnostic: they take a streaming DataFrame
(file/kafka/rate source) and return a streaming DataFrame.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window: n_events + sum(value) per event_type.
    The watermark bounds state: windows older than it are finalized and
    dropped — required for unbounded sources."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"), "event_type", "n_events", "sum_value"
        )
    )


def streaming_dedup(
    records: DataFrame, hash_col: str = "content_hash", watermark: str = "24 hours"
) -> DataFrame:
    """First occurrence per content hash within the watermark horizon
    (streaming D1). dropDuplicates state is bounded by the watermark."""
    return records.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [hash_col]
    )


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user (F.session_window): the
    streaming twin of the batch lag+flag-sum sessionizer
    (queries_windows.q_sessionization)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id", F.col("win.start").alias("session_start"),
            "n_events", "session_value",
        )
    )


def versioned_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: the reference's position-version counter
    (D2, ear_crawler.py:84,97-103) as a true stream — per (user_id,
    event_type) the state holds the last assigned version; each incoming
    event gets version = state+1. applyInPandasWithState = the
    flatMapGroupsWithState surface for arbitrary per-key state the
    built-in aggregations can't express.

    Note: versions are assigned in arrival order within each micro-batch
    group (sorted by ts inside the batch) — the streaming contract, not
    the batch total order, when late data crosses batch boundaries.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def assign(key, pdfs, state):
        last = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            versions = list(range(last + 1, last + 1 + len(pdf)))
            last += len(pdf)
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_type": pdf["event_type"],
                    "event_id": pdf["event_id"],
                    "version": versions,
                }
            )
        state.update((last,))

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            assign,
            outputStructType="user_id long, event_type string, event_id long, version int",
            stateStructType="last int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def change_detection(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Monitor delta as a stream: latest value-hash per (user_id,
    event_type) per window; downstream consumers diff consecutive windows
    (state.py:35-73 semantics). Implemented as windowed argmax — the
    aggregation Spark can incrementally maintain with bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("win"), "user_id", "event_type"
        )
        .agg(
            F.max_by(F.sha2(F.round("value", 6).cast("string"), 256), F.col("ts")).alias(
                "state_hash"
            ),
            F.max("ts").alias("last_ts"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "user_id", "event_type", "state_hash", "last_ts",
        )
    )


def incident_attribution(
    events: DataFrame,
    incident_type: str = "error",
    point_type: str = "purchase",
    window: str = "2 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with watermarks — the continuous twin of
    the batch ``interval_attribution`` query (queries_windows.py): every
    ``incident_type`` event opens a half-open [ts, ts + window) incident
    for its user; ``point_type`` events of the same user landing inside
    any open incident emit an attribution pair.

    The time-range condition (p_ts >= e_ts AND p_ts < e_ts + window)
    plus a watermark on BOTH sides is what lets Spark bound join state
    on an unbounded source: incident rows are dropped once the global
    event-time watermark passes e_ts + window, point rows once it
    passes p_ts (batch mode needs the bucketed interval_join instead
    because it has no watermark to bound a theta join's state).

    Output (append mode): one row per (point, incident) pair with both
    ids, the user, the point's value and both event times."""
    pts = events.filter(F.col("event_type") == point_type).select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    ivl = events.filter(F.col("event_type") == incident_type).select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    return pts.withWatermark("p_ts", watermark).join(
        ivl.withWatermark("e_ts", watermark),
        F.expr(
            f"user_id = e_user AND p_ts >= e_ts"
            f" AND p_ts < e_ts + interval {window}"
        ),
        "inner",
    )
