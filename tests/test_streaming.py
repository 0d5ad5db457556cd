"""Structured Streaming tests: stream the events parquet through a file
source and assert the streaming results equal the equivalent batch
aggregation (the gold standard for streaming correctness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from earcrawler_spark.streaming.monitor import (
    change_detection,
    hourly_rollup,
    streaming_dedup,
)


@pytest.fixture(scope="module")
def events_stream(spark, sf_small, tmp_path_factory):
    # file streams need a directory; stage the single-file testdata parquet
    import shutil

    d = tmp_path_factory.mktemp("events_stream_src")
    shutil.copy(f"{sf_small}/events.parquet", d / "events.parquet")
    # watermarks require TIMESTAMP (with tz); the parquet is TIMESTAMP_NTZ —
    # session tz is UTC, so the cast is value-preserving
    batch = spark.read.parquet(f"{sf_small}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{sf_small}/events.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return stream, batch


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_hourly_rollup_matches_batch(spark, events_stream):
    stream, batch = events_stream
    name = _run_to_memory(hourly_rollup(stream), "t_rollup", "append")
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    }
    # append mode emits only watermark-finalized windows; all emitted
    # windows must match batch exactly, and most windows must have emitted
    assert got, "no finalized windows emitted"
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) * 0.8


def test_streaming_dedup_first_wins(spark, events_stream):
    stream, batch = events_stream
    recs = stream.select(
        "ts", F.sha2(F.col("event_type"), 256).alias("content_hash"), "event_id"
    )
    name = _run_to_memory(streaming_dedup(recs), "t_dedup", "append")
    got = spark.sql(f"SELECT content_hash, count(*) c FROM {name} GROUP BY 1").collect()
    assert got and all(r["c"] == 1 for r in got)
    n_types = batch.select("event_type").distinct().count()
    assert len(got) == n_types


def test_change_detection_emits_latest_state(spark, events_stream):
    stream, batch = events_stream
    name = _run_to_memory(change_detection(stream), "t_change", "append")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert rows
    # each emitted (window, user, type) matches the batch argmax hash
    want = {
        (r["window_start"], r["user_id"], r["event_type"]): r["state_hash"]
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("win"), "user_id", "event_type"
        )
        .agg(
            F.max_by(
                F.sha2(F.round("value", 6).cast("string"), 256), F.col("ts")
            ).alias("state_hash")
        )
        .select(F.col("win.start").alias("window_start"), "user_id", "event_type", "state_hash")
        .collect()
    }
    for r in rows:
        key = (r["window_start"], r["user_id"], r["event_type"])
        assert want[key] == r["state_hash"]


def test_versioned_stream_stateful_counter(spark, events_stream):
    from earcrawler_spark.streaming.monitor import versioned_stream

    stream, batch = events_stream
    name = _run_to_memory(versioned_stream(stream), "t_version", "append")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) == batch.count()
    got = {(r["user_id"], r["event_type"], r["event_id"]): r["version"] for r in rows}
    # single-file source => one micro-batch per group => versions must
    # exactly equal the batch row_number semantics
    from pyspark.sql import Window as W

    want = {
        (r["user_id"], r["event_type"], r["event_id"]): r["version"]
        for r in batch.withColumn(
            "version",
            F.row_number().over(
                W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
            ),
        ).collect()
    }
    assert got == want


def test_session_rollup_matches_batch_sessionizer(spark, events_stream):
    from earcrawler_spark.streaming.monitor import session_rollup

    stream, batch = events_stream
    name = _run_to_memory(session_rollup(stream), "t_sess", "append")
    got = spark.sql(f"SELECT * FROM {name}").collect()
    assert got
    # session_window semantics == batch lag+flag-sum sessionizer: compare
    # (user, n_events, value) multisets
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_min = (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")) / 60.0
    sess = (
        batch.withColumn(
            "new_session", F.when(gap_min.isNull() | (gap_min >= 30), 1).otherwise(0)
        )
        .withColumn("sno", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sno")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("v"))
    )
    from collections import Counter

    want = Counter((r["user_id"], r["n_events"], r["v"]) for r in sess.collect())
    have = Counter((r["user_id"], r["n_events"], r["session_value"]) for r in got)
    # append mode holds back sessions not yet finalized by the final
    # watermark — emitted sessions must be a subset of the batch result
    # and cover nearly all of it
    assert not (have - want), f"stream emitted sessions absent from batch: {(have - want).most_common(3)}"
    missing = sum((want - have).values())
    assert missing <= max(5, 0.05 * sum(want.values())), f"too many unemitted sessions: {missing}"


def test_incident_attribution_matches_batch_join(spark, events_stream):
    """Stream-stream watermarked join emits exactly the batch theta-join
    pair set (the gold-standard equality, same as the other operators)."""
    from earcrawler_spark.streaming.monitor import incident_attribution

    stream, batch = events_stream
    name = _run_to_memory(
        incident_attribution(stream).select("p_id", "e_id"),
        "incident_pairs",
        "append",
    )
    got = sorted(
        (r["p_id"], r["e_id"]) for r in spark.sql(f"select * from {name}").collect()
    )
    pts = batch.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    ivl = batch.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    want = sorted(
        (r["p_id"], r["e_id"])
        for r in pts.join(
            ivl,
            F.expr(
                "user_id = e_user AND p_ts >= e_ts"
                " AND p_ts < e_ts + interval 2 hours"
            ),
        ).collect()
    )
    assert got == want and len(want) > 0


def test_incident_attribution_late_data_watermark(spark, tmp_path):
    """Late-data contract (the one behavior the batch twin can't
    witness): a point event arriving AFTER the watermark has passed its
    event time is dropped — its pair is NOT emitted even though the
    batch theta join would produce it — while a late-but-inside-the-
    watermark event still joins.  Also asserts the dropped-row
    accounting the progress metrics report matches."""
    import datetime as dt

    from earcrawler_spark.streaming.monitor import incident_attribution

    T0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, ts, u, et, 1.0) for i, (ts, u, et) in enumerate(rows, start=100)],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        ).withColumn("event_id", F.col("event_id") + F.lit(0))

    src = tmp_path / "late_src"
    src.mkdir()
    # file 1: u1 incident at T0; u2 incident at T0+9h; u3 purchase at
    # T0+10h (matches nothing) advances the POINT side's watermark —
    # the global watermark is the MIN across both withWatermark nodes,
    # so both sides must see data: after batch 1 it is
    # min(T0+10h, T0+9h) - 1h = T0+8h
    f1 = [
        (T0, 1, "error"),
        (T0 + dt.timedelta(hours=9), 2, "error"),
        (T0 + dt.timedelta(hours=10), 3, "purchase"),
    ]
    mk(f1).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    schema = spark.read.parquet(str(src / "f1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = incident_attribution(stream).select("p_id", "e_id")
    q = (
        out.writeStream.format("memory")
        .queryName("late_pairs")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # file 2 (arrives after the watermark advanced): u1 purchase at
        # T0+30min — inside u1's incident window but BELOW the T0+8h
        # watermark (late beyond tolerance -> dropped); u2 purchase at
        # T0+9h30m — above the watermark, joins u2's incident
        f2 = [
            (T0 + dt.timedelta(minutes=30), 1, "purchase"),
            (T0 + dt.timedelta(hours=9, minutes=30), 2, "purchase"),
        ]
        mk(f2).coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
    finally:
        q.stop()

    got = {
        (r["p_id"], r["e_id"])
        for r in spark.sql("select * from late_pairs").collect()
    }
    # only the within-watermark pair (u2's purchase id 101 -> incident 101
    # of file1) emits; u1's late purchase (id 100 of file2) is dropped
    assert got == {(101, 101)}, got
    # the watermark contract's accounting: exactly the one late point row
    # was dropped by the watermark
    assert dropped == 1, dropped
