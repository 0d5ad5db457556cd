"""applyInPandasWithState sessionizer vs the batch sessionization query:
the stream replays the SAME events in time-ordered micro-batches plus a
final flush-sentinel batch, and must emit exactly the batch query's
(user_id, session_no, n_events, session_value) rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from earcrawler_spark.queries_windows import q_sessionization
from earcrawler_spark.streaming.sessions import FLUSH_EVENT, sessionize_stream

from .conftest import SF_SMALL

N_CHUNKS = 4


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = tmp_path / "stream_src"
    src.mkdir()

    # stage time-ordered chunk files (per-user in-order arrival — the
    # operator's documented contract) so sessions straddle micro-batches
    ordered = events.orderBy("ts", "event_id").collect()
    step = (len(ordered) + N_CHUNKS - 1) // N_CHUNKS
    for i in range(N_CHUNKS):
        chunk = ordered[i * step : (i + 1) * step]
        if chunk:
            spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(
                str(src / f"tmp_{i:02d}")
            )
    # final batch: one flush sentinel per user, after all real events
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinels = (
        events.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(max_ts).alias("ts"),
            "user_id",
            F.lit(FLUSH_EVENT).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("").alias("props"),
        )
    )
    sentinels.coalesce(1).write.parquet(str(src / f"tmp_{N_CHUNKS:02d}"))

    # flatten each chunk dir's part-file into the source dir, in order
    import shutil

    for i in range(N_CHUNKS + 1):
        d = src / f"tmp_{i:02d}"
        if not d.exists():
            continue
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.move(str(part), str(src / f"chunk_{i:02d}.parquet"))
        shutil.rmtree(d)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, r.session_no): (r.n_events, r.session_value)
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    want = {
        (r.user_id, r.session_no): (r.n_events, r.session_value)
        for r in q_sessionization(spark, SF_SMALL).collect()
    }
    assert got == want
    # sessions genuinely straddle micro-batches (multi-event sessions exist)
    assert any(n > 1 for n, _ in got.values())
