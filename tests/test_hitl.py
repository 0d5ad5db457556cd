"""HITL decision-event coercion parity (audit/hitl_events.py:83-111)."""

from pyspark.sql import functions as F


def _as_bool_model(value) -> bool:
    # reference _as_bool: strip+lower membership in the truthy set
    raw = str(value or "").strip().lower()
    return raw in {"1", "true", "yes", "y", "on"}


def _as_int_model(value) -> int:
    raw = str(value or "").strip()
    if not raw:
        return 0
    try:
        return int(raw)
    except ValueError:
        return 0


def test_hitl_coercions_match_reference_model(spark):
    vals = [
        "true", "TRUE", " YES ", "y", "on", "1", "false", "", "0", "no",
        "1200", "-50", "notanum", " 88 ", "+7",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = df.select(
        "s",
        F.lower(F.trim(F.col("s")))
        .isin("1", "true", "yes", "y", "on")
        .alias("b"),
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(
                F.trim(F.col("s")).try_cast("long"), F.lit(0).cast("long")
            ),
        ).alias("i"),
    ).collect()
    for r in got:
        assert r["b"] == _as_bool_model(r["s"]), r["s"]
        assert r["i"] == max(0, _as_int_model(r["s"])), r["s"]
