"""Branch coverage for the full temporal classifier: the
no-snapshot-at-or-before reason and both refusal outcomes
(temporal.py:226-339 contract)."""

from __future__ import annotations

import datetime as dt

from earcrawler_spark.operators.temporal import classify_temporal, refusal_reason_col

SCHEMA = (
    "doc_id long, section_id string, snapshot_date date, "
    "effective_from date, effective_to date"
)


def _d(s):
    return dt.date.fromisoformat(s)


def test_no_snapshot_at_or_before(spark):
    rows = [
        (1, "A", _d("2020-05-01"), None, None),  # only future snapshots
        (2, "A", _d("2020-06-01"), None, None),
    ]
    got = {
        r["doc_id"]: (r["temporal_status"], r["temporal_reason"])
        for r in classify_temporal(
            spark.createDataFrame(rows, SCHEMA), "2020-01-01"
        ).collect()
    }
    assert got[1] == ("future", "no_snapshot_at_or_before_query_date")
    assert got[2] == ("future", "no_snapshot_at_or_before_query_date")


def test_window_precedence_over_snapshot(spark):
    # a doc with both window and snapshot classifies by the window
    rows = [(1, "A", _d("2019-01-01"), _d("2019-12-01"), _d("2020-02-01"))]
    got = classify_temporal(
        spark.createDataFrame(rows, SCHEMA), "2020-01-01"
    ).collect()[0]
    assert got["temporal_status"] == "applicable"
    assert got["temporal_reason"] == "within_effective_window"


def test_refusal_ambiguous_vs_no_evidence(spark):
    # all unknown -> ambiguous
    rows = [(1, None, None, None, None)]
    c = classify_temporal(spark.createDataFrame(rows, SCHEMA), "2020-01-01")
    assert (
        refusal_reason_col(c).collect()[0]["refusal_reason"]
        == "temporal_evidence_ambiguous"
    )
    # all future, none unknown -> no_temporally_applicable_evidence
    rows = [(1, "A", None, _d("2021-01-01"), None)]
    c = classify_temporal(spark.createDataFrame(rows, SCHEMA), "2020-01-01")
    assert (
        refusal_reason_col(c).collect()[0]["refusal_reason"]
        == "no_temporally_applicable_evidence"
    )
    # one applicable -> no refusal
    rows = [
        (1, "A", None, _d("2021-01-01"), None),
        (2, "A", None, _d("2019-01-01"), None),
    ]
    c = classify_temporal(spark.createDataFrame(rows, SCHEMA), "2020-01-01")
    assert refusal_reason_col(c).collect()[0]["refusal_reason"] is None
