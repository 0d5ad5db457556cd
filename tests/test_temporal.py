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


def test_fuzz_temporal_requests(spark):
    """300 random questions/params vs a model of resolve_temporal_request
    (rag/temporal.py:132-176)."""
    import random
    from datetime import datetime

    from pyspark.sql import functions as F

    from earcrawler_spark.queries_rag import resolve_temporal_requests

    def norm_iso(v):
        raw = str(v or "").strip()
        if not raw:
            return None
        try:
            return datetime.fromisoformat(raw).date().isoformat()
        except ValueError:
            return None

    def extract(text):
        import re
        seen, out = set(), []
        for m in re.finditer(r"\b(\d{4}-\d{2}-\d{2})\b", text or ""):
            n = norm_iso(m.group(1))
            if n and n not in seen:
                seen.add(n)
                out.append(n)
        return out

    def model(q, param):
        qd = extract(q)
        if param:
            conflicts = [v for v in qd if v != param]
            return (True, param, "parameter", qd,
                    "conflicting_effective_dates" if conflicts else None)
        if len(qd) > 1:
            return (True, None, "question", qd, "multiple_dates_in_question")
        if len(qd) == 1:
            return (True, qd[0], "question", qd, None)
        return (False, None, None, qd, None)

    rng = random.Random(7)
    dates = ["2020-06-15", "2021-01-02", "2020-02-30", "2021-13-01",
             "2019-12-31", "2020-06-15"]
    rows = []
    for i in range(300):
        words = []
        for _ in range(rng.randint(0, 4)):
            words.append(rng.choice(["as of", "on", "since", "until", "x"]))
            if rng.random() < 0.7:
                words.append(rng.choice(dates))
        q = " ".join(words)
        param = rng.choice([None, None, "2020-06-15", "2019-12-31"])
        rows.append((i, q, param))
    df = spark.createDataFrame(rows, "q_id int, question string, param string")
    got = {
        r["q_id"]: (r["requested"], r["effective_date"], r["source"],
                     r["question_dates"], r["refusal_reason"])
        for r in resolve_temporal_requests(df, param_col="param").collect()
    }
    for i, q, param in rows:
        w = model(q, param)
        want = (w[0], w[1], w[2], "|".join(w[3]), w[4])
        assert got[i] == want, (q, param, got[i], want)
