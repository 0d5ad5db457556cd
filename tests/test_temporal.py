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


# --- bucketed interval join ---------------------------------------------------


def _ij(spark, points, intervals, bucket, keys=()):
    from earcrawler_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(points, "pid long, k long, p long")
    ivl = spark.createDataFrame(intervals, "iid long, k long, s long, e long")
    return interval_join(
        pts, ivl, "p", "s", "e", bucket, keys=(("k",) if keys else ())
    )


def test_interval_join_half_open_boundaries(spark):
    # point == start included, point == end excluded
    got = _ij(
        spark,
        [(1, 0, 100), (2, 0, 200), (3, 0, 150)],
        [(10, 0, 100, 200)],
        bucket=64,
    ).select("pid", "iid").collect()
    assert sorted((r.pid, r.iid) for r in got) == [(1, 10), (3, 10)]


def test_interval_join_pair_met_exactly_once_across_buckets(spark):
    # interval spans many buckets; each matching point pairs exactly once
    pts = [(i, 0, 1000 + i * 7) for i in range(50)]
    got = _ij(spark, pts, [(10, 0, 990, 1400)], bucket=16).collect()
    want = {p[0] for p in pts if 990 <= p[2] < 1400}
    assert sorted(r.pid for r in got) == sorted(want)


def test_interval_join_end_on_bucket_boundary_owes_no_replica(spark):
    # interval [0, 64) with bucket 64 must not match a point in bucket 1
    got = _ij(spark, [(1, 0, 64), (2, 0, 63)], [(10, 0, 0, 64)], bucket=64).collect()
    assert [r.pid for r in got] == [2]


def test_interval_join_keys_partition_matches(spark):
    got = _ij(
        spark,
        [(1, 1, 50), (2, 2, 50)],
        [(10, 1, 0, 100), (11, 2, 40, 60), (12, 3, 0, 100)],
        bucket=32,
        keys=True,
    ).select("pid", "iid").collect()
    assert sorted((r.pid, r.iid) for r in got) == [(1, 10), (2, 11)]


def test_interval_join_plans_as_equi_join(spark):
    # the whole point of the operator: no BroadcastNestedLoopJoin even
    # when the interval side is too big to broadcast
    from earcrawler_spark.operators.temporal import interval_join

    pts = spark.range(1000).selectExpr("id as pid", "id * 13 as p")
    ivl = spark.range(1000).selectExpr("id as iid", "id * 11 as s", "id * 11 + 40 as e")
    plan = interval_join(
        pts.hint("merge"), ivl, "p", "s", "e", 32
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_matches_bruteforce_dense_random(spark):
    # one seeded dense case: zero-length / boundary-aligned / long-span
    # intervals, duplicate points, several keys, bucket much smaller
    # than the longest span — compared row-for-row to the O(n*m) model
    import random

    from earcrawler_spark.operators.temporal import interval_join

    rng = random.Random(20260818)
    pts = [
        (i, rng.randrange(4), rng.randrange(-50, 450))
        for i in range(300)
    ]
    ivl = []
    for j in range(120):
        s = rng.randrange(-60, 420)
        span = rng.choice([0, 1, 7, 32, 64, 65, 200])
        ivl.append((j, rng.randrange(4), s, s + span))
    want = sorted(
        (p[0], v[0])
        for p in pts
        for v in ivl
        if p[1] == v[1] and v[2] <= p[2] < v[3]
    )
    got = interval_join(
        spark.createDataFrame(pts, "pid long, k long, p long"),
        spark.createDataFrame(ivl, "iid long, k long, s long, e long"),
        "p", "s", "e", 32, keys=("k",),
    ).select("pid", "iid").collect()
    assert sorted((r.pid, r.iid) for r in got) == want
