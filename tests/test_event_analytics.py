"""Model tests for the round-6 event-analytics queries: ordered funnel
(min-time propagation) and weekly retention cohorts, each checked
against a direct Python model over the same events."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "user_id", "ts", "event_type"
    ).collect()


def test_funnel_conversion_matches_model(spark):
    from earcrawler_spark.queries_windows import FUNNEL_STEPS, q_funnel_conversion

    rows = {r["step"]: r for r in q_funnel_conversion(spark, SF_SMALL).collect()}
    ev = _events(spark)
    # model: per user, earliest qualifying time per step in order
    reached_prev: dict[int, object] = {}
    want: list[int] = []
    for i, step in enumerate(FUNNEL_STEPS):
        cur: dict[int, object] = {}
        for u, ts, et in ev:
            if et != step:
                continue
            if i > 0 and (u not in reached_prev or ts < reached_prev[u]):
                continue
            if u not in cur or ts < cur[u]:
                cur[u] = ts
        want.append(len(cur))
        reached_prev = cur
    assert [rows[s]["users"] for s in FUNNEL_STEPS] == want
    # monotone shrink and rate sanity
    assert want[0] >= want[1] >= want[2]
    assert rows["view"]["conv_from_prev"] == 1.0
    assert rows["view"]["conv_from_start"] == 1.0
    assert rows["purchase"]["conv_from_start"] == round(want[2] / want[0], 6)


def test_retention_cohorts_matches_model(spark):
    from earcrawler_spark.queries_windows import q_retention_cohorts

    got = {
        (r["cohort_week"], r["offset_weeks"]): (r["active_users"], r["retention"])
        for r in q_retention_cohorts(spark, SF_SMALL).collect()
    }
    ev = _events(spark)
    uw = {(u, int(ts.timestamp()) // 604800) for u, ts, _ in ev}
    cohort = {}
    for u, w in uw:
        cohort[u] = min(cohort.get(u, w), w)
    sizes: dict[int, int] = {}
    for u, cw in cohort.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    want: dict[tuple, int] = {}
    for u, w in uw:
        key = (cohort[u], w - cohort[u])
        want[key] = want.get(key, 0) + 1
    assert {k: v[0] for k, v in got.items()} == want
    for (cw, off), (n, rate) in got.items():
        assert rate == round(n / sizes[cw], 6)
    # offset 0 is always the full cohort
    for cw, sz in sizes.items():
        assert got[(cw, 0)][0] == sz and got[(cw, 0)][1] == 1.0


def test_conversion_latency_matches_model(spark):
    """Per-cohort exact k-th order statistics reproduced by a direct
    Python model over microsecond epochs."""
    from earcrawler_spark.queries_windows import (
        LAT_PS,
        _WEEK_US,
        q_conversion_latency,
    )

    got = {
        (r["week"], r["p"]): r
        for r in q_conversion_latency(spark, SF_SMALL).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type",
            "unix_micros(cast(ts as timestamp)) as us",
        )
        .collect()
    )
    t_view: dict[int, int] = {}
    for u, et, us in ev:
        if et == "view" and (u not in t_view or us < t_view[u]):
            t_view[u] = us
    t_purch: dict[int, int] = {}
    for u, et, us in ev:
        if et == "purchase" and u in t_view and us >= t_view[u]:
            if u not in t_purch or us < t_purch[u]:
                t_purch[u] = us
    cohorts: dict[int, list[tuple[int, int]]] = {}
    for u, tp in t_purch.items():
        tv = t_view[u]
        cohorts.setdefault(tv // _WEEK_US, []).append((tp - tv, u))
    want = {}
    for wk, lats in cohorts.items():
        lats.sort()
        n = len(lats)
        for p in LAT_PS:
            k = (p * n + 99) // 100
            want[(wk, p)] = (n, lats[k - 1][0])
    assert set(got) == set(want)
    for key, (n, lat) in want.items():
        r = got[key]
        assert (r["n_conv"], r["latency_us"]) == (n, lat), key
        assert r["latency_h"] == round(lat / 3_600_000_000, 6)
