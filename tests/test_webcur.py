"""Invariants of the queries_webcur batch beyond the DuckDB oracle:
fixture non-degeneracy (the rules actually split the corpus), quota
bounds, HITS normalization, span-sequence audit health."""

from pyspark.sql import functions as F

from earcrawler_spark.queries_webcur import (
    QUOTA_K,
    _SCALE,
    q_domain_quota,
    q_gopher_rules,
    q_hits_scores,
    q_span_integrity,
)

from .conftest import SF_SMALL


def test_gopher_rules_split_corpus(spark):
    rows = q_gopher_rules(spark, SF_SMALL).collect()
    passed = [r for r in rows if r.passes]
    failed = [r for r in rows if not r.passes]
    # the rule ladder must actually discriminate, or the query is a no-op
    assert passed and failed
    for r in rows:
        assert r.passes == (r.failed_rules == "")
        # code order is fixed: W before L before S... (subsequence of WLSBEAT)
        codes = "WLSBEAT"
        idx = [codes.index(c) for c in r.failed_rules]
        assert idx == sorted(idx)
        # word-count rule consistent with the metric it gates
        assert ("W" in r.failed_rules) == (r.n_words < 50 or r.n_words > 100000)


def test_domain_quota_bounds(spark):
    rows = q_domain_quota(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.kept <= QUOTA_K
        assert r.kept + r.dropped == r.total
        assert r.kept_chars >= r.kept_min_chars * r.kept >= 0


def test_hits_normalized_to_scale(spark):
    df = q_hits_scores(spark, SF_SMALL)
    agg = df.agg(
        F.max("auth_micro").alias("ma"),
        F.max("hub_micro").alias("mh"),
        F.min("auth_micro").alias("na"),
        F.min("hub_micro").alias("nh"),
    ).collect()[0]
    # max-normalization pins the top node to exactly the micro scale
    assert agg.ma == _SCALE and agg.mh == _SCALE
    assert agg.na >= 0 and agg.nh >= 0


def test_span_integrity_all_ordered(spark):
    rows = q_span_integrity(spark, SF_SMALL).collect()
    assert rows
    assert all(r.order_ok and r.first_is_text for r in rows)
    assert all(r.n_spans == r.n_media + 1 for r in rows)
    assert len({r.seq_sha for r in rows}) > 1
