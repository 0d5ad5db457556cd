"""Physical-plan regression guards: the properties that make these
queries viable at 100 TB must stay true (filter pushdown, column
pruning, broadcast dims, codegen) — checked against .explain output."""

from __future__ import annotations

import contextlib
import io

import pytest

from earcrawler_spark.queries import QUERIES


def plan_of(spark, sf_small, name) -> str:
    df = QUERIES[name](spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_small):
    p = plan_of(spark, sf_small, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p


def test_column_pruning(spark, sf_small):
    p = plan_of(spark, sf_small, "dedup_exact")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p
    p = plan_of(spark, sf_small, "pricing_summary")
    # only needed columns, not the 11-column table
    line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in line and "l_suppkey" not in line, line


def test_dim_joins_are_broadcast(spark, sf_small):
    p = plan_of(spark, sf_small, "top_revenue_nations")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p  # all sides small at this sf; AQE/hints


def test_partial_aggregation_present(spark, sf_small):
    p = plan_of(spark, sf_small, "top_terms")
    # map-side combine: two HashAggregate levels around the exchange
    assert p.count("HashAggregate") >= 2


def test_topk_is_take_ordered(spark, sf_small):
    p = plan_of(spark, sf_small, "top_revenue_nations")
    assert "TakeOrderedAndProject" in p


def test_scalar_pipeline_stays_jvm_side(spark, sf_small):
    # the PII scrub chain must be native regexp_replace in a Project —
    # never a Python eval node (AQE's formatted output doesn't annotate
    # codegen stages pre-execution, so assert on operator kinds instead)
    p = plan_of(spark, sf_small, "pii_scrub")
    assert "regexp_replace" in p and "Project" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bm25_single_corpus_pass(spark, sf_small):
    p = plan_of(spark, sf_small, "bm25_topk")
    # one logical tokenize+agg pipeline reused for per-doc and corpus
    # stats: at most 4 physical scans (2 passes × reuse), never the 8-scan
    # naive shape
    assert p.count("Scan parquet") <= 4, p.count("Scan parquet")


@pytest.mark.parametrize("name", ["knn_bruteforce", "mention_scoring"])
def test_small_side_broadcast_not_shuffled(spark, sf_small, name):
    p = plan_of(spark, sf_small, name)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
