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


@pytest.mark.parametrize("name", ["bm25_topk", "rrf_fusion"])
def test_ranking_topk_is_distributed(spark, sf_small, name):
    # the global-window formulation (row_number over an unpartitioned
    # window on the FULL set) was the round-1 scale-killer; top-k must be
    # a TakeOrderedAndProject with the rank window only over survivors
    p = plan_of(spark, sf_small, name)
    assert "TakeOrderedAndProject" in p


def test_mention_scoring_stays_jvm_side(spark, sf_small):
    # 4-tier scoring is instr/array exprs — no Python eval in the plan
    p = plan_of(spark, sf_small, "mention_scoring")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_reconcile_v2_blocking_joins_shapes(spark, sf_small):
    # inspect the RAW pipeline plan — the registered query serves a
    # shared localCheckpoint (decisions-table contract), which shows as
    # a materialized scan
    from earcrawler_spark.queries_fidelity import build_decided_pairs

    df = build_decided_pairs(spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # hot-bucket size filter and override table ride broadcast joins; the
    # JW feature is the one sanctioned Arrow-batched UDF
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # Arrow-batched, never row-at-a-time (the planner may materialize the
    # JW projection in up to two stages)
    assert 1 <= p.count("ArrowEvalPython") <= 2, p.count("ArrowEvalPython")
    assert "BatchEvalPython" not in p


def test_chunking_sections_single_pass(spark, sf_small):
    # one exploded-lines aggregation feeds every container branch as
    # per-section array expressions — the multi-branch DAG formulation
    # cost 56 parquet scans / 114 exchanges
    p = plan_of(spark, sf_small, "chunking_sections")
    assert p.count("Scan parquet") <= 4, p.count("Scan parquet")
    assert p.count("Exchange") <= 8, p.count("Exchange")


def test_record_merge_full_partial_aggregation(spark, sf_small):
    p = plan_of(spark, sf_small, "record_merge_full")
    # map-side combine on the entity-bucket and scalar groupBys
    assert p.count("HashAggregate") >= 2 or p.count("ObjectHashAggregate") >= 2


def test_citation_boost_stays_jvm_side(spark, sf_small):
    # extraction/canonicalization/argmax are pure Column exprs
    p = plan_of(spark, sf_small, "citation_boost")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_rag_context_plan_shape(spark, sf_small):
    # raw builder — the registered query serves a shared localCheckpoint
    from earcrawler_spark.queries_rag import build_rag_context

    df = build_rag_context(spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # over-fetch top-k stages compile to bounded heaps, not global sorts
    assert "TakeOrderedAndProject" in p
    # the 1-row query-vector / stats sides broadcast
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


@pytest.mark.parametrize("name", ["claims_extraction", "evidence_resolution",
                                  "temporal_requests", "label_inference"])
def test_eval_queries_stay_jvm_side(spark, sf_small, name):
    # the eval text ops are regex/array Column exprs — no Python eval
    p = plan_of(spark, sf_small, name)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


ROUND4_QUERIES = [
    "groundedness_gate", "groundedness_reasons", "phase2_contract_gate",
    "eval_schema_violations", "index_binding", "kg_expansion_index",
    "citation_scores_agg", "retrieval_compare", "llm_output_violations",
]


@pytest.mark.parametrize("name", ROUND4_QUERIES)
def test_round4_queries_stay_jvm_side(spark, sf_small, name):
    """Every round-4 query is pure Column expressions + joins — no
    Python eval nodes in the plan."""
    p = plan_of(spark, sf_small, name)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def _global_windows(plan: str) -> list[str]:
    """Window operators with no partition spec: their formatted-plan
    Arguments line has two bracket groups ([funcs], [order]) instead of
    three ([funcs], [partition], [order])."""
    lines = plan.splitlines()
    bad = []
    for i, l in enumerate(lines):
        if l.strip().endswith("Window") and l.strip().startswith("("):
            for j in range(i + 1, min(i + 4, len(lines))):
                if lines[j].startswith("Arguments:"):
                    # two bracket groups = [funcs], [X].  X is an ORDER
                    # spec (=> no partition: the bad shape) when it
                    # carries sort direction markers; a partition-only
                    # window ([funcs], [partition cols]) is fine.
                    if lines[j].count("], [") < 2:
                        tail = lines[j].rsplit("], [", 1)[-1]
                        if " ASC" in tail or " DESC" in tail:
                            bad.append(lines[j][:160])
                    break
    return bad


def test_no_unpartitioned_windows_anywhere(spark, sf_small):
    """No registered query's plan may contain an ORDERED window with an
    empty partition spec (the round-3 fr_coverage defect class) — the
    legitimate bounded global orderings all use the non-foldable
    constant partition key idiom, which keeps a partition group."""
    flagged = {}
    for name in QUERIES:
        p = plan_of(spark, sf_small, name)
        bad = _global_windows(p)
        if bad:
            flagged[name] = bad[0]
    assert flagged == {}, flagged


def test_global_window_detector_actually_detects(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    import contextlib, io

    d = spark.range(10).withColumn("rn", F.row_number().over(W.orderBy("id")))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        d.explain("formatted")
    assert len(_global_windows(buf.getvalue())) == 1
