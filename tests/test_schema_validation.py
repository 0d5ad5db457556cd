"""Eval dataset schema validation: every rule fires on its seeded
defect, clean items produce zero violation rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from earcrawler_spark.queries_schema import q_eval_schema_violations

SF = "/root/testdata/sf0.001"

ALL_RULES = {
    "id_required", "question_required", "ground_truth_answer_required",
    "ear_section_pattern", "doc_id_pattern", "span_id_pattern",
    "doc_id_unregistered", "span_id_unregistered", "kg_node_legacy",
    "kg_node_namespace", "kg_node_unregistered", "kg_path_unregistered",
    "effective_date_pattern", "regression_outcome_enum",
    "kg_entity_legacy", "kg_entity_namespace",
}


def test_every_rule_fires_and_clean_items_are_clean(spark):
    out = q_eval_schema_violations(spark, SF).cache()
    rules = {r["rule"] for r in out.select("rule").distinct().collect()}
    assert rules == ALL_RULES, ALL_RULES - rules
    # a line with none of the seeded defect conditions must be absent:
    # doc 1 (odd, not divisible by any seed modulus; kg_path path-1 is
    # registered)
    clean = out.filter(F.col("line") == 1).count()
    assert clean == 0
    # seeded defects land on the expected lines
    by_line = {
        (r["line"], r["rule"]) for r in out.collect()
    }
    assert (0, "id_required") in by_line          # 0 % 23 == 0
    assert (8, "ear_section_pattern") in by_line  # EAR-9999.1 seeded
    assert (12, "doc_id_pattern") in by_line      # D12 seeded
    assert (15, "span_id_pattern") in by_line     # 'weird span'
    assert (9, "kg_node_legacy") in by_line       # legacy IRI
    assert (3, "kg_path_unregistered") in by_line # path-3 at line 3
    assert (18, "kg_entity_legacy") in by_line    # legacy entity IRI
    assert (22, "kg_entity_namespace") in by_line # non-canonical entity
    assert (19, "effective_date_pattern") in by_line
    assert (21, "regression_outcome_enum") in by_line
    out.unpersist()


def test_index_binding_verdicts(spark):
    from earcrawler_spark.queries_schema import q_index_binding

    rows = {r["index_id"]: r for r in q_index_binding(spark, SF).collect()}
    assert rows["idx-good"]["binding_ok"] and rows["idx-good"]["refusal"] is None
    assert rows["idx-wrong-model"]["refusal"] == "embedding_model mismatch"
    assert rows["idx-stale"]["refusal"] == "corpus_digest mismatch"
    assert rows["idx-partial"]["refusal"] == "doc_count mismatch"
    # model mismatch wins over any later check, mirroring the reference's
    # check order
    assert not rows["idx-wrong-model"]["binding_ok"]
