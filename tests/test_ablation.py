"""Multihop ablation compare: the expansion-on condition must strictly
dominate the expansion-off condition on the deterministic fixture, and
the ALL row must be the per-dataset sum."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_multihop_ablation_kg_gains(spark):
    from earcrawler_spark.queries_rag import q_multihop_ablation

    rows = {r["dataset_id"]: r for r in q_multihop_ablation(spark, SF).collect()}
    assert set(rows) == {"ds0", "ds1", "ds2", "ALL"}
    allr = rows["ALL"]
    # expansion can only add hits, never lose them
    assert allr["hits_on"] >= allr["hits_off"]
    # the seeded KG graph must produce real gains (the reference golden
    # test asserts deltas > 0 the same way)
    assert allr["coverage_delta"] > 0.0
    assert allr["kg_path_usage_rate"] > 0.0
    # every item is multihop (>= 2 expected sections)
    assert allr["expected_total"] >= 2 * allr["num_items"]
    # ALL is the sum of the per-dataset rows
    for col in ("num_items", "expected_total", "hits_off", "hits_on",
                "items_gained"):
        assert allr[col] == sum(rows[d][col] for d in ("ds0", "ds1", "ds2"))


def test_multihop_ablation_on_rank_never_worse(spark):
    """Per the construction: on_rank = min(direct, expanded) — coverage
    under 'on' includes every 'off' hit at the same-or-better seed rank."""
    from earcrawler_spark.queries_rag import q_multihop_ablation

    rows = q_multihop_ablation(spark, SF).collect()
    for r in rows:
        assert r["hits_on"] >= r["hits_off"]
        assert 0.0 <= r["coverage_off"] <= r["coverage_on"] <= 1.0
