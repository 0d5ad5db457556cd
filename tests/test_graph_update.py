"""SPARQL UPDATE merge semantics: wildcard deletes, INSERT DATA
idempotence, delete+reinsert netting out of the delta."""

from __future__ import annotations

from earcrawler_spark.operators.kg import apply_graph_update, graph_delta


def _g(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_apply_graph_update_semantics(spark):
    base = _g(spark, [
        ("part:001", "rdf:type", "ear:Part"),
        ("part:001", "ear:hasAnchor", "anch:a1"),
        ("part:001", "ear:hasAnchor", "anch:stale"),
        ("part:002", "dct:title", "T2"),
    ])
    inserts = _g(spark, [
        ("part:001", "ear:hasAnchor", "anch:a1"),   # delete+reinsert
        ("part:001", "rdf:type", "ear:Part"),        # already present
        ("anch:a1", "dct:title", "New"),             # genuinely new
        ("anch:a1", "dct:title", "New"),             # duplicate insert row
    ])
    deletes = _g(spark, [
        ("part:001", "ear:hasAnchor", "anch:a1"),    # exact
        ("part:002", "dct:title", None),             # wildcard object
    ])
    after = apply_graph_update(base, inserts, deletes)
    got = {tuple(r) for r in after.collect()}
    assert got == {
        ("part:001", "rdf:type", "ear:Part"),
        ("part:001", "ear:hasAnchor", "anch:a1"),
        ("part:001", "ear:hasAnchor", "anch:stale"),
        ("anch:a1", "dct:title", "New"),
    }
    # graph stays a set even with duplicate insert rows
    assert after.count() == 4

    delta = {tuple(r) for r in graph_delta(base, after).collect()}
    assert delta == {
        ("delete", "part:002", "dct:title", "T2"),
        ("insert", "anch:a1", "dct:title", "New"),
    }


def test_update_without_deletes_is_insert_data(spark):
    base = _g(spark, [("s1", "p", "o1")])
    inserts = _g(spark, [("s1", "p", "o1"), ("s2", "p", "o2")])
    after = apply_graph_update(base, inserts)
    assert after.count() == 2
