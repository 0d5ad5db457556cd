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


def test_fuzz_graph_update(spark):
    """40 random (graph, inserts, deletes) triples-universe cases vs a
    set model of DELETE-patterns-then-INSERT-DATA."""
    import random

    rng = random.Random(99)
    S = [f"s{i}" for i in range(6)]
    P = ["p1", "p2"]
    O = [f"o{i}" for i in range(5)]

    def model(base, ins, dels):
        kept = {
            t for t in base
            if not any(
                d[0] == t[0] and d[1] == t[1] and (d[2] is None or d[2] == t[2])
                for d in dels
            )
        }
        return kept | set(ins)

    for trial in range(40):
        base = {(rng.choice(S), rng.choice(P), rng.choice(O))
                for _ in range(rng.randint(0, 12))}
        ins = {(rng.choice(S), rng.choice(P), rng.choice(O))
               for _ in range(rng.randint(0, 6))}
        dels = [
            (rng.choice(S), rng.choice(P),
             rng.choice(O) if rng.random() < 0.6 else None)
            for _ in range(rng.randint(0, 4))
        ]
        schema = "s string, p string, o string"
        after = apply_graph_update(
            _g(spark, sorted(base)) if base else spark.createDataFrame([], schema),
            _g(spark, sorted(ins)) if ins else spark.createDataFrame([], schema),
            spark.createDataFrame(dels, schema) if dels else None,
        )
        got = {tuple(r) for r in after.collect()}
        want = model(base, ins, dels)
        assert got == want, (trial, sorted(base), sorted(ins), dels, got ^ want)
