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


def test_policy_hints_loader(spark, tmp_path):
    """load_hints/hints_manifest parity (policy/__init__.py) + the hint
    upsert riding apply_graph_update like upsert_policy_hint.sparql."""
    from earcrawler_spark.policy import hints_df, hints_manifest, load_hints

    p = tmp_path / "hints.yml"
    p.write_text(
        "hints:\n"
        "  - part: '744'\n    program: EAR-EXPORT\n    priority: 2\n"
        "    rationale: core\n"
        "  - part: '736'\n    program: GENERAL\n",
        encoding="utf-8",
    )
    hints = load_hints(str(p))
    assert hints == [
        {"part": "744", "program": "EAR-EXPORT", "priority": 2.0,
         "rationale": "core"},
        {"part": "736", "program": "GENERAL", "priority": 0.0,
         "rationale": ""},
    ]
    # manifest sorted by (part, program), keys sorted
    m = hints_manifest(hints)
    assert m.index('"part": "736"') < m.index('"part": "744"')
    assert load_hints(str(tmp_path / "missing.yml")) == []

    # hint upsert = the proven DELETE/INSERT merge
    df = hints_df(spark, hints)
    from pyspark.sql import functions as F

    triples = df.select(
        F.concat(F.lit("part:"), "part").alias("s"),
        F.lit("ear:hasPolicyHint").alias("p"),
        F.concat(F.lit("hint:"), "part", F.lit(":"), "program").alias("o"),
    )
    base = spark.createDataFrame(
        [("part:744", "ear:hasPolicyHint", "hint:744:EAR-EXPORT")],
        "s string, p string, o string",
    )
    after = apply_graph_update(base, triples, triples)
    assert after.count() == 2  # dedup + re-upsert of the existing edge
