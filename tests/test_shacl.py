"""SHACL shape validation: conforming graph -> 0 violations; every
seeded violation class is detected with the right constraint kind."""

from __future__ import annotations

from earcrawler_spark.operators.shacl import (
    REFERENCE_SHAPES,
    shape_violations,
)
from earcrawler_spark.queries_shacl import _ear_triples

SF = "/root/testdata/sf0.001"


def test_clean_graph_conforms(spark):
    t = _ear_triples(spark, SF, seed_violations=False)
    assert shape_violations(t, REFERENCE_SHAPES).count() == 0


def test_seeded_violations_detected(spark):
    t = _ear_triples(spark, SF, seed_violations=True)
    rows = shape_violations(t, REFERENCE_SHAPES).collect()
    got = {(r["shape"], r["violation"], r["path"]) for r in rows}
    # entity: bad IRI, missing name, duplicate name, duplicate country
    assert ("EntityShape", "node_pattern", None) in got
    assert ("EntityShape", "min_count", "ear:name") in got
    assert ("EntityShape", "max_count", "ear:name") in got
    assert ("EntityShape", "max_count", "ear:country") in got
    # part: bad IRI, missing/bad notation, duplicate title
    assert ("PartShape", "node_pattern", None) in got
    assert ("PartShape", "min_count", "ear:notation") in got
    assert ("PartShape", "value_pattern", "ear:notation") in got
    assert ("PartShape", "max_count", "ear:title") in got
    # nothing else fires
    assert {v for _, v, _ in got} <= {
        "node_pattern", "min_count", "max_count", "value_pattern"
    }


def test_explicit_tiny_graph(spark):
    rows = [
        # conforming entity
        ("https://ear.example.org/entity/e1", "rdf:type", "ear:Entity"),
        ("https://ear.example.org/entity/e1", "ear:name", "Acme"),
        ("https://ear.example.org/entity/e1", "ear:source", "tradegov"),
        # entity with 2 names + no source
        ("https://ear.example.org/entity/e2", "rdf:type", "ear:Entity"),
        ("https://ear.example.org/entity/e2", "ear:name", "A"),
        ("https://ear.example.org/entity/e2", "ear:name", "B"),
        # non-focus noise is ignored
        ("urn:x", "ear:name", "ignored"),
    ]
    t = spark.createDataFrame(rows, "s string, p string, o string")
    got = {
        (r["focus"], r["violation"], r["path"])
        for r in shape_violations(t, REFERENCE_SHAPES).collect()
    }
    assert got == {
        ("https://ear.example.org/entity/e2", "max_count", "ear:name"),
        ("https://ear.example.org/entity/e2", "min_count", "ear:source"),
    }
