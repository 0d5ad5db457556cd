"""IRI minting vectors vs a model using urllib.parse.quote and the
reference rules (kg/iri.py:21-122)."""

from __future__ import annotations

from urllib.parse import quote

from pyspark.sql import functions as F

from earcrawler_spark.functions import iri as I

SHA = "a" * 64


def test_iri_vectors(spark):
    cases = [
        ("section", "15 CFR 744.11", I.RESOURCE_NS + "ear/section/EAR-744.11"),
        ("section", "744", I.RESOURCE_NS + "ear/section/EAR-744"),
        ("section", "ear-736.2 # note", I.RESOURCE_NS + "ear/section/" + quote("ear-736.2", safe="-._~")),
        ("section", "Part 99", I.RESOURCE_NS + "ear/section/" + quote("Part 99", safe="-._~")),
        ("paragraph", SHA.upper(), I.RESOURCE_NS + "ear/paragraph/" + SHA[:16]),
        ("paragraph", "tok 42", I.RESOURCE_NS + "ear/paragraph/tok%2042"),
        ("entity", "Acme Corp #1", I.ENTITY_NS + quote("Acme_Corp_#1", safe="-._~")),
        ("legacy", I.LEGACY_EAR + "reg", I.RESOURCE_NS + "ear/reg"),
        ("legacy", I.LEGACY_EAR + "p_" + SHA, I.RESOURCE_NS + "ear/paragraph/" + SHA[:16]),
        ("legacy", I.LEGACY_EAR + "s_736_2", I.RESOURCE_NS + "ear/section/EAR-736.2"),
        ("legacy", I.LEGACY_EAR + "entity/Acme Co", I.ENTITY_NS + "Acme_Co"),
        ("legacy", I.LEGACY_EAR + "policy/x/y", I.RESOURCE_NS + "ear/policy/x/y"),
        ("legacy", I.LEGACY_EAR + "SomeClass", I.SCHEMA_NS + "SomeClass"),
        ("legacy", I.LEGACY_ENT + "Entity", I.SCHEMA_NS + "Entity"),
        ("legacy", I.LEGACY_ENT + "FooShape", I.SCHEMA_NS + "FooShape"),
        ("legacy", I.LEGACY_ENT + "E123", I.ENTITY_NS + "E123"),
        ("legacy", "https://other.org/x", "https://other.org/x"),
        ("legacy", I.RESOURCE_NS + "ear/reg", I.RESOURCE_NS + "ear/reg"),  # idempotent
    ]
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v, _) in enumerate(cases)], "i int, kind string, v string"
    )
    fn = {
        "section": I.section_iri,
        "paragraph": I.paragraph_iri,
        "entity": I.entity_iri,
        "legacy": I.canonicalize_iri,
    }
    out = df.select(
        "i",
        *[
            F.when(F.col("kind") == k, f(F.col("v"))).alias(k)
            for k, f in fn.items()
        ],
    ).collect()
    got = {r["i"]: r[cases[r["i"]][0]] for r in out}
    for i, (kind, v, want) in enumerate(cases):
        assert got[i] == want, (kind, v, got[i], want)


def test_apply_version_suffix_vectors(spark):
    """apply_version_suffix vs the reference model (rag/temporal.py:70-83)."""
    from earcrawler_spark.functions.iri import apply_version_suffix

    def model(doc_id, suffix):
        normalized = str(doc_id or "").strip()
        s = str(suffix or "").strip()
        if not normalized or not s:
            return normalized
        if "#" not in normalized:
            return f"{normalized}#{s}"
        left, right = normalized.split("#", 1)
        if right == s or right.startswith(f"{s}:"):
            return normalized
        return f"{left}#{s}:{right}"

    cases = [
        ("EAR-744.11", "v2"),
        ("EAR-744.11#p0001", "v2"),
        ("EAR-744.11#v2", "v2"),
        ("EAR-744.11#v2:p0001", "v2"),
        ("EAR-744.11#v3:p0001", "v2"),
        ("  EAR-744.11  ", " v2 "),
        ("", "v2"),
        ("EAR-744.11", ""),
        (None, "v2"),
        ("a#b#c", "v1"),
    ]
    df = spark.createDataFrame(
        [(i, d, s) for i, (d, s) in enumerate(cases)],
        "i int, d string, s string",
    )
    got = {
        r["i"]: r["o"]
        for r in df.select(
            "i", apply_version_suffix(F.col("d"), F.col("s")).alias("o")
        ).collect()
    }
    for i, (d, s) in enumerate(cases):
        assert got[i] == model(d, s), (d, s, got[i], model(d, s))
