"""Identifier-consistency gate semantics (check_id_consistency.py parity)."""

from pyspark.sql import functions as F

from earcrawler_spark.operators.id_consistency import (
    SECTION_IRI_PREFIX,
    legacy_token_to_section,
    pct_unquote,
    scan_kg_sections,
)


def _unquote_model(s: str) -> str:
    from urllib.parse import unquote

    return unquote(s)


def test_pct_unquote_matches_urllib(spark):
    vals = [
        "EAR-736.2%28a%29", "EAR-736%2E2", "plain", "a%2Fb%2fc",
        "%41%42c", "trailing%", "%G1bad", "%%28", "a%20b%7e",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["u"]
        for r in df.select("s", pct_unquote(F.col("s")).alias("u")).collect()
    }
    for v in vals:
        assert got[v] == _unquote_model(v), v


def test_legacy_token_grammar(spark):
    # check_id_consistency.py:229-241: 3-digit part, numeric second
    # token, remaining tokens lowercase paren tails; else None.
    cases = {
        "736_2": "EAR-736.2",
        "736_2_B": "EAR-736.2(b)",
        "740_1_a_2": "EAR-740.1(a)(2)",
        "12_3": None,      # part not 3-digit
        "736": None,       # single token
        "736_x": None,     # second token not numeric
        "abc_2": None,
    }
    df = spark.createDataFrame([(k,) for k in cases], "t string")
    got = {
        r["t"]: r["sec"]
        for r in df.select(
            "t", legacy_token_to_section(F.col("t")).alias("sec")
        ).collect()
    }
    assert got == cases


def test_scan_and_classification_precedence(spark):
    pre = SECTION_IRI_PREFIX
    lines = spark.createDataFrame(
        [
            # expected-IRI hit
            (f"<{pre}EAR-700.1> a ex:Section .",),
            # duplicate: two distinct encodings of the same section
            (f"<{pre}EAR-700.2> x . <{pre}EAR-700%2E2> y .",),
            # noncanonical single (encoding differs from expected)
            (f"<{pre}EAR-700%2E3> a ex:Section .",),
            # legacy-only section
            ("stmt ear:s_700_4 .",),
            # invalid legacy token is dropped
            ("junk ear:s_12_x .",),
        ],
        "line string",
    )
    canonical, legacy = scan_kg_sections(lines)
    canon = canonical.groupBy("section_id").agg(
        F.countDistinct("iri").alias("n")
    )
    got = {r["section_id"]: r["n"] for r in canon.collect()}
    assert got == {"EAR-700.1": 1, "EAR-700.2": 2, "EAR-700.3": 1}
    assert [r["section_id"] for r in legacy.collect()] == ["EAR-700.4"]
    # the reference's classification: >1 IRIs -> duplicate even if the
    # expected IRI is among them; 1 IRI != expected -> noncanonical;
    # legacy-only -> noncanonical, not missing (:394-409)
    one = {
        r["section_id"]: r["iri"]
        for r in canonical.filter(F.col("section_id") == "EAR-700.3").collect()
    }
    assert one == {"EAR-700.3": f"{pre}EAR-700%2E3"}
