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


def test_pct_unquote_fuzz_vs_urllib(spark):
    """Seeded fuzz over the operator's documented ASCII domain: strings
    whose %-sequences are either ASCII-range hex pairs (00-7F) or
    non-hex garbage decode exactly like urllib.parse.unquote.  (Pairs
    >= 0x80 deliberately stay literal in the operator — crash-proofing
    against malformed standalone UTF-8 bytes — so they are excluded
    from the equivalence domain.)"""
    import random

    rng = random.Random(42)
    # no lone "%" atom: a trailing "%" would pair with the next atom's
    # leading hex chars ("EAR.." -> %EA = 0xEA) and leave the ASCII
    # equivalence domain
    atoms = ["%41", "%7e", "%28", "%29", "%2F", "%2e", "%00", "%zz",
             "%G1", "%%", "abc", "EAR-736.2", ".", "-", "~", "§", " ",
             "(", ")", "/", "%6a%6B", "%25"]
    import re as _re

    vals = [
        "".join(rng.choice(atoms) for _ in range(rng.randint(0, 8)))
        for _ in range(300)
    ]
    # keep the equivalence domain: no %-pair >= 0x80 anywhere (atom
    # concatenation can form them, e.g. '%%' + 'abc' -> '%ab')
    vals = [
        v for v in vals
        if v and not _re.search(r"%[89a-fA-F][0-9a-fA-F]", v)
    ]
    df = spark.createDataFrame([(v,) for v in set(vals)], "s string")
    got = {
        r["s"]: r["u"]
        for r in df.select(
            "s", pct_unquote(F.col("s")).alias("u")
        ).collect()
    }
    bad = {
        v: (got[v], _unquote_model(v))
        for v in got
        if got[v] != _unquote_model(v)
    }
    assert bad == {}, list(bad.items())[:5]


def test_legacy_token_fuzz_vs_model(spark):
    """Seeded fuzz of _legacy_token_to_section_id over the token
    grammar's edge space (check_id_consistency.py:229-241)."""
    import random
    import re as _re

    def model(body: str):
        tokens = [t for t in str(body).split("_") if t]
        if len(tokens) < 2:
            return None
        if not (tokens[0].isdigit() and len(tokens[0]) == 3):
            return None
        if not tokens[1].isdigit():
            return None
        sec = f"{tokens[0]}.{tokens[1]}"
        for tok in tokens[2:]:
            sec += f"({tok.lower()})"
        # normalize_ear_section_id on the built body
        m = _re.match(
            r"^(\d{3}(?:\.\d+[a-z0-9]*)*)((?:\([a-z0-9]+\))*)$", sec.lower()
        )
        return f"EAR-{sec.lower()}" if m else None

    rng = random.Random(7)
    pieces = ["736", "74", "0", "2", "b", "B2", "x", "", "12a", "9999"]
    vals = {
        "_".join(rng.choice(pieces) for _ in range(rng.randint(1, 5)))
        for _ in range(400)
    }
    vals = {v for v in vals if v}
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = {
        r["t"]: r["sec"]
        for r in df.select(
            "t", legacy_token_to_section(F.col("t")).alias("sec")
        ).collect()
    }
    bad = {v: (got[v], model(v)) for v in got if got[v] != model(v)}
    assert bad == {}, list(bad.items())[:5]
