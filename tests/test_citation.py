"""Citation-boost operator vs a direct model of
retriever_citation_policy.py (extract/canonical/best-row/boost)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from earcrawler_spark.operators.citation import (
    apply_citation_boost,
    extract_targets,
)

_CFR_RE = re.compile(r"(?:§\s*)?(?P<section>\d{3}\.\d+(?:\([A-Za-z0-9]+\))*)")


def model_targets(prompt: str) -> list[str]:
    seen, targets = set(), []
    for m in _CFR_RE.finditer(prompt or ""):
        sec = (m.group("section") or "").strip()
        if not sec:
            continue
        exact = f"EAR-{sec}"
        if exact not in seen:
            targets.append(exact)
            seen.add(exact)
        if "(" in sec:
            base = f"EAR-{sec.split('(', 1)[0]}"
            if base not in seen:
                targets.append(base)
                seen.add(base)
    return targets


def model_canonical(row: dict) -> str | None:
    raw = row.get("section_id") or row.get("doc_id")
    if raw is None:
        return None
    sec = str(raw).strip()
    if not sec:
        return None
    if sec.upper().startswith("EAR-"):
        if "#" in sec:
            sec = sec.split("#", 1)[0].strip()
        return sec
    return None


def model_boost(prompt, results, metadata, k):
    targets = model_targets(prompt)
    if not targets:
        return list(results)
    present = set()
    for row in results:
        sec = model_canonical(row) or model_canonical({"doc_id": row.get("doc_id")})
        if sec:
            present.add(sec)
    # reference floors the baseline at 0.0 (initial value + strict >)
    mx = max([0.0] + [float(r.get("score") or 0.0) for r in results])
    out = []
    idx = 0
    for target in targets:
        if target in present:
            continue
        best, best_score = None, -1_000_000
        for row in metadata:
            if model_canonical({"section_id": row["section_id"], "doc_id": row["mdoc_id"]}) != target:
                continue
            score = 0
            if row["mdoc_id"] == target:
                score += 100
            elif row["mdoc_id"].startswith(target + "#"):
                score += 60
            if row["chunk_kind"] == "section":
                score += 10
            if row["ordinal"] == 0:
                score += 5
            if score > best_score:
                best, best_score = row, score
        if best is None:
            continue
        out.append(
            {
                "doc_id": best["mdoc_id"],
                # setdefault: an existing (even '') section_id is kept
                "section_id": best["section_id"]
                if best["section_id"] is not None
                else target,
                "score": round(mx + 1.0 - idx * 0.001, 6),
                "boost_reason": "explicit_citation",
            }
        )
        present.add(target)
        idx += 1
    if not out:
        # reference: `if not boosted: return results` — untruncated
        return list(results)
    merged = out + [
        {
            "doc_id": str(r["doc_id"]),
            "section_id": r["section_id"],
            "score": r["score"],
            "boost_reason": None,
        }
        for r in results
    ]
    return merged[: max(1, int(k))]


METADATA = [
    # target exact section row (should win: 100+10+5=115)
    {"row_id": 0, "mdoc_id": "EAR-744.11", "section_id": "EAR-744.11",
     "chunk_kind": "section", "ordinal": 0},
    # child paragraph of the same section (60)
    {"row_id": 1, "mdoc_id": "EAR-744.11#p0001", "section_id": "EAR-744.11",
     "chunk_kind": "paragraph", "ordinal": 1},
    # empty section_id, canonical comes from mdoc_id
    {"row_id": 2, "mdoc_id": "EAR-746.3#p0002", "section_id": "",
     "chunk_kind": "paragraph", "ordinal": 0},
    # opaque ids never match
    {"row_id": 3, "mdoc_id": "D3", "section_id": "",
     "chunk_kind": "paragraph", "ordinal": 2},
    # parenthesised canonical section
    {"row_id": 4, "mdoc_id": "EAR-744.11(b)", "section_id": "EAR-744.11(b)",
     "chunk_kind": "section", "ordinal": 0},
    # tie on score within EAR-746.3: earliest row_id must win
    {"row_id": 5, "mdoc_id": "EAR-746.3#p0003", "section_id": "EAR-746.3",
     "chunk_kind": "paragraph", "ordinal": 0},
]

RESULTS = [
    {"rank": 1, "doc_id": "10", "section_id": "EAR-700.1", "score": 2.5},
    {"rank": 2, "doc_id": "11", "section_id": "", "score": 1.5},
    {"rank": 3, "doc_id": "EAR-712.9#p0004", "section_id": "", "score": 1.0},
]


def _dfs(spark):
    meta = spark.createDataFrame(
        [tuple(m.values()) for m in METADATA],
        "row_id long, mdoc_id string, section_id string, chunk_kind string, ordinal int",
    )
    res = spark.createDataFrame(
        [tuple(r.values()) for r in RESULTS],
        "rank int, doc_id string, section_id string, score double",
    )
    return res, meta


def run_boost(spark, prompt, k):
    res, meta = _dfs(spark)
    out = apply_citation_boost(res, meta, extract_targets(spark, prompt), k)
    return [r.asDict() for r in out.orderBy("rank").collect()]


def test_extract_targets_order_and_dedup(spark):
    prompt = "See § 744.11(b) then 744.11 and §746.3, also 746.3 again; 99.9 no"
    got = [
        r["target"]
        for r in extract_targets(spark, prompt).orderBy("tpos").collect()
    ]
    assert got == model_targets(prompt) == [
        "EAR-744.11(b)", "EAR-744.11", "EAR-746.3"
    ]


def test_boost_matches_model_full(spark):
    # present (700.1 via result section), exact+base, canonical-from-
    # doc_id fallback, miss (999.99), tie->earliest-row
    prompt = "§ 700.1 and § 744.11(b) with 746.3 and § 712.9 but 999.99"
    got = run_boost(spark, prompt, k=6)
    want = model_boost(prompt, RESULTS, METADATA, k=6)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["doc_id"] == w["doc_id"], (g, w)
        assert g["section_id"] == w["section_id"], (g, w)
        assert abs(g["score"] - w["score"]) < 1e-9, (g, w)
        assert g["boost_reason"] == w["boost_reason"], (g, w)


def test_boost_no_targets_keeps_results(spark):
    got = run_boost(spark, "no citations here", k=3)
    assert [g["doc_id"] for g in got] == ["10", "11", "EAR-712.9#p0004"]
    assert all(g["boost_reason"] is None for g in got)


def test_boost_truncates_to_k(spark):
    prompt = "§ 744.11 and 746.3"
    got = run_boost(spark, prompt, k=3)
    want = model_boost(prompt, RESULTS, METADATA, k=3)
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]
    assert len(got) == 3
    # boosted rows displaced the tail of the original results
    assert got[0]["boost_reason"] == "explicit_citation"


def test_boost_baseline_floors_at_zero(spark):
    """All-negative result scores: the bump baseline is 0.0, not the
    negative max (reference starts max_score at 0.0 with a strict >)."""
    meta = spark.createDataFrame(
        [tuple(m.values()) for m in METADATA],
        "row_id long, mdoc_id string, section_id string, chunk_kind string, ordinal int",
    )
    neg = [
        {"rank": 1, "doc_id": "10", "section_id": "EAR-700.1", "score": -0.5},
        {"rank": 2, "doc_id": "11", "section_id": "", "score": -2.5},
    ]
    res = spark.createDataFrame(
        [tuple(r.values()) for r in neg],
        "rank int, doc_id string, section_id string, score double",
    )
    out = apply_citation_boost(
        res, meta, extract_targets(spark, "cite § 744.11"), k=5
    )
    got = [r.asDict() for r in out.orderBy("rank").collect()]
    want = model_boost("cite § 744.11", neg, METADATA, k=5)
    assert got[0]["boost_reason"] == "explicit_citation"
    assert abs(got[0]["score"] - 1.0) < 1e-9  # 0.0 + 1.0, not -0.5 + 1.0
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]


def test_no_boost_passthrough_untruncated(spark):
    """When every target misses the metadata (no boost rows), the
    reference returns results UNTRUNCATED — k does not apply."""
    got = run_boost(spark, "cite § 999.99", k=2)  # target has no metadata
    want = model_boost("cite § 999.99", RESULTS, METADATA, k=2)
    assert len(want) == 3  # model passthrough keeps all 3 despite k=2
    assert len(got) == 3
    assert all(g["boost_reason"] is None for g in got)
    # ...but a firing boost still truncates to k
    got2 = run_boost(spark, "§ 744.11 and 746.3", k=3)
    assert len(got2) == 3


def test_tie_breaks_to_earliest_metadata_row(spark):
    # EAR-746.3: row 2 (mdoc canonical, ordinal 0 -> 5) vs row 5
    # (section_id canonical, ordinal 0 -> 5): equal scores, row 2 wins
    got = run_boost(spark, "cite § 746.3", k=5)
    assert got[0]["doc_id"] == "EAR-746.3#p0002"


def test_fuzz_extract_targets(spark):
    """300 random prompts mixing citation shapes, unicode §, stray
    digits, and dupes — column extraction equals the reference regex
    model exactly (order + dedup)."""
    import random

    rng = random.Random(20260816)
    frags = [
        "§ {a}.{b}", "§{a}.{b}", "section {a}.{b}", "{a}.{b}",
        "§ {a}.{b}(b)", "{a}.{b}({c})", "§ {a}.{b}(1)(i)x",
        "part {a}", "{a}", "{a}.{b}.", "EAR {a}.{b}", "no cite here",
        "v1.2", "10.5", "§ 12.3",  # 2-digit section bodies must NOT match... (12.3 has 2 digits)
    ]
    # build prompts
    prompts = []
    for _ in range(300):
        n = rng.randint(1, 6)
        words = []
        for _ in range(n):
            f = rng.choice(frags)
            words.append(
                f.format(
                    a=rng.randint(1, 999), b=rng.randint(0, 99),
                    c=rng.choice("ab1ix"),
                )
            )
            if rng.random() < 0.3:
                words.append(rng.choice(["and", "under", "see", ",", "—"]))
        prompts.append(" ".join(words))

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(prompts)], "i int, prompt string"
    )
    from earcrawler_spark.operators.citation import CITATION_PATTERN

    pairs = F.flatten(
        F.transform(
            F.regexp_extract_all(F.col("prompt"), F.lit(CITATION_PATTERN), F.lit(1)),
            lambda m: F.array(
                F.concat(F.lit("EAR-"), m),
                F.when(
                    m.contains("("),
                    F.concat(F.lit("EAR-"), F.substring_index(m, "(", 1)),
                ),
            ),
        )
    )
    # keep-first dedup as an aggregate fold (same semantics as the
    # operator's posexplode+min-pos, expressible per-row here)
    dedup = F.aggregate(
        F.filter(pairs, lambda x: x.isNotNull()),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    got = {
        r["i"]: list(r["targets"])
        for r in df.select("i", dedup.alias("targets")).collect()
    }
    for i, p in enumerate(prompts):
        assert got[i] == model_targets(p), (p, got[i], model_targets(p))


def test_fuzz_normalize_section_full(spark):
    """300 random raw section values vs the reference normalize_section_id
    model (retrieval_runtime.py:134-148)."""
    import random
    import re as _re

    from earcrawler_spark.operators.citation import normalize_section_full

    _SEC_RE = _re.compile(
        r"^(?:15\s*CFR\s*)?(?:§+\s*)?(?P<section>\d{3}(?:\.\S+)?)$", _re.IGNORECASE
    )

    def model(value):
        raw = str(value or "").strip()
        if not raw:
            return None
        if raw.upper().startswith("EAR-"):
            if "#" in raw:
                raw = raw.split("#", 1)[0].strip()
            return raw
        cleaned = raw.strip().rstrip(".,;:")
        cleaned = _re.sub(r"^§+\s*", "", cleaned).strip()
        m = _SEC_RE.match(cleaned)
        if m:
            return f"EAR-{m.group('section')}"
        return raw

    rng = random.Random(555)
    frags = [
        "EAR-744.11", "ear-702.4(b)", "EAR-744.11#p0001", " EAR-1 # x ",
        "§ 744.11", "§§744.11(b)", "15 CFR 744.11", "15CFR736.2", "736",
        "736.2.", "736.2;,:", "part 744", "hello world", "", "   ",
        "99.9", "9999.1", "§", "744.11 extra", "15 CFR", "EAR-",
    ]
    cases = [rng.choice(frags) for _ in range(280)] + frags
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, v string"
    )
    got = {
        r["i"]: r["o"]
        for r in df.select(
            "i", normalize_section_full(F.col("v")).alias("o")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == model(c), (repr(c), got[i], model(c))


def test_citation_regressions_seeded_drift(spark):
    """Golden citation-regression harness: healthy items are 'ok' with no
    codes; every seeded drift class trips its reference error code
    (tests/golden/test_citation_regressions.py scenarios)."""
    from earcrawler_spark.queries_eval import q_citation_regressions

    rows = {
        r["item_id"]: r
        for r in q_citation_regressions(spark, "/root/testdata/sf0.001").collect()
    }
    # healthy item: doc 1 hits none of the seeded moduli
    ok = rows[1]
    assert ok["status_category"] == "ok"
    assert ok["error_codes"] == ""
    assert ok["citation_precision"] == 1.0 and ok["citation_recall"] == 1.0
    # wrong cite (%13): fp+fn -> citation_wrong
    wrong = rows[13]
    assert wrong["status_category"] == "citation_wrong"
    assert "not_in_expected" in wrong["error_codes"]
    assert "missing_expected" in wrong["error_codes"]
    assert wrong["citation_recall"] < 1.0
    # reserved cite (%17, not %13/%19/%23): reserved_cited fires
    assert "reserved_cited" in rows[17]["error_codes"]
    assert rows[17]["status_category"] == "citation_wrong"
    # invalid id (%19): '' normalizes to null -> invalid_id
    assert "invalid_id" in rows[19]["error_codes"]
    # unregistered section (%23): EAR-999.99 -> not_in_references
    assert "not_in_references" in rows[23]["error_codes"]
    # retrieval miss (%4 and %6): gt section absent from retrieval wins
    # the status ladder over citation_wrong (reference :1078-1083)
    miss = rows[12]
    assert miss["status_category"] == "retrieval_miss_gt_section"
    assert "missing_in_retrieval" in miss["error_codes"]
    assert miss["missing_in_retrieval"] != ""
