"""Answer scoring modes vs the reference model
(scripts/eval/eval_rag_llm.py:241-277 + tests/eval/test_answer_scoring_modes.py)."""

from __future__ import annotations

import difflib
import random
import re

from pyspark.sql import functions as F

from earcrawler_spark.operators.answer_scoring import (
    answer_is_correct,
    normalize_answer_text,
    semantic_match_ratio,
)


def _normalize_model(text: str) -> str:
    value = (text or "").strip()
    if not value:
        return ""
    value = re.sub(r"^(answer|final answer)\s*:\s*", "", value, flags=re.IGNORECASE)
    value = value.casefold()
    value = re.sub(r"\s+", " ", value).strip()
    value = value.strip(" \t\n\r\"'`")
    value = value.strip(" .,:;!?")
    return value


def _correct_model(gt, pred, mode, thr=0.6):
    if not gt or not pred:
        return False
    if mode == "exact":
        return pred == gt
    if mode == "normalized":
        return _normalize_model(pred) == _normalize_model(gt)
    return (
        difflib.SequenceMatcher(None, pred.casefold(), gt.casefold()).ratio()
        >= thr
    )


def test_reference_golden_vectors(spark):
    # tests/eval/test_answer_scoring_modes.py verbatim expectations
    gt = "Yes. A license is required for that activity."
    pred = "Yes, a license is required."
    rows = [
        ("Yes.", "Yes.", "exact", 0.6, True),
        ("Yes.", "yes.", "exact", 0.6, False),
        ("Yes.", " yes ", "normalized", 0.6, True),
        ("Answer: Yes!", "final answer: yes", "normalized", 0.6, True),
        (gt, pred, "semantic", 0.6, True),
        (gt, pred, "semantic", 0.99, False),
        ("", "x", "exact", 0.6, False),
        ("x", "", "normalized", 0.6, False),
    ]
    df = spark.createDataFrame(
        [(i, g, p, m, t) for i, (g, p, m, t, _) in enumerate(rows)],
        "i int, gt string, pred string, mode string, thr double",
    )
    for mode in ("exact", "normalized", "semantic"):
        for thr in (0.6, 0.99):
            sub = [r for r in rows if r[2] == mode and r[3] == thr]
            if not sub:
                continue
            got = {
                r["i"]: r["ok"]
                for r in df.filter(
                    (F.col("mode") == mode) & (F.col("thr") == thr)
                )
                .select(
                    "i",
                    answer_is_correct(
                        F.col("gt"), F.col("pred"), mode, thr
                    ).alias("ok"),
                )
                .collect()
            }
            for i, (g, p, m, t, want) in enumerate(rows):
                if m == mode and t == thr:
                    assert got[i] == want, (g, p, m, t)


def test_scoring_fuzz_vs_model(spark):
    rng = random.Random(99)
    atoms = [
        "Yes", "No", "A license is required", "answer:", "Final Answer: ",
        "  ", ".", "!?", '"', "'", "`", "\t", "EAR-736.2", "unless an",
        "exception applies", ",",
    ]
    pairs = []
    for _ in range(150):
        g = "".join(rng.choice(atoms) for _ in range(rng.randint(0, 5)))
        p = (
            g
            if rng.random() < 0.4
            else "".join(rng.choice(atoms) for _ in range(rng.randint(0, 5)))
        )
        pairs.append((g, p))
    df = spark.createDataFrame(
        [(i, g, p) for i, (g, p) in enumerate(pairs)],
        "i int, gt string, pred string",
    )
    got = {
        r["i"]: (r["n"], r["e"], r["no"], r["s"], r["r"])
        for r in df.select(
            "i",
            normalize_answer_text(F.col("pred")).alias("n"),
            answer_is_correct(F.col("gt"), F.col("pred"), "exact").alias("e"),
            answer_is_correct(F.col("gt"), F.col("pred"), "normalized").alias(
                "no"
            ),
            answer_is_correct(F.col("gt"), F.col("pred"), "semantic").alias(
                "s"
            ),
            semantic_match_ratio(F.col("pred"), F.col("gt")).alias("r"),
        ).collect()
    }
    for i, (g, p) in enumerate(pairs):
        n, e, no, s, r = got[i]
        assert n == _normalize_model(p), (p, n)
        assert e == _correct_model(g, p, "exact"), (g, p)
        assert no == _correct_model(g, p, "normalized"), (g, p)
        assert s == _correct_model(g, p, "semantic"), (g, p)
        want_r = difflib.SequenceMatcher(
            None, p.casefold(), g.casefold()
        ).ratio()
        assert abs(r - want_r) < 1e-12, (g, p)
