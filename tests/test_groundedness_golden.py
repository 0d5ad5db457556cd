"""The reference CI's golden groundedness split-metric vectors
(tests/golden/test_groundedness_split_metrics.py) run END-TO-END through
the engine: answer text -> extract_claims (decisive filter) ->
score_citations -> score_claims -> per-item rates.  The three vectors
pin valid/supported/overclaim rates AND the expected per-claim reason
codes against the reference's own golden expectations."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from earcrawler_spark.operators.groundedness import score_citations, score_claims
from earcrawler_spark.queries_eval import extract_claims

_CTX_BLOCK_RE = re.compile(r"^\[([^\]]+)\]\s*(.*)$", re.DOTALL)

CASES = [
    (
        "support-001",
        "Yes. A BIS license is required for this activity; internal review is complete.",
        [(
            "EAR-744.6(b)(3)",
            "A BIS license is required for certain U.S. person support related "
            "to biological weapons activities.",
        )],
        "[EAR-744.6(b)(3)] A BIS license is required for certain U.S. person "
        "support related to biological weapons activities.",
        {"valid": 1.0, "supported": 0.5, "overclaim": 0.5,
         "reason": "claim_without_linked_citation"},
    ),
    (
        "support-002",
        "Yes. A BIS license or License Exception is required before proceeding.",
        [(
            "EAR-740.1",
            "You may not proceed unless a BIS license or License Exception applies.",
        )],
        "[EAR-736.2(b)] You may not proceed unless a BIS license or License "
        "Exception applies.\n\n"
        "[EAR-740.1] License Exceptions authorize exports without a license "
        "when all stated conditions are met.",
        {"valid": 1.0, "supported": 0.0, "overclaim": 1.0,
         "reason": "claim_linked_citation_not_supported"},
    ),
    (
        "overclaim-001",
        "Yes. A license is required for NS Column 1 exports to China unless an "
        "exception applies. Internal screening is complete.",
        [(
            "EAR-742.4(a)(1)",
            "A license is required for NS Column 1 exports to China unless an "
            "exception applies.",
        )],
        "[EAR-742.4(a)(1)] A license is required for NS Column 1 exports to "
        "China unless an exception applies.",
        {"valid": 1.0, "supported": 0.5, "overclaim": 0.5,
         "reason": "claim_without_linked_citation"},
    ),
]


def test_golden_split_metric_vectors(spark):
    ctx_rows, cit_rows, ans_rows = [], [], []
    for i, (_cid, answer, citations, raw_context, _exp) in enumerate(CASES):
        ans_rows.append((i, answer))
        for j, (sec, quote) in enumerate(citations):
            cit_rows.append((i, j, sec, quote))
        for block in raw_context.split("\n\n"):
            m = _CTX_BLOCK_RE.match(block.strip())
            assert m, block
            ctx_rows.append((m.group(1), m.group(2)))

    ctx_df = spark.createDataFrame(
        ctx_rows, "section_id string, ctx_text string"
    ).distinct()
    cit_df = spark.createDataFrame(
        cit_rows, "item_id long, cit_idx int, raw_section_id string, quote string"
    )
    ans_df = spark.createDataFrame(ans_rows, "item_id long, answer string")

    claims_df = extract_claims(ans_df).filter(F.col("decisive")).select(
        "item_id", "claim_idx", "tokens", "sections"
    )
    sc = score_citations(cit_df, ctx_df)
    scored = score_claims(claims_df, sc)

    valid = {
        r["item_id"]: r["v"]
        for r in sc.groupBy("item_id")
        .agg(F.avg(F.col("valid").cast("double")).alias("v"))
        .collect()
    }
    sup = {
        r["item_id"]: r["s"]
        for r in scored.groupBy("item_id")
        .agg(F.avg(F.col("supported").cast("double")).alias("s"))
        .collect()
    }
    reasons = {}
    for r in scored.collect():
        reasons.setdefault(r["item_id"], set()).add(r["reason"])

    for i, (cid, _a, _c, _ctx, exp) in enumerate(CASES):
        assert valid[i] == exp["valid"], (cid, valid[i])
        assert sup[i] == exp["supported"], (cid, sup[i])
        assert 1.0 - sup[i] == exp["overclaim"], cid
        assert exp["reason"] in reasons[i], (cid, reasons[i])
