"""ParagraphRecord parity with the reference's own test expectations
(style of tests/core/test_ear_crawler.py:25-71 — literal expected lists
for paragraph parse + citation extraction + versioning)."""

from __future__ import annotations

from earcrawler_spark.crawler.spans import SPANS_SCHEMA
from earcrawler_spark.operators.paragraphs import paragraph_records


def _doc(doc_id, texts_and_media, it):
    spans, off = [], 0
    for kind, payload in texts_and_media:
        if kind == "text":
            spans.append(("text", payload, "", off))
        else:
            spans.append(("media", "", payload, off))
        off += 1
    return (doc_id, spans, it)


def test_paragraph_records_literal(spark):
    docs = spark.createDataFrame(
        [
            _doc(
                "FR-2024-001",
                [
                    ("text", "Amendment per 85 FR 12345 and 90 FR 1."),
                    ("media", "https://x/media/1.bin"),
                    ("text", "No citations here."),
                ],
                1,
            ),
            # re-crawl of the same doc: paragraph 0 changed → version 2
            _doc("FR-2024-001", [("text", "Amended text, see 91 FR 222.")], 2),
        ],
        f"doc_id string, spans {SPANS_SCHEMA}, iter int",
    )
    rows = sorted(
        (r["document_number"], r["paragraph_index"], r["text"], r["citations"], r["version"])
        for r in paragraph_records(docs).collect()
    )
    assert rows == [
        ("FR-2024-001", 0, "Amended text, see 91 FR 222.", ["91 FR 222"], 2),
        ("FR-2024-001", 0, "Amendment per 85 FR 12345 and 90 FR 1.", ["85 FR 12345", "90 FR 1"], 1),
        ("FR-2024-001", 1, "No citations here.", [], 1),
    ]
    # media spans never consume a paragraph index
    assert max(r[1] for r in rows) == 1


def test_paragraph_records_over_crawl_output(spark, tmp_path):
    from earcrawler_spark.crawler import synth
    from earcrawler_spark.crawler.runner import Crawler, CrawlConfig

    c = Crawler(spark, str(tmp_path / "pr"), CrawlConfig(max_iters=1, n_partitions=4))
    c.init_seeds(synth.seed_list())
    c.run(max_iters=1)
    docs = c.state.read_all("documents", 1)
    recs = paragraph_records(docs)
    n_text_spans = sum(
        sum(1 for s in r["spans"] if s["kind"] == "text") for r in docs.collect()
    )
    assert recs.count() == n_text_spans
    sample = recs.filter("size(citations) > 0").limit(5).collect()
    assert sample, "synthetic pages embed FR citations"
    for r in sample:
        for c_ in r["citations"]:
            assert c_ in r["text"]
        assert len(r["sha256"]) == 64
