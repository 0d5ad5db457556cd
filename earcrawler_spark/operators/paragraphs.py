"""ParagraphRecord derivation — the reference's crawl unit
(earCrawler/core/ear_crawler.py:52-60) materialized from the span
documents table.

One text span ≙ one paragraph record:
    (document_number, paragraph_index, text, sha256, citations, version)
- paragraph_index = ordinal among TEXT spans (media spans interleave but
  don't consume paragraph indexes — matches the reference, which only
  ever sees <p> elements);
- sha256 = content fingerprint of the normalized text (identity.py:9-12);
- citations = FR-citation regex matches in document order
  (ear_crawler.py:76-78);
- version = D2 position-version counter per (document_number,
  paragraph_index) over re-crawls, keyed by crawl iteration.

Pure Column expressions over the exploded spans — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from earcrawler_spark.functions.text import content_sha256, extract_fr_citations


def paragraph_records(documents: DataFrame, iter_col: str = "iter") -> DataFrame:
    """documents(doc_id, spans, [iter]) → ParagraphRecord rows."""
    has_iter = iter_col in documents.columns
    spans = documents.select(
        F.col("doc_id").alias("document_number"),
        *([F.col(iter_col)] if has_iter else [F.lit(1).alias(iter_col)]),
        F.posexplode(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text"))
        ).alias("paragraph_index", "span"),
    )
    recs = spans.select(
        "document_number",
        "paragraph_index",
        F.col("span.text").alias("text"),
        content_sha256(F.col("span.text")).alias("sha256"),
        extract_fr_citations(F.col("span.text")).alias("citations"),
        F.col(iter_col),
    )
    w = W.partitionBy("document_number", "paragraph_index").orderBy(iter_col)
    return recs.withColumn("version", F.row_number().over(w)).drop(iter_col)
