"""Bucketed-table evidence for the 100 TB claims: several query
docstrings state that at scale the big joins become shuffle-free because
the tables are bucketed on the join key. Prove the mechanism: write the
documents/seen tables bucketed on their hash key and assert the join
plan has NO shuffle exchange on either side."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    # spark-warehouse location is fixed per session; use unique table names
    yield
    for t in ("b_docs", "b_seen"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_identity_join_has_no_shuffle(spark, sf_small, warehouse):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", F.sha2("text", 256).alias("content_hash")
    )
    seen = docs.filter(F.col("doc_id") % 2 == 0).select("content_hash")
    (docs.write.mode("overwrite").bucketBy(8, "content_hash")
        .sortBy("content_hash").saveAsTable("b_docs"))
    (seen.write.mode("overwrite").bucketBy(8, "content_hash")
        .sortBy("content_hash").saveAsTable("b_seen"))

    a = spark.table("b_docs")
    b = spark.table("b_seen")
    joined = a.join(b.hint("merge"), "content_hash", "left_anti")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # co-bucketed tables: the anti-join runs directly on the bucketed
    # scans — no Exchange (shuffle) anywhere in the plan
    assert "Exchange" not in plan, plan
    # and it still computes the right thing
    assert joined.count() == docs.filter(F.col("doc_id") % 2 == 1).count()
