"""Record/entity-map merge unit behavior: normalization vectors, legacy
bucket handling, first-non-empty order, in-plan conflict raise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, LongType, MapType, StringType, StructField, StructType,
)

from earcrawler_spark.operators.records import (
    entities_json,
    merge_corpus_records,
    merge_entity_maps,
)

FRAG_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("seq", LongType()),
        StructField("identifier", StringType()),
        StructField("content_sha256", StringType()),
        StructField("source_url", StringType()),
        StructField("date", StringType()),
        StructField("provider", StringType()),
        StructField("section", StringType()),
        StructField("paragraph", StringType()),
        StructField("entities", MapType(StringType(), ArrayType(StringType()))),
    ]
)


def _frag(rid, seq, ident, fp, url=None, ents=None):
    return (rid, seq, ident, fp, url, None, None, None, "text", ents or {})


def test_entity_map_merge_normalizes_buckets_and_values(spark):
    rows = [
        _frag("r1", 1, "a", "f", ents={" org ": ["  Acme ", "", "Beta"]}),
        _frag("r1", 2, "b", "f", ents={"ORG": ["Beta", "Gamma"], "program": ["P1"]}),
        _frag("r2", 1, "c", "f", ents={}),
    ]
    df = spark.createDataFrame(rows, FRAG_SCHEMA)
    got = {
        r["record_id"]: r["entities"]
        for r in merge_entity_maps(df).collect()
    }
    assert got["r1"] == {"ORG": ["Acme", "Beta", "Gamma"], "PROGRAM": ["P1"]}
    assert got["r2"] == {}
    js = {
        r["record_id"]: r["j"]
        for r in merge_entity_maps(df)
        .select("record_id", entities_json(F.col("entities")).alias("j"))
        .collect()
    }
    assert js["r1"] == '{"ORG":["Acme","Beta","Gamma"],"PROGRAM":["P1"]}'
    assert js["r2"] == "{}"


def test_first_nonempty_scalar_follows_seq_order(spark):
    rows = [
        _frag("r1", 5, "late", "f", url="https://late.example"),
        _frag("r1", 2, "early", "f", url=None),
        _frag("r1", 3, "mid", "f", url="https://mid.example"),
    ]
    out = merge_corpus_records(spark.createDataFrame(rows, FRAG_SCHEMA)).collect()[0]
    assert out["source_url"] == "https://mid.example"
    assert out["identifiers"] == ["early", "late", "mid"]
    assert out["conflict"] is False


def test_conflict_flag_and_error_mode(spark):
    rows = [
        _frag("r1", 1, "a", "fp_one"),
        _frag("r1", 2, "b", "fp_two"),
    ]
    df = spark.createDataFrame(rows, FRAG_SCHEMA)
    assert merge_corpus_records(df, on_conflict="flag").collect()[0]["conflict"]
    with pytest.raises(Exception, match="Conflicting content fingerprints"):
        merge_corpus_records(df, on_conflict="error").collect()
