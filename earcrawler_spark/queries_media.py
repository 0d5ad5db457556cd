"""Multimodal media pipeline as a first-class registered query.

Rows-only by construction: the PPM/WAV/PPMV byte decoding inside the
mapInPandas stages is not DuckDB-expressible, so the driver records the
weaker rows-only check. Correctness of the codecs and batch shapes is
pinned by tests/test_multimodal.py; determinism of this query is pinned
by test_media_features_query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_QUERIES: dict = {}
MEDIA_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _span_docs(docs: DataFrame) -> DataFrame:
    """Interleaved text+media span docs derived from the documents table:
    every doc carries its text span; 3 of 4 docs reference a media asset
    from a shared pool of 120 (so the sidecar build must de-duplicate);
    every 8th doc references a second asset."""
    d = F.col("doc_id")
    ref1 = F.concat(
        F.lit("https://bis.doc.gov/media/"), (d % 120).cast("string"), F.lit(".bin")
    )
    ref2 = F.concat(
        F.lit("https://bis.doc.gov/media/"), (d % 40 + 200).cast("string"), F.lit(".bin")
    )
    spans = F.filter(
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.when(
                d % 4 != 3,
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit("").alias("text"),
                    ref1.alias("media_ref"),
                    F.lit(1).alias("offset"),
                ),
            ),
            F.when(
                d % 8 == 0,
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit("").alias("text"),
                    ref2.alias("media_ref"),
                    F.lit(2).alias("offset"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    return docs.select(d.cast("string").alias("doc_id"), spans.alias("spans"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: span docs → de-duplicated media
    sidecar (mapInPandas synth+decode of REAL PPM/WAV/PPMV payloads,
    multimodal.py:179-228) → feature extraction (resize / RMS-ZCR /
    frame-sample, :274-343) → per-kind rollup. Scale shape: one decode
    per distinct asset regardless of fan-in; features ride Arrow
    batches; the rollup is a tiny groupBy."""
    from earcrawler_spark.multimodal import extract_features, media_table_from_spans

    docs = _span_docs(_t(spark, sf_dir, "documents"))
    media = media_table_from_spans(docs)
    feats = extract_features(media)
    norm = F.sqrt(
        F.aggregate(
            F.col("feature"), F.lit(0.0), lambda a, x: a + x * x
        )
    )
    return (
        feats.withColumn("feat_norm", norm)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.round(F.avg("feat_norm"), 6).alias("avg_feat_norm"),
            F.sum("n_frames_sampled").alias("total_frames_sampled"),
            F.round(F.avg("thumb_w"), 2).alias("avg_thumb_w"),
        )
        .orderBy("kind")
    )


MEDIA_QUERIES["media_features"] = q_media_features
# no oracle: binary codec stages are not SQL-expressible (rows-only)


def q_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sidecar BUILD stage of the multimodal pipeline, oracled: one
    row per distinct media asset with the deterministic identity + kind
    routing the mapInPandas stage uses (multimodal.py:195-228 —
    media_id = sha256(ref)[:16], kind = int(sha256(ref)[:8], 16) % 3)
    plus the span fan-in count.  Only the byte-decode stage remains
    rows-only (`media_features`).

    The kind index is JVM-native via conv(hex, 16, 10) % 3; the DuckDB
    mirror uses 16^k ≡ 1 (mod 3): the hex value mod 3 equals the sum of
    its hex digits mod 3."""
    docs = _span_docs(_t(spark, sf_dir, "documents"))
    spans = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )
    fan_in = spans.groupBy("media_ref").agg(F.count(F.lit(1)).alias("fan_in"))
    sha = F.sha2(F.col("media_ref"), 256)
    kind_idx = F.conv(F.substring(sha, 1, 8), 16, 10).cast("long") % 3
    kind = (
        F.when(kind_idx == 0, F.lit("image"))
        .when(kind_idx == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    codec = (
        F.when(kind_idx == 0, F.lit("ppm"))
        .when(kind_idx == 1, F.lit("wav"))
        .otherwise(F.lit("ppmv"))
    )
    return fan_in.select(
        F.substring(sha, 1, 16).alias("media_id"),
        "media_ref",
        kind.alias("kind"),
        codec.alias("codec"),
        "fan_in",
    ).orderBy("media_id")


def _media_manifest_sql() -> str:
    digit = "(strpos('0123456789abcdef', substr(sha, {i}, 1)) - 1)"
    ksum = " + ".join(digit.format(i=i) for i in range(1, 9))
    return f"""
WITH spans AS (
  SELECT 'https://bis.doc.gov/media/' || CAST(doc_id % 120 AS VARCHAR)
         || '.bin' AS media_ref
  FROM documents WHERE doc_id % 4 <> 3
  UNION ALL
  SELECT 'https://bis.doc.gov/media/' || CAST(doc_id % 40 + 200 AS VARCHAR)
         || '.bin'
  FROM documents WHERE doc_id % 8 = 0
), fan AS (
  SELECT media_ref, count(*) AS fan_in FROM spans GROUP BY media_ref
), hashed AS (
  SELECT media_ref, fan_in, sha256(media_ref) AS sha FROM fan
), kinds AS (
  SELECT media_ref, fan_in, substr(sha, 1, 16) AS media_id,
         CAST(({ksum}) % 3 AS BIGINT) AS kind_idx
  FROM hashed
)
SELECT media_id, media_ref,
       CASE kind_idx WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CASE kind_idx WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav'
            ELSE 'ppmv' END AS codec,
       fan_in
FROM kinds
ORDER BY media_id
"""


MEDIA_QUERIES["media_manifest"] = q_media_manifest
MEDIA_ORACLES["media_manifest"] = _media_manifest_sql()
