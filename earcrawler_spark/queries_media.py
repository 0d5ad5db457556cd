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
