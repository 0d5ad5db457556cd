"""Corpus record merge with conflict detection + entity-map merge.

Reference parity:
- merge_records (corpus/records.py:84-125): same-record_id fragments
  merge into one record — identifiers become the sorted distinct union,
  scalar fields take the first non-empty value in fragment order, and
  conflicting content fingerprints within a group raise.
- merge_entity_maps / normalize_entity_map (corpus/entities.py:30-66):
  entities are map<bucket, list<name>>; buckets are upper-cased and
  trimmed (empty buckets dropped), values trimmed, de-duplicated, sorted;
  maps merge bucket-wise.

Spark shape: the pairwise reduce of the reference is re-expressed as one
groupBy per concern — a double explode_outer + groupBy for the map merge
(map_from_entries over sorted entries), struct-min aggregates for
first-non-empty scalars, countDistinct for the conflict check. `error`
mode embeds F.raise_error in the plan so a conflicting group fails the
job exactly where the reference raises ValueError, with no driver-side
validation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALAR_FIELDS = ("identifier", "source_url", "date", "provider", "section", "paragraph")


def merge_entity_maps(fragments: DataFrame, id_col: str = "record_id") -> DataFrame:
    """(record_id, entities map<string,array<string>>) fragments ->
    one normalized merged map per record_id (records with no surviving
    entries keep an empty map)."""
    exploded = fragments.select(
        id_col, F.explode_outer("entities").alias("bucket_raw", "vals")
    )
    values = exploded.select(
        id_col,
        F.upper(F.trim("bucket_raw")).alias("bucket"),
        F.explode_outer("vals").alias("v_raw"),
    ).select(id_col, "bucket", F.trim("v_raw").alias("v"))
    cleaned = values.filter(
        F.col("bucket").isNotNull()
        & (F.col("bucket") != "")
        & F.col("v").isNotNull()
        & (F.col("v") != "")
    )
    buckets = cleaned.groupBy(id_col, "bucket").agg(
        F.array_sort(F.collect_set("v")).alias("names")
    )
    merged = buckets.groupBy(id_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("bucket", "names")))
        ).alias("entities")
    )
    ids = fragments.select(id_col).distinct()
    empty = F.map_from_entries(
        F.array().cast("array<struct<bucket:string,names:array<string>>>")
    )
    return ids.join(merged, id_col, "left").select(
        id_col, F.coalesce("entities", empty).alias("entities")
    )


def entities_json(entities_col) -> F.Column:
    """Deterministic sorted-JSON rendering of a merged entity map (keys
    already sorted by construction in merge_entity_maps). Values in this
    engine's corpora are scrubbed tokens — no JSON metacharacters."""
    entry = lambda e: F.concat(
        F.lit('"'), e["key"], F.lit('":["'),
        F.array_join(e["value"], '","'), F.lit('"]'),
    )
    return F.concat(
        F.lit("{"),
        F.array_join(F.transform(F.map_entries(entities_col), entry), ","),
        F.lit("}"),
    )


def merge_corpus_records(
    fragments: DataFrame, on_conflict: str = "flag"
) -> DataFrame:
    """Merge fragments(record_id, seq, identifier, content_sha256,
    source_url, date, provider, section, paragraph, entities) by
    record_id. seq orders fragments (the reference's primary-first
    pairwise order); scalars take the first non-empty in seq order;
    identifiers union+sort; entities merge bucket-wise; >1 distinct
    fingerprint in a group -> conflict (raise in 'error' mode)."""
    first_nonempty = lambda c: F.min(
        F.when(
            F.col(c).isNotNull() & (F.col(c).cast("string") != ""),
            F.struct(F.col("seq"), F.col(c).alias("v")),
        )
    )["v"]
    scalars = fragments.groupBy("record_id").agg(
        F.array_sort(F.collect_set("identifier")).alias("identifiers"),
        *[first_nonempty(c).alias(c) for c in SCALAR_FIELDS if c != "identifier"],
        F.count(F.lit(1)).alias("n_fragments"),
        # empty fingerprints neither conflict nor win the merged value:
        # the reference only raises when BOTH sides are non-empty and
        # back-fills the non-empty one (corpus/records.py:84-125)
        F.countDistinct(
            F.when(F.col("content_sha256") != "", F.col("content_sha256"))
        ).alias("n_fingerprints"),
        F.coalesce(
            F.min(F.when(F.col("content_sha256") != "", F.col("content_sha256"))),
            F.lit(""),
        ).alias("content_sha256"),
    )
    conflict = F.col("n_fingerprints") > 1
    if on_conflict == "error":
        flag = F.when(
            conflict,
            F.raise_error(
                F.concat(
                    F.lit("Conflicting content fingerprints for record "),
                    F.col("record_id"),
                )
            ),
        ).otherwise(F.lit(False))
    else:
        flag = conflict
    out = scalars.withColumn("conflict", flag).drop("n_fingerprints")
    return out.join(merge_entity_maps(fragments), "record_id")
