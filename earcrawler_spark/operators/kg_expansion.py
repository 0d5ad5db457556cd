"""KG-expansion snippet index builder.

Reference: rag/kg_expansion_builder.py
- `_load_corpus_index` (:31-49): section-normalized corpus records,
  sorted per section by str(id or title or section); the FIRST record
  supplies the preview.
- `_collect_targets` (:68-113): targets = manifest reference-group
  children + parents + dataset ear_sections + evidence doc-span ids;
  `related[child] = (group ∪ parent) − child`; label hints for group
  children come from the manifest-level kg_nodes/kg_paths, and dataset
  ear_sections union their item's evidence kg_nodes/kg_paths.
- `build_expansion_mapping` (:116-146): per sorted target with a
  non-empty-text corpus record -> {text[:320], source, title,
  related_sections sorted, label_hints sorted}.

Spark-first shape: the corpus "first record per section" is a
struct-min argmax (one aggregation, no window); targets/related/hints
are unions + grouped collect_sets; the corpus join is the only big-side
touch and happens once.  Everything is relational — no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earcrawler_spark.operators.citation import normalize_section_full

PREVIEW_CHARS = 320


def first_corpus_record(corpus: DataFrame) -> DataFrame:
    """_load_corpus_index's sorted-first record per normalized section.

    corpus: (section_raw, rec_id, title, text, source_url)
    -> (section_id, text, source, title)

    The reference sorts records by ``str(id or title or section)`` and
    takes the head; that argmin is a struct-min aggregate here.
    """
    sort_key = F.coalesce(
        F.nullif(F.col("rec_id").cast("string"), F.lit("")),
        F.nullif(F.col("title"), F.lit("")),
        F.col("section_raw"),
        F.lit(""),
    )
    norm = normalize_section_full(F.col("section_raw"))
    return (
        corpus.select(
            norm.alias("section_id"),
            F.struct(
                sort_key.alias("k"),
                F.col("text").alias("text"),
                F.col("source_url").alias("source"),
                F.col("title").alias("title"),
            ).alias("rec"),
        )
        .filter(F.col("section_id").isNotNull())
        .groupBy("section_id")
        .agg(F.min("rec").alias("rec"))
        .select(
            "section_id",
            F.trim(F.col("rec.text")).alias("text"),
            F.col("rec.source").alias("source"),
            F.col("rec.title").alias("title"),
        )
    )


def build_expansion_index(
    corpus: DataFrame,
    ref_groups: DataFrame,
    manifest_hints: DataFrame,
    items: DataFrame,
) -> DataFrame:
    """build_expansion_mapping as one relational plan.

    corpus: see first_corpus_record.
    ref_groups: (parent, child) — the manifest's references.sections
        groups, one row per (parent, child), pre-normalized ids.
    manifest_hints: (hint) — the manifest-level kg_nodes + kg_paths
        (the reference unions the SAME global set into every group
        child's hints).
    items: (item_id, ear_sections array<string>, kg_nodes array<string>,
        kg_paths array<string>, span_ids array<string>) — eval dataset
        rows.
    -> (section_id, text, source, title, related_sections, label_hints)
       with '|'-joined sorted sets, ordered by section_id.
    """
    child = ref_groups.select("parent", "child")

    # related[child] = (siblings ∪ parent) − child: group members join
    # on parent (bounded per-group fan-out), parent added, self removed
    sib = child.alias("a").join(
        child.alias("b"), F.col("a.parent") == F.col("b.parent")
    ).select(
        F.col("a.child").alias("section_id"),
        F.col("b.child").alias("rel_sec"),
    )
    par = child.select(
        F.col("child").alias("section_id"), F.col("parent").alias("rel_sec")
    )
    related = (
        sib.unionByName(par)
        .filter(F.col("rel_sec") != F.col("section_id"))
        .groupBy("section_id")
        .agg(F.array_sort(F.collect_set("rel_sec")).alias("related_sections"))
    )

    # label hints: every ref-group child gets the manifest-level hints;
    # dataset ear_sections get their item's evidence kg_nodes ∪ kg_paths
    global_hints = manifest_hints.agg(
        F.array_sort(F.collect_set("hint")).alias("h")
    )
    ref_hints = (
        child.select(F.col("child").alias("section_id"))
        .distinct()
        .crossJoin(F.broadcast(global_hints))
        .select("section_id", F.explode("h").alias("hint"))
    )
    item_hints = (
        items.select(
            F.explode("ear_sections").alias("sec_raw"),
            F.array_union(
                F.coalesce("kg_nodes", F.array().cast("array<string>")),
                F.coalesce("kg_paths", F.array().cast("array<string>")),
            ).alias("hints"),
        )
        .select(
            normalize_section_full(F.col("sec_raw")).alias("section_id"),
            F.explode("hints").alias("hint"),
        )
        .filter(F.col("section_id").isNotNull())
    )
    hints = (
        ref_hints.unionByName(item_hints)
        .groupBy("section_id")
        .agg(F.array_sort(F.collect_set("hint")).alias("label_hints"))
    )

    # target universe: group children + parents + dataset ear_sections +
    # evidence span ids (normalized, non-null)
    targets = (
        child.select(F.col("child").alias("section_id"))
        .unionByName(child.select(F.col("parent").alias("section_id")))
        .unionByName(
            items.select(F.explode("ear_sections").alias("s")).select(
                normalize_section_full(F.col("s")).alias("section_id")
            )
        )
        .unionByName(
            items.select(F.explode("span_ids").alias("s")).select(
                normalize_section_full(F.col("s")).alias("section_id")
            )
        )
        .filter(F.col("section_id").isNotNull())
        .distinct()
    )

    recs = first_corpus_record(corpus)
    return (
        targets.join(recs, "section_id")  # reference drops corpus-less targets
        .filter(F.col("text") != "")
        .join(related, "section_id", "left")
        .join(hints, "section_id", "left")
        .select(
            "section_id",
            F.substring(F.col("text"), 1, PREVIEW_CHARS).alias("text"),
            "source",
            "title",
            F.array_join(
                F.coalesce("related_sections", F.array().cast("array<string>")),
                "|",
            ).alias("related_sections"),
            F.array_join(
                F.coalesce("label_hints", F.array().cast("array<string>")), "|"
            ).alias("label_hints"),
        )
        .orderBy("section_id")
    )
