"""Trace-pack contract — reference parity with earCrawler/trace/trace_pack.py.

The reference's per-answer explainability artifact normalizes each
evidence list (drop incomplete entries, reference sort keys), serializes
the five-part payload as canonical JSON (sorted keys, compact
separators — trace_pack.py:69-70), sha256s it (provenance_hash,
:230-233), and validates a required-field ladder with a
label-conditional section_quotes requirement (:261-344).

Everything here is native Column expressions over typed struct arrays —
filter/sort/serialize run inside whole-stage codegen, one pack per row,
no UDFs.  JSON string escaping is the identity on this corpus domain
(no quotes/backslashes/control chars in the synthetic strings); a
general encoder would wrap each string field in a JSON-escape transform.

Float fields serialize via CAST(double AS STRING); the fixtures restrict
scores to exact binary fractions (0.25/0.5/1.5/null) where Python repr,
Spark, and DuckDB agree on the rendering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from earcrawler_spark.operators.citation import normalize_section_full

PROVENANCE_SCALAR_FIELDS = (
    "snapshot_id", "snapshot_sha256", "corpus_digest", "index_path",
    "index_sha256", "index_meta_path", "index_meta_sha256",
    "index_meta_schema_version", "index_build_timestamp_utc",
    "embedding_model", "llm_provider", "llm_model",
)
REQUIRED_PROVENANCE_FIELDS = (
    "snapshot_id", "snapshot_sha256", "corpus_digest", "index_path",
    "embedding_model",
)


def _s(col: Column) -> Column:
    """_as_str (trace_pack.py:50-51): None -> '' then str.strip().
    (?U)\\s matches Python's Unicode whitespace (NBSP, em-space, tabs)
    — F.trim would strip ASCII spaces only.  Exotic control-char
    whitespace (\\x1c-\\x1f) is outside the corpus domain."""
    return F.regexp_replace(
        F.coalesce(col, F.lit("")), r"(?U)^\s+|\s+$", ""
    )


def _jstr(col: Column) -> Column:
    return F.concat(F.lit('"'), col, F.lit('"'))


def _jopt_str(col: Column) -> Column:
    return F.when(col.isNull(), F.lit("null")).otherwise(_jstr(col))


def _jnum(col: Column) -> Column:
    return F.when(col.isNull(), F.lit("null")).otherwise(
        col.cast("double").cast("string")
    )


def _section_quotes_kept(col: Column) -> Column:
    cleaned = F.transform(
        col,
        lambda e: F.struct(
            normalize_section_full(e["section_id"]).alias("sid"),
            _s(e["quote"]).alias("quote"),
            F.when(_s(e["source_url"]) != "", _s(e["source_url"])).alias("url"),
            e["score"].cast("double").alias("score"),
        ),
    )
    return F.filter(
        cleaned,
        lambda e: e["sid"].isNotNull() & (e["sid"] != "") & (e["quote"] != ""),
    )


def section_quotes_kept_size(col: Column) -> Column:
    """Size of the NORMALIZED quote list — the validation ladder's
    label-conditional requirement checks the normalized list
    (trace_pack.py:283-293), so entries dropped by normalization count
    as absent."""
    return F.size(_section_quotes_kept(col))


def section_quotes_json(col: Column) -> Column:
    """_normalize_section_quotes (:73-99): keep entries with a
    normalizable section_id and non-empty quote; source_url '' -> null;
    sort by (section_id, quote, source_url or '', score or -1)."""
    kept = _section_quotes_kept(col)
    # the original index as the FINAL sort key emulates Python's stable
    # sorted(): entries tying on the reference keys (e.g. score null vs
    # -1.0, which coalesce collapses in k4 but serializes differently in
    # j) keep arrival order instead of re-sorting lexicographically by j
    sortable = F.array_sort(
        F.transform(
            kept,
            lambda e, i: F.struct(
                e["sid"].alias("k1"),
                e["quote"].alias("k2"),
                F.coalesce(e["url"], F.lit("")).alias("k3"),
                F.coalesce(e["score"], F.lit(-1.0)).alias("k4"),
                i.alias("k5"),
                F.concat(
                    F.lit('{"quote":'), _jstr(e["quote"]),
                    F.lit(',"score":'), _jnum(e["score"]),
                    F.lit(',"section_id":'), _jstr(e["sid"]),
                    F.lit(',"source_url":'), _jopt_str(e["url"]),
                    F.lit("}"),
                ).alias("j"),
            ),
        )
    )
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(sortable, lambda e: e["j"]), ","),
        F.lit("]"),
    )


def _kg_paths_kept(col: Column) -> Column:
    cleaned = _kg_paths_cleaned(col)
    return F.filter(
        cleaned, lambda p: (p["pid"] != "") & (F.size(p["edges"]) > 0)
    )


def kg_paths_kept_size(col: Column) -> Column:
    """Size of the NORMALIZED path list (require_kg_paths checks it,
    trace_pack.py:295-303)."""
    return F.size(_kg_paths_kept(col))


def _kg_paths_cleaned(col: Column) -> Column:
    return F.transform(
        col,
        lambda p: F.struct(
            _s(p["path_id"]).alias("pid"),
            F.array_sort(
                F.transform(
                    F.filter(
                        p["edges"],
                        lambda e: (_s(e["source"]) != "")
                        & (_s(e["predicate"]) != "")
                        & (_s(e["target"]) != ""),
                    ),
                    lambda e: F.struct(
                        _s(e["source"]).alias("source"),
                        _s(e["predicate"]).alias("predicate"),
                        _s(e["target"]).alias("target"),
                    ),
                )
            ).alias("edges"),
        ),
    )


def kg_paths_json(col: Column) -> Column:
    """_normalize_kg_paths (:102-131): edges with any empty member drop;
    edges sort by (source, predicate, target); paths without id or
    edges drop; paths sort by path_id."""
    kept = _kg_paths_kept(col)
    # stable sort: paths sharing a path_id keep arrival order (Python
    # sorted() parity) — the index key stops array_sort comparing j
    sortable = F.array_sort(
        F.transform(
            kept,
            lambda p, i: F.struct(
                p["pid"].alias("k1"),
                i.alias("k2"),
                F.concat(
                    F.lit('{"edges":['),
                    F.array_join(
                        F.transform(
                            p["edges"],
                            lambda e: F.concat(
                                F.lit('{"predicate":'), _jstr(e["predicate"]),
                                F.lit(',"source":'), _jstr(e["source"]),
                                F.lit(',"target":'), _jstr(e["target"]),
                                F.lit("}"),
                            ),
                        ),
                        ",",
                    ),
                    F.lit('],"path_id":'), _jstr(p["pid"]), F.lit("}"),
                ).alias("j"),
            ),
        )
    )
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(sortable, lambda e: e["j"]), ","),
        F.lit("]"),
    )


def citations_json(col: Column) -> Column:
    """_normalize_citations (:134-156): entries keep only a normalizable
    section_id; quote/span_id/source stringify ('' kept); sort by
    (section_id, quote, span_id, source)."""
    cleaned = F.transform(
        col,
        lambda c: F.struct(
            normalize_section_full(c["section_id"]).alias("sid"),
            _s(c["quote"]).alias("quote"),
            _s(c["span_id"]).alias("span_id"),
            _s(c["source"]).alias("source"),
        ),
    )
    kept = F.filter(cleaned, lambda c: c["sid"].isNotNull() & (c["sid"] != ""))
    sortable = F.array_sort(
        F.transform(
            kept,
            lambda c: F.struct(
                c["sid"].alias("k1"),
                c["quote"].alias("k2"),
                c["span_id"].alias("k3"),
                c["source"].alias("k4"),
                F.concat(
                    F.lit('{"quote":'), _jstr(c["quote"]),
                    F.lit(',"section_id":'), _jstr(c["sid"]),
                    F.lit(',"source":'), _jstr(c["source"]),
                    F.lit(',"span_id":'), _jstr(c["span_id"]),
                    F.lit("}"),
                ).alias("j"),
            ),
        )
    )
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(sortable, lambda e: e["j"]), ","),
        F.lit("]"),
    )


def retrieval_metadata_json(col: Column) -> Column:
    """_normalize_retrieval_metadata (:159-188): section normalizes from
    (section or id); entries with neither id nor section drop; id falls
    back to the normalized section; sort by (id, section or '',
    score or -1)."""
    cleaned = F.transform(
        col,
        lambda r: F.struct(
            _s(r["id"]).alias("rid"),
            # reference truthiness (`row.get("section") or row.get("id")`,
            # trace_pack.py:164): ANY non-empty RAW string — including
            # whitespace-only — wins; only None/'' falls back to id
            normalize_section_full(
                F.when(
                    r["section"].isNotNull() & (r["section"] != ""),
                    r["section"],
                ).otherwise(r["id"])
            ).alias("section"),
            r["score"].cast("double").alias("score"),
            _s(r["source"]).alias("source"),
            _s(r["url"]).alias("url"),
            _s(r["title"]).alias("title"),
        ),
    )
    kept = F.filter(
        cleaned,
        lambda r: (r["rid"] != "")
        | (r["section"].isNotNull() & (r["section"] != "")),
    )
    # stable sort: rows tying on (id, section, score) but differing in
    # url/title/source keep arrival order (Python sorted() parity)
    sortable = F.array_sort(
        F.transform(
            kept,
            lambda r, i: F.struct(
                F.when(r["rid"] != "", r["rid"])
                .otherwise(F.coalesce(r["section"], F.lit("")))
                .alias("k1"),
                F.coalesce(r["section"], F.lit("")).alias("k2"),
                F.coalesce(r["score"], F.lit(-1.0)).alias("k3"),
                i.alias("k4"),
                F.concat(
                    F.lit('{"id":'),
                    _jstr(
                        F.when(r["rid"] != "", r["rid"]).otherwise(
                            F.coalesce(r["section"], F.lit(""))
                        )
                    ),
                    F.lit(',"score":'), _jnum(r["score"]),
                    F.lit(',"section":'), _jopt_str(r["section"]),
                    F.lit(',"source":'), _jstr(r["source"]),
                    F.lit(',"title":'), _jstr(r["title"]),
                    F.lit(',"url":'), _jstr(r["url"]),
                    F.lit("}"),
                ).alias("j"),
            ),
        )
    )
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(sortable, lambda e: e["j"]), ","),
        F.lit("]"),
    )


def run_provenance_json(col: Column) -> Column:
    """_normalize_run_provenance (:191-215): keep the known scalar
    fields that stringify non-empty, object keys in sorted order."""
    entries = F.filter(
        F.array(
            *[
                F.when(
                    _s(col[f]) != "",
                    F.concat(F.lit(f'"{f}":'), _jstr(_s(col[f]))),
                )
                for f in sorted(PROVENANCE_SCALAR_FIELDS)
            ]
        ),
        lambda e: e.isNotNull(),
    )
    return F.concat(F.lit("{"), F.array_join(entries, ","), F.lit("}"))


def provenance_hash(
    section_quotes: Column,
    kg_paths: Column,
    citations: Column,
    retrieval_metadata: Column,
    run_provenance: Column,
) -> Column:
    """canonical_provenance_payload + sha256 (:218-233): the five-part
    payload with top-level keys in sorted order, compact separators."""
    payload = F.concat(
        F.lit('{"citations":'), citations_json(citations),
        F.lit(',"kg_paths":'), kg_paths_json(kg_paths),
        F.lit(',"retrieval_metadata":'),
        retrieval_metadata_json(retrieval_metadata),
        F.lit(',"run_provenance":'), run_provenance_json(run_provenance),
        F.lit(',"section_quotes":'), section_quotes_json(section_quotes),
        F.lit("}"),
    )
    return F.sha2(payload, 256)
