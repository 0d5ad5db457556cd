"""Query batch 7 — reference-fidelity operators (round-2 VERDICT items):
section_subsection chunking, 4-tier mention scoring, full temporal
selection, reconcile v2, record/entity-map merge.

Each query synthesizes its reference-shaped input deterministically from
the driver parquet tables (no external data), runs the fidelity operator,
and has a DuckDB oracle implementing the identical semantics in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_MAX_CHARS = 400


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- P16 fidelity: section_subsection chunking ------------------------------

def _synth_sections(docs: DataFrame) -> DataFrame:
    """Deterministic EAR-shaped section text from the documents table:
    lead-in, (a)/(b) letter blocks, a roman '(i)' line every 7th doc, digit
    markers inside (b), a duplicate '(b)' tail every 11th doc, and plain
    marker-less text every 5th doc. Exercises every chunking rule branch."""
    tk = F.filter(F.split("text", r"\s+"), lambda t: t != "")

    def seg(start: int, length: int):
        return F.array_join(F.slice(tk, start, length), " ")

    nl = "\n"
    structured = F.concat(
        seg(1, 6),
        F.lit(nl + "(a) "), seg(7, 15),
        F.when(F.col("doc_id") % 7 == 0, F.lit(nl + "(i) roman note")).otherwise(F.lit("")),
        F.lit(nl + nl), seg(22, 15),
        F.lit(nl + "(b) intro "), seg(37, 6),
        F.lit(nl + "(1) "), seg(43, 15),
        F.lit(nl + "(2) "), seg(58, 15),
        F.when(F.col("doc_id") % 11 == 0, F.lit(nl + "(b) duplicate tail")).otherwise(F.lit("")),
    )
    raw = F.when(F.col("doc_id") % 5 == 0, F.array_join(F.slice(tk, 1, 40), " ")).otherwise(structured)
    return docs.select(
        F.concat(F.lit("S"), F.col("doc_id").cast("string")).alias("section_id"),
        raw.alias("text"),
    )


def q_chunking_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 reference-fidelity chunking (rag/chunking.py:144-286): letter /
    digit subsection detection with roman + duplicate-label guards, base
    section container, blank-line paragraph split with #pNNNN children and
    greedy kept prefix. Fixture equality vs the rule model is
    pytest-verified (tests/test_chunking_sections.py); this query proves
    the relational pipeline against an independent SQL implementation."""
    from earcrawler_spark.operators.chunking import chunk_sections

    sections = _synth_sections(_t(spark, sf_dir, "documents"))
    out = chunk_sections(sections, max_chars=CHUNK_MAX_CHARS)
    return out.select(
        "chunk_id",
        "section_id",
        "parent_id",
        "chunk_kind",
        F.col("ordinal").cast("int").alias("ordinal"),
        "chunk_text",
        F.col("emit_order").cast("long").alias("emit_order"),
        F.col("split_error").cast("boolean").alias("split_error"),
    ).orderBy("section_id", "emit_order", "chunk_id")


_SQL_CHUNKING_SECTIONS = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t
  FROM documents
), secs AS (
  SELECT 'S' || CAST(doc_id AS VARCHAR) AS sec,
    CASE WHEN doc_id % 5 = 0 THEN coalesce(array_to_string(list_slice(t, 1, 40), ' '), '')
    ELSE
      coalesce(array_to_string(list_slice(t, 1, 6), ' '), '')
      || chr(10) || '(a) ' || coalesce(array_to_string(list_slice(t, 7, 21), ' '), '')
      || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '(i) roman note' ELSE '' END
      || chr(10) || chr(10) || coalesce(array_to_string(list_slice(t, 22, 36), ' '), '')
      || chr(10) || '(b) intro ' || coalesce(array_to_string(list_slice(t, 37, 42), ' '), '')
      || chr(10) || '(1) ' || coalesce(array_to_string(list_slice(t, 43, 57), ' '), '')
      || chr(10) || '(2) ' || coalesce(array_to_string(list_slice(t, 58, 72), ' '), '')
      || CASE WHEN doc_id % 11 = 0 THEN chr(10) || '(b) duplicate tail' ELSE '' END
    END AS raw
  FROM tk
), lines0 AS (
  SELECT sec, raw, regexp_split_to_array(raw, chr(10)) AS arr FROM secs
), lines AS (
  SELECT sec, generate_subscripts(arr, 1) - 1 AS pos, unnest(arr) AS line,
         len(arr) AS n_lines
  FROM lines0
), flagged AS (
  SELECT sec, pos, line,
    CASE WHEN regexp_matches(probe, '^\\s*\\(\\s*([a-z])\\s*\\)\\s')
          AND regexp_extract(probe, '^\\s*\\(\\s*([a-z])\\s*\\)\\s', 1)
              NOT IN ('i', 'v', 'x')
         THEN regexp_extract(probe, '^\\s*\\(\\s*([a-z])\\s*\\)\\s', 1) END AS letter,
    CASE WHEN regexp_matches(probe, '^\\s*\\(\\s*([0-9]+)\\s*\\)\\s')
         THEN regexp_extract(probe, '^\\s*\\(\\s*([0-9]+)\\s*\\)\\s', 1) END AS digit
  FROM (SELECT sec, pos, line,
               CASE WHEN pos < n_lines - 1 THEN line || chr(10) ELSE line END AS probe
        FROM lines)
), blocked AS (
  SELECT *, count(letter) OVER (PARTITION BY sec ORDER BY pos) AS blk FROM flagged
), blocked2 AS (
  SELECT *, CASE WHEN blk > 0
                 THEN count(digit) OVER (PARTITION BY sec, blk ORDER BY pos)
                 ELSE 0 END AS dblk
  FROM blocked
), lguard AS (
  SELECT sec, count(letter) = count(DISTINCT letter) AS letters_ok
  FROM blocked WHERE letter IS NOT NULL GROUP BY sec
), dguard AS (
  SELECT sec, blk, count(digit) = count(DISTINCT digit) AS digits_ok
  FROM blocked2 WHERE digit IS NOT NULL AND blk > 0 GROUP BY sec, blk
), base AS (
  SELECT sec AS chunk_id, sec AS section_id, CAST(NULL AS VARCHAR) AS parent_id,
         'section' AS chunk_kind, CAST(0 AS BIGINT) AS ordinal,
         trim(raw) AS chunk_text, CAST(0 AS BIGINT) AS emit_order
  FROM secs
), lblocks AS (
  SELECT b.sec, b.blk, max(b.letter) AS letter,
         trim(string_agg(b.line, chr(10) ORDER BY b.pos)) AS block_text,
         max(CASE WHEN b.digit IS NOT NULL THEN 1 ELSE 0 END) AS has_digits
  FROM blocked2 b JOIN lguard g USING (sec)
  WHERE b.blk > 0 AND g.letters_ok
  GROUP BY b.sec, b.blk
), lblocks2 AS (
  SELECT l.*, l.sec || '(' || l.letter || ')' AS letter_id,
         (l.has_digits = 1 AND coalesce(d.digits_ok, false)) AS split_digits
  FROM lblocks l LEFT JOIN dguard d ON l.sec = d.sec AND l.blk = d.blk
), whole_letter AS (
  SELECT letter_id AS chunk_id, letter_id AS section_id, sec AS parent_id,
         'subsection' AS chunk_kind, blk AS ordinal, block_text AS chunk_text,
         CAST(blk * 1000000 AS BIGINT) AS emit_order
  FROM lblocks2 WHERE NOT split_digits
), dgroups AS (
  SELECT b.sec, b.blk, l.letter_id, b.dblk, max(b.digit) AS digit,
         trim(string_agg(b.line, chr(10) ORDER BY b.pos)) AS block_text
  FROM blocked2 b JOIN lblocks2 l ON b.sec = l.sec AND b.blk = l.blk AND l.split_digits
  GROUP BY b.sec, b.blk, l.letter_id, b.dblk
), lead AS (
  SELECT letter_id AS chunk_id, letter_id AS section_id, sec AS parent_id,
         'subsection' AS chunk_kind, blk AS ordinal, block_text AS chunk_text,
         CAST(blk * 1000000 AS BIGINT) AS emit_order
  FROM dgroups WHERE dblk = 0 AND block_text <> ''
), dchunks AS (
  SELECT letter_id || '(' || digit || ')' AS chunk_id,
         letter_id || '(' || digit || ')' AS section_id,
         letter_id AS parent_id, 'subsection' AS chunk_kind, dblk AS ordinal,
         block_text AS chunk_text,
         CAST(blk * 1000000 + dblk * 1000 AS BIGINT) AS emit_order
  FROM dgroups WHERE dblk > 0
), containers AS (
  SELECT * FROM base UNION ALL SELECT * FROM whole_letter
  UNION ALL SELECT * FROM lead UNION ALL SELECT * FROM dchunks
), withp AS (
  SELECT c.*, length(chunk_text) > {CHUNK_MAX_CHARS} AS over,
    list_filter(list_transform(regexp_split_to_array(chunk_text, '\\n\\s*\\n'),
                p -> trim(p)), p -> p <> '') AS bp,
    list_filter(list_transform(regexp_split_to_array(chunk_text, '\\n+'),
                p -> trim(p)), p -> p <> '') AS np
  FROM containers c
), withp2 AS (
  SELECT *, CASE WHEN NOT over THEN CAST([] AS VARCHAR[])
                 WHEN len(bp) > 1 THEN bp ELSE np END AS paras
  FROM withp
), kept AS (
  SELECT *, CASE WHEN over THEN greatest(len(list_filter(
      list_transform(range(1, len(paras) + 1),
        i -> list_aggregate(list_transform(list_slice(paras, 1, i),
               p -> length(p) + 2), 'sum') - 2),
      c -> c <= {CHUNK_MAX_CHARS})), 1) ELSE 0 END AS kept_n
  FROM withp2
), parents AS (
  SELECT chunk_id, section_id, parent_id, chunk_kind, ordinal,
         CASE WHEN over THEN array_to_string(list_slice(paras, 1, kept_n),
                                             chr(10) || chr(10))
              ELSE chunk_text END AS chunk_text,
         emit_order, false AS split_error
  FROM kept
), children AS (
  SELECT chunk_id || '#p' || printf('%04d', pidx) AS chunk_id,
         chunk_id AS section_id, chunk_id AS parent_id,
         'paragraph' AS chunk_kind, CAST(pidx AS BIGINT) AS ordinal,
         ptext AS chunk_text,
         CAST(emit_order + pidx AS BIGINT) AS emit_order, false AS split_error
  FROM (SELECT chunk_id, emit_order,
               generate_subscripts(paras, 1) AS pidx, unnest(paras) AS ptext
        FROM kept WHERE over)
)
SELECT chunk_id, section_id, parent_id, chunk_kind, CAST(ordinal AS INT) AS ordinal,
       chunk_text, emit_order, split_error
FROM (SELECT * FROM parents UNION ALL SELECT * FROM children)
ORDER BY section_id, emit_order, chunk_id
"""


FIDELITY_QUERIES = {
    "chunking_sections": q_chunking_sections,
}

FIDELITY_ORACLES = {
    "chunking_sections": _SQL_CHUNKING_SECTIONS,
}
