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
), blocked0 AS (
  SELECT *, count(letter) OVER (PARTITION BY sec ORDER BY pos) AS blk FROM flagged
), blocked0b AS (
  SELECT *, max(CASE WHEN regexp_replace(line, '^\\s+|\\s+$', '', 'g') <> ''
                     THEN pos END) OVER (PARTITION BY sec, blk) AS last_content_pos
  FROM blocked0
), blocked AS (
  -- digit markers live inside the STRIPPED letter block: on the block's
  -- last content line they only count when non-ws follows the ')'
  SELECT sec, pos, line, letter,
         CASE WHEN pos < last_content_pos THEN digit
              WHEN regexp_matches(line, '^\\s*\\(\\s*[0-9]+\\s*\\)\\s*\\S') THEN digit
         END AS digit,
         blk
  FROM blocked0b
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
         regexp_replace(raw, '^\\s+|\\s+$', '', 'g') AS chunk_text, CAST(0 AS BIGINT) AS emit_order
  FROM secs
), lblocks AS (
  SELECT b.sec, b.blk, max(b.letter) AS letter,
         regexp_replace(string_agg(b.line, chr(10) ORDER BY b.pos), '^\\s+|\\s+$', '', 'g') AS block_text,
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
         CAST(blk * 1000000000 AS BIGINT) AS emit_order
  FROM lblocks2 WHERE NOT split_digits
), dgroups AS (
  SELECT b.sec, b.blk, l.letter_id, b.dblk, max(b.digit) AS digit,
         regexp_replace(string_agg(b.line, chr(10) ORDER BY b.pos), '^\\s+|\\s+$', '', 'g') AS block_text
  FROM blocked2 b JOIN lblocks2 l ON b.sec = l.sec AND b.blk = l.blk AND l.split_digits
  GROUP BY b.sec, b.blk, l.letter_id, b.dblk
), lead AS (
  SELECT letter_id AS chunk_id, letter_id AS section_id, sec AS parent_id,
         'subsection' AS chunk_kind, blk AS ordinal, block_text AS chunk_text,
         CAST(blk * 1000000000 AS BIGINT) AS emit_order
  FROM dgroups WHERE dblk = 0 AND block_text <> ''
), dchunks AS (
  SELECT letter_id || '(' || digit || ')' AS chunk_id,
         letter_id || '(' || digit || ')' AS section_id,
         letter_id AS parent_id, 'subsection' AS chunk_kind, dblk AS ordinal,
         block_text AS chunk_text,
         CAST(blk * 1000000000 + dblk * 1000000 AS BIGINT) AS emit_order
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


# --- J6/J7 fidelity: reconcile v2 (9 features, multi-key blocking,
# whitelist/blacklist overrides, hard country reject) ------------------------

RECONCILE_WHITELIST = [("PA000010", "PB000010", "manual whitelist")]
RECONCILE_BLACKLIST = [("PA000020", "PB000020", "manual blacklist")]


def _synth_entities(part: DataFrame) -> DataFrame:
    """Two entities per part row: 'PA' originals and 'PB' variants (exact /
    stopword-suffixed / token-perturbed names, occasional country flips,
    shared duns/cage ids, shared url hosts) — a deterministic domain where
    every feature, block key family, and decision branch fires."""
    k = F.col("p_partkey")
    pad = F.lpad(k.cast("string"), 6, "0")
    country_a = F.concat(F.lit("C"), (k % 4).cast("string"))
    country_b = F.concat(
        F.lit("C"),
        F.when(k % 13 == 0, (k + 1) % 4).otherwise(k % 4).cast("string"),
    )
    duns = F.when(k % 5 == 0, F.concat(F.lit("D"), k.cast("string")))
    cage = F.when(k % 11 == 0, F.concat(F.lit("G"), k.cast("string")))
    host = F.concat(F.lit("https://h"), (k % 97).cast("string"), F.lit(".example.com/"))
    name_b = (
        F.when(k % 3 == 0, F.concat(F.col("p_name"), F.lit(" Inc")))
        .when(k % 3 == 1, F.col("p_name"))
        .otherwise(F.concat(F.col("p_name"), F.lit(" xtra")))
    )
    a = part.select(
        F.concat(F.lit("PA"), pad).alias("id"),
        F.col("p_name").alias("name"),
        country_a.alias("country"),
        F.when(k % 2 == 0, F.lit("tradegov")).otherwise(F.lit("other")).alias("source"),
        duns.alias("duns"),
        cage.alias("cage"),
        F.lit(None).cast("string").alias("fr_doc"),
        F.when(k % 10 < 2, F.concat(host, F.lit("x/"), k.cast("string"))).alias("url"),
    )
    b = part.select(
        F.concat(F.lit("PB"), pad).alias("id"),
        name_b.alias("name"),
        country_b.alias("country"),
        F.when(k % 2 == 0, F.lit("federalregister")).otherwise(F.lit("other")).alias("source"),
        duns.alias("duns"),
        cage.alias("cage"),
        F.lit(None).cast("string").alias("fr_doc"),
        F.when(k % 10 < 2, F.concat(host, F.lit("y/"), k.cast("string"))).alias("url"),
    )
    return a.unionByName(b)


# The decided-pairs table is the contract between reconcile_v2 (emit the
# decisions) and reconcile_summary (aggregate them). At real scale the
# summary reads the PERSISTED decisions table; within one bench/gate
# process we mirror that with a per-(session, sf_dir) localCheckpoint so
# the blocking + 9-feature scoring (incl. the Jaro-Winkler Arrow stage)
# executes once, not once per consumer.
_DECIDED_CACHE: dict[tuple[str, str], DataFrame] = {}


def build_decided_pairs(
    spark: SparkSession, sf_dir: str, materialize_stages: bool = False
) -> DataFrame:
    """The raw (un-checkpointed) blocking → scoring → decisions plan —
    also the target of the plan-shape regression guard, which must see
    the joins, not the materialized scan.

    ``materialize_stages`` (the materialized/bench path, guide §1.2 "the
    distributed algorithm first") fixes the two measured hot spots of the
    raw plan at one-file scale:

    * the entity table derives from ONE tiny parquet split, so the whole
      synthesis (normalize/soundex regexes, key explode) runs at scan
      parallelism 1-2 — and the raw plan re-executes that subtree in
      every self-reference (keyed/sizes/a/b/left/right ≈ 6 scans).
      Repartition to the cluster and localCheckpoint: one distributed
      synthesis, every consumer reads the materialized 40k-row frame.
    * the normalized name is computed per PAIR ROW (2 × 416k regex+HOF
      evaluations — 65 CPU-s in the final stage) instead of per ENTITY
      (2 × 20k).  Carrying norm through the enrichment join cuts that
      stage ~4×; score_pairs_v2 reuses a present norm_a/norm_b.

    Both are O(entities) materializations — at 100 TB the entity table is
    a real distributed table and the same shape holds (the checkpoint
    stands in for the persisted table scan).  Default False keeps the raw
    single-plan shape the guard inspects."""
    from earcrawler_spark.operators.reconcile import (
        blocking_pairs_v2,
        decide_pairs_v2,
        normalize_name_v2,
        score_pairs_v2,
    )

    ents = _synth_entities(_t(spark, sf_dir, "part"))
    attrs = ents
    if materialize_stages:
        par = spark.sparkContext.defaultParallelism
        ents = ents.repartition(par).localCheckpoint()
        attrs = ents.withColumn(
            "norm", normalize_name_v2(F.coalesce(F.col("name"), F.lit("")))
        )
    # attrs carries the precomputed norm; blocking_pairs_v2 reuses it
    pairs = blocking_pairs_v2(attrs if materialize_stages else ents)
    if materialize_stages:
        pairs = pairs.localCheckpoint()
    left = attrs.select(*[F.col(c).alias(f"{c}_a") for c in attrs.columns])
    right = attrs.select(*[F.col(c).alias(f"{c}_b") for c in attrs.columns])
    enriched = pairs.join(left, "id_a").join(right, "id_b")
    scored = score_pairs_v2(enriched)
    decided = decide_pairs_v2(
        scored, whitelist=RECONCILE_WHITELIST, blacklist=RECONCILE_BLACKLIST
    )
    # the decisions-TABLE contract is exactly these columns — carrying
    # the scoring intermediates (token arrays, normalized names) into
    # the shared materialization would double its compute+storage
    return decided.select(
        "id_a", "id_b", "name_exact", "token_jaccard", "jaro_winkler",
        "prefix_overlap", "suffix_overlap", "country_match", "id_equal",
        "url_host", "source_bonus", "score", "decision",
        F.coalesce("reason", F.lit("")).alias("reason"),
    )


def _decided_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DECIDED_CACHE:
        from earcrawler_spark.session import bound_materialization_cache

        bound_materialization_cache(_DECIDED_CACHE, key)
        # cache + eager count, NOT localCheckpoint: checkpointing 416k
        # wide rows re-executes the plan as a raw RDD job (~3x the cost
        # of the pipeline itself); a storage-level cache materializes at
        # pipeline cost and serves every later consumer at read cost
        d = build_decided_pairs(spark, sf_dir, materialize_stages=True).cache()
        d.count()
        _DECIDED_CACHE[key] = d
    return _DECIDED_CACHE[key]


def q_reconcile_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/J7 full reconcile parity (kg/reconcile.py:156-304): multi-key
    blocking (4 lexical keys capped at 64 + duns/cage/fr_doc + url_host),
    9 weighted features incl. Jaro-Winkler / prefix / suffix / attribute
    equality, whitelist/blacklist pair overrides, hard country-mismatch
    reject, rules.yml default weights and thresholds."""
    return _decided_pairs(spark, sf_dir).orderBy("id_a", "id_b")


def _reconcile_v2_sql() -> str:
    from earcrawler_spark.operators.reconcile import (
        MAX_LEXICAL_BLOCK,
        RECONCILE_SOURCE_BONUS,
        RECONCILE_STOPWORDS,
        RECONCILE_THRESHOLDS,
        RECONCILE_WEIGHTS,
        soundex_v2_sql,
    )

    stop = ", ".join(f"'{s}'" for s in RECONCILE_STOPWORDS)

    def norm(x):
        return (
            "array_to_string(list_filter(regexp_split_to_array(trim("
            f"regexp_replace(regexp_replace(lower({x}), '[^\\w\\s]', ' ', 'g'),"
            " '\\s+', ' ', 'g')), ' '), "
            f"t -> t <> '' AND t NOT IN ({stop})), ' ')"
        )

    def prefix_len(a, b):
        return (
            f"len(list_filter(range(1, greatest(least(length({a}), length({b})), 1) + 1), "
            f"i -> length({a}) > 0 AND length({b}) > 0 AND "
            f"substr({a}, 1, CAST(i AS INT)) = substr({b}, 1, CAST(i AS INT))))"
        )

    host = "lower(coalesce(regexp_extract({u}, 'https?://([^/]+)/?', 1), ''))"
    bonus_cases = " ".join(
        f"WHEN {{s}} = '{k}' THEN {v}" for k, v in RECONCILE_SOURCE_BONUS.items()
    )
    bonus = f"CAST((CASE {bonus_cases} ELSE 0.0 END) AS DOUBLE)"
    weights = RECONCILE_WEIGHTS
    wl = ", ".join(f"('{a}', '{b}', '{r}', 'auto_merge')" for a, b, r in RECONCILE_WHITELIST)
    bl = ", ".join(f"('{a}', '{b}', '{r}', 'reject')" for a, b, r in RECONCILE_BLACKLIST)

    return f"""
WITH ents AS (
  SELECT 'PA' || lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS id,
         p_name AS name,
         'C' || CAST(p_partkey % 4 AS VARCHAR) AS country,
         CASE WHEN p_partkey % 2 = 0 THEN 'tradegov' ELSE 'other' END AS source,
         CASE WHEN p_partkey % 5 = 0 THEN 'D' || CAST(p_partkey AS VARCHAR) END AS duns,
         CASE WHEN p_partkey % 11 = 0 THEN 'G' || CAST(p_partkey AS VARCHAR) END AS cage,
         CAST(NULL AS VARCHAR) AS fr_doc,
         CASE WHEN p_partkey % 10 < 2 THEN 'https://h' || CAST(p_partkey % 97 AS VARCHAR)
              || '.example.com/x/' || CAST(p_partkey AS VARCHAR) END AS url
  FROM part
  UNION ALL
  SELECT 'PB' || lpad(CAST(p_partkey AS VARCHAR), 6, '0'),
         CASE WHEN p_partkey % 3 = 0 THEN p_name || ' Inc'
              WHEN p_partkey % 3 = 1 THEN p_name
              ELSE p_name || ' xtra' END,
         'C' || CAST(CASE WHEN p_partkey % 13 = 0 THEN (p_partkey + 1) % 4
                          ELSE p_partkey % 4 END AS VARCHAR),
         CASE WHEN p_partkey % 2 = 0 THEN 'federalregister' ELSE 'other' END,
         CASE WHEN p_partkey % 5 = 0 THEN 'D' || CAST(p_partkey AS VARCHAR) END,
         CASE WHEN p_partkey % 11 = 0 THEN 'G' || CAST(p_partkey AS VARCHAR) END,
         CAST(NULL AS VARCHAR),
         CASE WHEN p_partkey % 10 < 2 THEN 'https://h' || CAST(p_partkey % 97 AS VARCHAR)
              || '.example.com/y/' || CAST(p_partkey AS VARCHAR) END
  FROM part
), normed AS (
  SELECT *, {norm('name')} AS norm,
         regexp_replace({norm('name')}, '[^0-9a-z]', '', 'g') AS alnum
  FROM ents
), keys AS (
  SELECT id, kt, kv FROM (
    SELECT id, 'lexical:country_name' AS kt, country || '-' || alnum AS kv FROM normed
    UNION ALL SELECT id, 'lexical:alnum', alnum FROM normed
    UNION ALL SELECT id, 'lexical:country_soundex',
           country || '-' || {soundex_v2_sql('norm')} FROM normed
    UNION ALL SELECT id, 'lexical:country_token0',
           CASE WHEN norm <> '' THEN country || '-' || string_split(norm, ' ')[1] END
           FROM normed
    UNION ALL SELECT id, 'id:duns', duns FROM normed
    UNION ALL SELECT id, 'id:cage', cage FROM normed
    UNION ALL SELECT id, 'id:fr_doc', fr_doc FROM normed
    UNION ALL SELECT id, 'url_host',
           CASE WHEN url IS NOT NULL THEN {host.format(u='url')} END FROM normed
  ) WHERE kv IS NOT NULL AND kv <> ''
), sizes AS (
  SELECT kt, kv, count(DISTINCT id) AS n FROM keys GROUP BY kt, kv
), ok AS (
  SELECT k.id, k.kt, k.kv FROM keys k JOIN sizes s ON k.kt = s.kt AND k.kv = s.kv
  WHERE s.n >= 2 AND (NOT starts_with(k.kt, 'lexical:') OR s.n <= {MAX_LEXICAL_BLOCK})
), pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM ok a JOIN ok b ON a.kt = b.kt AND a.kv = b.kv AND a.id < b.id
), enriched AS (
  SELECT p.id_a, p.id_b,
         ea.norm AS na, eb.norm AS nb,
         ea.country AS country_a, eb.country AS country_b,
         ea.source AS source_a, eb.source AS source_b,
         ea.duns AS duns_a, eb.duns AS duns_b,
         ea.cage AS cage_a, eb.cage AS cage_b,
         ea.fr_doc AS fr_doc_a, eb.fr_doc AS fr_doc_b,
         ea.url AS url_a, eb.url AS url_b
  FROM pairs p JOIN normed ea ON p.id_a = ea.id JOIN normed eb ON p.id_b = eb.id
), feats AS (
  SELECT id_a, id_b,
    round(CAST(na = nb AS DOUBLE), 6) AS name_exact,
    round(CASE WHEN len(list_distinct(list_concat(
            list_filter(string_split(na, ' '), t -> t <> ''),
            list_filter(string_split(nb, ' '), t -> t <> '')))) > 0
      THEN len(list_intersect(list_distinct(list_filter(string_split(na, ' '), t -> t <> '')),
                              list_distinct(list_filter(string_split(nb, ' '), t -> t <> ''))))
           * 1.0 /
           len(list_distinct(list_concat(
             list_filter(string_split(na, ' '), t -> t <> ''),
             list_filter(string_split(nb, ' '), t -> t <> ''))))
      ELSE 0.0 END, 6) AS token_jaccard,
    round(CAST(jaro_winkler_similarity(na, nb) AS DOUBLE), 6) AS jaro_winkler,
    round(CASE WHEN length(na) > 0 AND length(nb) > 0
      THEN {prefix_len('na', 'nb')} * 1.0 / greatest(length(na), length(nb))
      ELSE 0.0 END, 6) AS prefix_overlap,
    round(CASE WHEN length(na) > 0 AND length(nb) > 0
      THEN {prefix_len('reverse(na)', 'reverse(nb)')} * 1.0 / greatest(length(na), length(nb))
      ELSE 0.0 END, 6) AS suffix_overlap,
    round(CAST(country_a = country_b AS DOUBLE), 6) AS country_match,
    round(CAST(coalesce(duns_a IS NOT NULL AND duns_b IS NOT NULL AND duns_a = duns_b, false)
       OR coalesce(cage_a IS NOT NULL AND cage_b IS NOT NULL AND cage_a = cage_b, false)
       OR coalesce(fr_doc_a IS NOT NULL AND fr_doc_b IS NOT NULL AND fr_doc_a = fr_doc_b, false)
       AS DOUBLE), 6) AS id_equal,
    round(CAST(url_a IS NOT NULL AND {host.format(u='url_a')} <> ''
       AND {host.format(u='url_a')} = {host.format(u='url_b')} AS DOUBLE), 6) AS url_host,
    round({bonus.format(s='source_a')} + {bonus.format(s='source_b')}, 6) AS source_bonus
  FROM enriched
), scored AS (
  -- exact integer score (engine twin in score_pairs_v2): 6-dp features
  -- to micro-int, centi-weights, one final division — bit-stable
  SELECT *, CAST({' + '.join(f'CAST(round({k} * 1000000, 0) AS BIGINT) * {int(round(w * 100))}' for k, w in weights.items())} AS DOUBLE) / CAST(100000000 AS DOUBLE) AS score
  FROM feats
), ov AS (
  SELECT * FROM (VALUES {wl}, {bl}) AS v(id_a, id_b, ov_reason, ov)
), decided AS (
  SELECT f.*,
    CASE WHEN o.ov IS NOT NULL THEN o.ov
         WHEN f.country_match < 1.0 THEN 'reject'
         WHEN f.score >= {RECONCILE_THRESHOLDS['high']} THEN 'auto_merge'
         WHEN f.score >= {RECONCILE_THRESHOLDS['low']} THEN 'review'
         ELSE 'reject' END AS decision,
    CASE WHEN o.ov IS NOT NULL THEN o.ov_reason
         WHEN f.country_match < 1.0 THEN 'country mismatch'
         ELSE '' END AS reason
  FROM scored f LEFT JOIN ov o ON f.id_a = o.id_a AND f.id_b = o.id_b
)
SELECT id_a, id_b, name_exact, token_jaccard, jaro_winkler, prefix_overlap,
       suffix_overlap, country_match, id_equal, url_host, source_bonus,
       CAST(score AS DOUBLE) AS score, decision, reason
FROM decided ORDER BY id_a, id_b
"""


# --- D4/D5/SO1 fidelity: record merge + entity-map merge --------------------

def _synth_fragments(docs: DataFrame) -> DataFrame:
    """Multi-provider record fragments from documents: ~300 record groups,
    per-fragment scalars that are only sometimes populated (first-non-empty
    semantics), shared-per-group content fingerprints with a planted
    conflict in every 37th group, and map<bucket, names> entities with
    dirty buckets/values (' org ', blanks) to exercise normalization."""
    d = F.col("doc_id")
    gid = (d % 300).cast("string")
    tk = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    e = lambda i: F.try_element_at(tk, F.lit(i))
    b1 = F.when(d % 2 == 0, F.lit("ORG")).otherwise(F.lit(" org "))
    entries = F.filter(
        F.array(
            F.struct(b1.alias("key"), F.array(e(1), e(2), F.lit(" ")).alias("value")),
            F.struct(
                F.when(d % 3 == 0, F.lit("PROGRAM")).alias("key"),
                F.array(e(3)).alias("value"),
            ),
        ),
        lambda s: s["key"].isNotNull(),
    )
    return docs.select(
        F.concat(F.lit("R"), gid).alias("record_id"),
        d.alias("seq"),
        F.concat(F.lit("src"), (d % 3).cast("string"), F.lit(":"), d.cast("string")).alias("identifier"),
        F.when(
            (d % 300 % 37 == 0) & (d % 5 == 0),
            F.sha2(F.concat(F.lit("fp-"), d.cast("string")), 256),
        )
        .otherwise(F.sha2(F.concat(F.lit("fp-"), gid), 256))
        .alias("content_sha256"),
        F.when(d % 2 == 0, F.concat(F.lit("https://ex.org/"), d.cast("string"))).alias("source_url"),
        F.when(d % 6 == 0, F.concat(F.lit("2024-01-0"), (d % 9 + 1).cast("string"))).alias("date"),
        F.concat(F.lit("p"), (d % 3).cast("string")).alias("provider"),
        F.when(d % 4 == 0, F.concat(F.lit("sec"), (d % 7).cast("string"))).alias("section"),
        F.when(d % 3 == 1, F.lit("")).otherwise(F.concat(F.lit("text for R"), gid)).alias("paragraph"),
        F.map_from_entries(entries).alias("entities"),
    )


def q_record_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/D5/SO1 full record merge (corpus/records.py:84-125 +
    corpus/entities.py:30-66): identifiers union+sort, first-non-empty
    scalars in fragment order, bucket-wise map<string,array<string>>
    entity merge with bucket/value normalization, conflicting-fingerprint
    detection (flag mode here; 'error' mode raises in-plan and is
    pytest-verified)."""
    from earcrawler_spark.operators.records import (
        entities_json,
        merge_corpus_records,
    )

    frags = _synth_fragments(_t(spark, sf_dir, "documents"))
    merged = merge_corpus_records(frags, on_conflict="flag")
    return merged.select(
        "record_id",
        F.array_join("identifiers", "|").alias("identifiers"),
        "content_sha256",
        "source_url",
        "date",
        "provider",
        "section",
        "paragraph",
        "n_fragments",
        "conflict",
        entities_json(F.col("entities")).alias("entities_json"),
    ).orderBy("record_id")


_SQL_RECORD_MERGE_FULL = """
WITH frags AS (
  SELECT doc_id, doc_id AS seq,
         'R' || CAST(doc_id % 300 AS VARCHAR) AS record_id,
         'src' || CAST(doc_id % 3 AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR) AS identifier,
         CASE WHEN (doc_id % 300) % 37 = 0 AND doc_id % 5 = 0
              THEN sha256('fp-' || CAST(doc_id AS VARCHAR))
              ELSE sha256('fp-' || CAST(doc_id % 300 AS VARCHAR)) END AS content_sha256,
         CASE WHEN doc_id % 2 = 0 THEN 'https://ex.org/' || CAST(doc_id AS VARCHAR) END AS source_url,
         CASE WHEN doc_id % 6 = 0 THEN '2024-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) END AS date_s,
         'p' || CAST(doc_id % 3 AS VARCHAR) AS provider,
         CASE WHEN doc_id % 4 = 0 THEN 'sec' || CAST(doc_id % 7 AS VARCHAR) END AS section,
         CASE WHEN doc_id % 3 = 1 THEN ''
              ELSE 'text for R' || CAST(doc_id % 300 AS VARCHAR) END AS paragraph,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
), ent_rows AS (
  SELECT record_id,
         CASE WHEN doc_id % 2 = 0 THEN 'ORG' ELSE ' org ' END AS bucket_raw, tk[1] AS v
  FROM frags
  UNION ALL SELECT record_id,
         CASE WHEN doc_id % 2 = 0 THEN 'ORG' ELSE ' org ' END, tk[2] FROM frags
  UNION ALL SELECT record_id,
         CASE WHEN doc_id % 2 = 0 THEN 'ORG' ELSE ' org ' END, ' ' FROM frags
  UNION ALL SELECT record_id, 'PROGRAM', tk[3] FROM frags WHERE doc_id % 3 = 0
), cleaned AS (
  SELECT record_id, upper(trim(bucket_raw)) AS bucket, trim(v) AS v
  FROM ent_rows
  WHERE trim(coalesce(bucket_raw, '')) <> '' AND trim(coalesce(v, '')) <> ''
), buckets AS (
  SELECT record_id, bucket, list_sort(list_distinct(list(v))) AS names
  FROM cleaned GROUP BY record_id, bucket
), ejson AS (
  SELECT record_id,
         '{' || string_agg('"' || bucket || '":["' || array_to_string(names, '","') || '"]',
                           ',' ORDER BY bucket) || '}' AS entities_json
  FROM buckets GROUP BY record_id
), scal AS (
  SELECT record_id,
         array_to_string(list_sort(list(DISTINCT identifier)), '|') AS identifiers,
         coalesce(min(nullif(content_sha256, '')), '') AS content_sha256,
         arg_min(source_url, seq) FILTER (WHERE source_url IS NOT NULL AND source_url <> '') AS source_url,
         arg_min(date_s, seq) FILTER (WHERE date_s IS NOT NULL AND date_s <> '') AS "date",
         arg_min(provider, seq) FILTER (WHERE provider IS NOT NULL AND provider <> '') AS provider,
         arg_min(section, seq) FILTER (WHERE section IS NOT NULL AND section <> '') AS section,
         arg_min(paragraph, seq) FILTER (WHERE paragraph IS NOT NULL AND paragraph <> '') AS paragraph,
         count(*) AS n_fragments,
         count(DISTINCT nullif(content_sha256, '')) > 1 AS conflict
  FROM frags GROUP BY record_id
)
SELECT s.record_id, s.identifiers, s.content_sha256, s.source_url, s."date",
       s.provider, s.section, s.paragraph, s.n_fragments, s.conflict,
       coalesce(e.entities_json, '{}') AS entities_json
FROM scal s LEFT JOIN ejson e ON s.record_id = e.record_id
ORDER BY s.record_id
"""


# --- P13 fidelity: IRI minting + legacy canonicalization --------------------

def q_iri_minting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 IRI fidelity (kg/iri.py:21-122): canonical section ids ('15
    CFR ddd' forms), sha256-prefix paragraph tokens, percent-encoded
    entity IRIs, and the idempotent legacy-namespace rewrite — each
    branch exercised over inputs derived from documents."""
    from earcrawler_spark.functions import iri as I

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s3 = (700 + d % 300).cast("string")
    section_in = (
        F.when(d % 4 == 0, F.concat(F.lit("15 CFR "), s3, F.lit("."), (d % 20).cast("string")))
        .when(d % 4 == 1, s3)
        .when(d % 4 == 2, F.concat(F.lit("EAR-"), s3, F.lit("#frag")))
        .otherwise(F.concat(F.lit("Part "), s3))
    )
    para_in = F.when(d % 2 == 0, F.sha2("text", 256)).otherwise(
        F.concat(F.lit("tok "), d.cast("string"))
    )
    entity_in = F.concat(F.lit("Acme Corp #"), (d % 50).cast("string"))
    legacy_in = (
        F.when(d % 8 == 0, F.lit(I.LEGACY_EAR + "reg"))
        .when(d % 8 == 1, F.concat(F.lit(I.LEGACY_EAR + "p_"), F.sha2("text", 256)))
        .when(d % 8 == 2, F.concat(F.lit(I.LEGACY_EAR + "s_"), s3, F.lit("_2")))
        .when(d % 8 == 3, F.concat(F.lit(I.LEGACY_EAR + "entity/Acme "), s3))
        .when(d % 8 == 4, F.concat(F.lit(I.LEGACY_EAR + "policy/x/"), s3))
        .when(d % 8 == 5, F.lit(I.LEGACY_EAR + "SomeClass"))
        .when(d % 8 == 6, F.lit(I.LEGACY_ENT + "Entity"))
        .otherwise(F.concat(F.lit(I.LEGACY_ENT + "E"), s3))
    )
    out = (
        docs.select(d.alias("doc_id"), F.lit("section").alias("kind"),
                    I.section_iri(section_in).alias("iri"))
        .unionByName(docs.select(d.alias("doc_id"), F.lit("paragraph").alias("kind"),
                                 I.paragraph_iri(para_in).alias("iri")))
        .unionByName(docs.select(d.alias("doc_id"), F.lit("entity").alias("kind"),
                                 I.entity_iri(entity_in).alias("iri")))
        .unionByName(docs.select(d.alias("doc_id"), F.lit("legacy").alias("kind"),
                                 I.canonicalize_iri(legacy_in).alias("iri")))
    )
    # idempotence is part of the contract: canonicalizing the output again
    # must be a no-op — emit it canonicalized twice.
    return out.select(
        "doc_id", "kind", I.canonicalize_iri(F.col("iri")).alias("iri")
    ).orderBy("doc_id", "kind")


def _iri_sql() -> str:
    from earcrawler_spark.functions import iri as I

    def q(x):
        return (
            "array_to_string(list_transform(list_filter(string_split("
            f"{x}, ''), c -> c <> ''), c -> CASE WHEN regexp_matches(c, "
            "'^[A-Za-z0-9._~-]$') THEN c ELSE "
            "regexp_replace(hex(encode(c)), '(..)', '%\\1', 'g') "
            "END), '')"
        )

    def canon_section(x):
        return f"""CASE
          WHEN trim({x}) = '' THEN NULL
          WHEN upper(trim({x})) LIKE 'EAR-%' THEN trim(string_split(trim({x}), '#')[1])
          WHEN regexp_matches(trim({x}), '(?i)^(?:15\\s*CFR\\s*)?([0-9]{{3}}(?:\\.\\S+)?)$')
            THEN 'EAR-' || regexp_extract(trim({x}), '(?i)^(?:15\\s*CFR\\s*)?([0-9]{{3}}(?:\\.\\S+)?)$', 1)
          ELSE trim({x}) END"""

    def para(x):
        return (
            f"'{I.RESOURCE_NS}ear/paragraph/' || CASE WHEN regexp_matches(trim({x}), "
            f"'^[0-9a-fA-F]{{64}}$') THEN lower(substr(trim({x}), 1, 16)) "
            f"ELSE {q(f'trim({x})')} END"
        )

    def entity(x):
        inner = "replace(trim(" + x + "), ' ', '_')"
        return f"'{I.ENTITY_NS}' || {q(inner)}"

    def section(x):
        inner = f"coalesce({canon_section(x)}, trim({x}))"
        return f"'{I.RESOURCE_NS}ear/section/' || {q(inner)}"

    def res_path(x):
        return (
            f"'{I.RESOURCE_NS}' || array_to_string(list_transform(list_filter("
            f"list_transform(string_split({x}, '/'), s -> trim(s)), s -> s <> ''), "
            f"s -> {q('s')}), '/')"
        )

    ear_len = len(I.LEGACY_EAR)
    ent_len = len(I.LEGACY_ENT)
    canon_legacy = f"""CASE
      WHEN li LIKE '{I.LEGACY_EAR}%' THEN (
        CASE
          WHEN substr(li, {ear_len + 1}) = 'reg' THEN '{I.RESOURCE_NS}ear/reg'
          WHEN substr(li, {ear_len + 1}) LIKE 'p\\_%' ESCAPE '\\'
            THEN {para(f"substr(li, {ear_len + 3})")}
          WHEN substr(li, {ear_len + 1}) LIKE 's\\_%' ESCAPE '\\'
            THEN {section(f"replace(substr(li, {ear_len + 3}), '_', '.')")}
          WHEN substr(li, {ear_len + 1}) LIKE 'entity/%'
            THEN {entity(f"substr(li, {ear_len + 8})")}
          WHEN substr(li, {ear_len + 1}) LIKE '%/%'
            THEN {res_path(f"'ear/' || substr(li, {ear_len + 1})")}
          ELSE '{I.SCHEMA_NS}' || substr(li, {ear_len + 1})
        END)
      WHEN li LIKE '{I.LEGACY_ENT}%' THEN (
        CASE WHEN substr(li, {ent_len + 1}) = 'Entity'
                  OR substr(li, {ent_len + 1}) LIKE '%Shape'
             THEN '{I.SCHEMA_NS}' || substr(li, {ent_len + 1})
             ELSE {entity(f"substr(li, {ent_len + 1})")} END)
      ELSE li END"""

    section_input = (
        "CASE WHEN doc_id % 4 = 0 THEN '15 CFR ' || s3 || '.' || CAST(doc_id % 20 AS VARCHAR) "
        "WHEN doc_id % 4 = 1 THEN s3 "
        "WHEN doc_id % 4 = 2 THEN 'EAR-' || s3 || '#frag' "
        "ELSE 'Part ' || s3 END"
    )
    para_input = (
        "CASE WHEN doc_id % 2 = 0 THEN sha256(text) "
        "ELSE 'tok ' || CAST(doc_id AS VARCHAR) END"
    )
    entity_input = "'Acme Corp #' || CAST(doc_id % 50 AS VARCHAR)"
    return f"""
WITH d AS (
  SELECT doc_id, text, CAST(700 + doc_id % 300 AS VARCHAR) AS s3 FROM documents
), rows_ AS (
  SELECT doc_id, 'section' AS kind,
    {section(section_input)} AS iri
  FROM d
  UNION ALL
  SELECT doc_id, 'paragraph',
    {para(para_input)}
  FROM d
  UNION ALL
  SELECT doc_id, 'entity', {entity(entity_input)} FROM d
  UNION ALL
  SELECT doc_id, 'legacy', (
    SELECT {canon_legacy} FROM (SELECT CASE
      WHEN doc_id % 8 = 0 THEN '{I.LEGACY_EAR}reg'
      WHEN doc_id % 8 = 1 THEN '{I.LEGACY_EAR}p_' || sha256(text)
      WHEN doc_id % 8 = 2 THEN '{I.LEGACY_EAR}s_' || s3 || '_2'
      WHEN doc_id % 8 = 3 THEN '{I.LEGACY_EAR}entity/Acme ' || s3
      WHEN doc_id % 8 = 4 THEN '{I.LEGACY_EAR}policy/x/' || s3
      WHEN doc_id % 8 = 5 THEN '{I.LEGACY_EAR}SomeClass'
      WHEN doc_id % 8 = 6 THEN '{I.LEGACY_ENT}Entity'
      ELSE '{I.LEGACY_ENT}E' || s3 END AS li) t)
  FROM d
)
SELECT doc_id, kind, iri FROM rows_ ORDER BY doc_id, kind
"""


# --- P14 fidelity: date normalization with the 1970 fallback -----------------

from earcrawler_spark.functions.text import (  # noqa: E402
    _ISO_SHAPE,
    DEFAULT_DATE,
    normalise_date,
)


def q_date_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 date normalization (corpus/metadata.py:24-31) over a
    deterministic mix of valid ISO dates/timestamps, shaped-but-invalid
    dashed strings, unshaped strings, empties and nulls."""
    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    iso = F.date_format(F.col("o_orderdate"), "yyyy-MM-dd")
    raw = (
        F.when(k % 7 == 0, F.lit(None).cast("string"))
        .when(k % 7 == 1, F.lit(""))
        .when(k % 7 == 2, iso)
        .when(k % 7 == 3, F.concat(iso, F.lit("T10:30:00")))
        .when(k % 7 == 4, F.lit("1998-13-45"))
        .when(k % 7 == 5, F.lit("not a date"))
        .otherwise(F.lit("19980102"))
    )
    return orders.select(
        k.alias("o_orderkey"),
        F.coalesce(raw, F.lit("<null>")).alias("raw"),
        normalise_date(raw).alias("date_norm"),
    ).orderBy("o_orderkey")


_SQL_DATE_NORM = f"""
WITH src AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL
         WHEN o_orderkey % 7 = 1 THEN ''
         WHEN o_orderkey % 7 = 2 THEN strftime(o_orderdate, '%Y-%m-%d')
         WHEN o_orderkey % 7 = 3 THEN strftime(o_orderdate, '%Y-%m-%d') || 'T10:30:00'
         WHEN o_orderkey % 7 = 4 THEN '1998-13-45'
         WHEN o_orderkey % 7 = 5 THEN 'not a date'
         ELSE '19980102' END AS raw0
  FROM orders
), prep AS (
  SELECT o_orderkey, raw0,
    CASE WHEN trim(coalesce(raw0, '{DEFAULT_DATE}')) = '' THEN '{DEFAULT_DATE}'
         ELSE trim(coalesce(raw0, '{DEFAULT_DATE}')) END AS raw
  FROM src
)
SELECT o_orderkey, coalesce(raw0, '<null>') AS raw,
  CASE
    WHEN regexp_matches(raw, '{_ISO_SHAPE}')
         AND TRY_CAST(substr(raw, 1, 10) AS DATE) IS NOT NULL
      THEN strftime(TRY_CAST(substr(raw, 1, 10) AS DATE), '%Y-%m-%d')
    WHEN regexp_matches(raw, '^\\d{{8}}$')
         AND try_strptime(raw, '%Y%m%d') IS NOT NULL
      THEN strftime(try_strptime(raw, '%Y%m%d'), '%Y-%m-%d')
    WHEN length(raw) = 10 AND substr(raw, 5, 1) = '-' AND substr(raw, 8, 1) = '-'
      THEN raw
    ELSE '{DEFAULT_DATE}'
  END AS date_norm
FROM prep
ORDER BY o_orderkey
"""


# --- P3/P15: FR-citation + ISO-date mining (oracle-checked) ------------------

def q_text_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 FR-citation extraction (core/ear_crawler.py:76-78) and P15
    ISO-date mining (rag/temporal.py:34-44) as an oracle-gated query:
    deterministic citation/date snippets are woven into the documents
    and mined back out."""
    from earcrawler_spark.functions.text import (
        extract_fr_citations,
        extract_iso_dates,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    decorated = F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" effective 199"), (d % 9).cast("string"),
                F.lit("-0"), (d % 9 + 1).cast("string"),
                F.lit("-1"), (d % 9).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" see "), (d % 90 + 1).cast("string"),
                F.lit(" FR "), (d % 70000 + 1).cast("string"),
                F.lit(" and 200"), (d % 9).cast("string"),
                F.lit("-12-31"),
            ),
        ).otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit(" cf. 61 FR 12345")).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        F.array_join(extract_fr_citations(decorated), "|").alias("fr_citations"),
        F.array_join(F.array_sort(extract_iso_dates(decorated)), "|").alias("iso_dates"),
        F.size(extract_fr_citations(decorated)).alias("n_citations"),
        F.size(extract_iso_dates(decorated)).alias("n_dates"),
    ).orderBy("doc_id")


_SQL_TEXT_MINING = r"""
WITH dec AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0
            THEN ' effective 199' || CAST(doc_id % 9 AS VARCHAR)
                 || '-0' || CAST(doc_id % 9 + 1 AS VARCHAR)
                 || '-1' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' see ' || CAST(doc_id % 90 + 1 AS VARCHAR)
                 || ' FR ' || CAST(doc_id % 70000 + 1 AS VARCHAR)
                 || ' and 200' || CAST(doc_id % 9 AS VARCHAR) || '-12-31'
            ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN ' cf. 61 FR 12345' ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       coalesce(array_to_string(regexp_extract_all(t, '\b\d{1,3} FR \d{1,6}\b'), '|'), '') AS fr_citations,
       coalesce(array_to_string(list_sort(list_distinct(
           regexp_extract_all(t, '\d{4}-\d{2}-\d{2}'))), '|'), '') AS iso_dates,
       len(regexp_extract_all(t, '\b\d{1,3} FR \d{1,6}\b')) AS n_citations,
       len(list_distinct(regexp_extract_all(t, '\d{4}-\d{2}-\d{2}'))) AS n_dates
FROM dec
ORDER BY doc_id
"""


# --- P7 fidelity: GRANT/ORG/PERSON regex entity extraction ------------------

GRANT_PAT = r"\b(?:R01|R21|R03|U01|P30|K99|F31|DOD|NSF|DOE)[-\s]?[A-Z0-9-]+"
ORG_PAT = (
    r"\b(?:University|College|Institute|Laborator(?:y|ies)|Inc\.|LLC|Ltd\.|GmbH|AG|SAS|PLC)"
    r"(?:\s+(?:of|and|for|the|[A-Z][a-z]+)){0,5}"
)
PERSON_PAT = r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+"


def q_entity_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 regex entity extraction — reference parity
    (core/nsf_case_parser.py:18-49): GRANT ids (agency-prefix forms),
    ORG phrases (keyword + up-to-5 connective/capitalized tail,
    whitespace-normalized), PERSON (2+ capitalized words, skipped when
    the match itself starts like an ORG), sorted distinct union. Entity
    snippets are woven into the documents deterministically."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    person = F.array("text")  # placeholder to keep linters calm
    _ = person
    decorated = F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.concat(F.lit(" NSF-"), (d % 100000).cast("string"))).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" University of "),
                F.element_at(F.array(F.lit("Testing"), F.lit("Research"), F.lit("Science")), (d % 3 + 1).cast("int")),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" John "),
                F.element_at(F.array(F.lit("Smith"), F.lit("Doe"), F.lit("Roe")), (d % 3 + 1).cast("int")),
            ),
        ).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit(" Acme Institute Inc. case K99 AB-12")).otherwise(F.lit("")),
    )
    grants = F.transform(
        F.regexp_extract_all(decorated, F.lit(GRANT_PAT), F.lit(0)),
        lambda m: F.trim(m),
    )
    orgs = F.transform(
        F.regexp_extract_all(decorated, F.lit(ORG_PAT), F.lit(0)),
        lambda m: F.trim(F.regexp_replace(m, r"\s+", " ")),
    )
    persons = F.filter(
        F.regexp_extract_all(decorated, F.lit(PERSON_PAT), F.lit(0)),
        lambda m: ~m.rlike("^" + ORG_PAT.replace(r"\b", "", 1)),
    )
    entities = F.array_sort(
        F.array_distinct(F.concat(grants, orgs, F.transform(persons, lambda m: F.trim(m))))
    )
    return (
        docs.select(d.alias("doc_id"), F.explode(entities).alias("entity"))
        .orderBy("doc_id", "entity")
    )


def _entity_extraction_sql() -> str:
    org_anchor = "^" + ORG_PAT.replace(r"\b", "", 1)
    return f"""
WITH dec AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN ' NSF-' || CAST(doc_id % 100000 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ' University of ' ||
         (['Testing', 'Research', 'Science'])[CAST(doc_id % 3 + 1 AS INT)] ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' John ' ||
         (['Smith', 'Doe', 'Roe'])[CAST(doc_id % 3 + 1 AS INT)] ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' Acme Institute Inc. case K99 AB-12' ELSE '' END AS t
  FROM documents
), ents AS (
  SELECT doc_id,
    list_sort(list_distinct(list_concat(list_concat(
      list_transform(regexp_extract_all(t, '{GRANT_PAT}'), m -> trim(m)),
      list_transform(regexp_extract_all(t, '{ORG_PAT}'),
                     m -> trim(regexp_replace(m, '\\s+', ' ', 'g')))),
      list_transform(list_filter(regexp_extract_all(t, '{PERSON_PAT}'),
                                 m -> NOT regexp_matches(m, '{org_anchor}')),
                     m -> trim(m))
    ))) AS entities
  FROM dec
)
SELECT doc_id, unnest(entities) AS entity
FROM ents
ORDER BY doc_id, entity
"""


# --- A7 fidelity: reconcile run summary -------------------------------------

def q_reconcile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 reconcile summary (kg/reconcile.py:322-345): per-decision
    counts, per-feature averages, and the blocking pair-stats (all-pairs
    total, candidates evaluated, reduction ratio) — one row per decision
    plus an 'ALL' rollup. Both scalars ride 1-row broadcast aggregates;
    no driver actions in the query path."""
    from earcrawler_spark.operators.reconcile import RECONCILE_WEIGHTS

    # aggregate the SHARED decided-pairs materialization (the persisted
    # decisions-table contract) — the blocking+scoring pipeline runs once
    # per session/sf even when reconcile_v2 also runs in the same bench
    decided = _decided_pairs(spark, sf_dir)
    feats = sorted(RECONCILE_WEIGHTS)

    # Exact-integer mean: a float avg() accumulates in partition order,
    # so its low bits are association-dependent (the class the score fix
    # removed).  The 6-dp features are within 1 ulp of micro-int
    # multiples, so sum BIGINT micros and divide once — bit-stable
    # across engines, partitionings and runs.
    def _avg_exact(f: str):
        sum_micro = F.sum(F.round(F.col(f) * 1_000_000, 0).cast("bigint"))
        return F.round(
            sum_micro.cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1_000_000).cast("double"),
            6,
        ).alias(f"avg_{f}")

    per_decision = decided.groupBy("decision").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        *[_avg_exact(f) for f in feats],
    )
    overall = decided.agg(
        F.lit("ALL").alias("decision"),
        F.count(F.lit(1)).alias("n_pairs"),
        *[_avg_exact(f) for f in feats],
    )
    stats = (
        _synth_entities(_t(spark, sf_dir, "part"))
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .crossJoin(F.broadcast(decided.agg(F.count(F.lit(1)).alias("evaluated"))))
        .select(
            (F.col("n_entities") * (F.col("n_entities") - 1) / 2)
            .cast("long")
            .alias("all_pairs_total"),
            "evaluated",
        )
        .select(
            "all_pairs_total",
            F.round(
                (F.col("all_pairs_total") - F.col("evaluated"))
                / F.col("all_pairs_total"),
                6,
            ).alias("candidate_reduction_ratio"),
        )
    )
    return (
        per_decision.unionByName(overall)
        .crossJoin(F.broadcast(stats))
        .orderBy("decision")
    )


FIDELITY_QUERIES = {
    "chunking_sections": q_chunking_sections,
    "entity_extraction": q_entity_extraction,
    "date_normalization": q_date_normalization,
    "text_mining": q_text_mining,
    "reconcile_v2": q_reconcile_v2,
    "reconcile_summary": q_reconcile_summary,
    "record_merge_full": q_record_merge_full,
    "iri_minting": q_iri_minting,
}

FIDELITY_ORACLES = {
    "chunking_sections": _SQL_CHUNKING_SECTIONS,
    "entity_extraction": _entity_extraction_sql(),
    "date_normalization": _SQL_DATE_NORM,
    "text_mining": _SQL_TEXT_MINING,
    "reconcile_v2": _reconcile_v2_sql(),
    "reconcile_summary": None,  # filled below (built from the v2 SQL)
    "record_merge_full": _SQL_RECORD_MERGE_FULL,
    "iri_minting": _iri_sql(),
}


def _reconcile_summary_sql() -> str:
    from earcrawler_spark.operators.reconcile import RECONCILE_WEIGHTS

    feats = sorted(RECONCILE_WEIGHTS)
    # exact-integer mean (engine twin in q_reconcile_summary)
    avgs = ", ".join(
        f"round(CAST(sum(CAST(round({f} * 1000000, 0) AS BIGINT)) AS DOUBLE)"
        f" / CAST(count(*) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS avg_{f}"
        for f in feats
    )
    return f"""
WITH decided AS ({_reconcile_v2_sql()}),
stats AS (
  SELECT CAST(n * (n - 1) / 2 AS BIGINT) AS all_pairs_total,
         round((n * (n - 1) / 2 - evaluated) * 1.0 / (n * (n - 1) / 2), 6)
           AS candidate_reduction_ratio
  FROM (SELECT 2 * count(*) AS n FROM part),
       (SELECT count(*) AS evaluated FROM decided)
), per AS (
  SELECT decision, count(*) AS n_pairs, {avgs} FROM decided GROUP BY decision
  UNION ALL
  SELECT 'ALL', count(*), {avgs.replace(' AS avg_', ' AS avg_')}
  FROM decided
)
SELECT per.*, stats.* FROM per, stats ORDER BY decision
"""


FIDELITY_ORACLES["reconcile_summary"] = _reconcile_summary_sql()


# --- D7/J14 fidelity: provenance upsert + anchor index ----------------------

def q_provenance_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 hash-gated provenance upsert (kg/provenance_store.py:85-131):
    previous manifest = subjects from even order keys; current run =
    subjects from keys % 3 == 0 with every 4th hash changed — emits the
    new manifest with the changed flag (regenerate signal)."""
    from earcrawler_spark.operators.kg import provenance_upsert

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    subject = F.concat(F.lit("https://ear.example.org/resource/order/"),
                       (k % 2000).cast("string"))
    prev = orders.filter(k % 2 == 0).select(
        subject.alias("subject"),
        F.sha2(F.concat(F.lit("h"), (k % 2000).cast("string")), 256).alias("content_hash"),
    ).dropDuplicates(["subject"])
    current = orders.filter(k % 3 == 0).select(
        subject.alias("subject"),
        F.concat(F.lit("https://src/"), (k % 2000).cast("string")).alias("source_url"),
        F.lit("ear.example.org").alias("provider"),
        F.when(k % 5 == 0, F.lit("2024-03-01")).otherwise(F.lit("2024-03-01T08:00:00Z")).alias("retrieved_at"),
        F.sha2(
            F.concat(F.lit("h"), ((k % 2000) + F.when(k % 4 == 0, 1).otherwise(0)).cast("string")),
            256,
        ).alias("content_hash"),
        F.lit(None).cast("string").alias("request_url"),
    ).dropDuplicates(["subject"])
    return (
        provenance_upsert(prev, current)
        .select("subject", "source_url", "provider", "retrieved_at",
                "content_hash", "changed")
        .orderBy("subject")
    )


_SQL_PROVENANCE = """
WITH prev AS (
  SELECT DISTINCT ON (subject) subject, content_hash FROM (
    SELECT 'https://ear.example.org/resource/order/' || CAST(o_orderkey % 2000 AS VARCHAR) AS subject,
           sha256('h' || CAST(o_orderkey % 2000 AS VARCHAR)) AS content_hash
    FROM orders WHERE o_orderkey % 2 = 0)
), cur AS (
  SELECT DISTINCT ON (subject) * FROM (
    SELECT 'https://ear.example.org/resource/order/' || CAST(o_orderkey % 2000 AS VARCHAR) AS subject,
           'https://src/' || CAST(o_orderkey % 2000 AS VARCHAR) AS source_url,
           'ear.example.org' AS provider,
           CASE WHEN o_orderkey % 5 = 0 THEN '2024-03-01' ELSE '2024-03-01T08:00:00Z' END AS retrieved_at,
           sha256('h' || CAST(o_orderkey % 2000 + CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END AS VARCHAR)) AS content_hash
    FROM orders WHERE o_orderkey % 3 = 0)
)
SELECT c.subject, c.source_url, c.provider,
       CASE WHEN c.retrieved_at NOT LIKE '%T%' AND c.retrieved_at <> ''
            THEN c.retrieved_at || 'T00:00:00Z' ELSE c.retrieved_at END AS retrieved_at,
       c.content_hash,
       (p.content_hash IS NULL OR p.content_hash <> c.content_hash) AS changed
FROM cur c LEFT JOIN prev p ON c.subject = p.subject
ORDER BY c.subject
"""


def q_part_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 part-anchor grouping (kg/anchors.py:43-59): anchors normalize
    (strip / whitespace-collapse / empty-date -> null) and order
    deterministically by (document_id, lower(title)) within each part."""
    from earcrawler_spark.operators.kg import anchor_index

    part = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    anchors = part.select(
        F.concat(F.lit("PART-"), (k % 50).cast("string")).alias("part"),
        F.concat(F.lit("D"), F.lpad(k.cast("string"), 6, "0")).alias("document_id"),
        F.concat(F.lit("\t "), F.when(k % 2 == 0, F.upper("p_name")).otherwise(F.col("p_name")), F.lit(" \n")).alias("title"),
        F.concat(F.lit(" https://fr.example/d/"), k.cast("string"), F.lit(" ")).alias("source_url"),
        F.concat(F.lit("snippet   with    "), F.col("p_name"), F.lit("  spaces")).alias("snippet"),
        # k%3==0: padded real date -> stripped; k%3==1: truthy
        # whitespace-only -> '' (reference keeps empty string, not null);
        # k%3==2: NULL -> null
        F.when(k % 3 == 0, F.lit(" 2024-01-15 ")).when(k % 3 == 1, F.lit("  ")).alias("publication_date"),
    )
    return anchor_index(anchors).orderBy("part", "ordinal")


_SQL_PART_ANCHORS = """
WITH anchors AS (
  SELECT 'PART-' || CAST(p_partkey % 50 AS VARCHAR) AS part,
         'D' || lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS document_id,
         regexp_replace(chr(9) || ' ' || CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END || ' ' || chr(10), '^\\s+|\\s+$', '', 'g') AS title,
         trim(' https://fr.example/d/' || CAST(p_partkey AS VARCHAR) || ' ') AS source_url,
         trim(regexp_replace('snippet   with    ' || p_name || '  spaces', '\\s+', ' ', 'g')) AS snippet,
         CASE WHEN p_partkey % 3 = 0 THEN '2024-01-15'
              WHEN p_partkey % 3 = 1 THEN '' END AS publication_date
  FROM part
)
SELECT part, document_id, title, source_url, snippet, publication_date,
       row_number() OVER (PARTITION BY part ORDER BY document_id, lower(title)) AS ordinal
FROM anchors
ORDER BY part, ordinal
"""


# --- EAR part-number mining (transforms/ear_fr_to_rdf.py:8-22) ---------------

PART_MINE_PATTERN = r"(?i)\b15\s*CFR\s*Part\s*(\d{3})\b"


def q_part_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_parts_from_text + pick_parts
    (transforms/ear_fr_to_rdf.py:8-22): '15 CFR Part NNN' mentions
    (case-insensitive, whitespace-tolerant) mined per doc into the
    sorted distinct digit list; docs without mentions are absent (the
    reference returns an empty set)."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    seeded = F.concat(
        F.col("text"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" See 15 CFR Part "),
                (700 + d % 37).cast("string"),
                F.lit(" and 15 cfr part 744."),
            ),
        ).otherwise(F.lit("")),
        F.when(d % 10 == 3, F.lit(" Also 15  CFR  PART 736 applies; part 99 does not.")).otherwise(F.lit("")),
    )
    parts = F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(seeded, F.lit(PART_MINE_PATTERN), F.lit(1))
        )
    )
    return (
        docs.select("doc_id", F.array_join(parts, "|").alias("parts"))
        .filter(F.col("parts") != "")
        .orderBy("doc_id")
    )


_SQL_PART_MINING = r"""
WITH seeded AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0
                 THEN ' See 15 CFR Part ' || CAST(700 + doc_id % 37 AS VARCHAR)
                      || ' and 15 cfr part 744.' ELSE '' END
         || CASE WHEN doc_id % 10 = 3
                 THEN ' Also 15  CFR  PART 736 applies; part 99 does not.'
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       array_to_string(list_sort(list_distinct(
         regexp_extract_all(t, '(?i)\b15\s*CFR\s*Part\s*(\d{3})\b', 1))), '|') AS parts
FROM seeded
WHERE len(regexp_extract_all(t, '(?i)\b15\s*CFR\s*Part\s*(\d{3})\b', 1)) > 0
ORDER BY doc_id
"""


FIDELITY_QUERIES["part_mining"] = q_part_mining
FIDELITY_ORACLES["part_mining"] = _SQL_PART_MINING

FIDELITY_QUERIES["provenance_upsert"] = q_provenance_upsert
FIDELITY_QUERIES["part_anchors"] = q_part_anchors
FIDELITY_ORACLES["provenance_upsert"] = _SQL_PROVENANCE
FIDELITY_ORACLES["part_anchors"] = _SQL_PART_ANCHORS


# --- J10 full: hybrid RRF over the DENSE ranking ----------------------------

def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 full hybrid fusion (retriever_ranking.py:190-245): BM25 top-50
    (lexical signal) ⊕ embedding-cosine top-50 to the query vector
    (dense signal, vec_id aligned with doc_id) → Σ 1/(60+rank) top-20.
    This is the reference's actual BM25⊕dense pairing; rrf_fusion keeps
    the lexical⊕length variant for comparison."""
    from earcrawler_spark.operators.ranking import bm25_scores, rrf_fuse, topk_ranked
    from earcrawler_spark.operators.similarity import cosine
    from earcrawler_spark.queries import BM25_QUERY

    docs = _t(spark, sf_dir, "documents")
    bm25 = bm25_scores(docs, BM25_QUERY, k=50).select("doc_id", "rank")
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dense_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"),
        )
    )
    dense = topk_ranked(
        dense_scored, [F.desc("sim"), F.col("doc_id")], 50
    ).select("doc_id", "rank")
    return rrf_fuse(bm25, dense, k=20)


def _rrf_hybrid_sql() -> str:
    from earcrawler_spark.operators.ranking import bm25_sql
    from earcrawler_spark.queries import BM25_QUERY

    return f"""
WITH bm25 AS (
  SELECT doc_id, rank FROM ({bm25_sql(BM25_QUERY, k=50)}) ranked
), e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT v AS qv FROM e WHERE vec_id = 0
), dense_scored AS (
  SELECT e.vec_id AS doc_id,
         round(list_aggregate(list_transform(range(1, len(qv)+1), i -> qv[i]*v[i]), 'sum')
               / (sqrt(list_aggregate(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i]), 'sum'))
                * sqrt(list_aggregate(list_transform(range(1, len(v)+1), i -> v[i]*v[i]), 'sum'))), 6)
         AS sim
  FROM e, q WHERE e.vec_id <> 0
), dense AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
    FROM dense_scored) WHERE rank <= 50
), fused AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, a.rank AS rank_a, b.rank AS rank_b,
         round(coalesce(1.0 / (60 + a.rank), 0.0) + coalesce(1.0 / (60 + b.rank), 0.0), 6) AS rrf
  FROM bm25 a FULL OUTER JOIN dense b ON a.doc_id = b.doc_id
)
SELECT doc_id, rank_a, rank_b, rrf, fused_rank FROM (
  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank FROM fused
) WHERE fused_rank <= 20
ORDER BY fused_rank
"""


FIDELITY_QUERIES["rrf_hybrid"] = q_rrf_hybrid
FIDELITY_ORACLES["rrf_hybrid"] = _rrf_hybrid_sql()
