"""Groundedness claim extraction — the data-op core of the reference's
eval gate.

Reference: eval/groundedness_gates.py:15-243 — answers normalize
(whitespace collapse, U.S.→US), split into claims on
[;!?], sentence-final periods, 'but/however/yet', and ', not';
leading yes/no/true/false verdicts strip; hedged claims
(may/might/unclear/...) are non-decisive; each claim carries content
tokens (section-id spans scrubbed, [a-z0-9]+ words, 43-stopword filter,
len>1, the ing/ies/ed/es/s-not-ss stemming ladder) and normalized
EAR-section mentions.

The full evaluate_groundedness_signals citation-linkage gate consumes
LLM answer artifacts (citations with quotes) and is per-item harness
plumbing past the data surface; the claim decomposition below is the
reusable text operator and is verified against a direct model of the
reference code (tests/test_eval_claims.py), with one deliberate
mechanical difference: the sentence-final-period split is expressed
lookahead-free (`\\.\\s|\\.$` instead of `\\.(?=\\s|$)`) so ONE pattern
runs identically on Spark (Java regex) and DuckDB (RE2, no lookahead);
equivalence on whitespace-normalized text is asserted by the model test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVAL_QUERIES: dict = {}
EVAL_ORACLES: dict = {}

# lookahead-free equivalent of the reference _CLAIM_SPLIT_RE on
# whitespace-normalized input
CLAIM_SPLIT_PATTERN = (
    r"(?i)\s*(?:[;!?]+|\.\s|\.$|\bbut\b|\bhowever\b|\byet\b|,\s*not\b)\s*"
)
LEADING_VERDICT_PATTERN = r"(?i)^(?:yes|no|true|false)\b[:,]?\s*"
HEDGE_PATTERN = (
    r"(?i)\b("
    r"may|might|could|can depend|depends|dependent|unclear|uncertain|"
    r"insufficient (?:info|information|evidence)|not enough (?:info|information|evidence)|"
    r"cannot determine|unable to determine|cannot answer|unanswerable|need more|need additional|"
    r"if provided|if more information"
    r")\b"
)
SECTION_INLINE_PATTERN = r"(?i)\bEAR-\d[\w().-]*|\b\d{3}\.\d+(?:\([^)]+\))*"
WORD_PATTERN = r"[a-z0-9]+"
STOPWORDS = (
    "a all an and answer any are as at be before by can cited conclusion "
    "context described does excerpt for from in is it its of or provision "
    "question section states stated that the their them these they this "
    "those under when with"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_claim_token(tok):
    """_normalize_token (groundedness_gates.py:184-196): one stemming
    rule per token — ing(>5), ies→y(>4), ed(>4), es(>4), s-not-ss(>4)."""
    t = F.lower(tok)
    n = F.length(t)
    return (
        F.when((n > 5) & t.endswith("ing"), F.substring(t, 1, n - 3))
        .when((n > 4) & t.endswith("ies"), F.concat(F.substring(t, 1, n - 3), F.lit("y")))
        .when((n > 4) & t.endswith("ed"), F.substring(t, 1, n - 2))
        .when((n > 4) & t.endswith("es"), F.substring(t, 1, n - 2))
        .when((n > 4) & t.endswith("s") & ~t.endswith("ss"), F.substring(t, 1, n - 1))
        .otherwise(t)
    )


def content_tokens(text_col):
    """_content_tokens: scrub section spans, [a-z0-9]+ words of the
    lowercased text, stopword + len>1 filter, stem, distinct sorted."""
    scrubbed = F.regexp_replace(
        F.lower(text_col), F.lit(SECTION_INLINE_PATTERN), F.lit(" ")
    )
    words = F.regexp_extract_all(scrubbed, F.lit(WORD_PATTERN), F.lit(0))
    kept = F.filter(
        words, lambda w: (F.length(w) > 1) & ~w.isin(*STOPWORDS)
    )
    stemmed = F.filter(
        F.transform(kept, normalize_claim_token), lambda t: t != ""
    )
    return F.array_sort(F.array_distinct(stemmed))


def section_mentions(text_col):
    """_extract_section_mentions: inline section spans, EAR- prefixed
    when bare, '#'-suffix-stripped heads, distinct sorted."""
    raw = F.regexp_extract_all(text_col, F.lit(SECTION_INLINE_PATTERN), F.lit(0))
    normed = F.transform(
        raw,
        lambda m: F.when(
            F.upper(m).startswith("EAR-"), F.substring_index(m, "#", 1)
        ).otherwise(F.concat(F.lit("EAR-"), F.substring_index(m, "#", 1))),
    )
    return F.array_sort(F.array_distinct(normed))


def extract_claims(answers: DataFrame, text_col: str = "answer") -> DataFrame:
    """(item_id, answer) -> one row per claim: (item_id, claim_idx,
    claim, decisive, tokens, sections)."""
    normalized = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), r"\s+", " "), r"^\s+|\s+$", ""
        ),
        r"U\.S\.?",
        "US",
    )
    parts = F.split(normalized, CLAIM_SPLIT_PATTERN)
    # .strip(' ,:') parity: strip any run of space/comma/colon from both
    # ends (the reference strips a char SET, not a literal)
    cleaned = F.transform(
        parts,
        lambda p: F.regexp_replace(
            F.regexp_replace(p, LEADING_VERDICT_PATTERN, ""),
            r"^[ ,:]+|[ ,:]+$",
            "",
        ),
    )
    claims = F.filter(cleaned, lambda c: c != "")
    out = answers.select(
        F.col("item_id"), F.posexplode(claims).alias("claim_idx", "claim")
    )
    return out.select(
        "item_id",
        "claim_idx",
        "claim",
        (~F.col("claim").rlike(HEDGE_PATTERN)).alias("decisive"),
        content_tokens(F.col("claim")).alias("tokens"),
        section_mentions(F.col("claim")).alias("sections"),
    )


def q_claims_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Claim decomposition over seeded answers covering every split
    trigger, verdict strip, hedges, section scrubbing, stemming, and
    stopword filtering."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    answer = (
        F.when(
            d % 6 == 0,
            F.lit("Yes: the export is prohibited under EAR-744.11(b). "
                  "However, exceptions may apply; see 740.13!"),
        )
        .when(
            d % 6 == 1,
            F.lit("No, licenses are required before exporting, "
                  "but section 742.4 states otherwise."),
        )
        .when(
            d % 6 == 2,
            F.concat(
                F.lit("U.S. entities described in "),
                F.lit("EAR-"),
                (d % 37 + 700).cast("string"),
                F.lit("."),
                (d % 7 + 1).cast("string"),
                F.lit(" cannot determine applicability, not even partially."),
            ),
        )
        .when(d % 6 == 3, F.lit("True: shipping containers moved; cases closed."))
        .when(d % 6 == 4, F.lit("   "))
        .otherwise(
            F.concat(
                F.lit("The answer depends on context excerpt "),
                d.cast("string"),
                F.lit("? It is permitted."),
            )
        )
    )
    qs = docs.select(d.alias("item_id"), answer.alias("answer"))
    claims = extract_claims(qs)
    return claims.select(
        "item_id",
        "claim_idx",
        "claim",
        "decisive",
        F.array_join("tokens", "|").alias("tokens"),
        F.array_join("sections", "|").alias("sections"),
    ).orderBy("item_id", "claim_idx")


def _claims_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stem = (
        "CASE WHEN len(x) > 5 AND x LIKE '%ing' THEN substr(x, 1, len(x)-3) "
        "WHEN len(x) > 4 AND x LIKE '%ies' THEN substr(x, 1, len(x)-3) || 'y' "
        "WHEN len(x) > 4 AND x LIKE '%ed' THEN substr(x, 1, len(x)-2) "
        "WHEN len(x) > 4 AND x LIKE '%es' THEN substr(x, 1, len(x)-2) "
        "WHEN len(x) > 4 AND x LIKE '%s' AND x NOT LIKE '%ss' THEN substr(x, 1, len(x)-1) "
        "ELSE x END"
    )
    sec_norm = (
        "CASE WHEN upper(m) LIKE 'EAR-%' THEN split_part(m, '#', 1) "
        "ELSE 'EAR-' || split_part(m, '#', 1) END"
    )
    return f"""
WITH answers AS (
  SELECT doc_id AS item_id,
    CASE WHEN doc_id % 6 = 0 THEN 'Yes: the export is prohibited under EAR-744.11(b). However, exceptions may apply; see 740.13!'
         WHEN doc_id % 6 = 1 THEN 'No, licenses are required before exporting, but section 742.4 states otherwise.'
         WHEN doc_id % 6 = 2 THEN 'U.S. entities described in EAR-' || CAST(doc_id % 37 + 700 AS VARCHAR) || '.' || CAST(doc_id % 7 + 1 AS VARCHAR) || ' cannot determine applicability, not even partially.'
         WHEN doc_id % 6 = 3 THEN 'True: shipping containers moved; cases closed.'
         WHEN doc_id % 6 = 4 THEN '   '
         ELSE 'The answer depends on context excerpt ' || CAST(doc_id AS VARCHAR) || '? It is permitted.' END AS answer
  FROM documents
), norm AS (
  SELECT item_id,
         regexp_replace(trim(regexp_replace(answer, '\\s+', ' ', 'g')), 'U\\.S\\.?', 'US', 'g') AS t
  FROM answers
), split_parts AS (
  SELECT item_id, pos, raw FROM (
    SELECT item_id,
           generate_subscripts(parts, 1) AS pos, unnest(parts) AS raw
    FROM (SELECT item_id,
                 regexp_split_to_array(t, '(?i)\\s*(?:[;!?]+|\\.\\s|\\.$|\\bbut\\b|\\bhowever\\b|\\byet\\b|,\\s*not\\b)\\s*') AS parts
          FROM norm))
), cleaned AS (
  SELECT item_id, pos,
         trim(regexp_replace(raw, '(?i)^(?:yes|no|true|false)\\b[:,]?\\s*', ''), ' ,:') AS claim
  FROM split_parts
), claims AS (
  SELECT item_id, claim,
         row_number() OVER (PARTITION BY item_id ORDER BY pos) - 1 AS claim_idx
  FROM cleaned WHERE claim <> ''
), enriched AS (
  SELECT item_id, claim_idx, claim,
    NOT regexp_matches(claim, '(?i)\\b(may|might|could|can depend|depends|dependent|unclear|uncertain|insufficient (?:info|information|evidence)|not enough (?:info|information|evidence)|cannot determine|unable to determine|cannot answer|unanswerable|need more|need additional|if provided|if more information)\\b') AS decisive,
    list_sort(list_distinct(list_filter(list_transform(
      list_filter(regexp_extract_all(
        regexp_replace(lower(claim), '(?i)\\bEAR-\\d[\\w().-]*|\\b\\d{{3}}\\.\\d+(?:\\([^)]+\\))*', ' ', 'g'),
        '[a-z0-9]+'),
        w -> len(w) > 1 AND w NOT IN ({stop_list})),
      x -> {stem}), tk -> tk <> ''))) AS tokens,
    list_sort(list_distinct(list_transform(
      regexp_extract_all(claim, '(?i)\\bEAR-\\d[\\w().-]*|\\b\\d{{3}}\\.\\d+(?:\\([^)]+\\))*'),
      m -> {sec_norm}))) AS sections
  FROM claims
)
SELECT item_id, claim_idx, claim, decisive,
       coalesce(array_to_string(tokens, '|'), '') AS tokens,
       coalesce(array_to_string(sections, '|'), '') AS sections
FROM enriched
ORDER BY item_id, claim_idx
"""


EVAL_QUERIES["claims_extraction"] = q_claims_extraction
EVAL_ORACLES["claims_extraction"] = _claims_sql()
