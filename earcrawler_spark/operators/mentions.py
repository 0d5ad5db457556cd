"""4-tier mention scoring — reference parity with
earCrawler/transforms/mentions.py:49-134.

Tiers (first match wins):
  1.00  full candidate token sequence appears contiguously in the text
  0.85  stopword-filtered core tokens appear contiguously
  0.65  every distinct core token appears within one 8-token window
  0.45  the core-token acronym (>=2 letters) appears in the string of
        text-token initials
  0     otherwise (rows dropped)

Tokenization matches the reference's TOKEN_RE = [A-Za-z0-9']+ lowercased
(mentions.py:28,100-101); stopwords are the reference's corporate-suffix
set (mentions.py:10-25). Everything is native Column expressions over
token arrays — exists/slice/array_intersect stay JVM-side, and the same
computation is expressible in DuckDB SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MENTION_STOPWORDS = [
    "inc", "corp", "co", "co.", "company", "companies", "corporation",
    "group", "limited", "ltd", "llc", "holding", "holdings", "international",
]
MENTION_WINDOW = 8
_TOKEN_PATTERN = r"[a-z0-9']+"


def mention_tokens(col: Column) -> Column:
    """Reference tokenization: [A-Za-z0-9']+ matches, lowercased."""
    return F.regexp_extract_all(F.lower(col), F.lit(_TOKEN_PATTERN), F.lit(0))


def core_tokens(cand_tokens: Column) -> Column:
    return F.filter(
        cand_tokens, lambda t: ~t.isin(*MENTION_STOPWORDS) & (t != "")
    )


def _contains_sequence(text_toks: Column, pattern: Column) -> Column:
    # Token-sequence containment as separator-delimited substring search:
    # '|' cannot occur inside [a-z0-9']+ tokens, so
    #   pattern ⊑ tokens  ⇔  '|p1|p2|' ∈ '|t1|t2|...|'.
    # instr over two concat'd strings is whole-stage-codegen'd; the
    # positional slice-compare formulation evaluates interpreted per
    # window start and dominated the corpus scan.
    hay = F.concat(F.lit("|"), F.array_join(text_toks, "|"), F.lit("|"))
    needle = F.concat(F.lit("|"), F.array_join(pattern, "|"), F.lit("|"))
    return (F.size(pattern) > 0) & (F.instr(hay, needle) > 0)


def _core_in_window(text_toks: Column, core: Column, window: int) -> Column:
    # Equivalent to the reference's every-index window scan: a window
    # [s, s+w) whose start is NOT a core token is dominated by the window
    # starting at the first core-token position inside it, so only
    # core-token positions need checking. Gated on the cheap
    # all-core-tokens-present test first (& short-circuits), which kills
    # almost every (doc, candidate) pair before any window work.
    cset = F.array_distinct(core)
    n = F.size(text_toks)
    all_present = F.size(F.array_intersect(cset, text_toks)) == F.size(cset)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda s: F.array_contains(cset, F.element_at(text_toks, s)),
    )
    return (
        (F.size(cset) > 0)
        & (n > 0)
        & all_present
        & F.exists(
            starts,
            lambda s: F.size(F.array_intersect(cset, F.slice(text_toks, s, window)))
            == F.size(cset),
        )
    )


def _acronym_hit(text_toks: Column, core: Column) -> Column:
    initials = F.array_join(
        F.transform(text_toks, lambda t: F.substring(t, 1, 1)), ""
    )
    acr = F.array_join(F.transform(core, lambda t: F.substring(t, 1, 1)), "")
    return (F.length(acr) >= 2) & (F.instr(initials, acr) > 0)


def mention_score(
    text_col: Column, cand_col: Column, window: int = MENTION_WINDOW
) -> Column:
    """Best-tier mention strength of candidate phrase `cand_col` in
    `text_col` (0.0 when no tier fires or the core is empty).

    For corpus-scale scans, pre-tokenize each side once and use
    `mention_score_tokens` — tokenizing inside the scoring expression
    re-runs regexp_extract_all per tier under interpreted evaluation."""
    return mention_score_tokens(
        mention_tokens(text_col), mention_tokens(cand_col), window
    )


def mention_score_tokens(
    tt: Column, ct: Column, window: int = MENTION_WINDOW
) -> Column:
    """mention_score over pre-tokenized arrays (tt = text tokens, ct =
    candidate tokens)."""
    core = core_tokens(ct)
    return (
        F.when(F.size(core) == 0, F.lit(0.0))
        .when(_contains_sequence(tt, ct), F.lit(1.0))
        .when(_contains_sequence(tt, core), F.lit(0.85))
        .when(_core_in_window(tt, core, window), F.lit(0.65))
        .when(_acronym_hit(tt, core), F.lit(0.45))
        .otherwise(F.lit(0.0))
    )


def mention_score_sql(text_expr: str, cand_expr: str, window: int = MENTION_WINDOW) -> str:
    """The identical 4-tier scoring as a DuckDB SQL scalar expression."""
    stop = ", ".join(f"'{s}'" for s in MENTION_STOPWORDS)
    pat = _TOKEN_PATTERN.replace("'", "''")  # SQL-literal-escape the apostrophe
    tt = f"regexp_extract_all(lower({text_expr}), '{pat}')"
    ct = f"regexp_extract_all(lower({cand_expr}), '{pat}')"
    core = f"list_filter({ct}, t -> t NOT IN ({stop}) AND t <> '')"
    seq = (
        "(len({p}) > 0 AND len({t}) >= len({p}) AND len(list_filter("
        "range(1, greatest(len({t}) - len({p}) + 1, 1) + 1), "
        "i -> list_slice({t}, i, i + len({p}) - 1) = {p})) > 0)"
    )
    win = (
        f"(len(list_distinct({core})) > 0 AND len({tt}) > 0 AND "
        f"len(list_filter(range(1, len({tt}) + 1), "
        f"s -> len(list_intersect(list_distinct({core}), "
        f"list_slice({tt}, s, s + {window - 1}))) = len(list_distinct({core})))) > 0)"
    )
    initials = f"array_to_string(list_transform({tt}, t -> substr(t, 1, 1)), '')"
    acr = f"array_to_string(list_transform({core}, t -> substr(t, 1, 1)), '')"
    return f"""CAST(CASE
      WHEN len({core}) = 0 THEN 0.0
      WHEN {seq.format(t=tt, p=ct)} THEN 1.0
      WHEN {seq.format(t=tt, p=core)} THEN 0.85
      WHEN {win} THEN 0.65
      WHEN length({acr}) >= 2 AND position({acr} IN {initials}) > 0 THEN 0.45
      ELSE 0.0 END AS DOUBLE)"""
