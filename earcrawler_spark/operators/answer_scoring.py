"""Answer-correctness scoring modes — reference parity with
scripts/eval/eval_rag_llm.py:241-277 (_normalize_answer_text,
_semantic_match_ratio, _answer_is_correct).

exact / normalized are native Column expressions; semantic is the
reference's difflib.SequenceMatcher (Ratcliff/Obershelp) ratio, which
has no relational equivalent — it runs as an Arrow-batched pandas UDF
(the sanctioned slow path, like reconcile's Jaro-Winkler stage) and is
pinned against difflib directly in tests/test_answer_scoring.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

_QUOTE_SET = " \\t\\n\\r\"'`"
_PUNCT_SET = " .,:;!?"


def _strip_set(col: Column, chars: str) -> Column:
    cls = f"[{chars}]"
    return F.regexp_replace(col, f"^{cls}+|{cls}+$", "")


def normalize_answer_text(col: Column) -> Column:
    """_normalize_answer_text (eval_rag_llm.py:241-251): strip, drop an
    'answer:'/'final answer:' prefix, casefold (lower on this ASCII
    corpus domain), collapse whitespace, strip quote chars then
    punctuation — each strip is a char-SET strip, not a literal."""
    ws = r"(?U)^\s+|\s+$"  # str.strip(): all whitespace, not F.trim's spaces
    v = F.regexp_replace(F.coalesce(col, F.lit("")), ws, "")
    v = F.regexp_replace(v, r"(?i)^(answer|final answer)\s*:\s*", "")
    v = F.lower(v)
    v = F.regexp_replace(F.regexp_replace(v, r"\s+", " "), ws, "")
    v = _strip_set(v, _QUOTE_SET)
    return _strip_set(v, _PUNCT_SET)


@F.pandas_udf(DoubleType())
def semantic_match_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    """_semantic_match_ratio (eval_rag_llm.py:253-256): difflib
    SequenceMatcher ratio over casefolded strings, Arrow-batched."""
    import difflib

    return pd.Series(
        [
            difflib.SequenceMatcher(
                None, str(x or "").casefold(), str(y or "").casefold()
            ).ratio()
            for x, y in zip(a, b)
        ]
    )


def answer_is_correct(
    gt: Column, pred: Column, mode: str, semantic_threshold: float = 0.6
) -> Column:
    """_answer_is_correct (eval_rag_llm.py:259-277): empty ground truth
    or prediction is always incorrect; then the mode decides."""
    nonempty = (F.coalesce(gt, F.lit("")) != "") & (
        F.coalesce(pred, F.lit("")) != ""
    )
    if mode == "exact":
        return nonempty & (pred == gt)
    if mode == "normalized":
        return nonempty & (
            normalize_answer_text(pred) == normalize_answer_text(gt)
        )
    if mode == "semantic":
        return nonempty & (
            semantic_match_ratio(pred, gt) >= F.lit(semantic_threshold)
        )
    raise ValueError(f"Unknown answer score mode: {mode}")
