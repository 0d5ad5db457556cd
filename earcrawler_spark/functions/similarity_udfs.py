"""Arrow-batched similarity UDFs that have no native Spark builtin.

Jaro-Winkler (reference J6 pair feature, kg/reconcile.py:165 via
rapidfuzz): standard Jaro with Winkler prefix boost (p=0.1, max prefix 4,
boost threshold 0.7). Implemented in numpy-friendly pure Python inside a
pandas UDF — one Arrow batch per call, never per-row Spark round trips.
Unit-tested against canonical vectors; excluded from the SQL oracle gate
because engine implementations of JW differ in variant details.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j <= boost:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], index=a.index
    )
