"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle on the same sf dir and compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # both sides pre-round in the queries; this guards residual repr noise
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def _strict_cell(v):
    """Zero-normalization view of a cell: Python type + full repr.

    No float formatting, no Decimal→float coercion, no timestamp
    stringification — if Spark hands back 0.15000000000000002 and DuckDB
    0.15, or one side is Decimal('0.150000') and the other float, this
    compare fails where the 6-dp legacy compare silently passed (the
    round-4 driver-gate blind spot, VERDICT r4 What's-wrong #2)."""
    return (type(v).__name__, repr(v))


def strict_normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_strict_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


# DuckDB result types the driver's Arrow-level hash is known to
# canonicalize identically to the matching Spark dtype.  Everything else
# — most importantly HUGEINT/INT128, which DuckDB silently widens bare
# integer sum() to while count(*) stays BIGINT — hashes differently even
# when every value is identical (the round-4/5 driver-red root cause:
# fetchall() yields plain Python ints for HUGEINT, so value-level strict
# compare is structurally blind to the declared-type divergence).
# int32 vs int64 across the two engines is hash-equal on the driver:
# 19 registry queries (citation_metrics, rrf_hybrid, bm25_tokenized,
# knn_l2_bucket, ...) hold green driver rows with Spark `int` against
# DuckDB BIGINT — the driver canonicalizes both to int64 before hashing.
# Only the 128-bit widening (HUGEINT) falls outside that canonical form.
_DUCK_TYPE_ALLOWED: dict[str, set[str]] = {
    "BIGINT": {"bigint", "int"},
    "INTEGER": {"int", "bigint"},
    "VARCHAR": {"string"},
    "DOUBLE": {"double"},
    "BOOLEAN": {"boolean"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
}


def lint_result_types(spark_dtypes, con, sql: str) -> tuple[bool, str]:
    """Check the oracle's DECLARED DuckDB result types — the layer the
    driver's hash actually compares on, which fetchall()-based value
    comparison cannot see.

    Two assertions per column: (1) the DuckDB type is in the whitelist
    of types known to hash-match Spark, and (2) it maps to the Spark
    dtype of the same-named column."""
    rel = con.sql(sql)
    d_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    s_types = dict(spark_dtypes)
    errs = []
    for col, dt in d_types.items():
        allowed = _DUCK_TYPE_ALLOWED.get(dt)
        if allowed is None:
            errs.append(f"{col}: DuckDB type {dt} not in hash-safe whitelist")
        elif col in s_types and s_types[col] not in allowed:
            errs.append(
                f"{col}: DuckDB {dt} vs Spark {s_types[col]} (want one of {sorted(allowed)})"
            )
    if errs:
        return False, "TYPE LINT: " + "; ".join(errs[:5])
    return True, "types ok"


def compare(spark_df, con, sql: str, strict: bool = True) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    sn, dn = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"values differ, first diffs: {diffs}"
    if strict:
        ss = strict_normalize(s_rows, s_cols)
        dd = strict_normalize(d_rows, d_cols)
        if ss != dd:
            diffs = [(a, b) for a, b in zip(ss, dd) if a != b][:3]
            return False, f"STRICT repr/type mismatch, first diffs: {diffs}"
        ok, msg = lint_result_types(spark_df.dtypes, con, sql)
        if not ok:
            return False, msg
    return True, f"OK ({len(s_rows)} rows, strict)" if strict else f"OK ({len(s_rows)} rows)"
