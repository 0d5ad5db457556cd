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
    return True, f"OK ({len(s_rows)} rows, strict)" if strict else f"OK ({len(s_rows)} rows)"
