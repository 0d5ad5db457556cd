"""Run every registered query against its DuckDB oracle at the given sf dir.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from earcrawler_spark.queries import ORACLES, QUERIES  # noqa: E402
from earcrawler_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("check_oracles")
    con = duckdb_conn(sf_dir)
    print(f"duckdb {duckdb.__version__}; strict compare (raw repr + type)")
    failed = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            if name not in ORACLES:
                print(f"{name:32s} rows-only: {df.count()} rows")
                continue
            ok, msg = compare(df, con, ORACLES[name])
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        print(f"{name:32s} {'PASS' if ok else 'FAIL'} {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
