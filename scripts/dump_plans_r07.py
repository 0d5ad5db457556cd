"""Dump explain('formatted') for the round-7 touched builders/queries.

Usage: python scripts/dump_plans_r07.py <outdir> <suffix> [sf_dir]
suffix: 'before' (round-start code) or 'after' (optimized code).
Run from the tree whose plans you want (round-start worktree for
'before').  The materialized builders are invoked exactly as the bench
invokes them (materialize_stages=True when the parameter exists).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

outdir, suffix = sys.argv[1], sys.argv[2]
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

from earcrawler_spark.session import get_spark  # noqa: E402

spark = get_spark("plans_r07", master="local[8]", shuffle_partitions=8)


def dump(name, df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(buf.getvalue())
    p = buf.getvalue()
    print(f"{name}_{suffix}: Exchange={p.count('Exchange')} "
          f"ScanParquet={p.count('Scan parquet')} "
          f"ArrowEvalPython={p.count('ArrowEvalPython')} "
          f"ExistingRDD={p.count('ExistingRDD')} bytes={len(p)}")


import inspect  # noqa: E402

from earcrawler_spark.queries_fidelity import build_decided_pairs  # noqa: E402
from earcrawler_spark.queries_rag import build_rag_context  # noqa: E402

staged = "materialize_stages" in inspect.signature(build_rag_context).parameters
# the plan the bench/materialized path actually executes
dump("rag_context",
     build_rag_context(spark, sf, materialize_stages=True) if staged
     else build_rag_context(spark, sf))
dump("reconcile_v2",
     build_decided_pairs(spark, sf, materialize_stages=True) if staged
     else build_decided_pairs(spark, sf))
