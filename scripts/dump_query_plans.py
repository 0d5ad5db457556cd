"""Dump explain('formatted') for named registered queries.

Usage: python scripts/dump_query_plans.py <outdir> <suffix> <q1> [q2 ...]
Run from the tree whose plans you want (round-start worktree for
'before', current tree for 'after').  Queries are invoked exactly as the
bench invokes them, so shared materializations / output caches show as
the checkpoint or in-memory scans the executed plan really reads.
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

outdir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from earcrawler_spark.queries import QUERIES  # noqa: E402
from earcrawler_spark.session import get_spark  # noqa: E402

spark = get_spark("plans", master="local[8]", shuffle_partitions=8)

for name in names:
    df = QUERIES[name](spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(p)
    print(f"{name}_{suffix}: Exchange={p.count('Exchange')} "
          f"Scan={p.count('Scan parquet')} InMem={p.count('InMemoryTableScan')} "
          f"RDD={p.count('ExistingRDD')} bytes={len(p)}")
