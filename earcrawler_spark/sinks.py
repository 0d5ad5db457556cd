"""Deterministic sinks — byte-reproducible exports + audit manifests.

Reference behaviors re-expressed:
- S12 sorted JSONL writer (corpus/artifacts.py:24-36): global sort by key
  columns, `sort_keys=True` compact JSON — byte-identical across rebuilds
  (determinism test precedent: tests/corpus/test_artifacts_determinism.py).
- S13 manifest + checksums (corpus/artifacts.py:47-79): per-file record
  count + sha256 → checksums.sha256 + manifest.json.
- S15 sorted Turtle sink (kg/emit_ear.py:71-83): triples rendered as
  N-Triple-ish lines, globally sorted, prefix header.

Scale note: a global sort is a range-partitioned shuffle; for golden-diff
exports that's the point (the reference's corpus is small relative to the
cluster). The parquet/Iceberg tables remain the system of record — these
sinks are the deterministic export path.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sorted_jsonl(
    df: DataFrame, path: str, sort_cols: list[str]
) -> dict:
    """Globally sorted, canonically serialized JSONL (one file) + manifest.

    Canonical serialization = sorted keys, compact separators (the
    reference's json.dumps(sort_keys=True) — monitor/utils.py:27-32).
    Returns the manifest dict. Collected through toLocalIterator so the
    driver streams partitions in sort order without materializing all
    rows at once.
    """
    os.makedirs(path, exist_ok=True)
    cols = df.columns
    out_path = os.path.join(path, "records.jsonl")
    h = hashlib.sha256()
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for row in df.orderBy(*sort_cols).toLocalIterator():
            d = {c: row[c] for c in cols}
            line = json.dumps(d, sort_keys=True, separators=(",", ":"), default=str)
            f.write(line + "\n")
            h.update((line + "\n").encode())
            n += 1
    manifest = {
        "files": {"records.jsonl": {"records": n, "sha256": h.hexdigest()}},
        "sort_cols": sort_cols,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True, indent=2)
    with open(os.path.join(path, "checksums.sha256"), "w") as f:
        f.write(f"{h.hexdigest()}  records.jsonl\n")
    return manifest


def read_jsonl(spark, path: str) -> DataFrame:
    """S11 JSONL reader: blank-line tolerant (artifacts.py:11-21 skips
    blanks; spark.read.json does natively)."""
    return spark.read.json(os.path.join(path, "records.jsonl"))


def write_sorted_turtle(
    triples: DataFrame, path: str, prefixes: dict[str, str] | None = None
) -> int:
    """Sorted Turtle export of a triples DataFrame(s, p, o).

    Line shape mirrors emit_ear.py:71-83: one `<s> <p> <o|"literal"> .`
    per triple, globally sorted, prefix header first."""
    prefixes = prefixes or {"ear": "https://ear.example/"}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lines = (
        triples.select(
            F.concat(
                F.lit("<"), "s", F.lit("> <"), "p", F.lit("> "),
                F.when(
                    F.col("o").startswith("http") | F.col("o").contains("/"),
                    F.concat(F.lit("<"), "o", F.lit(">")),
                ).otherwise(F.concat(F.lit('"'), "o", F.lit('"'))),
                F.lit(" ."),
            ).alias("line")
        )
        .orderBy("line")
    )
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for k, v in sorted(prefixes.items()):
            f.write(f"@prefix {k}: <{v}> .\n")
        f.write("\n")
        for row in lines.toLocalIterator():
            f.write(row["line"] + "\n")
            n += 1
    return n
