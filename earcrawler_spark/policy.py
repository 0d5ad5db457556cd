"""Policy-hint loader — advisory linking rules.

Reference: earCrawler/policy/__init__.py — hints.yml entries
(part, program, priority, rationale) with a deterministic sorted-JSON
manifest; their KG materialization is the DELETE/INSERT upsert pattern
(sparql/upsert_policy_hint.sparql) covered by
operators/kg.apply_graph_update.

The YAML read is driver-side configuration (like load_rules); hints_df
exposes the same rows as a DataFrame so the hint table can join against
parts at any scale.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

HINT_SCHEMA = "part string, program string, priority double, rationale string"


def load_hints(path: str) -> list[dict]:
    """hints.yml -> [{part, program, priority, rationale}] (missing file
    -> []; defaults per the reference dataclass)."""
    import os

    import yaml

    if not os.path.exists(path):
        return []
    raw = yaml.safe_load(open(path, encoding="utf-8").read()) or {}
    return [
        {
            "part": str(e["part"]).strip(),
            "program": str(e["program"]).strip(),
            "priority": float(e.get("priority", 0.0)),
            "rationale": str(e.get("rationale", "")),
        }
        for e in raw.get("hints", [])
    ]


def hints_manifest(hints: list[dict]) -> str:
    """Deterministic sorted-JSON manifest (policy/__init__.py:41-46):
    sorted by (part, program), keys sorted."""
    ordered = sorted(hints, key=lambda h: (h["part"], h["program"]))
    return json.dumps(ordered, sort_keys=True)


def hints_df(spark: SparkSession, hints: list[dict]) -> DataFrame:
    rows = [
        (h["part"], h["program"], h["priority"], h["rationale"]) for h in hints
    ]
    return spark.createDataFrame(rows, HINT_SCHEMA)
