"""Driver-gate rotation helper.

The driver certifies the FIRST 50 registry entries per round
(CORRECTNESS_r{N}.json).  Each round the builder must:

1. move queries with a fully-green driver row (rows+schema+hash all
   true) into a _GATED_R{N} frozenset in earcrawler_spark/queries.py so
   _reorder_for_gate stops spending window slots re-certifying them;
2. keep any query whose impl OR oracle changed since its green row OUT
   of the gated sets (modified-since-certification counts as
   never-certified — ADVICE r4); this script cannot see diffs, so it
   prints the candidate list for the builder to prune by hand against
   `git log --since` of the query's module;
3. drain _GATE_OVERFLOW into the freed window slots.

Usage:  python scripts/gate_rotation.py
Prints, per round artifact found, the green / red / rows-only names,
then the rotation candidates: green names not yet in any gated set.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def classify(rows: dict) -> tuple[list[str], list[str], list[str]]:
    """Split one round's correctness dict into (green, red, rows_only).

    green     — rows_match, schema_match and hash_match all true
    red       — at least one of the three is explicitly false
    rows_only — all three null (no oracle; the driver ran a weaker
                rows-only check)
    """
    green, red, rows_only = [], [], []
    for name, r in rows.items():
        if not isinstance(r, dict):
            continue
        trio = (r.get("rows_match"), r.get("schema_match"), r.get("hash_match"))
        if all(v is True for v in trio):
            green.append(name)
        elif any(v is False for v in trio):
            red.append(name)
        else:
            rows_only.append(name)
    return sorted(green), sorted(red), sorted(rows_only)


def main() -> None:
    from earcrawler_spark import queries as q

    gated = set(q._GATED_R1_R3) | set(q._GATED_R4)
    for extra in ("_GATED_R5", "_GATED_R6"):  # future rounds, if present
        gated |= set(getattr(q, extra, ()))

    all_green: set[str] = set()
    paths = sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    latest_green: list[str] = []
    for p in paths:
        rows = json.load(open(p))
        green, red, rows_only = classify(rows)
        all_green |= set(green)
        latest_green = green
        print(f"{os.path.basename(p)}: {len(green)} green, "
              f"{len(red)} red {red if red else ''}, "
              f"{len(rows_only)} rows-only {rows_only if rows_only else ''}")

    candidates = [n for n in latest_green if n not in gated]
    stale_gated = sorted(gated - set(q.QUERIES))
    print(f"\nregistry: {len(q.QUERIES)} queries; certified sets hold "
          f"{len(gated)}; ever-green across rounds: {len(all_green)}")
    print(f"\nrotation candidates (latest-round green, not yet gated) — "
          f"prune any modified since their green row:\n  {candidates}")
    if stale_gated:
        print(f"\nWARNING gated names missing from registry: {stale_gated}")
    overflow = [n for n in q._GATE_OVERFLOW if n in q.QUERIES]
    print(f"\n_GATE_OVERFLOW waiting for freed slots ({len(overflow)}): "
          f"{sorted(overflow)}")


if __name__ == "__main__":
    main()
