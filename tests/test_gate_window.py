"""Driver-gate window invariants (queries._reorder_for_gate).

The driver certifies the FIRST 50 registry entries each round.  Three
regimes so far:

- uncertified > 50 (round 5): every window slot is spent on an
  uncertified oracled query, and anything uncertified left outside the
  window is an EXPLICIT deferral in _GATE_OVERFLOW / _GATE_DEPRIORITIZED
  — never registration-order luck.
- uncertified <= 50 (round 6, after the _GATED_R5 rotation drained the
  overflow queue): every uncertified oracled query MUST be in the
  window, and the spare slots re-certified the most recently certified
  greens as regression canaries.
- round 7 (VERDICT r6 task 4): with the round-7 changed queries
  re-entering as the uncertified front, the spare slots now cycle the
  STALE r1-r3 greens first — 44 of them were last driver-gated in r03
  and no green row should go more than ~3 rounds stale — then the
  newest greens (R6 before R5 before R4).
"""

from earcrawler_spark.queries import (
    ORACLES,
    QUERIES,
    _GATE_DEPRIORITIZED,
    _GATE_OVERFLOW,
    _GATED_R1_R3,
    _GATED_R4,
    _GATED_R5,
    _GATED_R6,
)

WINDOW = 50


def _certified() -> frozenset:
    return _GATED_R1_R3 | _GATED_R4 | _GATED_R5 | _GATED_R6


def _uncertified_oracled() -> list[str]:
    certified = _certified()
    return [
        k
        for k in QUERIES
        if k not in certified and k not in _GATE_DEPRIORITIZED and ORACLES.get(k)
    ]


def test_every_uncertified_oracled_query_gets_a_window_slot_or_deferral():
    order = list(QUERIES)
    window = set(order[:WINDOW])
    outside = [k for k in _uncertified_oracled() if k not in window]
    undocumented = [k for k in outside if k not in _GATE_OVERFLOW]
    assert undocumented == [], (
        f"uncertified queries silently outside the {WINDOW}-slot window "
        f"(add to _GATE_OVERFLOW deliberately or displace a lower-value "
        f"query): {undocumented}"
    )


def test_overflow_only_used_when_window_is_full():
    order = list(QUERIES)
    certified = _certified()
    in_window = [k for k in order[:WINDOW] if k not in certified]
    if _GATE_OVERFLOW:
        assert len(in_window) == WINDOW, (
            "queries deferred to _GATE_OVERFLOW while window slots sit free"
        )


def test_spare_window_slots_cycle_stale_r1_r3_greens_first():
    """Round-7 regime: spare slots go to the stalest greens.  No
    R6/R5/R4 canary may hold a window slot while an r1-r3 green (last
    driver-gated in r03) waits outside."""
    order = list(QUERIES)
    window = order[:WINDOW]
    newer = (_GATED_R6 | _GATED_R5 | _GATED_R4) - _GATED_R1_R3
    r13_out = [k for k in order[WINDOW:] if k in _GATED_R1_R3]
    newer_in = [k for k in window if k in newer]
    if r13_out:
        assert not newer_in, (
            f"newer-round canaries {newer_in[:5]} hold window slots while "
            f"stale r1-3 greens wait: {r13_out[:5]}"
        )


def test_gated_sets_reference_real_queries():
    for name in _certified() | _GATE_DEPRIORITIZED | _GATE_OVERFLOW:
        assert name in QUERIES, name


def test_gated_sets_disjoint_from_deprioritized():
    assert not _certified() & (_GATE_DEPRIORITIZED | _GATE_OVERFLOW)
    assert not _GATE_OVERFLOW & _GATE_DEPRIORITIZED


def _greens(path_name: str) -> set:
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", path_name)
    rows = json.load(open(path))
    return {
        k
        for k, r in rows.items()
        if isinstance(r, dict)
        and r.get("rows_match") is True
        and r.get("schema_match") is True
        and r.get("hash_match") is True
    }


def test_gated_r5_matches_driver_greens():
    """Everything in _GATED_R5 must have a fully-green row in
    CORRECTNESS_r05.json — membership is evidence-backed, not asserted."""
    green = _greens("CORRECTNESS_r05.json")
    not_green = sorted(_GATED_R5 - green)
    assert not_green == [], f"_GATED_R5 entries without a green r5 row: {not_green}"
    # eval_report is deliberately excluded: green in r5 but its oracle
    # embeds the red queries' SQL, which the round-6 BIGINT casts edited.
    assert "eval_report" not in _GATED_R5


def test_gated_r6_matches_driver_greens():
    """Everything in _GATED_R6 must have a fully-green row in
    CORRECTNESS_r06.json, and none of the round-7 modified queries may
    sit in any certified set."""
    green = _greens("CORRECTNESS_r06.json")
    not_green = sorted(_GATED_R6 - green)
    assert not_green == [], f"_GATED_R6 entries without a green r6 row: {not_green}"
    r7_modified = {
        "reconcile_v2", "reconcile_summary", "rag_context", "context_lines",
        "rag_context_kg", "multihop_ablation", "citation_scores_agg",
        "eval_report", "fr_coverage", "groundedness_gate",
        "groundedness_reasons", "id_consistency", "graph_triangles",
        "ann_ivf_lists", "ann_ivf_search", "pq_codes", "semdedup",
        "citation_boost", "retrieval_compare", "sparql_update",
        "shape_violations", "eval_schema_violations", "cross_source_overlap",
        # late round-7: canonical_url UDF body vectorized
        "url_canonicalize",
    }
    leaked = sorted(r7_modified & _certified())
    assert leaked == [], f"round-7 modified queries still gate-certified: {leaked}"
