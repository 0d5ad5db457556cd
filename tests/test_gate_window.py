"""Driver-gate window invariants (queries._reorder_for_gate).

The driver certifies the FIRST 50 registry entries each round.  Two
regimes:

- uncertified > 50 (round 5): every window slot is spent on an
  uncertified oracled query, and anything uncertified left outside the
  window is an EXPLICIT deferral in _GATE_OVERFLOW / _GATE_DEPRIORITIZED
  — never registration-order luck.
- uncertified <= 50 (round 6, after the _GATED_R5 rotation drained the
  overflow queue): every uncertified oracled query MUST be in the
  window (overflow empty), and the spare slots re-certify the most
  recently certified greens (_GATED_R5 before _GATED_R4 before
  _GATED_R1_R3) as regression canaries.
"""

from earcrawler_spark.queries import (
    ORACLES,
    QUERIES,
    _GATE_DEPRIORITIZED,
    _GATE_OVERFLOW,
    _GATED_R1_R3,
    _GATED_R4,
    _GATED_R5,
)

WINDOW = 50


def _certified() -> frozenset:
    return _GATED_R1_R3 | _GATED_R4 | _GATED_R5


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


def test_spare_window_slots_recertify_newest_greens_first():
    """When the window has spare capacity, re-cert canaries must be the
    most recently certified queries: no _GATED_R4 name may occupy a
    slot while a _GATED_R5 name (not also in an older set) waits
    outside, and likewise R1-3 behind R4."""
    order = list(QUERIES)
    window = order[:WINDOW]
    r5_only = _GATED_R5 - _GATED_R4 - _GATED_R1_R3
    r4_only = _GATED_R4 - _GATED_R1_R3
    r5_out = [k for k in order[WINDOW:] if k in r5_only]
    r4_in = [k for k in window if k in r4_only]
    r13_in = [k for k in window if k in _GATED_R1_R3]
    if r5_out:
        assert not r4_in and not r13_in, (
            f"older-round canaries {r4_in + r13_in} hold window slots while "
            f"round-5 greens wait: {r5_out[:5]}"
        )
    r4_out = [k for k in order[WINDOW:] if k in r4_only]
    if r4_out:
        assert not r13_in, (
            f"r1-3 canaries {r13_in} hold window slots while round-4 greens "
            f"wait: {r4_out[:5]}"
        )


def test_gated_sets_reference_real_queries():
    for name in _certified() | _GATE_DEPRIORITIZED | _GATE_OVERFLOW:
        assert name in QUERIES, name


def test_gated_sets_disjoint_from_deprioritized():
    assert not _certified() & (_GATE_DEPRIORITIZED | _GATE_OVERFLOW)
    assert not _GATE_OVERFLOW & _GATE_DEPRIORITIZED


def test_gated_r5_matches_driver_greens():
    """Everything in _GATED_R5 must have a fully-green row in
    CORRECTNESS_r05.json — membership is evidence-backed, not asserted."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r05.json")
    rows = json.load(open(path))
    green = {
        k
        for k, r in rows.items()
        if isinstance(r, dict)
        and r.get("rows_match") is True
        and r.get("schema_match") is True
        and r.get("hash_match") is True
    }
    not_green = sorted(_GATED_R5 - green)
    assert not_green == [], f"_GATED_R5 entries without a green r5 row: {not_green}"
    # eval_report is deliberately excluded: green in r5 but its oracle
    # embeds the red queries' SQL, which the round-6 BIGINT casts edited.
    assert "eval_report" not in _GATED_R5
