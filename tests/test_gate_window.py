"""Driver-gate window invariants (queries._reorder_for_gate).

The driver certifies the FIRST 50 registry entries each round, so the
ordering must guarantee: every query without a standing green driver row
for its CURRENT impl+oracle sits inside the window, and no window slot
is wasted on a rows-only query that already has its rows-check."""

from earcrawler_spark.queries import (
    ORACLES,
    QUERIES,
    _GATE_DEPRIORITIZED,
    _GATED_R1_R3,
    _GATED_R4,
)


def test_every_uncertified_query_in_gate_window():
    order = list(QUERIES)
    certified = _GATED_R1_R3 | _GATED_R4
    uncertified = [k for k in order if k not in certified]
    window = set(order[:50])
    missing = [k for k in uncertified if k not in window]
    assert missing == [], f"uncertified queries outside the 50-slot window: {missing}"


def test_gated_sets_reference_real_queries():
    for name in _GATED_R1_R3 | _GATED_R4 | _GATE_DEPRIORITIZED:
        assert name in QUERIES, name


def test_gated_sets_disjoint_from_deprioritized():
    assert not (_GATED_R1_R3 | _GATED_R4) & _GATE_DEPRIORITIZED


def test_oracled_uncertified_sort_before_deprioritized():
    order = list(QUERIES)
    certified = _GATED_R1_R3 | _GATED_R4
    for dep in _GATE_DEPRIORITIZED:
        dep_idx = order.index(dep)
        for k in order:
            if k not in certified and k not in _GATE_DEPRIORITIZED and ORACLES.get(k):
                assert order.index(k) < dep_idx, (k, dep)
