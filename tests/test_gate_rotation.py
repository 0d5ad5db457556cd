"""scripts/gate_rotation.classify: the per-round driver-row triage the
round-opening rotation relies on."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "gate_rotation",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "gate_rotation.py"),
)
gate_rotation = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gate_rotation)


def test_classify_triage():
    rows = {
        "a": {"rows_match": True, "schema_match": True, "hash_match": True},
        "b": {"rows_match": True, "schema_match": True, "hash_match": False},
        "c": {"rows_match": None, "schema_match": None, "hash_match": None},
        "d": {"rows_match": False, "schema_match": None, "hash_match": None},
        "_meta": "ignored non-dict",
    }
    green, red, rows_only = gate_rotation.classify(rows)
    assert green == ["a"]
    assert red == ["b", "d"]
    assert rows_only == ["c"]


def test_classify_matches_r04_verdict():
    """The classifier reproduces the judged r4 outcome: 41 green, the 7
    named hash-reds, and the 2 rows-only slots."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r04.json")
    green, red, rows_only = gate_rotation.classify(json.load(open(path)))
    assert len(green) == 41
    assert red == [
        "citation_scores_agg", "evidence_resolution", "fr_coverage",
        "generation_policy", "groundedness_gate", "groundedness_reasons",
        "phase2_contract_gate",
    ]
    assert rows_only == ["ann_ivf_lists", "media_features"]
