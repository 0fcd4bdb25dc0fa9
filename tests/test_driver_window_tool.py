"""Unit tests for tools/driver_window.py — the generated ordering IS
the verification schedule, so its rules (touched first, never-green
next, stalest-green-first, stability) are load-bearing."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "tools")


@pytest.fixture()
def fake_history(monkeypatch, tmp_path):
    import driver_window

    files = {
        "CORRECTNESS_r01.json": {
            "a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "b": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "c": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
        },
        "CORRECTNESS_r02.json": {
            "b": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "d": {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"},
        },
    }
    for name, rows in files.items():
        (tmp_path / name).write_text(json.dumps(rows))
    monkeypatch.setattr(driver_window, "REPO", str(tmp_path))
    monkeypatch.setattr(
        driver_window, "_raw_registry", lambda: ["a", "b", "c", "d", "e"]
    )
    return driver_window


def test_history_green_rule(fake_history):
    green = fake_history.history()
    # a: green in r1 only; b: green r1+r2 → r2; c: hash mismatch →
    # never; d: err → never; e: no row → absent
    assert green == {"a": 1, "b": 2}


def test_window_order_touched_then_never_green_then_stalest(fake_history):
    rows = fake_history.build_window(front=["b"])
    assert [n for n, _ in rows] == ["b", "c", "d", "e", "a"]
    why = dict(rows)
    assert why["b"] == "touched this round"
    assert why["c"] == "never driver-green"  # red row ≠ green
    assert why["e"] == "never driver-green"  # never checked
    assert why["a"] == "last green r1"


def test_front_name_must_exist(fake_history):
    with pytest.raises(AssertionError):
        fake_history.build_window(front=["nope"])
