"""Driver-artifact health checks (VERDICT r03 "Next round #7").

Round 3's bench gate broke because bench.py printed one huge JSON line
whose head fell outside the driver's bounded tail capture
(BENCH_r03.json: ``"parsed": null``).  These tests catch a broken
driver artifact IN-ROUND instead of at the next judge pass:

- the bench summary line stays short enough to survive tail capture,
  regardless of how many headline queries exist;
- BENCH_DETAIL.json (when present) is valid JSON with the full map;
- every CORRECTNESS_r*.json is a valid <=50-key grading window whose
  keys all exist in the registry;
- the rotation puts ONLY driver-ungraded keys in the next window (while
  any remain) and keeps queries()/oracle_sql() key-aligned.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    import __spark_entry__ as e

    return e


def test_bench_summary_line_is_tail_safe():
    """Simulate the exact summary line bench.py prints for the current
    HEADLINE list and assert it stays far under any plausible stdout
    tail-capture bound (BENCH_r03's tail held ~2000 chars of line)."""
    import bench

    fake = {name: 1.234 for name in bench.HEADLINE}
    head = {k: fake[k] for k in list(fake)[:5]}
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": 123.456,
            "unit": "sec",
            "queries": head,
            "sf": 0.1,
            "n_queries": len(fake),
            "detail": "BENCH_DETAIL.json",
        }
    )
    assert len(line) < 1000, f"summary line too long ({len(line)} chars)"
    parsed = json.loads(line)
    assert parsed["unit"] == "sec" and parsed["n_queries"] == len(
        bench.HEADLINE
    )


def test_bench_detail_file_valid_when_present():
    path = os.path.join(HERE, "BENCH_DETAIL.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_DETAIL.json yet (first bench not run)")
    with open(path) as f:
        detail = json.load(f)
    assert detail["unit"] == "sec"
    assert isinstance(detail["queries"], dict) and detail["queries"]
    assert detail["n_queries"] == len(detail["queries"])
    assert abs(sum(detail["queries"].values()) - detail["value"]) < 1.0


def test_correctness_artifacts_are_valid_windows():
    e = _entry()
    registry_keys = set(e.queries())
    paths = sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")))
    assert paths, "no CORRECTNESS artifacts found"
    for path in paths:
        with open(path) as f:
            data = json.load(f)
        assert isinstance(data, dict) and data, f"{path}: empty/invalid"
        assert len(data) <= 50, f"{path}: >50 graded keys"
        unknown = set(data) - registry_keys
        assert not unknown, f"{path}: keys not in registry: {unknown}"
        for key, row in data.items():
            assert isinstance(row, dict) and "rows_match" in row, (
                f"{path}:{key}: malformed row"
            )


def test_rotation_serves_ungraded_keys_first():
    e = _entry()
    qs = e.queries()
    osql = e.oracle_sql()
    green = e._DRIVER_GREEN
    window = list(qs)[:50]
    ungraded_total = sum(1 for k in qs if k not in green)
    expect_ungraded = min(50, ungraded_total)
    in_window_ungraded = sum(1 for k in window if k not in green)
    assert in_window_ungraded == expect_ungraded, (
        "grading window wastes slots on already-green keys"
    )
    # oracle map serves the same keys in the same order (driver zips them)
    shared = [k for k in qs if k in osql]
    shared_o = [k for k in osql if k in qs]
    assert shared == shared_o, "queries()/oracle_sql() order diverged"


def test_priority_keys_exist_in_registry():
    e = _entry()
    qs = e.queries()
    missing = [k for k in e._PRIORITY if k not in qs]
    assert not missing, f"_PRIORITY names unknown keys: {missing}"


def test_compare_gate_catches_drift():
    """Negative control for the oracle gate: compare() must flag value,
    schema, and rowcount drift — a gate that can't fail is no gate.
    (Float compare rounds to 6 dp by design, so sub-1e-6 drift is
    accepted; anything at 1e-5 must be caught.)"""
    import pandas as pd

    from tools.check_correctness import compare

    base = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5], "s": ["a", "b"]})
    assert compare("t", base, base.copy()) == "OK"
    # order-insensitive by contract
    assert compare("t", base.iloc[::-1].reset_index(drop=True), base) == "OK"
    # sub-rounding float noise accepted
    wiggle = base.copy()
    wiggle["v"] = wiggle["v"] + 1e-9
    assert compare("t", wiggle, base) == "OK"
    # real value drift caught
    mut = base.copy()
    mut.loc[0, "v"] = 1.50002
    assert compare("t", mut, base).startswith("VALUE MISMATCH")
    muts = base.copy()
    muts.loc[1, "s"] = "B"
    assert compare("t", muts, base).startswith("VALUE MISMATCH")
    # schema and rowcount drift caught
    ren = base.rename(columns={"v": "value"})
    assert compare("t", ren, base).startswith("SCHEMA MISMATCH")
    assert compare("t", base.head(1), base).startswith("ROWCOUNT MISMATCH")
