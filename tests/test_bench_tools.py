"""Tests for tools/bench_diff.py flag logic (no Spark needed).

The multi-lens flagging rule requires every normalization lens to agree.
r12 advisor find: a regressed key that is itself a member of the mid
variance index inflates the mid index with its own regression and
self-masks its mid-normalized lens — a key dominating the index could
never be flagged.  The fix recomputes the mid ratio leave-one-out (the
index is sum(queries[k]) so the key's own contribution subtracts out).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "tools")

import bench_diff  # noqa: E402


def _write(tmp_path, name, queries, vi_keys, mid_keys):
    vi = round(sum(queries[k] for k in vi_keys), 3)
    vim = round(sum(queries[k] for k in mid_keys), 3)
    doc = {
        "metric": "bench",
        "value": sum(queries.values()),
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "variance_index": vi,
        "variance_index_keys": vi_keys,
        "variance_index_mid": vim,
        "variance_index_mid_keys": mid_keys,
    }
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def test_mid_index_key_cannot_self_mask(tmp_path, monkeypatch, capsys):
    """m1 dominates the mid index and regresses 3x.  With the all-in mid
    ratio its own regression inflates the index (31/11 = 2.82) so the
    mid lens reads 3.0/2.82 = 1.06 — under the pre-r12 rule the key
    could never flag.  Leave-one-out removes m1 from both sides
    ((31-30)/(11-10) = 1.0) and the flag survives every lens."""
    vi_keys = ["t1"]
    mid_keys = ["m1", "m2"]
    old = _write(
        tmp_path, "old.json",
        {"t1": 0.1, "m1": 10.0, "m2": 1.0, "q1": 1.0}, vi_keys, mid_keys,
    )
    new = _write(
        tmp_path, "new.json",
        {"t1": 0.1, "m1": 30.0, "m2": 1.0, "q1": 1.0}, vi_keys, mid_keys,
    )
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", old, new])
    rc = bench_diff.main()
    out = capsys.readouterr().out
    assert rc == 1
    assert "REGRESSIONS (1): ['m1']" in out
    assert "leave-one-out" in out


def test_unchanged_keys_do_not_flag(tmp_path, monkeypatch, capsys):
    vi_keys = ["t1"]
    mid_keys = ["m1", "m2"]
    old = _write(
        tmp_path, "old.json",
        {"t1": 0.1, "m1": 10.0, "m2": 1.0, "q1": 1.0}, vi_keys, mid_keys,
    )
    new = _write(
        tmp_path, "new.json",
        {"t1": 0.1, "m1": 10.1, "m2": 1.0, "q1": 1.05}, vi_keys, mid_keys,
    )
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", old, new])
    rc = bench_diff.main()
    out = capsys.readouterr().out
    assert rc == 0
    assert "REGRESSED" not in out


def test_json_report_full_width(tmp_path, monkeypatch):
    """--json emits a driver-style per-query prev/now/speedup record for
    EVERY common key (r12 verdict: the 5-key PERF window is a noise
    lottery; the committed artifacts must carry the full-width,
    load-normalized diff)."""
    vi_keys = ["t1"]
    mid_keys = ["m1", "m2"]
    old = _write(
        tmp_path, "old.json",
        {"t1": 0.2, "m1": 10.0, "m2": 1.0, "q1": 2.0, "q2": 1.0},
        vi_keys, mid_keys,
    )
    new = _write(
        tmp_path, "new.json",
        # host 2x more loaded (t1 doubles); q1 genuinely halves raw
        {"t1": 0.4, "m1": 20.0, "m2": 2.0, "q1": 2.0, "q2": 2.0},
        vi_keys, mid_keys,
    )
    out = tmp_path / "report.json"
    monkeypatch.setattr(
        sys, "argv", ["bench_diff.py", old, new, "--json", str(out)]
    )
    rc = bench_diff.main()
    assert rc == 0
    doc = json.loads(out.read_text())
    assert doc["n_common"] == 5
    assert set(doc["per_query"]) == {"t1", "m1", "m2", "q1", "q2"}
    q1 = doc["per_query"]["q1"]
    # raw parity, but the 2x variance-index lens normalizes it to a 2x
    # improvement (speedup = prev/now convention, >1 is faster)
    assert q1["speedup"] == 1.0
    assert q1["speedup_norm"] == 2.0
    assert q1["status"] == "improved"
    # unchanged-under-load keys read flat after normalization
    assert doc["per_query"]["q2"]["speedup_norm"] == 1.0
    assert doc["per_query"]["q2"]["status"] == "flat"
    assert doc["geomean_speedup_norm"] > 1.0
    assert doc["variance_index_ratio"] == 2.0


def test_json_report_marks_new_and_gone(tmp_path, monkeypatch):
    vi_keys = ["t1"]
    old = _write(tmp_path, "o.json", {"t1": 0.2, "gone_q": 1.0}, vi_keys, [])
    new = _write(tmp_path, "n.json", {"t1": 0.2, "new_q": 1.0}, vi_keys, [])
    out = tmp_path / "r.json"
    monkeypatch.setattr(
        sys, "argv", ["bench_diff.py", old, new, "--json", str(out)]
    )
    bench_diff.main()
    doc = json.loads(out.read_text())
    assert doc["per_query"]["gone_q"]["status"] == "gone"
    assert doc["per_query"]["new_q"]["status"] == "new"
    assert doc["n_common"] == 1
