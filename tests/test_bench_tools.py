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
