"""Exhaustive session-timezone invariance scan over the registry.

Runs every key (or a subset) twice — session timezone UTC vs
Asia/Kathmandu (+05:45: east-of-UTC AND non-whole-hour, the offset
class that breaks day floors and window alignment anchored in session
time) — and reports any key whose normalized output differs.

The per-suite pytest battery (tests/test_timezone_invariance.py)
covers the calendar-risk subset on every run; this tool is the full
sweep for audits and round verdicts:

    python tools/tz_scan.py                       # all keys at sf0.001
    python tools/tz_scan.py /root/testdata/sf0.01 key1 key2

Exits nonzero if any key drifts or errors, so it can gate.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FLIP_TZ = "Asia/Kathmandu"
TZ_CONF = "spark.sql.session.timeZone"
SKIP = {"gen_uuid", "gen_timestamp"}  # nondeterministic by nature


def _load_normalize():
    spec = importlib.util.spec_from_file_location(
        "check_correctness", REPO / "tools" / "check_correctness.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.normalize


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from atac_data_products_spark.session import get_spark

    import __spark_entry__ as entry

    normalize = _load_normalize()
    qs = entry.queries()
    keys = sys.argv[2:] or [k for k in sorted(qs) if k not in SKIP]

    spark = get_spark("tz-scan", shuffle_partitions=8)
    drift, errors = [], []
    for i, k in enumerate(keys, 1):
        out = {}
        for tz in ("UTC", FLIP_TZ):
            spark.conf.set(TZ_CONF, tz)
            try:
                out[tz] = normalize(qs[k](spark, sf_dir).toPandas())
            except Exception as ex:  # noqa: BLE001 — report, don't mask
                out[tz] = f"{type(ex).__name__}: {str(ex)[:120]}"
        spark.conf.set(TZ_CONF, "UTC")
        a, b = out["UTC"], out[FLIP_TZ]
        if isinstance(a, str) or isinstance(b, str):
            errors.append(k)
            print(f"[{i}/{len(keys)}] {k}: ERR {a if isinstance(a, str) else b}")
        elif a.shape != b.shape or not a.equals(b):
            drift.append(k)
            print(f"[{i}/{len(keys)}] {k}: DRIFT")
        else:
            print(f"[{i}/{len(keys)}] {k}: ok")
    print(f"\n{len(keys) - len(drift) - len(errors)}/{len(keys)} invariant")
    if drift:
        print("DRIFT:", ", ".join(drift))
    if errors:
        print("ERRORS:", ", ".join(errors))
    return 1 if drift or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
