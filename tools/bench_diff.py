"""Diff two bench JSON files and flag per-query regressions.

Usage:
    python tools/bench_diff.py BENCH_r01.json BENCH_r02.json [--threshold 1.5]

Each input is either the raw one-line JSON bench.py prints, or the
driver's wrapper ({"parsed": {...}} / {"tail": "...{json}..."}).  Exits
nonzero if any query regressed by more than the threshold, so the check
can gate a commit.
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    bench = None
    if "queries" in raw or "queries_runs" in raw:
        bench = raw
    elif isinstance(raw.get("parsed"), dict) and "queries" in raw["parsed"]:
        bench = raw["parsed"]
    else:
        # driver wrapper without parsed: fish the JSON line out of the tail
        for line in reversed(raw.get("tail", "").splitlines()):
            if line.startswith("{"):
                bench = json.loads(line)
                break
    if bench is None:
        raise ValueError(f"{path}: no bench JSON found")
    # prefer the r09+ per-key run records (sec_min == the old `queries`
    # min by definition, but carries the full sec_runs spread)
    qr = bench.get("queries_runs")
    if isinstance(qr, dict) and qr:
        bench = dict(bench)
        bench["queries"] = {k: v["sec_min"] for k, v in qr.items()}
        bench["_runs"] = {k: v.get("sec_runs", []) for k, v in qr.items()}
        # r11+: per-key calibration probe adjacent to each key's runs
        bench["_cal"] = {
            k: v["cal_sec"] for k, v in qr.items() if v.get("cal_sec")
        }
    return bench


def _spread(runs: list[float] | None) -> str:
    """max/min run ratio — >~1.3 on an unchanged key means host noise."""
    if not runs or len(runs) < 2 or min(runs) <= 0:
        return ""
    return f" runs×{max(runs) / min(runs):.2f}"


def main() -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--threshold", type=float, default=1.5)
    p.add_argument(
        "--json",
        dest="json_out",
        default=None,
        help="write a driver-style per-query prev/now/speedup report "
        "(speedup = prev/now; *_norm = load-normalized by the per-key "
        "calibration probe when both sides carry one, else by the "
        "variance index) over ALL common keys to this path",
    )
    ns = p.parse_args()
    thr = ns.threshold
    old, new = load_bench(ns.old), load_bench(ns.new)
    oq, nq = old["queries"], new["queries"]
    # Host-load normalization: when both artifacts carry the
    # variance_index (sum of 7 plan-frozen trivial keys — see bench.py
    # VARIANCE_INDEX_KEYS), divide each per-query ratio by the index
    # ratio so co-tenant load differences between the two runs don't
    # read as code regressions (round-5 finding: unchanged keys 1.41x
    # slower across days while the suite was load-normalized faster).
    load_ratio = 1.0
    ovi, nvi = old.get("variance_index"), new.get("variance_index")
    ok_keys, nk_keys = (
        old.get("variance_index_keys"), new.get("variance_index_keys"),
    )
    if ovi and nvi and ok_keys is not None and nk_keys is not None and ok_keys != nk_keys:
        # indices summed over DIFFERENT key sets are not comparable —
        # normalizing by their ratio would skew every query ~1/N per
        # missing key (review finding); fall back to raw ratios loudly
        print(
            "variance_index_keys differ between artifacts "
            f"({sorted(set(ok_keys) ^ set(nk_keys))}) — normalization SKIPPED"
        )
    elif ovi and nvi:
        load_ratio = nvi / ovi
        print(f"variance_index: {ovi:.3f}s -> {nvi:.3f}s "
              f"(host-load ratio {load_ratio:.2f} — per-query ratios normalized)")
    # Second, shuffle-class index (bench.py VARIANCE_INDEX_MID_KEYS):
    # sub-second shuffle+explode keys drift in a correlated cluster the
    # trivial-key index misses (round-8 corpus_tfidf_topk adjudication).
    # Reported as a diagnostic; flags below stay decided by the primary
    # index, but each flagged key also shows its mid-normalized ratio so
    # a shuffle-class drift reads as such without a hand-run A/B.
    mid_ratio = None
    omi, nmi = old.get("variance_index_mid"), new.get("variance_index_mid")
    omk, nmk = (
        old.get("variance_index_mid_keys"), new.get("variance_index_mid_keys"),
    )
    if omi and nmi and omk == nmk:
        mid_ratio = nmi / omi
        print(f"variance_index_mid: {omi:.3f}s -> {nmi:.3f}s "
              f"(shuffle-class ratio {mid_ratio:.2f} — diagnostic only)")
    # Per-key calibration normalization (r11, preferred when BOTH sides
    # carry it): each key's cost in units of the fixed probe measured
    # RIGHT BEFORE it — (new_sec/new_cal)/(old_sec/old_cal) cancels host
    # load at the moment each side ran, where the run-level
    # variance_index can only cancel the run's average load.  Probe
    # identity is checked: ratios in different probe units are garbage.
    ocal, ncal = old.get("_cal", {}), new.get("_cal", {})
    cal_comparable = bool(ocal) and bool(ncal)
    oprobe, nprobe = old.get("cal_probe"), new.get("cal_probe")
    if cal_comparable and oprobe != nprobe:
        print(
            f"cal_probe definitions differ ({oprobe} vs {nprobe}) — "
            "per-key calibration normalization SKIPPED"
        )
        cal_comparable = False
    if cal_comparable:
        print(
            "per-key calibration present on both sides — ratios are "
            "load-normalized per key (probe units), variance_index is "
            "the fallback for keys missing a probe"
        )
    regressed = []
    report: dict = {}
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            tag = "NEW" if a is None else "GONE"
            print(f"{name:34s} {a if a is not None else '-':>8} {b if b is not None else '-':>8}   {tag}")
            report[name] = {
                "prev_sec": a,
                "now_sec": b,
                "status": "new" if a is None else "gone",
            }
            continue
        ca, cb = ocal.get(name), ncal.get(name)
        if cal_comparable and ca and cb:
            key_load = cb / ca  # how much slower the probe ran beside new
            norm_tag = "cal"
        else:
            key_load = load_ratio
            norm_tag = ""
        raw = b / a if a else float("inf")
        ratio = raw / key_load
        # A flag must survive EVERY normalization lens available (r11):
        # when the two runs' load differs a lot, any single run-level
        # index over- or under-corrects for keys outside its cost class
        # (a 0.63 trivial-key ratio between a storm-hour and a quiet-hour
        # run inflated 34 phantom flags whose mid-normalized ratios were
        # all ~1.0-1.2).  Requiring the primary, the mid-index, and the
        # per-key probe (when present) to AGREE is how flags were being
        # adjudicated by hand anyway.
        lenses = [ratio]
        if mid_ratio:
            # Leave-one-out (r12, advisor find): a key that is itself a
            # member of the mid index inflates mid_ratio with its own
            # regression and self-masks its mid-normalized lens — a
            # genuine regression in a mid-index key could never flag.
            # The index is sum(queries[k] for k in mid_keys), so the
            # key's own contribution can be subtracted from both sides.
            key_mid_ratio = mid_ratio
            if omk and name in omk and (omi - a) > 0 and (nmi - b) > 0:
                key_mid_ratio = (nmi - b) / (omi - a)
            lenses.append(raw / key_mid_ratio)
        norm_min = min(lenses)
        flag = ""
        # the noise floor must use the NORMALIZED delta: with the raw
        # delta, a less-loaded new host masks genuine normalized
        # regressions whose raw times happen to match (review finding)
        if norm_min > thr and (b / key_load) - a > 0.2:
            flag = f"  REGRESSED >{thr}x"
            if norm_tag:
                flag += f" (cal-normalized; probe {ca:.3f}->{cb:.3f}s)"
            if mid_ratio:
                flag += f" (mid-normalized {raw / key_mid_ratio:.2f}x"
                if key_mid_ratio != mid_ratio:
                    flag += ", leave-one-out"
                flag += ")"
            # per-key run spread (r09): a flagged key whose new-side
            # sec_runs spread exceeds its ratio is host noise, not code
            flag += _spread(new.get("_runs", {}).get(name))
            regressed.append(name)
        print(f"{name:34s} {a:8.3f} {b:8.3f} {ratio:7.2f}{flag}")
        # driver-style record: speedup = prev/now (>1 is faster), plus
        # the load-normalized variant (per-key calibration probe when
        # both sides carry one, else the run-level variance index) —
        # the r12 verdict's ask: a full-width round-over-round diff
        # computable from committed artifacts alone, so the 5-key PERF
        # window stops being a noise lottery.
        norm_speedup = 1.0 / ratio if ratio else None
        report[name] = {
            "prev_sec": round(a, 3),
            "now_sec": round(b, 3),
            "speedup": round(a / b, 3) if b else None,
            "speedup_norm": round(norm_speedup, 3) if norm_speedup else None,
            "norm_lens": norm_tag or ("vi" if load_ratio != 1.0 else "raw"),
            "flagged": bool(flag),
            "status": (
                "regressed"
                if norm_speedup and norm_speedup < 1 / 1.1
                else "improved"
                if norm_speedup and norm_speedup > 1.1
                else "flat"
            ),
        }
    total_old = old.get("value", sum(oq.values()))
    total_new = new.get("value", sum(nq.values()))
    print(f"\ntotal: {total_old:.2f}s -> {total_new:.2f}s")
    if ns.json_out:
        import math

        common = [r for r in report.values() if r.get("speedup_norm")]
        doc = {
            "n_common": len(common),
            "n_improved": sum(1 for r in common if r["status"] == "improved"),
            "n_regressed": sum(
                1 for r in common if r["status"] == "regressed"
            ),
            "n_flagged": len(regressed),
            "total_prev": round(total_old, 3),
            "total_now": round(total_new, 3),
            "geomean_speedup": (
                round(
                    math.exp(
                        sum(math.log(r["speedup"]) for r in common)
                        / len(common)
                    ),
                    3,
                )
                if common
                else None
            ),
            "geomean_speedup_norm": (
                round(
                    math.exp(
                        sum(math.log(r["speedup_norm"]) for r in common)
                        / len(common)
                    ),
                    3,
                )
                if common
                else None
            ),
            "variance_index_ratio": round(load_ratio, 3),
            "variance_index_mid_ratio": (
                round(mid_ratio, 3) if mid_ratio else None
            ),
            "cal_normalized": cal_comparable,
            "status_bounds": "improved > 1.1, regressed < 1/1.1, on speedup_norm",
            "per_query": report,
        }
        with open(ns.json_out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"json report: {ns.json_out}")
    if regressed:
        print(f"REGRESSIONS ({len(regressed)}): {regressed}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
