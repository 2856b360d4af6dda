"""Exhaustive row-order / file-sharding invariance sweep.

The synthetic parquet tables freeze one physical row order and one
file per table; a real lake at 100 TB guarantees neither — ingestion
order, compaction, and writer parallelism all reshuffle rows and
resplit files.  A key whose result depends on the incidental order
(an implicit "first", a double sum whose accumulation order crosses a
rounding boundary) is oracle-green on the frozen layout and drifts on
any other.

This tool rewrites every table row-permuted (deterministic seed) and
split into N files, runs every key (or a subset) against both layouts,
and diffs normalized output:

    python tools/order_scan.py                   # seed 42, 3 files
    python tools/order_scan.py --seed 7 --files 5
    python tools/order_scan.py --seed 7 --files 5 key1 key2

Exits nonzero on drift.  Found at introduction: tpch_q1's double-sum
accumulation flipped a cent at the round(2) boundary → money math
rewritten in exact DECIMAL.  The per-suite battery
(tests/test_order_invariance.py) pins the risk subset.
"""

from __future__ import annotations

import argparse
import importlib.util
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCHEMA_SOURCE = "/root/testdata/sf0.001"
SKIP = {"gen_uuid", "gen_timestamp"}  # nondeterministic by nature


def build_shuffled_dir(
    dest: str, source: str = SCHEMA_SOURCE, seed: int = 42, nfiles: int = 3
) -> None:
    """Row-permute every table (deterministic rng) and split it into
    nfiles parquet parts under <dest>/<table>.parquet/."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from atac_data_products_spark.sources.tables import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{source}/{t}.parquet")
        rng = np.random.default_rng(seed)
        shuf = tbl.take(pa.array(rng.permutation(tbl.num_rows)))
        part_dir = Path(dest) / f"{t}.parquet"
        part_dir.mkdir(parents=True, exist_ok=True)
        n = tbl.num_rows
        k = max(1, min(nfiles, n))
        cuts = [round(i * n / k) for i in range(k + 1)]
        for i in range(k):
            pq.write_table(
                shuf.slice(cuts[i], cuts[i + 1] - cuts[i]),
                part_dir / f"part-{i}.parquet",
            )


def _load_normalize():
    spec = importlib.util.spec_from_file_location(
        "check_correctness", REPO / "tools" / "check_correctness.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.normalize


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--files", type=int, default=3)
    args = ap.parse_args()

    from atac_data_products_spark.session import get_spark

    import __spark_entry__ as entry

    normalize = _load_normalize()
    qs = entry.queries()
    keys = args.keys or [k for k in sorted(qs) if k not in SKIP]

    spark = get_spark("order-scan", shuffle_partitions=8)
    drift, errors = [], []
    tmp = tempfile.mkdtemp(prefix="adp_order_")
    try:
        build_shuffled_dir(tmp, seed=args.seed, nfiles=args.files)
        for i, k in enumerate(keys, 1):
            try:
                a = normalize(qs[k](spark, SCHEMA_SOURCE).toPandas())
                b = normalize(qs[k](spark, tmp).toPandas())
            except Exception as ex:  # noqa: BLE001 — report, don't mask
                errors.append(k)
                print(f"[{i}/{len(keys)}] {k}: ERR {type(ex).__name__}: "
                      f"{str(ex).splitlines()[0][:100]}")
                continue
            if a.shape != b.shape or not a.equals(b):
                drift.append(k)
                print(f"[{i}/{len(keys)}] {k}: DRIFT")
            else:
                print(f"[{i}/{len(keys)}] {k}: ok")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"\n{len(keys) - len(drift) - len(errors)}/{len(keys)} invariant")
    if drift:
        print("DRIFT:", ", ".join(drift))
    if errors:
        print("ERRORS:", ", ".join(errors))
    return 1 if drift or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
