"""Run any registered contract query from the command line.

Usage:
    python tools/run_query.py <key> [--sf-dir DIR] [--limit N]
                              [--explain] [--oracle] [--json]
    python tools/run_query.py --list [pattern]

Examples:
    python tools/run_query.py tpch_q1_pricing_summary
    python tools/run_query.py dedup_minhash_lsh --sf-dir /root/testdata/sf0.1
    python tools/run_query.py similarity_topk --explain
    python tools/run_query.py --list corpus_

This is the single-user entry point the registry was built for: every
operator a reference user runs today has a key here, executable against
any sf directory (or any directory holding the same parquet tables).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("key", nargs="?", help="registry key (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20, help="rows to show (0 = all)")
    ap.add_argument("--explain", action="store_true", help="print the formatted physical plan")
    ap.add_argument("--oracle", action="store_true", help="print the DuckDB oracle SQL twin")
    ap.add_argument("--json", action="store_true", help="emit rows as JSON lines")
    ap.add_argument("--list", dest="list_pat", nargs="?", const="", default=None,
                    metavar="PATTERN", help="list keys (optionally filtered)")
    args = ap.parse_args()

    import __spark_entry__ as e

    qs = e.queries()
    if args.list_pat is not None:
        for k in sorted(qs):
            if args.list_pat in k:
                print(k)
        return 0
    if not args.key:
        ap.error("a key is required (or --list)")
    if args.key not in qs:
        near = [k for k in sorted(qs) if args.key in k][:10]
        print(f"unknown key {args.key!r}; close matches: {near}", file=sys.stderr)
        return 2
    if args.oracle:
        print(e.oracle_sql().get(args.key, "-- no oracle (rows-only contract)"))
        return 0

    from atac_data_products_spark.session import get_spark

    spark = get_spark(f"run-{args.key}")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.key](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    # collect ONCE and print from the collected rows (the query never
    # executes twice, and --limit 0 really shows every row)
    rows = df.collect() if args.limit == 0 else df.limit(args.limit).collect()
    if args.json:
        import json

        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
    else:
        shown = spark.createDataFrame(rows, df.schema) if rows else df.limit(0)
        shown.show(n=max(len(rows), 1), truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
