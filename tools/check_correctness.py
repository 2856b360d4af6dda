"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive value multiset (floats rounded).  Usage:

    python tools/check_correctness.py [sf_dir] [key ...]

Conf-invariance sweeps: set ADP_SWEEP_CONF to comma-separated k=v
Spark conf pairs to run the identical gate under a deliberately
different physical configuration — e.g. disable auto-broadcast so
every threshold-decided join runs SMJ/shuffled-hash, the plan family
a 100 TB dim actually gets:

    ADP_SWEEP_CONF='spark.sql.autoBroadcastJoinThreshold=-1,\
spark.sql.shuffle.partitions=3,spark.sql.files.maxPartitionBytes=65536,\
spark.sql.adaptive.enabled=false' python tools/check_correctness.py ...

Results must be identical — the conf decides the physical plan, never
the answer.  Record full-registry runs in docs/SCALE_SWEEP.md.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from atac_data_products_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # synthesized scale-sweep tables are Spark-written DIRECTORIES
        # of part files; the driver's testdata tables are single files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("string")
        else:
            df[c] = s.astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(key: str, spark_df, oracle_df) -> str:
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = normalize(spark_df), normalize(oracle_df)
    if not a.equals(b):
        diff = a.compare(b) if a.shape == b.shape else None
        head = diff.head(5).to_string() if diff is not None and not diff.empty else "(dtype diff)"
        for c in a.columns:
            if not a[c].equals(b[c]):
                head += f"\n  col {c}: spark={a[c].head(3).tolist()} oracle={b[c].head(3).tolist()}"
        return f"VALUE MISMATCH\n{head}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from __spark_entry__ import oracle_sql, queries

    qs, os_ = queries(), oracle_sql()
    keys = sys.argv[2:] or list(qs)
    sweep_conf = {
        k.strip(): v.strip()
        for k, v in (
            pair.split("=", 1)
            for pair in os.environ.get("ADP_SWEEP_CONF", "").split(",")
            if "=" in pair
        )
    }
    if sweep_conf:
        print(f"conf-invariance sweep: {sweep_conf}")
    spark = get_spark("correctness-check", extra_conf=sweep_conf or None)
    con = duck_connect(sf_dir)
    failed = []
    for key in keys:
        t0 = time.time()
        try:
            sdf = qs[key](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{key:32s} SPARK ERROR: {type(e).__name__}: {e}")
            failed.append(key)
            continue
        if key not in os_:
            print(f"{key:32s} rows-only: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(os_[key]).df()
        except Exception as e:
            print(f"{key:32s} ORACLE ERROR: {e}")
            failed.append(key)
            continue
        verdict = compare(key, sdf, odf)
        print(f"{key:32s} {verdict.splitlines()[0]}  rows={len(sdf)}  ({time.time()-t0:.1f}s)")
        if verdict != "OK":
            print("\n".join(verdict.splitlines()[1:]))
            failed.append(key)
    print(f"\n{len(keys) - len(failed)}/{len(keys)} passed")
    if failed:
        print("FAILED:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
