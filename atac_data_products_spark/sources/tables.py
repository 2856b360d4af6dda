"""Parquet table scans over the driver's synthetic star schema.

Canonical storage for this engine is Parquet (SURVEY.md §1.4, §4.3):
scans are declarative `spark.read.parquet`, so Catalyst gets predicate
pushdown + column pruning + partition pruning for free — the optimizer
the reference (an eager pandas pipeline) never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Single narrow entry point so partition layout /
    bucketing decisions can later change in one place."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects by default; read nanos as long (runtime-settable)
        # and derive the usable timestamp via events_with_ts().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so the SQL API (`spark.sql`)
    works over the same scans — ANSI text in, identical Catalyst plans
    out."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ts_us_expr(df: DataFrame):
    """Microsecond-epoch BIGINT expression for the events `ts` column,
    robust to the parquet physical type: TIMESTAMP(NANOS) arrives as
    BIGINT nanos (nanosAsLong) and is integer-DIVed — not float-divided,
    nanosecond epochs exceed double's 53-bit mantissa — while
    TIMESTAMP(MICROS) arrives as a timestamp and converts exactly via
    unix_micros (session tz is UTC, so this equals DuckDB's epoch_us)."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        return F.expr("ts DIV 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` normalized to a µs TIMESTAMP regardless of the
    file's physical type (BIGINT nanos or TIMESTAMP(MICROS))."""
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    return df.withColumn("ts", F.timestamp_micros(ts_us_expr(df)))
