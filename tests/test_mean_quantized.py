"""Unit battery for the exact-quantization lane
(functions/numeric.py::mean_quantized family) — the primitive behind
the round-8 integer-ratio contract (docs/OPERATIONS.md): every case is
checked BOTH engines and must agree bit-for-bit, including the exact
boundary rationals `round(double)` gets wrong.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from atac_data_products_spark.functions.numeric import (
    mean_quantized,
    mean_quantized_signed,
    mean_quantized_signed_sql,
    mean_quantized_sql,
)

# (sum, count) — includes exact 10^-6 boundaries (x.5 quanta), huge
# values past int64 when scaled, and degenerate zero-count groups
CASES = [
    (20_000_033, 20),        # 1000001.65 — the cadence-bug rational
    (41, 20),                # 2.05 exactly at a 2dp boundary
    (5, 2),                  # 2.5
    (1, 3),                  # repeating fraction
    (0, 5),                  # zero mean
    (999_999_999_999_999, 999_983),   # large, prime-ish denominator
    (250_000_000_000_000_000, 3),     # mean ~8.3e16: past int64 when ×1e6
    (None, 0),               # empty group → NULL
    (0, 0),                  # degenerate → NULL
]

SIGNED_CASES = [(-s if s else s, n) for s, n in CASES] + [(-41, 20), (-5, 2)]


@pytest.fixture(scope="module")
def duck_local():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_vals(spark, cases, col_fn):
    df = spark.createDataFrame(cases, "s bigint, n bigint").select(
        col_fn("s", "n").alias("m")
    )
    return [r.m for r in df.collect()]


def _duck_vals(con, cases, sql_fn):
    out = []
    for s, n in cases:
        s_sql = "CAST(NULL AS BIGINT)" if s is None else f"CAST({s} AS BIGINT)"
        out.append(con.execute(f"SELECT {sql_fn(s_sql, str(n))}").fetchone()[0])
    return out


def test_unsigned_matches_cross_engine(spark, duck_local):
    a = _spark_vals(spark, CASES, mean_quantized)
    b = _duck_vals(duck_local, CASES, mean_quantized_sql)
    assert a == b


def test_signed_matches_cross_engine(spark, duck_local):
    a = _spark_vals(spark, SIGNED_CASES, mean_quantized_signed)
    b = _duck_vals(duck_local, SIGNED_CASES, mean_quantized_signed_sql)
    assert a == b


def test_exact_boundary_rationals(spark):
    # the exact values round(double) cannot pin: x.5 quanta round AWAY
    vals = _spark_vals(spark, [(41, 20), (5, 2), (20_000_033, 20)], mean_quantized)
    assert vals == [2.05, 2.5, 1000001.65]
    neg = _spark_vals(spark, [(-41, 20), (-5, 2)], mean_quantized_signed)
    assert neg == [-2.05, -2.5]  # half AWAY from zero, matching SQL round


def test_zero_count_is_null_both_forms(spark):
    assert _spark_vals(spark, [(7, 0)], mean_quantized) == [None]
    assert _spark_vals(spark, [(-7, 0)], mean_quantized_signed) == [None]


def test_custom_unit(spark, duck_local):
    cases = [(12345, 2)]  # 6172.5 at 4dp unit
    a = _spark_vals(spark, cases, lambda s, n: mean_quantized(s, n, 10_000))
    b = _duck_vals(
        duck_local, cases, lambda s, n: mean_quantized_sql(s, n, 10_000)
    )
    assert a == b == [6172.5]


def test_signed_numerator_expression(spark):
    # Column-expression numerators (the common call shape in registry code)
    df = spark.createDataFrame([(10, -30, 4)], "a bigint, b bigint, n bigint")
    out = df.select(
        mean_quantized_signed(F.col("a") + F.col("b"), "n").alias("m")
    ).collect()[0].m
    assert out == -5.0
