"""Skew-mitigation operators: salted two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles join-side skew;
aggregation hot keys still funnel one reducer when a single key holds a
large share of rows (one viral user, one boilerplate document).  The
classic fix is salting: shard each key into `n_salts` sub-keys, partial-
aggregate per shard, then final-aggregate the shards — two small
shuffles instead of one skewed one.

Deterministic (salt = hash(row-identity) % n), so salted plans stay
oracle-checkable: results are bit-identical to the direct aggregation
for decomposable aggregates (sum/count/min/max over ints; float sums
change accumulation order — round before comparing, as everywhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    int_sum_cols: Sequence[str],
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase sum/count over possibly-skewed grouping keys.

    ``salt_on``: expression identifying the row (defaults to a uniform
    spread via spark_partition_id + monotonically_increasing_id would be
    nondeterministic — callers pass a stable column, e.g. the row's
    unique id, hashed).
    """
    if salt_on is None:
        raise ValueError("pass a stable row-identity column for deterministic salting")
    salt = (F.abs(F.hash(salt_on)) % F.lit(n_salts)).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__n"),
            *[F.sum(c).alias(f"__s_{c}") for c in int_sum_cols],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in int_sum_cols],
    )
