"""Window / limit / top-k operators (SURVEY.md §2.7).

L2 `first_match_shortcircuit`: the reference's find_files returns the
first match in os.walk order — nondeterministic under duplicates
(bin/concatenate.py:38-45).  The engine pins a deterministic definition:
rank by an explicit total order within each group and keep row 1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def first_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Deterministic per-group top-1 via row_number.

    Scale note: rank-then-filter shuffles once on the partition keys;
    at very large scale with tiny k, `groupBy + min_by(struct)` avoids
    materializing the sort, but row_number keeps all columns without
    struct packing and AQE handles skewed groups.
    """
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
