"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the reference's core product-build
  semantics — union → intersect → broadcast joins → annotate) at sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2
  plus the scale extensions (dedup / similarity / text / multimodal /
  streaming), each ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()``: DuckDB-runnable SQL twin per key; keys without an
  oracle get the driver's rows-only check (noted per entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from atac_data_products_spark.registry import product_obs_plan

    return product_obs_plan(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from atac_data_products_spark import (  # noqa: F401
        registry,
        registry_analytics,
        registry_corpus,
        registry_ext,
        registry_tpch,
    )

    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    from atac_data_products_spark import (  # noqa: F401
        registry,
        registry_analytics,
        registry_corpus,
        registry_ext,
        registry_tpch,
    )

    return dict(registry.ORACLES)
