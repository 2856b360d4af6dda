"""Graph operators: fixed-point PageRank and triangle counting.

Hand-checkable tiny graphs; the sf-scale parity against the unrolled
DuckDB oracle is covered by tools/check_correctness.py (graph_pagerank,
graph_triangle_count, graph_degree_stats).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atac_data_products_spark.operators.graph import (
    RANK_SCALE,
    TELEPORT_NUM,
    pagerank_fixed,
)


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src bigint, dst bigint")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_star_center_dominates(spark):
    # star: 1 at the center of 2,3,4 — center rank must exceed each leaf,
    # and all leaves are symmetric so their ranks must be identical
    ranks = {
        r.node: r.rank
        for r in pagerank_fixed(
            _sym_edges(spark, [(1, 2), (1, 3), (1, 4)]), n_iterations=3
        ).collect()
    }
    assert set(ranks) == {1, 2, 3, 4}
    assert ranks[2] == ranks[3] == ranks[4]
    assert ranks[1] > ranks[2]


def test_pagerank_mass_conservation_and_determinism(spark):
    # integer truncation only ever LOSES mass: total is <= n * uniform
    # seed and within n_nodes * (iterations+1) ulps of RANK_SCALE
    edges = _sym_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)])
    a = pagerank_fixed(edges, n_iterations=3)
    total = a.agg(F.sum("rank")).collect()[0][0]
    assert total <= RANK_SCALE
    assert total >= RANK_SCALE - 4 * 8  # slack far above truncation loss
    b = pagerank_fixed(edges, n_iterations=3)
    assert sorted(a.collect()) == sorted(b.collect())


def test_pagerank_regular_graph_is_uniform_fixed_point(spark):
    # on a d-regular graph the uniform vector is the exact fixed point:
    # every node keeps rank ~ RANK_SCALE / n regardless of iterations
    ring = _sym_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ranks = [r.rank for r in pagerank_fixed(ring, n_iterations=4).collect()]
    expected = TELEPORT_NUM // 4 + (85 * (RANK_SCALE // 4)) // 100
    assert all(abs(r - expected) <= 4 for r in ranks)


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; the ordered-edge representation counts each once
    from atac_data_products_spark.registry_graph import graph_triangle_count  # noqa: F401

    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "p1 bigint, p2 bigint",
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.p2") == F.col("e2.p1"))
        .join(
            e3,
            (F.col("e1.p1") == F.col("e3.p1")) & (F.col("e2.p2") == F.col("e3.p2")),
        )
        .count()
    )
    assert tri == 4


@pytest.mark.parametrize("key", ["graph_pagerank", "graph_degree_stats"])
def test_graph_queries_registered(key):
    import __spark_entry__ as entry

    assert key in entry.queries()
    assert key in entry.oracle_sql()
