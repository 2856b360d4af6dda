"""Empty/degenerate-input robustness: every extension operator must
return an empty (or well-defined) result, not crash, on empty frames —
the normal state of a fresh partition at scale."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_dedup_ops_on_empty(spark, empty_docs):
    from atac_data_products_spark.extensions.dedup import (
        exact_dedup,
        jaccard_pairs,
        minhash_lsh_dedup_pairs,
        simhash,
    )
    from atac_data_products_spark.extensions.text import shingle_table

    assert exact_dedup(empty_docs).count() == 0
    assert simhash(empty_docs).count() == 0
    assert jaccard_pairs(shingle_table(empty_docs)).count() == 0
    assert minhash_lsh_dedup_pairs(empty_docs).count() == 0


def test_text_ops_on_empty_and_whitespace(spark):
    from atac_data_products_spark.extensions.text import (
        lang_id,
        quality_features,
        shingle_table,
    )

    docs = spark.createDataFrame([(1, ""), (2, "   "), (3, "one")], "doc_id bigint, text string")
    qf = {r.doc_id: r for r in quality_features(docs).collect()}
    assert qf[3].n_tokens == 1
    assert lang_id(docs).count() == 3
    # no 3-gram shingles from any of these
    assert shingle_table(docs).count() == 0


def test_similarity_on_empty(spark):
    from atac_data_products_spark.extensions.similarity import cosine_pairs, cosine_topk

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert cosine_topk(emb, [1.0, 0.0], k=5).count() == 0
    assert cosine_pairs(emb, 0.5).count() == 0


def test_product_build_with_empty_modality(spark):
    from atac_data_products_spark.plans.product import build_product

    manifest = spark.createDataFrame(
        [("ds1", "HBM1", "40", "F", "1", "1", "1", None, "x")],
        "uuid string, hubmap_id string, age string, sex string, height string, "
        "weight string, bmi string, cause_of_death string, race string",
    )
    coo = "dataset string, barcode string, feature_id string, value double"
    cbb = spark.createDataFrame([("ds1", "A", "f1", 1.0)], coo)
    cbg = spark.createDataFrame([], coo)
    result = build_product(manifest, {"cbb": [cbb], "cbg": [cbg]})
    # empty modality ⇒ empty intersection ⇒ empty product, no crash
    assert result.obs.count() == 0


def test_frame_sample_empty_payload(spark):
    from atac_data_products_spark.extensions.multimodal import frame_sample

    media = spark.createDataFrame(
        [(1, bytearray(b""), "text/plain", 0)],
        "media_id bigint, payload binary, media_type string, declared_bytes bigint",
    )
    assert frame_sample(media).count() == 0


def test_cosine_pairs_brute_force_guard_trips(spark):
    """The O(n^2) baseline refuses inputs above its row cap — it must not
    silently become a production path on a large corpus."""
    from atac_data_products_spark.extensions.similarity import cosine_pairs

    emb = spark.range(1, 12).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="brute-force"):
        cosine_pairs(emb, 0.5, max_rows=10)
    # explicit raise of the cap unblocks the same input
    assert cosine_pairs(emb, 0.5, max_rows=11).count() > 0


def test_cosine_pairs_bucketed_builds_without_spark_action(spark):
    """bucketed=True plan construction must not run a job (n_dims is a
    required parameter, not discovered via .first())."""
    from atac_data_products_spark.extensions.similarity import cosine_pairs

    emb = spark.range(1, 4).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="n_dims"):
        cosine_pairs(emb, 0.5, bucketed=True)

    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId()
    df = cosine_pairs(emb, 0.5, bucketed=True, n_dims=2)
    after = sc._jsc.sc().dagScheduler().nextJobId()
    assert after == before, "plan construction launched a Spark job"
    assert df.count() >= 0  # the plan itself still executes


def test_pagerank_on_empty_edges(spark):
    from atac_data_products_spark.operators.graph import pagerank_fixed

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    out = pagerank_fixed(empty, n_iterations=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_connected_components_on_empty_edges(spark):
    from atac_data_products_spark.extensions.dedup import connected_components

    nodes = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    edges = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    out = {r.doc_id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert out == {1: 1, 2: 2}


def test_ml_score_bounds_and_prediction_consistency(spark):
    """|score| <= 127 * max|w| * dims, and predicted == (score > 0) —
    on adversarial vectors including all-zero (amax guard) and
    exact-half quantization boundaries."""
    from atac_data_products_spark.registry_ext import ML_WEIGHTS, ml_score_batch
    import __spark_entry__ as e

    rows = ml_score_batch(spark, "/root/testdata/sf0.001").collect()
    bound = 127 * max(abs(w) for w in ML_WEIGHTS) * 64
    assert rows
    for r in rows:
        assert abs(r.score) <= bound
        assert r.predicted == (r.score > 0)
