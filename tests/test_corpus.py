"""Property tests for the LLM-corpus pipeline operators — the semantic
guarantees the value-hash oracle can't express (fraction targets, bin
bounds, key stability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from atac_data_products_spark.registry_corpus import (
    _PACK_CAP,
    corpus_seq_packing,
    corpus_split_assign,
    corpus_mixture_sample,
)
from tests.conftest import SF_MED


def test_split_fractions_near_target(spark):
    got = (
        corpus_split_assign(spark, SF_MED)
        .groupBy("split")
        .agg(F.sum("n_docs").alias("n"))
        .toPandas()
        .set_index("split")["n"]
    )
    total = got.sum()
    assert abs(got["train"] / total - 0.80) < 0.03
    assert abs(got["val"] / total - 0.10) < 0.03
    assert abs(got["test"] / total - 0.10) < 0.03


def test_split_is_key_stable_under_corpus_growth(spark):
    """A doc's split must not change when the corpus grows — the whole
    point of hashing the KEY instead of a rand() or a row position.
    Compare the per-doc assignment at sf0.001 vs sf0.01 (the small
    corpus's doc_ids are a prefix of the larger one)."""
    from atac_data_products_spark.sources.tables import load_table

    def assign(sf):
        d = load_table(spark, sf, "documents")
        slot = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint") % 100
        )
        return d.select(
            "doc_id",
            F.when(slot < 80, "train").when(slot < 90, "val").otherwise("test").alias("split"),
        )

    small = assign("/root/testdata/sf0.001").toPandas().set_index("doc_id")["split"]
    big = assign(SF_MED).toPandas().set_index("doc_id")["split"]
    common = small.index.intersection(big.index)
    assert len(common) == len(small)
    assert small[common].equals(big[common])


def test_packing_bins_are_dense_and_conserve_docs(spark):
    from atac_data_products_spark.extensions.text import token_count
    from atac_data_products_spark.sources.tables import load_table

    pdf = corpus_seq_packing(spark, SF_MED).toPandas()
    docs = load_table(spark, SF_MED, "documents")
    max_doc_tokens = docs.select(F.max(token_count("text")).alias("m")).first().m
    for src, grp in pdf.groupby("source"):
        bins = sorted(grp["bin_id"])
        # dense 0..k: packing in order leaves no empty bins
        assert bins == list(range(len(bins)))
        # a bin's offset span is < cap, so its tokens < cap + one
        # straddling doc
        assert (grp["total_tokens"] < _PACK_CAP + max_doc_tokens).all()
    # every doc lands in exactly one bin
    assert int(pdf["n_docs"].sum()) == docs.count()


def test_mixture_sample_tracks_weights(spark):
    """Per-source counts are tiny at sf0.01 (25 docs), so assert the
    statistically meaningful properties: determinism, kept<=total, and
    the CORPUS-level kept fraction near the weighted mean (n=500,
    sigma ~2.2 pts -> 8 pts is >3 sigma)."""
    from atac_data_products_spark.registry_corpus import _MIX_WEIGHTS

    pdf = corpus_mixture_sample(spark, SF_MED).toPandas().set_index("source")
    again = corpus_mixture_sample(spark, SF_MED).toPandas().set_index("source")
    assert pdf.sort_index().equals(again.sort_index())  # key-stable, no rand()

    assert (pdf["n_kept"] <= pdf["n_docs"]).all()
    weights = dict(_MIX_WEIGHTS)
    expected = sum(weights.values()) / len(weights) / 100
    got = pdf["n_kept"].sum() / pdf["n_docs"].sum()
    assert abs(got - expected) < 0.08, (got, expected)
