"""Oracle-identity proof for the prefix-filtered truth rewrite (r09
verdict task 2 → round 10).

`dedup_lsh_band_sweep` and `dedup_simhash_eval` grade their candidate
stages against exact-Jaccard ground truth.  Their oracles originally
embedded the NAIVE all-pairs inverted-index join — quadratic in
shingle document frequency, spilling >80 GB at the 8x value sweep —
so both were value-verified only at 4x (docs/SCALE_SWEEP.md, the one
asymmetry in the r09 value gate).  The rewrite switches the truth CTE
to `registry_ext.prefix_pair_sql`: prefix-filtered candidate
generation + exact verify, recall-LOSSLESS by the public prefix-
filtering theorem (Chaudhuri 2006 / Xiao 2008 — the same result
dedup_prefix_filter_join's ENGINE side relies on).

This test pins the equivalence DuckDB-side: the prefix-filtered query
must return the exact same (doc_a, doc_b, jaccard) rows as the naive
inverted-index oracle of dedup_ngram_jaccard — which itself remains
the live oracle for dedup_ngram_jaccard / dedup_prefix_filter_join
and is therefore independently driver-checked every round.
"""

from __future__ import annotations


def test_prefix_truth_matches_naive_inverted_index(duck):
    from atac_data_products_spark.registry_ext import ORACLES, prefix_pair_sql

    naive = duck.execute(
        f"SELECT * FROM ({ORACLES['dedup_ngram_jaccard']}) ORDER BY doc_a, doc_b"
    ).df()
    prefix = duck.execute(
        f"SELECT * FROM ({prefix_pair_sql(1, 5)}) ORDER BY doc_a, doc_b"
    ).df()
    assert len(naive) > 0, "fixture produced no near-dup pairs — vacuous test"
    assert naive.equals(prefix), (
        "prefix-filtered truth diverged from the naive inverted-index "
        "oracle — the lossless-prefix rewrite is broken"
    )


def test_eval_oracles_embed_the_prefix_form(duck):
    """Both eval keys must actually USE the bucketed truth (a revert to
    the naive CTE would silently reopen the 8x-oracle-spill gap)."""
    import __spark_entry__ as e

    os_ = e.oracle_sql()
    for key in ("dedup_lsh_band_sweep", "dedup_simhash_eval"):
        assert "pf_prefix" in os_[key], f"{key} oracle lost the prefix truth"
        assert "s1 JOIN shingles s2" not in os_[key]
