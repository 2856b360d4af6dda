"""Oracle-identity proof for the blocked cosine-truth rewrite (r10
verdict task 2 → round 11).

`dedup_embedding_cosine` is the deliberate exact all-pairs baseline;
its oracle originally embedded a pure inequality self-join, which
DuckDB executes as an IEJoin materializing the 64-double normalized
vectors for the FULL O(n²) pair stream (~73 GB temp at the 4× value
sweep — the last oracle blocking the full-registry 8× gate).  The
rewrite (`registry_ext.cosine_pair_truth_sql`) drives the same pairs
through equality hash joins on a vec_id block key: every unordered
pair is produced exactly once (blk is monotone in vec_id, the block-
pair table enumerates ba ≤ bb, the diagonal block keeps the
a.vec_id < b.vec_id guard), so the rewrite is LOSSLESS by construction
— no data assumptions, unlike an LSH bucketing.

These tests pin that equivalence row-for-row DuckDB-side, on the real
fixture and on hypothesis-shrunk random corpora.
"""

from __future__ import annotations


def _naive_sql(threshold: float) -> str:
    from atac_data_products_spark.registry_ext import _COSINE_NAIVE_SQL

    return (
        "WITH "
        + _COSINE_NAIVE_SQL
        + f" SELECT id_a, id_b, cosine FROM p WHERE cosine >= {threshold}"
    )


def test_blocked_truth_matches_naive_on_fixture(duck):
    from atac_data_products_spark.registry_ext import (
        COSINE_DEDUP_THRESHOLD,
        cosine_pair_truth_sql,
    )

    naive = duck.execute(
        f"SELECT * FROM ({_naive_sql(COSINE_DEDUP_THRESHOLD)}) ORDER BY id_a, id_b"
    ).df()
    blocked = duck.execute(
        f"SELECT * FROM ({cosine_pair_truth_sql(COSINE_DEDUP_THRESHOLD)}) "
        "ORDER BY id_a, id_b"
    ).df()
    assert len(naive) > 0, "fixture produced no qualifying pairs — vacuous test"
    assert naive.equals(blocked), (
        "blocked cosine truth diverged from the naive all-pairs join — "
        "the lossless block decomposition is broken"
    )


def test_live_oracle_is_the_blocked_form():
    """The registry key must actually USE the blocked truth (a revert
    to the inequality join would silently reopen the 8×-oracle-spill
    gap)."""
    import __spark_entry__ as e

    sql = e.oracle_sql()["dedup_embedding_cosine"]
    assert "bp" in sql and "blk" in sql, "oracle lost the blocked truth"
    assert "ON a.vec_id < b.vec_id" not in sql


def test_blocked_truth_identity_property():
    """Property form: random small corpora — duplicated vectors
    (cosine exactly 1), zero vectors (dropped by the norm guard),
    negatives, sparse/dense mixes — across LOW and HIGH thresholds and
    tiny block sizes (so multi-block paths and the diagonal block are
    both exercised even on 12-vector corpora).  Hypothesis shrinks any
    counterexample."""
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from atac_data_products_spark.registry_ext import cosine_pair_truth_sql

    vec = st.lists(
        st.sampled_from([-1.0, 0.0, 0.5, 1.0, 2.0]), min_size=4, max_size=4
    )

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        vecs=st.lists(vec, min_size=2, max_size=12),
        threshold=st.sampled_from([0.2, 0.9]),
        block=st.sampled_from([1, 3, 1024]),
    )
    def check(vecs, threshold, block):
        con = duckdb.connect()
        emb = pd.DataFrame(
            {"vec_id": range(len(vecs)), "embedding": vecs}
        )
        con.register("embeddings", emb)
        naive = con.execute(
            f"SELECT * FROM ({_naive_sql(threshold)}) ORDER BY id_a, id_b"
        ).df()
        blocked = con.execute(
            "SELECT * FROM "
            f"({cosine_pair_truth_sql(threshold, block=block)}) "
            "ORDER BY id_a, id_b"
        ).df()
        assert naive.reset_index(drop=True).equals(
            blocked.reset_index(drop=True)
        ), f"divergence at t={threshold} block={block} on {vecs!r}"

    check()
