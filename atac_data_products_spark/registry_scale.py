"""Scale-operations batch: reconciliation checksums, join-key skew
diagnostics, weighted sampling, and an exact set-similarity join with
prefix filtering.

These are the operators a platform team runs *around* a 100 TB engine:
verifying two clusters hold the same table without moving it
(table_checksum), measuring whether a join key will melt a shuffle
(dq_skew_profile), drawing weighted eval subsets whose membership is
stable under reruns (sample_weighted_reservoir), and an exact —
recall-lossless — alternative to MinHash-LSH for near-dup joins
(dedup_prefix_filter_join, the AllPairs/PPJoin prefix-filter family).

The reference (an eager single-node pandas ETL, bin/concatenate.py:119-152)
has no notion of any of this; every operator here is an engine extension
per SURVEY.md §7 Phase E, expressed as declarative DataFrame plans with
DuckDB oracle twins following the repo's parity conventions
(fixed-point integers for anything summed distributively; floats rounded
before any threshold or sort; identical aliases on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.hashes import hash59, hash59_sql
from .registry import _t, query

# ---------------------------------------------------------------------------
# table_checksum — order-insensitive table fingerprint (reconciliation)
# ---------------------------------------------------------------------------

# Canonical per-row string per audited table: every column reduced to an
# exact integer or a raw string, so both engines concatenate identical
# bytes.  Doubles go through the repo's fixed-point ladder (cents /
# basis points), timestamps through epoch-µs — never through
# engine-specific float/timestamp formatting.
_CHECKSUM_TABLES: dict[str, tuple[str, ...]] = {
    "lineitem": (
        "CAST(l_orderkey AS {s})",
        "CAST(l_partkey AS {s})",
        "CAST(l_suppkey AS {s})",
        "CAST(l_linenumber AS {s})",
        "CAST(CAST(round(l_quantity * 100) AS BIGINT) AS {s})",
        "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS {s})",
        "CAST(CAST(round(l_discount * 10000) AS BIGINT) AS {s})",
        "CAST(CAST(round(l_tax * 10000) AS BIGINT) AS {s})",
        "l_returnflag",
        "l_linestatus",
        "CAST({us_ship} AS {s})",
    ),
    "orders": (
        "CAST(o_orderkey AS {s})",
        "CAST(o_custkey AS {s})",
        "o_orderstatus",
        "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS {s})",
        "CAST({us_order} AS {s})",
        "o_orderpriority",
    ),
    "customer": (
        "CAST(c_custkey AS {s})",
        "c_name",
        "CAST(c_nationkey AS {s})",
        "CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS {s})",
        "c_mktsegment",
    ),
}


def _checksum_exprs(dialect: str) -> dict[str, list[str]]:
    """Render the canonical column expressions for one engine."""
    if dialect == "spark":
        fmt = {
            "s": "STRING",
            # TIMESTAMP_NTZ → TIMESTAMP under pinned UTC session tz is the
            # identity on wall-clock, so this equals DuckDB's epoch_us
            "us_ship": "unix_micros(CAST(l_shipdate AS TIMESTAMP))",
            "us_order": "unix_micros(CAST(o_orderdate AS TIMESTAMP))",
        }
    else:
        fmt = {
            "s": "VARCHAR",
            "us_ship": "epoch_us(l_shipdate)",
            "us_order": "epoch_us(o_orderdate)",
        }
    return {
        t: [c.format(**fmt) for c in cols] for t, cols in _CHECKSUM_TABLES.items()
    }


def _checksum_oracle() -> str:
    exprs = _checksum_exprs("duck")
    parts = []
    for t, cols in exprs.items():
        row = "concat_ws('|', " + ", ".join(cols) + ")"
        digest = hash59_sql(row)
        parts.append(
            f"SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(CAST(sum({digest}) AS DECIMAL(38,0)) AS VARCHAR) AS checksum FROM {t}"
        )
    return " UNION ALL ".join(parts)


@query("table_checksum", oracle=_checksum_oracle())
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: per table, the DECIMAL(38,0)
    sum of a portable 59-bit digest of each row's canonical string form.

    This is the cross-cluster reconciliation primitive — compare two
    copies of a 100 TB table without moving either: each side computes
    one combinable aggregate (map-side partial sums, one tiny shuffle),
    and equal (n_rows, checksum) pairs mean equal content to 2^-59
    collision odds per differing row.  Sum (not XOR) so duplicate-row
    pairs cannot cancel; DECIMAL(38,0) so the sum never overflows
    (2^59 · 10^12 rows < 10^38) and is fold-order-independent (exact
    integer addition).  The same digest column doubles as the driver's
    own value-hash idiom (tools/check_correctness.py).

    The reference has no integrity checking at all — its de-facto gate
    is "the output file exists" (steps/concatenate.cwl:29-40).
    """
    exprs = _checksum_exprs("spark")
    outs = []
    for t, cols in exprs.items():
        df = _t(spark, sf_dir, t)
        row = F.expr("concat_ws('|', " + ", ".join(cols) + ")")
        outs.append(
            df.select(hash59(row).cast("decimal(38,0)").alias("digest")).agg(
                F.lit(t).alias("table_name"),
                F.count("*").alias("n_rows"),
                # surfaced as STRING: a 23-digit decimal silently loses
                # precision through any float hop, and a checksum that can
                # drift in transport is no checksum
                F.sum("digest").cast("string").alias("checksum"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# dq_skew_profile — join-key skew diagnostics
# ---------------------------------------------------------------------------


@query(
    "dq_skew_profile",
    oracle="""
    WITH c AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey),
    stats AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS top_cnt,
             round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
             round(quantile_cont(cnt, 0.99), 6) AS p99_cnt
      FROM c),
    top AS (SELECT CAST(min(o_custkey) AS BIGINT) AS top_key
            FROM c WHERE cnt = (SELECT top_cnt FROM stats))
    SELECT n_rows, n_keys, top_key, top_cnt,
           round(CAST(top_cnt AS DOUBLE) / n_rows, 6) AS top_share,
           p50_cnt, p99_cnt,
           round(p99_cnt / p50_cnt, 6) AS skew_ratio
    FROM stats, top
    """,
)
def dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for ``orders.o_custkey`` — the
    pre-flight check a platform runs BEFORE shuffling 100 TB on a key:
    per-key counts (one combinable shuffle), then a one-row profile of
    the count distribution — hottest key, its share of all rows, and the
    p99/median ratio that predicts whether AQE skew-split or salting
    (agg_salted_skew is this repo's mitigation twin) will be needed.

    Plan shape: groupBy(key) → single-row re-aggregation; the per-key
    count table is the ONLY shuffled data (|keys| rows, not |rows|), and
    the hottest-key lookup broadcasts the one-row stats back instead of
    sorting anything globally.  Exact interpolated percentiles share the
    same definition in both engines (see agg_percentiles).
    """
    c = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    stats = c.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("top_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_cnt"),
    )
    top = (
        c.join(
            F.broadcast(stats.select(F.col("top_cnt").alias("__top"))),
            F.col("cnt") == F.col("__top"),
        )
        .agg(F.min("o_custkey").alias("top_key"))
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        "top_key",
        "top_cnt",
        F.round(F.col("top_cnt").cast("double") / F.col("n_rows"), 6).alias(
            "top_share"
        ),
        "p50_cnt",
        "p99_cnt",
        F.round(F.col("p99_cnt") / F.col("p50_cnt"), 6).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# sample_weighted_reservoir — A-ES weighted reservoir per group
# ---------------------------------------------------------------------------

_WRS_K = 5
# exponential race keys quantized to integer MICRO-units: coarse enough
# that a last-ulp ln() difference between JVM and libm can essentially
# never move the rounded value, fine enough that distinct docs almost
# never tie (and ties break on doc_id either way)
_WRS_SCALE = 1_000_000


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH h AS (
      SELECT source, doc_id, n_chars,
             CAST(round(
               -ln((({hash59_sql("'wrs' || CAST(doc_id AS VARCHAR)")}) + 1)
                   / 576460752303423488.0)
               / n_chars * {_WRS_SCALE}) AS BIGINT) AS race_us
      FROM documents WHERE n_chars > 0),
    r AS (SELECT source, doc_id, race_us,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY race_us, doc_id) AS rk
          FROM h)
    SELECT source, doc_id, race_us, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_WRS_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample (A-ES / exponential-race) per source:
    each doc draws a key-stable uniform u from its own id, races with an
    Exponential(rate = weight) arrival time ``-ln(u)/w``, and the k
    earliest arrivals per group win — P(selected) ∝ n_chars, exactly the
    A-ES weighted-reservoir semantics (Efraimidis-Spirakis via the
    exponential-clock equivalence).

    Key-stable = rerun-stable: a doc's race time never changes, so the
    sample only changes when a faster doc ARRIVES — true reservoir
    behavior with no sequential state, which is what makes it
    distributed-safe at 100 TB (corpus_reservoir_per_source is the
    unweighted twin).  One shuffle on source; per-group top-k degrades
    to two-phase k-smallest at scale exactly as documented there.
    Race keys are quantized to integer micro-units BEFORE ranking (the
    rounding ladder: a last-ulp ln() divergence between engines cannot
    reorder quantized keys, and residual ties break on doc_id).
    """
    d = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (hash59(F.concat(F.lit("wrs"), F.col("doc_id").cast("string"))) + 1) / F.lit(
        float(1 << 59)
    )
    race = F.round(-F.log(u) / F.col("n_chars") * _WRS_SCALE).cast("bigint")
    w = Window.partitionBy("source").orderBy("race_us", "doc_id")
    return (
        d.select("source", "doc_id", race.alias("race_us"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= _WRS_K)
        .select("source", "doc_id", "race_us", "rk")
    )


# ---------------------------------------------------------------------------
# dedup_prefix_filter_join — exact set-similarity join via prefix filtering
# ---------------------------------------------------------------------------

# Jaccard threshold as an exact rational so prefix lengths use pure
# integer arithmetic on both engines: t = 1/2 → ceil(t·n) = (n+1)//2.
PREFIX_JACCARD_NUM = 1
PREFIX_JACCARD_DEN = 2
PREFIX_JACCARD = PREFIX_JACCARD_NUM / PREFIX_JACCARD_DEN


@query(
    "dedup_prefix_filter_join",
    oracle=f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                  FROM documents),
    shingles AS (SELECT DISTINCT doc_id,
                 unnest([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]) AS shingle
                 FROM toks WHERE len(t) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM shingles a JOIN shingles b USING (shingle)
              WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(CAST(n_inter AS DOUBLE)
                / (sa.n_sh + sb.n_sh - n_inter), 6)
          >= {PREFIX_JACCARD}
    """,
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join at threshold J ≥ {t} via PREFIX
    FILTERING (the AllPairs / PPJoin family) — the recall-LOSSLESS
    alternative to MinHash-LSH for near-dup detection.

    Order all shingles by ascending document frequency (rarest first,
    ties on the shingle string); each doc keeps only its first
    ``p = n - ceil(t·n) + 1`` shingles under that order as its PREFIX.
    Theorem (Chaudhuri et al. 2006 / Xiao et al. 2008, public result):
    two sets with Jaccard ≥ t must share at least one prefix element —
    so joining on prefix shingles alone generates a candidate superset,
    and the exact-Jaccard verify (the same pair-driven counting the LSH
    path uses, extensions/dedup.py) restores exactness.  The ORACLE is
    the naive all-pairs inverted-index join: prefix filtering being
    lossless means the optimized plan must match it bit-for-bit.

    Scale: the join fans out only on RARE shingles (a shingle shared by
    d docs in prefixes contributes d² candidate rows, but high-df
    shingles are exactly the ones prefixes exclude) — this is what kills
    the boilerplate-bucket quadratic blowup that forces the LSH path to
    cap buckets (LSH_MAX_BUCKET).  Cost: one extra combinable shuffle
    for the df table vs LSH's signature aggregation; no recall loss, no
    tuning knob.  Prefix length uses integer math (t = {num}/{den} →
    ceil(t·n) = (n·{num} + {den} - 1) DIV {den}) so both engines cut
    identical prefixes.
    """
    from .extensions.dedup import jaccard_pairs
    from .extensions.text import shingle_table

    sh = shingle_table(_t(spark, sf_dir, "documents"))  # distinct (doc, shingle)
    df_tab = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("__n"))
    num, den = PREFIX_JACCARD_NUM, PREFIX_JACCARD_DEN
    prefix_len = F.col("__n") - F.expr(
        f"CAST((__n * {num} + {den} - 1) DIV {den} AS BIGINT)"
    ) + 1
    ranked = (
        sh.join(df_tab, "shingle")
        .join(sizes, "doc_id")
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("__df", "shingle")
            ),
        )
        .where(F.col("__rk") <= prefix_len)
        .select("doc_id", "shingle")
    )
    a = ranked.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = ranked.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return jaccard_pairs(sh, threshold=PREFIX_JACCARD, candidates=cand)


dedup_prefix_filter_join.__doc__ = dedup_prefix_filter_join.__doc__.format(
    t=PREFIX_JACCARD, num=PREFIX_JACCARD_NUM, den=PREFIX_JACCARD_DEN
)
