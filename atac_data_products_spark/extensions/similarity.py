"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k**: the correctness baseline.  Query vector
  is broadcast as literals; per-row dot product via a sequential
  zip_with/aggregate fold in DOUBLE (deterministic IEEE order → the
  DuckDB oracle reproduces it bit-for-bit).  One scan, no shuffle, a
  single top-k sort of scalars.
- **Hyperplane-LSH buckets**: the scale path.  b deterministic ±1
  hyperplanes (seeded from the portable 59-bit hash) → b-bit bucket id;
  ANN search probes only the query's bucket.  Recall < 1 by design, so
  it carries a rows-only check, with the brute-force op as the graded
  baseline.

At 100 TB the brute-force plan is still a single pass (no pairwise
blowup — k smallest of a streamed scalar), and the LSH plan turns top-k
into a bucket-pruned scan: bucket id is a partition-prunable column when
the corpus is written partitioned by it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def query_vector(
    df: DataFrame,
    qid: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[float] | None:
    """Collect the designated query embedding as Python floats, or None
    when it doesn't exist (empty corpus, or the id filtered away) — the
    single bounded collect every query-vector operator shares.  Callers
    must handle None by returning their empty result, not crash: a
    0-row input is a legitimate state at scale (an upstream filter can
    drain any partition), so `.first().embedding` on a maybe-empty
    DataFrame is a latent AttributeError."""
    row = df.filter(F.col(id_col) == qid).select(vec_col).first()
    return None if row is None else [float(x) for x in row[0]]


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    e = _as_double(F.col(vec_col))
    # try_divide: a zero-norm vector has UNDEFINED similarity — NULL,
    # which both engines order last under DESC.  A bare `/` gives
    # Spark IEEE NaN, which sorts FIRST under DESC and pollutes the
    # top-k, while DuckDB's /0 gives NULL (hostile-embeddings find).
    cos = F.try_divide(dot(e, q), l2_norm(e) * F.lit(qn)).alias("cos")
    return (
        embeddings.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# Bucket count should track corpus size (2^planes buckets; aim for
# 10-100× more vectors than buckets so probes stay non-trivial).  4 is
# right for the ~500-vector test corpus; a billion-vector corpus wants
# 16-20 planes plus multi-probe.
NUM_PLANES = 4


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane weights from MD5 (portable, seedless)."""
    import hashlib

    digest = hashlib.md5(f"plane:{plane}:dim:{dim}".encode()).hexdigest()
    return 1 if int(digest[:2], 16) % 2 == 0 else -1


def hyperplane_bucket(vec_col: Column, n_dims: int, n_planes: int = NUM_PLANES) -> Column:
    """b-bit random-hyperplane LSH bucket id as a bigint expression.

    Weights are compile-time constants, so the whole bucket id is one
    codegen'd expression — no UDF, no shuffle.
    """
    e = _as_double(vec_col)
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        # weights as ONE array literal + zip_with/aggregate fold: ~4x
        # fewer expression nodes than a chained element_at sum, which
        # cuts first-run analysis/codegen by ~3 s at 4x64 dims while
        # keeping the identical left-to-right float fold order the
        # DuckDB list_dot_product oracle replays
        w = F.array(*[F.lit(float(_plane_sign(p, d))) for d in range(n_dims)])
        proj = F.aggregate(
            F.zip_with(e, w, lambda x, wt: x * wt),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


BRUTE_FORCE_MAX_ROWS = 10_000


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: bool = False,
    n_planes: int = NUM_PLANES,
    n_dims: int | None = None,
    max_rows: int = BRUTE_FORCE_MAX_ROWS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    ``bucketed=False``: exact brute-force — an O(n²) nested-loop join,
    the correctness baseline, **guarded**: the input may not exceed
    ``max_rows`` rows (checked with a bounded ``limit(max_rows+1)``
    count, so the guard never scans more than the cap itself).  The
    baseline twin cannot silently become a production path on a large
    corpus — the LSH path is the only scale entry point.
    ``bucketed=True``: hyperplane-LSH equality join — pair generation
    only within a bucket, turning the nested loop into a hash join on
    the bucket id (the scale path; deterministic, so still
    oracle-checkable, but recall < 1 across bucket boundaries).
    ``n_dims`` (vector dimensionality) is required when ``bucketed`` —
    plan construction stays action-free on the scale path.
    """
    if bucketed and n_dims is None:
        raise ValueError(
            "cosine_pairs(bucketed=True) requires n_dims: plan construction "
            "must not run a Spark action to discover vector dimensionality"
        )
    if not bucketed:
        # adp.allpairs.max_rows: explicit session-level opt-in to a
        # larger exact baseline (the scale value sweeps verify the
        # brute-force key above the default cap with it — round 11).
        # Same philosophy as adp.checkpoint.root/adp.spill.root: the
        # quadratic path never silently widens, an operator RAISES the
        # cap on purpose, per session.
        try:
            conf_cap = embeddings.sparkSession.conf.get("adp.allpairs.max_rows")
        except Exception:
            conf_cap = None
        if conf_cap:
            try:
                conf_cap_int = int(conf_cap)
            except (TypeError, ValueError):
                raise ValueError(
                    f"adp.allpairs.max_rows must be an integer row cap, "
                    f"got {conf_cap!r}"
                ) from None
            max_rows = max(max_rows, conf_cap_int)
        probe = embeddings.limit(max_rows + 1).count()
        if probe > max_rows:
            raise ValueError(
                f"cosine_pairs(bucketed=False) is the O(n^2) brute-force "
                f"baseline and is capped at max_rows={max_rows} input rows "
                f"(got >{max_rows}); use bucketed=True (hyperplane LSH) for "
                "large corpora, or raise max_rows explicitly (the "
                "adp.allpairs.max_rows session conf raises it for sweeps)"
            )
    # Pre-normalize per vector (cost n, not n²): the pair computation is
    # then a single fold — dot(vn_a, vn_b) — instead of three.  The
    # oracle replicates the same normalize-then-dot float sequence.
    e = embeddings.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
    )
    norm = l2_norm(F.col("v"))
    # try_divide: a zero-norm vector normalizes to NULL elements, so its
    # pair cosines are NULL and fail every threshold — matching DuckDB,
    # where /0 is NULL.  A bare `/` gives NaN elements, and NaN >= t is
    # TRUE in Spark's ordering semantics, so zero vectors would pair
    # with everything (hostile-embeddings find).
    e = e.select(
        F.col(id_col),
        F.col("v"),
        F.transform(F.col("v"), lambda x: F.try_divide(x, norm)).alias("vn"),
    )
    if bucketed:
        e = e.withColumn("bucket", hyperplane_bucket(F.col("v"), n_dims, n_planes))
    e = e.drop("v")
    # the embeddings table often arrives as one file → one partition,
    # which serializes the per-pair interpreted dot-product folds of the
    # join output on a single core (round-12 stage attribution: the
    # whole LSH key ran as ONE task, 2.5 exec-s).  Spread by the unique
    # id before pairing — wide inputs pass through untouched, so this is
    # a no-op at scale (see ensure_min_partitions)
    from .text import ensure_min_partitions

    e = ensure_min_partitions(e, by=id_col)
    a = e.select(*[F.col(c).alias(f"{c}_a") for c in e.columns])
    b = e.select(*[F.col(c).alias(f"{c}_b") for c in e.columns])
    if bucketed:
        joined = a.join(b, F.col("bucket_a") == F.col("bucket_b")).where(
            F.col(f"{id_col}_a") < F.col(f"{id_col}_b")
        )
    else:
        joined = a.join(b, F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
    cos = dot(F.col("vn_a"), F.col("vn_b"))
    return (
        joined.select(
            F.col(f"{id_col}_a").alias("id_a"),
            F.col(f"{id_col}_b").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_lo: int = 1,
    centroid_hi: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid, search
    only the query's ``nprobe`` closest centroid cells.

    Centroids here are a deterministic vector subset (ids in
    [centroid_lo, centroid_hi]) standing in for trained k-means centers —
    the *plan shape* is the real thing: centroid assignment is a
    broadcast nested-loop over k centroids (cost k·n, one pass), cell
    membership is a partition-prunable column at rest, and probing reads
    only nprobe cells.  Deterministic, so fully oracle-checkable.
    """
    e = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    cents = e.filter(
        (F.col(id_col) >= centroid_lo) & (F.col(id_col) <= centroid_hi)
    ).select(F.col(id_col).alias("cid"), F.col("v").alias("cv"))

    # Map-side argmax (round-12, the k-means assign pattern): the k
    # centroids collapse into ONE row holding a cid-sorted struct array
    # (centroid norms precomputed once per centroid), broadcast-cross-
    # joined into the point stream; the best cell is array_max over
    # (c_cos, cid) structs — the struct comparator IS the previous
    # row_number window's (c_cos DESC NULLS LAST, cid DESC) order (a
    # NULL field sorts smallest, NaN largest, exactly as the window
    # did), with the identical dot/norm folds producing bit-identical
    # doubles.  Removes the n×k-row shuffle + sort + window entirely —
    # assignment is now one pass over the points.
    carr = cents.select("cid", "cv", l2_norm(F.col("cv")).alias("cn")).agg(
        F.array_sort(F.collect_list(F.struct("cid", "cv", "cn"))).alias("__cents")
    )
    best = F.array_max(
        F.transform(
            "__cents",
            lambda s: F.struct(
                F.try_divide(
                    dot(F.col("v"), s["cv"]), F.col("__vn") * s["cn"]
                ).alias("c_cos"),
                s["cid"].alias("cid"),
            ),
        )
    )
    assigned = (
        e.withColumn("__vn", l2_norm(F.col("v")))
        .crossJoin(F.broadcast(carr))
        .select(id_col, best["cid"].alias("cid"))
    )

    # driver-side probe selection over k centroid vectors (same sequential
    # fold order as the SQL oracle)
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cent_rows = cents.collect()
    scored = []
    for r in cent_rows:
        dp = sum(float(a) * float(b) for a, b in zip(r.cv, query_vec))
        nc = math.sqrt(sum(float(a) * float(a) for a in r.cv))
        # zero-norm centroid: undefined similarity ranks LAST (the
        # python mirror of try_divide-NULL + DESC NULLS LAST)
        c_cos = (dp / (nc * qn)) if nc * qn > 0 else None
        scored.append((c_cos, r.cid))
    scored.sort(key=lambda t: (t[0] is None, -(t[0] or 0.0), -t[1]))
    probe_ids = [cid for _, cid in scored[:nprobe]]

    cell = assigned.filter(F.col("cid").isin(probe_ids)).select(id_col)
    candidates = embeddings.join(cell, id_col, "left_semi").filter(F.col(id_col) != 0)
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = NUM_PLANES,
) -> DataFrame:
    """ANN top-k probing only the query's hyperplane bucket."""
    n_dims = len(query_vec)
    q_bucket = 0
    for p in range(n_planes):
        proj = sum(float(query_vec[d]) * _plane_sign(p, d) for d in range(n_dims))
        if proj > 0:
            q_bucket |= 1 << p
    bucketed = embeddings.withColumn(
        "bucket", hyperplane_bucket(F.col(vec_col), n_dims, n_planes)
    )
    return cosine_topk(
        bucketed.where(F.col("bucket") == q_bucket), query_vec, k, id_col, vec_col
    )
