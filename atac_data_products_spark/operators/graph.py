"""Distributed graph analytics: fixed-iteration PageRank.

The reference has no graph surface; this is the iterative-algorithm
category of the engine's extension charter (connected components in
extensions/dedup.py is the other member).  PageRank here is the random-
walk form over an undirected (symmetrized) edge set, run for a FIXED
number of rounds so the result is a deterministic function of the graph
— which makes it oracle-checkable with a recursive CTE.

Cross-engine determinism is the design constraint: float summation is
fold-order-dependent, and a distributed sum's fold order is not
reproducible.  So ranks are kept in **fixed-point integer units**
(1e12 = rank 1.0): contributions are integer divisions, sums are exact
BIGINT adds (associative and commutative, any fold order), and the
damping step is integer multiply-then-divide.  The truncation error per
step is < out_degree ulps of 1e-12 — irrelevant to ranking, decisive
for bit-identical cross-engine results.

Scale shape per iteration: one join of the rank vector against the edge
list on the source key (co-partitionable — both sides hash on node id),
one map-side-combinable sum on the destination key.  That is the
canonical distributed PageRank step; 100 TB of edges changes the
partition count, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..spill import ckpt_eager as _ckpt_eager
from ..spill import release_checkpoint as _release_ckpt

RANK_SCALE = 1_000_000_000_000  # fixed-point 1.0
DAMP_NUM = 85  # damping 0.85 as an integer ratio
DAMP_DEN = 100
TELEPORT_NUM = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # 0.15 * scale


# Above this depth the unrolled lazy plan is abandoned for the eager
# Pregel loop: plan size grows linearly with iterations and analysis
# time super-linearly, while the loop's per-round checkpoint cost is
# flat.  Fixed-rank analytics (3-8 rounds) stay on the one-job path.
LAZY_UNROLL_MAX = 8


def pagerank_fixed(
    edges: DataFrame,
    n_iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank for ``n_iterations`` rounds over a directed
    edge list (symmetrize before calling for the undirected walk).
    Returns (node, rank) with rank in RANK_SCALE units.

    For small fixed iteration counts (≤ LAZY_UNROLL_MAX) the rounds are
    unrolled into ONE lazy plan over an EAGERLY CHECKPOINTED edge list:
    the edge derivation (often a join+distinct over fact tables) is
    referenced by every generation's join plus the degree/node/seed
    subtrees — as a lazy subtree it is re-analyzed per occurrence and
    its exchanges re-fetched per consumer, and the unrolled plan's
    analysis cost grows with iterations (the sf0.1 trade graph measured
    3.32 s lazy vs 2.72 s checkpointed interleaved min-of-4; cold-run
    gap larger — 44-scan plan vs 1).  Same reasoning as the PCA gram
    checkpoint: materialize ONCE before anything broadcasts or
    iterates.  Deeper runs fall back to the eager Pregel loop
    (persist + localCheckpoint per generation — the pattern in
    extensions/dedup.py::connected_components) where an unrolled plan
    would grow without bound.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if n_iterations <= LAZY_UNROLL_MAX:
        if n_iterations > 0:
            # 0-iteration runs never re-reference the edges: keep those
            # action-free (the checkpoint would be pure cost)
            e = _ckpt_eager(e)
        return _pagerank_unrolled(e, n_iterations)
    return _pagerank_loop(e, n_iterations)


def _pagerank_unrolled(e: DataFrame, n_iterations: int) -> DataFrame:
    # deg doubles as the node set (every node of the symmetrized graph
    # has out-degree ≥ 1); the 1-row count broadcast-cross-joins the
    # per-node teleport/seed terms into the plan.  The repeated deg / e
    # subtrees below are identical, so their exchanges are computed once
    # (ReusedExchange) even though the plan text repeats them.
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    nn = deg.agg(F.count("*").alias("n_nodes"))
    nodes = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"),
        "out_deg",
        F.expr(f"{TELEPORT_NUM} DIV n_nodes").alias("tele"),
        F.expr(f"{RANK_SCALE} DIV n_nodes").alias("seed"),
    )
    ranks = nodes.select("node", "out_deg", "tele", F.col("seed").alias("rank"))
    for _ in range(n_iterations):
        # SHUFFLE_HASH on the rank-vector side (guide §3.1): the default
        # SMJ re-SORTS the fetched edge partitions on every iteration
        # (the edge exchange is AQE-stage-reused, its sort is not) and
        # sorts the rank vector too.  Hashing builds a per-partition map
        # of the RANK side — O(nodes/partition) ≈ 16 B/node, the small
        # side by construction (the symmetrized edge list is ≥ the node
        # set) — and streams the edges with no sort at all.  Same for
        # the contrib side of the rank-update join below: contrib is
        # ≤ nodes rows.  Join output is bit-identical (integer adds are
        # fold-order-free; the groupBy re-hashes regardless).
        contrib = (
            ranks.hint("shuffle_hash").join(e, ranks.node == e.src)
            .select("dst", F.expr("rank DIV out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib.hint("shuffle_hash"), nodes.node == contrib.dst, "left")
            .select(
                "node",
                "out_deg",
                "tele",
                F.expr(
                    f"tele + ({DAMP_NUM} * coalesce(contrib, 0)) DIV {DAMP_DEN}"
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def _pagerank_loop(e: DataFrame, n_iterations: int) -> DataFrame:
    from pyspark import StorageLevel

    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).transform(_ckpt_eager)
    n_nodes = deg.count()
    if n_nodes == 0:
        e.unpersist()
        deg.unpersist()
        return deg.select(
            F.col("src").alias("node"), F.lit(0).cast("bigint").alias("rank")
        )
    teleport = TELEPORT_NUM // n_nodes
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(RANK_SCALE // n_nodes).alias("rank")
    )
    for _ in range(n_iterations):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            .join(e, "src")
            .select("dst", F.expr("rank DIV out_deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        prev = ranks
        ranks = (
            deg.join(contrib, deg.src == contrib.dst, "left")
            .select(
                F.col("src").alias("node"),
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(contrib, 0)) DIV {DAMP_DEN}"
                    )
                ).alias("rank"),
            )
            .transform(_ckpt_eager)
        )
        # the new generation is eagerly materialized; release the old
        # one — cached blocks AND, in reliable mode, its checkpoint
        # files (unpersist alone leaks those for the app lifetime)
        _release_ckpt(prev)
    e.unpersist()
    if n_iterations > 0:
        # the returned generation is materialized; the seed frame is not
        # referenced by it anymore
        _release_ckpt(deg)
    return ranks
