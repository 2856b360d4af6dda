"""Measure what the PPJoin+ SUFFIX filter would prune on this engine.

Round-12 verdict task: "try the PPJoin suffix filter on
dedup_prefix_filter_join ... keep only if it wins".  Before paying the
distributed cost (per-pair access to ordered suffix arrays — either
carrying per-doc sketches through the candidate joins or a third join
against a doc-array table), this probe answers the prior question:
given the candidates that ALREADY survive the prefix + length +
accumulated-positional filters, what fraction would the suffix filter
remove?

Method: rebuild the candidate subplan of ``dedup_prefix_filter_join``
(same digest order: df asc, hash59 asc) at the given sf_dir, collect
the surviving pairs plus the full ordered digest arrays of the docs
they involve (candidate-involved docs only — small), and evaluate the
paper's recursive SuffixFilter (Xiao et al. 2008, Algorithm 3) EXACTLY
in Python at MAXDEPTH 2..4 on each pair's suffixes-after-last-shared-
prefix-match.  A pair is suffix-prunable when

    c + (|xs| + |ys| - H_lb(xs, ys)) / 2  <  O_req

(c = shared prefix matches, exact; overlap(xs,ys) = (|xs|+|ys|-H)/2
for sets, and H_lb lower-bounds H, so the left side upper-bounds the
true overlap — the check is lossless).

Expected result (the degeneracy argument, docs/SCALE_SWEEP.md r12):
under a GLOBAL total order whose tie-break is a uniform hash digest,
any token's rank inside a doc is ≈ the token's corpus-wide order-CDF
quantile regardless of which doc — positions are proportional across
docs, partition sizes on both sides of any probe token match, and the
divide-and-conquer lower bound collapses toward 0 (bound on overlap
collapses toward min(|xs|,|ys|)).  The probe also prints the
position-proportionality statistic behind that argument.

Usage: python tools/suffix_probe.py [sf_dir] [maxdepth ...]
"""

from __future__ import annotations

import bisect
import sys

sys.path.insert(0, ".")


def suffix_hamming_lb(x, y, depth, maxdepth) -> int:
    """Lower bound on the hamming distance |xΔy| of two sorted digest
    lists — Xiao et al. 2008 Algorithm 3 (un-windowed: the paper bounds
    the probe window for speed, which only loosens the bound; the probe
    wants the TIGHTEST version, so full binary search)."""
    if not x or not y:
        return len(x) + len(y)
    if depth > maxdepth:
        return abs(len(x) - len(y))
    mid = len(y) // 2
    w = y[mid]
    yl, yr = y[:mid], y[mid + 1:]
    i = bisect.bisect_left(x, w)
    if i < len(x) and x[i] == w:
        xl, xr, diff = x[:i], x[i + 1:], 0
    else:
        xl, xr, diff = x[:i], x[i:], 1
    return (
        suffix_hamming_lb(xl, yl, depth + 1, maxdepth)
        + diff
        + suffix_hamming_lb(xr, yr, depth + 1, maxdepth)
    )


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from atac_data_products_spark.functions.hashes import hash59
    from atac_data_products_spark.extensions.text import shingle_table
    from atac_data_products_spark.registry_scale import (
        PREFIX_JACCARD_DEN,
        PREFIX_JACCARD_NUM,
    )
    from atac_data_products_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    depths = [int(a) for a in args[1:]] or [2, 3, 4]
    num, den = PREFIX_JACCARD_NUM, PREFIX_JACCARD_DEN

    spark = get_spark("suffix-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = (
        shingle_table(docs, distinct=False)
        .select("doc_id", hash59("shingle").alias("g"))
        .distinct()
    )
    df_tab = sh.groupBy("g").agg(F.count("*").alias("__df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("__n"))
    prefix_len = F.col("__n") - F.expr(
        f"CAST((__n * {num} + {den} - 1) DIV {den} AS BIGINT)"
    ) + 1
    index_len = F.col("__n") - F.expr(
        f"CAST((__n * {2 * num} + {num + den} - 1) DIV {num + den} AS BIGINT)"
    ) + 1
    order = sh.join(df_tab, "g").join(sizes, "doc_id").withColumn(
        "__rk",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("__df", "g")),
    )
    ranked = order.where(F.col("__rk") <= prefix_len).select(
        "doc_id", "g", "__rk", "__n"
    )
    a = ranked.select(
        F.col("doc_id").alias("doc_a"), "g",
        F.col("__rk").alias("__pa"), F.col("__n").alias("__na"),
    )
    b = ranked.where(F.col("__rk") <= index_len).select(
        F.col("doc_id").alias("doc_b"), "g",
        F.col("__rk").alias("__pb"), F.col("__n").alias("__nb"),
    )
    cand = (
        a.join(b, "g")
        .where(
            (
                (F.col("__na") > F.col("__nb"))
                | ((F.col("__na") == F.col("__nb")) & (F.col("doc_a") > F.col("doc_b")))
            )
            & (F.col("__nb") * den >= F.col("__na") * num)
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("c"),
            F.max("__pa").alias("pa_last"),
            F.max("__pb").alias("pb_last"),
            F.max("__na").alias("na"),
            F.max("__nb").alias("nb"),
        )
        .where(
            (
                F.col("c")
                + F.least(F.col("na") - F.col("pa_last"), F.col("nb") - F.col("pb_last"))
            )
            * (num + den)
            >= (F.col("na") + F.col("nb")) * num
        )
    )
    pairs = cand.collect()
    doc_ids = sorted({r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs})
    print(f"{sf_dir}: {len(pairs)} surviving candidates over {len(doc_ids)} docs")
    arr_rows = (
        order.where(F.col("doc_id").isin(doc_ids))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("__rk", "g"))).alias("seq"))
        .collect()
    )
    seqs = {r["doc_id"]: [s["g"] for s in r["seq"]] for r in arr_rows}

    # position-proportionality statistic: for each candidate's last
    # shared prefix element, |pa/na - pb/nb| — ≈0 means positions are
    # proportional across docs and partition filters have no signal
    props = [
        abs(r["pa_last"] / r["na"] - r["pb_last"] / r["nb"]) for r in pairs
    ]
    if props:
        props.sort()
        print(
            f"position proportionality |pa/na - pb/nb| at last shared "
            f"prefix match: median {props[len(props) // 2]:.4f}, "
            f"p95 {props[int(len(props) * 0.95)]:.4f}"
        )

    # Distributed-implementable variants with FIXED per-doc payloads
    # (no pair-specific suffix access needed — evaluated on full sets,
    # with the exact prefix-match count c folded in only where sound):
    #
    # (i) fixed-K histogram: bucket digests by K equal slices of the
    #     digest space; O <= sum_k min(a_k, b_k) (hamming-L1 bound with
    #     fixed boundaries — lossless for ANY fixed value partition).
    #     payload: K smallints per doc.
    import numpy as np

    GMAX = float(1 << 60)  # hash59 spans 60 bits (functions/hashes.py:32)
    for K in (16, 64, 256):
        hists = {
            d: np.bincount(
                (np.array(seqs[d], dtype=np.float64) / GMAX * K).astype(int).clip(0, K - 1),
                minlength=K,
            )
            for d in doc_ids
        }
        pruned = wrong = 0
        for r in pairs:
            o_ub = int(np.minimum(hists[r["doc_a"]], hists[r["doc_b"]]).sum())
            o_req = -(-(r["na"] + r["nb"]) * num // (num + den))
            if o_ub < o_req:
                pruned += 1
                to = len(set(seqs[r["doc_a"]]) & set(seqs[r["doc_b"]]))
                if to >= o_req:
                    wrong += 1
        print(
            f"fixed-hist K={K}: would prune {pruned}/{len(pairs)} "
            f"({100 * pruned / max(len(pairs), 1):.1f}%); wrong: {wrong}"
        )

    for maxdepth in depths:
        pruned = survivors_true = pruned_true = 0
        for r in pairs:
            x = seqs[r["doc_a"]]
            y = seqs[r["doc_b"]]
            # the suffixes AFTER the last order-aligned shared prefix
            # match; every uncounted shared element lives in both
            # (registry_scale.py accumulation-soundness argument)
            # rank is 1-based: suffix starts at list index == rank
            xs = x[r["pa_last"]:] if r["na"] == len(x) else None
            ys = y[r["pb_last"]:]
            assert xs is not None, "size mismatch: seq vs __n"
            # digest order within a doc is (df, g) — but suffix_hamming
            # probes by VALUE, so sort the suffix digests (same multiset,
            # any self-consistent order; bisect needs sorted)
            xs, ys = sorted(xs), sorted(ys)
            hlb = suffix_hamming_lb(xs, ys, 1, maxdepth)
            o_ub = r["c"] + (len(xs) + len(ys) - hlb) / 2
            o_req = -(-(r["na"] + r["nb"]) * num // (num + den))  # ceil
            true_overlap = r["c"] + len(set(xs) & set(ys))
            if o_ub < o_req:
                pruned += 1
                if true_overlap >= o_req:
                    pruned_true += 1  # MUST stay 0 — losslessness check
            elif true_overlap >= o_req:
                survivors_true += 1
        print(
            f"maxdepth={maxdepth}: suffix filter would prune "
            f"{pruned}/{len(pairs)} candidates "
            f"({100 * pruned / max(len(pairs), 1):.1f}%); "
            f"true pairs wrongly pruned: {pruned_true} (must be 0)"
        )


if __name__ == "__main__":
    main()
