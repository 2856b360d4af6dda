"""Custom stateful operators via applyInPandas (grouped map).

When built-in operators can't express per-key imperative logic, the
engine's escape hatch is Arrow-batched grouped-map — NOT row-at-a-time
UDFs and NOT driver-side loops.  `sessionize` is the worked example: it
reproduces session_window semantics (so the DuckDB gaps-and-islands
oracle checks it exactly), while demonstrating the seam where genuinely
non-SQL per-key logic (simulations, per-entity models) plugs in.

Scale: applyInPandas shuffles once on the grouping key and holds one
group in memory at a time per task — per-user event history fits easily;
a pathological hot key would need salting+two-phase, which sessions
can't use (state is inherently per-user), so watch key skew here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSION_SCHEMA = "user_id bigint, session_start_us bigint, n_events bigint"


def sessionize(
    events: DataFrame,
    gap_us: int = 30 * 60 * 1_000_000,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-user sessionization (gap-based) as a grouped-map operator.

    events must carry (user_id, ts_us).  Equivalent to
    session_window(ts, gap) — verified against the same oracle.

    Grouped-map pays a fixed cost per GROUP (one Arrow round trip + one
    Python call), so grouping directly on user_id makes millions of tiny
    calls.  Instead the group key is `user_id % n_buckets` — every row of
    a user still lands in one call, but one call sessionizes a whole
    bucket of users in a single vectorized pass (measured sf0.1: 2.6s →
    well under 1s steady-state for 1500 users / 100k events).  n_buckets
    bounds per-call memory at ~corpus/n_buckets; raise it with corpus
    size (or pass n_buckets ≈ 4× total cores at cluster scale).
    """
    from pyspark.sql import functions as F

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["user_id", "ts_us"])
        uid = pdf["user_id"].to_numpy()
        ts = pdf["ts_us"].to_numpy()
        # a session starts at a user boundary or where the gap from the
        # previous event EXCEEDS gap_us — strictly greater, matching
        # Spark's session_window, which merges an event landing at
        # exactly prev + gap (hostile-fixture boundary find; the oracle
        # pins the same `> gap` break)
        first = np.ones(1, dtype=bool)
        new_user = np.concatenate((first, uid[1:] != uid[:-1]))
        brk = new_user | np.concatenate((first, np.diff(ts) > gap_us))
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [len(ts)]))
        return pd.DataFrame(
            {
                "user_id": uid[starts].astype("int64"),
                "session_start_us": ts[starts].astype("int64"),
                "n_events": (ends - starts).astype("int64"),
            }
        )

    # round-12: AQE coalesces this exchange by BYTES (a 1.2 MB shuffle
    # at sf0.1 → ONE post-shuffle partition), but a grouped-map stage's
    # cost is per-ROW Python work, not bytes — stage attribution showed
    # the whole sessionizer running as a single Python task.  An
    # explicit repartition on the bucket key pins the partition count
    # (REPARTITION_BY_NUM is exempt from AQE coalescing) and the
    # groupBy reuses that clustering, so there is still exactly ONE
    # shuffle.  Partitions are capped by n_buckets (more would be
    # empty) and follow the session's shuffle-partition conf at scale.
    spark = events.sparkSession
    try:
        n_parts = min(
            n_buckets, int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        )
    except (TypeError, ValueError):  # e.g. "auto" on some deployments
        n_parts = min(n_buckets, spark.sparkContext.defaultParallelism)
    return (
        events.select(
            "user_id", "ts_us", (F.col("user_id") % n_buckets).alias("__bucket")
        )
        .repartition(n_parts, F.col("__bucket"))
        .groupBy("__bucket")
        .applyInPandas(per_bucket, SESSION_SCHEMA)
    )
