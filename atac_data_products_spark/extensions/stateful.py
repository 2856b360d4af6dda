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


def sessionize(events: DataFrame, gap_us: int = 30 * 60 * 1_000_000) -> DataFrame:
    """Per-user sessionization (gap-based) as a grouped-map operator.

    events must carry (user_id, ts_us).  Equivalent to
    session_window(ts, gap) — verified against the same oracle.
    """

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ts = np.sort(pdf["ts_us"].to_numpy())
        # vectorized break detection: a session starts where the gap from
        # the previous event is >= gap_us
        starts = np.flatnonzero(np.concatenate(([True], np.diff(ts) >= gap_us)))
        ends = np.concatenate((starts[1:], [len(ts)]))
        return pd.DataFrame(
            {
                "user_id": int(pdf["user_id"].iloc[0]),
                "session_start_us": ts[starts].astype("int64"),
                "n_events": (ends - starts).astype("int64"),
            }
        )

    return events.select("user_id", "ts_us").groupBy("user_id").applyInPandas(
        per_user, SESSION_SCHEMA
    )
