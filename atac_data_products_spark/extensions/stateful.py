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
        pdf = pdf.sort_values("ts_us")
        ts = pdf["ts_us"].to_numpy()
        breaks = [0]
        for i in range(1, len(ts)):
            if ts[i] - ts[i - 1] >= gap_us:
                breaks.append(i)
        breaks.append(len(ts))
        rows = []
        uid = int(pdf["user_id"].iloc[0])
        for s, e in zip(breaks[:-1], breaks[1:]):
            rows.append((uid, int(ts[s]), e - s))
        return pd.DataFrame(rows, columns=["user_id", "session_start_us", "n_events"])

    return events.select("user_id", "ts_us").groupBy("user_id").applyInPandas(
        per_user, SESSION_SCHEMA
    )
