"""Pins for the two contracts the first 10×-scale oracle sweep forced
(docs/OPERATIONS.md, docs/SCALE_SWEEP.md):

1. Published means of integer quantities are FLOOR-quantized to the
   integer unit (`sum div n` on bigints, then one IEEE rescale) —
   never `round(double/unit, k)`, whose k-th-decimal boundary the two
   engines break differently.  The sweep caught
   `events_bot_cadence_score` diverging by 1e-6 on exactly one sf0.1
   user; this test reconstructs such a boundary deliberately and
   asserts the floor, so a revert to round() fails loudly instead of
   waiting for unlucky data.

2. Asserted approximation envelopes carry ≥5× margin: the sketch's
   own error must be well inside the asserted bound
   (`approx_distinct_accuracy` at Spark's default rsd=0.05 asserted a
   5% envelope equal to its own σ — ~1-in-3 groups fail by
   construction).  Pinned by plan introspection: reverting to the
   default sketch size fails here, not at 10× scale months later.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pytest

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry

    return entry.queries()


def _write_boundary_events(dest: Path) -> None:
    """One user, 21 events → 20 gaps summing to 20_000_033 µs: the
    true mean is 1_000_001.65 µs, so round() publishes 1.000002 s
    while the pinned floor contract publishes 1.000001 s."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    gaps_us = [1_000_001] * 19 + [1_000_014]
    ts, cur = [base], base
    for g in gaps_us:
        cur = cur + dt.timedelta(microseconds=g)
        ts.append(cur)
    n = len(ts)
    tbl = pa.table(
        {
            "event_id": pa.array(range(1, n + 1), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(['{"k": 1}'] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(dest / "events.parquet"))


def test_cadence_mean_floors_at_rounding_boundary(spark, queries, tmp_path):
    _write_boundary_events(tmp_path)
    out = queries["events_bot_cadence_score"](spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_gaps"] == 20
    # 20_000_033 div 20 = 1_000_001 µs — the floor; round() would lift
    # the .65 fractional microsecond to 1.000002
    assert row["mean_gap_s"] == 1.000001


def test_approx_distinct_sketch_carries_margin(spark, queries):
    df = queries["approx_distinct_accuracy"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "approx_count_distinct" in plan
    assert "approx_count_distinct(user_id" in plan and ", 0.01," in plan, (
        "approx_distinct_accuracy must size its HLL at rsd=0.01 (≥5σ "
        "under the asserted 5% envelope) — the default rsd=0.05 equals "
        "the envelope and fails ~1-in-3 groups by construction"
    )


def test_hll_rollup_sketch_carries_margin(spark, queries):
    df = queries["sketch_hll_mergeable_rollup"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "hll_sketch_agg(user_id" in plan and ", 14," in plan, (
        "sketch_hll_mergeable_rollup must size its DataSketches HLL at "
        "lgConfigK=14 (~0.8% RSE, >5σ under the asserted 5% envelope) — "
        "the default lgK=12 leaves only ~3σ"
    )
