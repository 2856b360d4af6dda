"""Numeric helpers for exact fixed-point arithmetic in hot paths.

The engine's money/quantity columns are doubles storing EXACT 2-dp
decimal values (TESTDATA.md); every order-free aggregation first
rescales them to integers.  `F.round(double)` is the wrong tool for
that per-row step: Spark's Round on DoubleType goes through
``BigDecimal.valueOf(x).setScale(...)`` — an allocation per row that
measured 2× on tpch_q1's scan-agg pipeline (docs/PLAN_AUDIT.md,
round-8 A/B).  ``floor(x·scale + 0.5)`` is pure whole-stage-codegen
arithmetic (Math.floor), returns BIGINT directly, and is exact for
this domain: x·scale lands within ~1e-9 of the true integer, so the
+0.5 shift can never cross to the wrong unit.

Sign-correctness matters: ``(x·scale + 0.5).cast("bigint")`` truncates
toward zero and is off by one for EVERY negative value; floor rounds
half-up toward +∞, which for exact fixed-point inputs (never actually
ON a .5 boundary after the multiply) agrees with both SQL ``round``
halves-away-from-zero engines on all inputs, positive or negative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_fixed(col: Column | str, scale: int) -> Column:
    """Exact fixed-point BIGINT from a double column holding values
    that are exact multiples of 1/scale (e.g. 2-dp money with
    scale=100).  Pure codegen — no BigDecimal; see module docstring.
    NULL propagates (NULL·scale + 0.5 → NULL, floor(NULL) → NULL),
    matching ``CAST(round(x*scale) AS BIGINT)`` oracle semantics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * scale + F.lit(0.5))


def cents(col: Column | str) -> Column:
    """`to_fixed(col, 100)` — integer cents from exact 2-dp doubles."""
    return to_fixed(col, 100)
