"""Aggregation operators (SURVEY.md §2.6).

- A1 count: trivial `count` (bin/concatenate.py:142-143).
- A2 collect-lists: manifest columns → list fields of the product JSON
  (bin/concatenate.py:122-123).  For oracle-stable output we expose the
  *sorted-CSV* form — `array_join(sort_array(collect_list(x)), ',')` —
  because an unordered list's serialization is nondeterministic.
- A3 first-match: the reference's 52-line donor-concept extraction loop
  (make_uuids_tsv.py:91-142) reduces a concept/value record list to one
  column per concept, later-records-win.  Spark-first: explode + groupBy
  + pivot with an explicit value list (bounded width, single shuffle,
  map-side partial aggregation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def collect_sorted_csv(col: Column | str) -> Column:
    """Deterministic list aggregation: sorted, comma-joined.

    collect_list is order-nondeterministic under parallel merge; sorting
    pins the value so distributed runs hash identically.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.sort_array(F.collect_list(c)), ",")


def first_match_pivot(
    df: DataFrame,
    key: str,
    concept_col: str,
    value_col: str,
    concepts: Sequence[str],
    priority_col: str | None = None,
) -> DataFrame:
    """Concept-list → one column per concept, per key (A3).

    The reference's last-wins is iteration-order-dependent (organ-donor
    records overwritten by living-donor records, make_uuids_tsv.py:105-140).
    Deterministic re-expression: when a ``priority_col`` is given, the
    max-priority record wins (ties by max value); otherwise max(value).
    `pivot` with an explicit ``concepts`` list keeps the plan width bounded
    and compiles to a single hash aggregation — no per-concept passes.
    """
    if priority_col is not None:
        # max_by(value, (priority, value)) — deterministic last-wins.
        agg = F.expr(
            f"max_by({value_col}, struct({priority_col}, {value_col}))"
        )
    else:
        agg = F.max(F.col(value_col))
    return (
        df.groupBy(key)
        .pivot(concept_col, list(concepts))
        .agg(agg)
    )
