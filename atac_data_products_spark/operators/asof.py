"""As-of join (event-time attribution) — an operator Spark lacks natively.

The reference has no as-of/range joins (SURVEY.md §2.4 "absent"), but a
training-data/event pipeline needs them.  Composition strategy (a) from
the charter: express it with existing DataFrame ops — here a single
window over the unioned/ordered event stream, rather than a join at all:

  last_value(ts-of-matching-left-row, ignore nulls) over
    (partition by key order by time rows unbounded preceding → 1 preceding)

One shuffle on the partition key, no join, no range explosion — the
scalable shape for "most recent prior X for each Y".  For two separate
tables, union them with a tag first; `pd.merge_asof` inside
applyInPandas is the fallback only when tolerance/backward-forward
variants are needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_prior_event(
    events: DataFrame,
    key: str,
    time_col: str,
    match: Column,
    select_when: Column,
) -> DataFrame:
    """For each row matching ``select_when``, attach the most recent
    strictly-prior ``time_col`` of a row matching ``match`` with the same
    ``key``.  Ties in event time are broken by any unique ordering column
    the caller bakes into ``time_col`` ordering (pass a struct/secondary
    sort via time_col list if needed)."""
    w = (
        Window.partitionBy(key)
        .orderBy(time_col, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = events.withColumn(
        "__match_ts", F.when(match, F.col(time_col))
    ).withColumn("asof_ts", F.last("__match_ts", ignorenulls=True).over(w))
    return marked.filter(select_when).drop("__match_ts")
