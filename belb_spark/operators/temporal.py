"""Temporal join operators: as-of join and bounded range join.

Spark has no native ASOF JOIN; these are the standard compositions
(SURVEY.md §2.4 J7 interval-overlap family — belb's foreign-annotation
overlap join, belb/preprocessing/data.py:549-580, generalized to time):

- :func:`asof_prev_event` — each row joined to the latest earlier row of the
  same key: a window ``lag`` when self-referential (no shuffle beyond the
  keyed sort).
- :func:`asof_join` — generic two-table as-of: union the tables tagged,
  sort per key by time, propagate the last right-side row with a running
  ``last(..., ignorenulls)`` window, keep left rows. One shuffle on the key
  — the scalable pattern (no per-row lookups, no broadcast requirement).
- :func:`range_join_count` — per row, count rows of the same key in a
  bounded preceding interval: a ``rangeBetween`` window over epoch seconds
  (pure window, no self-join) — at scale this beats the naive range
  self-join by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_prev_event(
    df: DataFrame, key: str, ts: str, value_cols: list[str]
) -> DataFrame:
    """Self as-of: attach the same key's previous row's value columns
    (NULL for the first). Deterministic tie-break on all of (ts, value)."""
    w = Window.partitionBy(key).orderBy(ts, *value_cols)
    out = df
    for c in value_cols:
        out = out.withColumn(f"prev_{c}", F.lag(c).over(w))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For each left row: the right row of the same key with the greatest
    ``right_ts`` ≤ ``left_ts``. Union-sort-propagate — one shuffle on key."""
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_vals],
        F.struct(*left.columns).alias("_lrow"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_vals],
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_lrow"),
    )
    # right rows sort before left rows at equal timestamps => "<=" semantics
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tag.unionByName(r_tag)
    for c in right_vals:
        unioned = unioned.withColumn(
            f"asof_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    out = unioned.filter(F.col("_side") == 1)
    return out.select(
        F.col("_lrow.*"), *[F.col(f"asof_{c}") for c in right_vals]
    )


def range_join_count(
    df: DataFrame,
    key: str,
    ts: str,
    preceding_seconds: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Count same-key rows in (ts - preceding_seconds, ts] — inclusive of
    the row itself, so the result is ≥ 1 and insensitive to timestamp ties.
    rangeBetween over epoch seconds: pure window, no self-join."""
    sec = F.unix_timestamp(F.col(ts).cast("timestamp"))
    w = (
        Window.partitionBy(key)
        .orderBy(sec)
        .rangeBetween(-(preceding_seconds - 1), Window.currentRow)
    )
    return df.withColumn(count_alias, F.count(F.lit(1)).over(w))
