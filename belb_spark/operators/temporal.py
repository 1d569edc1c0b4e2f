"""Temporal/interval join operators: as-of join, bounded range join, and the
literal interval-overlap join + overlap-based subtraction.

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
- :func:`overlap_join` / :func:`overlap_anti_join` — the literal J7/U3
  predicate ``l.start < r.end AND r.start < l.end`` on a shared key
  (belb/preprocessing/data.py:549-580: attach foreign annotations that
  overlap a span; subtract annotations overlapped by foreign ones). Scale
  path: each interval is replicated to its covering range buckets and the
  join runs as a (key, bucket) EQUI-join + predicate — a key whose spans
  cover a long range no longer lands on one reducer, and Catalyst gets a
  hash join instead of a broadcast-nested-loop over an inequality.
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


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_size: int | None = None,
) -> DataFrame:
    """Half-open interval-overlap join on a shared key:
    ``l_start < r_end AND r_start < l_end`` (belb's foreign-annotation
    overlap, belb/preprocessing/data.py:549-580).

    Column names of ``left`` and ``right`` must be disjoint apart from
    ``key``. Empty intervals (end ≤ start) overlap nothing and are dropped.

    With ``bucket_size``, each interval explodes to its covering range
    buckets and the join is a (key, bucket) equi-join + predicate; a pair
    overlapping in k buckets is deduped with ``distinct`` — output rows must
    therefore be distinct, which holds for id-carrying span tables.
    """
    l = left.filter(F.col(l_end) > F.col(l_start))
    r = right.filter(F.col(r_end) > F.col(r_start))
    pred = (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    if bucket_size is None:
        return l.join(r, key).filter(pred)
    b = F.lit(int(bucket_size))
    lb = l.withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.floor(F.col(l_start) / b), F.floor((F.col(l_end) - 1) / b))
        ),
    )
    rb = r.withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.floor(F.col(r_start) / b), F.floor((F.col(r_end) - 1) / b))
        ),
    )
    return lb.join(rb, [key, "_bucket"]).filter(pred).drop("_bucket").distinct()


def overlap_anti_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_size: int | None = None,
) -> DataFrame:
    """Overlap-based subtraction (U3): left rows with NO overlapping right
    interval on the same key — belb's 'drop annotations overlapped by a
    foreign annotation' (belb/preprocessing/data.py:563-580). Left rows with
    empty intervals (end ≤ start) overlap nothing and are kept."""
    matched = overlap_join(
        left, right, key, l_start, l_end, r_start, r_end, bucket_size
    ).select(key, l_start, l_end).distinct()
    return left.join(matched, [key, l_start, l_end], "left_anti")


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
