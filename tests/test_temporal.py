from datetime import datetime

import pytest
from pyspark.sql import functions as F

from belb_spark.operators.temporal import (
    asof_join,
    asof_prev_event,
    overlap_anti_join,
    overlap_join,
    range_join_count,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), "e1"),
         (1, _ts("2024-01-01T12:00"), "e2"),
         (2, _ts("2024-01-01T09:00"), "e3")],
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30"), 10.0),
         (1, _ts("2024-01-01T11:00"), 20.0),
         (1, _ts("2024-01-01T12:00"), 30.0)],
        "k long, t timestamp, v double",
    )
    out = {r["name"]: r["asof_v"] for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()}
    assert out["e1"] == 10.0      # 09:30 is latest <= 10:00
    assert out["e2"] == 30.0      # equal timestamps included (<=)
    assert out["e3"] is None      # key with no right rows


def test_asof_prev_event(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), 1.0),
         (1, _ts("2024-01-01T11:00"), 2.0),
         (2, _ts("2024-01-01T10:30"), 9.0)],
        "user long, ts timestamp, value double",
    )
    out = {(r["user"], r["value"]): r["prev_value"]
           for r in asof_prev_event(df, "user", "ts", ["value"]).collect()}
    assert out[(1, 1.0)] is None
    assert out[(1, 2.0)] == 1.0
    assert out[(2, 9.0)] is None


def _span_frames(spark):
    left = spark.createDataFrame(
        [(1, 100, 0, 10), (1, 101, 20, 30), (1, 102, 5, 5),   # empty interval
         (2, 103, 0, 10)],
        "k long, lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(1, 200, 8, 25),    # overlaps 100 (8<10) and 101 (20<25)
         (1, 201, 10, 20),   # touches 100 at 10 (half-open: no) and 101 at 20 (no)
         (3, 202, 0, 100)],  # different key
        "k long, rid long, rs long, re long",
    )
    return left, right


@pytest.mark.parametrize("bucket", [None, 7])
def test_overlap_join_semantics(spark, bucket):
    left, right = _span_frames(spark)
    out = overlap_join(left, right, "k", "ls", "le", "rs", "re", bucket_size=bucket)
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    assert pairs == {(100, 200), (101, 200)}   # half-open, key-scoped, no dups


@pytest.mark.parametrize("bucket", [None, 7])
def test_overlap_anti_join_semantics(spark, bucket):
    left, right = _span_frames(spark)
    out = overlap_anti_join(left, right, "k", "ls", "le", "rs", "re", bucket_size=bucket)
    kept = {r["lid"] for r in out.collect()}
    # 102: empty interval overlaps nothing -> kept; 103: key 2 has no right
    assert kept == {102, 103}


def test_overlap_join_bucketed_matches_plain(spark):
    import random

    random.seed(3)
    lrows = [(random.randint(1, 5), i, s := random.randint(0, 200), s + random.randint(1, 50))
             for i in range(120)]
    rrows = [(random.randint(1, 5), 1000 + i, s := random.randint(0, 200), s + random.randint(1, 50))
             for i in range(120)]
    left = spark.createDataFrame(lrows, "k long, lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "k long, rid long, rs long, re long")
    plain = {(r["lid"], r["rid"]) for r in
             overlap_join(left, right, "k", "ls", "le", "rs", "re").collect()}
    bucketed = {(r["lid"], r["rid"]) for r in
                overlap_join(left, right, "k", "ls", "le", "rs", "re", bucket_size=16).collect()}
    assert plain == bucketed and len(plain) > 0


def test_range_join_count_window(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00")),
         (1, _ts("2024-01-01T10:30")),
         (1, _ts("2024-01-01T11:15")),
         (2, _ts("2024-01-01T10:00"))],
        "user long, ts timestamp",
    )
    out = {(r["user"], r["ts"].isoformat()): r["n_in_range"]
           for r in range_join_count(df, "user", "ts", 3600).collect()}
    assert out[(1, "2024-01-01T10:00:00")] == 1
    assert out[(1, "2024-01-01T10:30:00")] == 2   # 10:00 within preceding hour
    assert out[(1, "2024-01-01T11:15:00")] == 2   # 10:30 in, 10:00 out (>59:59)
    assert out[(2, "2024-01-01T10:00:00")] == 1
