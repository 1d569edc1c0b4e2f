"""Structured Streaming ops, driven with availableNow and compared against
their batch twins."""

import pathlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from belb_spark.streaming.incremental import (
    incremental_exact_dedup,
    read_repo_stream,
    run_available_now,
    windowed_event_counts,
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="belb_stream_")
    yield pathlib.Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_dedup_two_batches(spark, tiny_spark, workdir):
    """Drop files in two waves; the second wave's duplicates (already seen
    contents) must NOT be re-emitted — state survives across runs via the
    stream checkpoint."""
    repos = tiny_spark["repos"].limit(200).cache()
    in_dir, out_dir, ckpt = (
        str(workdir / "in"),
        str(workdir / "out"),
        str(workdir / "ckpt"),
    )
    # wave 1: first 100 rows
    repos.filter("uid <= 100").write.mode("overwrite").parquet(in_dir)
    stream = incremental_exact_dedup(read_repo_stream(spark, in_dir))
    run_available_now(stream, ckpt, out_dir)
    n1 = spark.read.parquet(out_dir).count()
    distinct1 = (
        repos.filter("uid <= 100").select(F.sha2("content", 256)).distinct().count()
    )
    assert n1 == distinct1

    # wave 2: append rows 101-200 (some repeat wave-1 contents)
    repos.filter("uid > 100").write.mode("append").parquet(in_dir)
    stream = incremental_exact_dedup(read_repo_stream(spark, in_dir))
    run_available_now(stream, ckpt, out_dir)
    out = spark.read.parquet(out_dir)
    total_distinct = repos.select(F.sha2("content", 256)).distinct().count()
    assert out.count() == total_distinct
    # no content emitted twice
    assert out.select("content_sha").distinct().count() == out.count()


def test_windowed_counts_match_batch(spark, workdir):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir, out_dir, ckpt = (
        str(workdir / "in"),
        str(workdir / "out"),
        str(workdir / "ckpt"),
    )
    events.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    # windowed aggregation on a finite stream: complete-mode to a memory sink
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from win_counts")
    batch = events.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
    assert got.count() == batch.count()
    diff = got.select("window_start", "event_type", "cnt").exceptAll(
        batch.select("window_start", "event_type", "cnt")
    )
    assert diff.count() == 0


def test_bounded_dedup_state_expires(spark, workdir):
    """dropDuplicatesWithinWatermark: duplicates inside the horizon are
    suppressed; a duplicate arriving after the watermark passed its state
    entry is re-admitted (state expired — the bounded-state contract)."""
    import pandas as pd

    from belb_spark.streaming.incremental import incremental_exact_dedup_bounded

    in_dir, out_dir, ckpt = (
        str(workdir / "in"),
        str(workdir / "out"),
        str(workdir / "ckpt"),
    )
    wave1 = pd.DataFrame(
        {
            "content": ["aaa", "aaa", "bbb"],
            "ingest_ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:30", "2024-01-01 00:40"]
            ),
        }
    )
    spark.createDataFrame(wave1).write.mode("overwrite").parquet(in_dir)
    schema = "content string, ingest_ts timestamp"
    stream = incremental_exact_dedup_bounded(
        spark.readStream.schema(schema).parquet(in_dir),
        watermark="1 hour",
    )
    run_available_now(stream, ckpt, out_dir)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 2  # in-horizon duplicate suppressed

    # wave 2: advances the watermark far past wave-1 state (expiry happens
    # at the END of the batch that moves the watermark)
    wave2 = pd.DataFrame(
        {
            "content": ["ccc"],
            "ingest_ts": pd.to_datetime(["2024-01-03 00:00"]),
        }
    )
    spark.createDataFrame(wave2).write.mode("append").parquet(in_dir)
    stream = incremental_exact_dedup_bounded(
        spark.readStream.schema(schema).parquet(in_dir),
        watermark="1 hour",
    )
    run_available_now(stream, ckpt, out_dir)
    assert spark.read.parquet(out_dir).count() == 3

    # wave 3: 'aaa' reappears AFTER its state expired -> re-admitted
    wave3 = pd.DataFrame(
        {
            "content": ["aaa"],
            "ingest_ts": pd.to_datetime(["2024-01-03 00:05"]),
        }
    )
    spark.createDataFrame(wave3).write.mode("append").parquet(in_dir)
    stream = incremental_exact_dedup_bounded(
        spark.readStream.schema(schema).parquet(in_dir),
        watermark="1 hour",
    )
    run_available_now(stream, ckpt, out_dir)
    assert spark.read.parquet(out_dir).count() == 4  # expired dup re-admitted
