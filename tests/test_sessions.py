"""Stateful streaming sessionization (applyInPandasWithState) vs batch twin."""

import pathlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from belb_spark.streaming.sessions import sessionize_batch, sessionize_stream

GAP = 1800


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="belb_sess_")
    yield pathlib.Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _norm(df):
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["value_sum"], 6))
        for r in df.collect()
    }


def test_batch_sessionization_gap_semantics(spark):
    from datetime import datetime as dt

    events = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 10, 0), 1.0),
            (1, dt(2024, 1, 1, 10, 20), 2.0),   # same session (<30min)
            (1, dt(2024, 1, 1, 11, 0), 4.0),    # 40min gap -> new session
            (2, dt(2024, 1, 1, 9, 0), 8.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = _norm(sessionize_batch(events, GAP))
    assert (1, dt(2024, 1, 1, 10, 0), dt(2024, 1, 1, 10, 20), 2, 3.0) in got
    assert (1, dt(2024, 1, 1, 11, 0), dt(2024, 1, 1, 11, 0), 1, 4.0) in got
    assert (2, dt(2024, 1, 1, 9, 0), dt(2024, 1, 1, 9, 0), 1, 8.0) in got
    assert len(got) == 3


def test_stream_matches_batch_minus_open_sessions(spark, workdir):
    """One availableNow pass: every session CLOSED by a later event within
    the batch is emitted; each user's final (still-open) session stays in
    state. So stream-emitted == batch sessions minus the last session per
    user."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    in_dir, out_dir, ckpt = (str(workdir / "in"), str(workdir / "out"), str(workdir / "ck"))
    events.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    q = (
        sessionize_stream(stream, GAP)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _norm(spark.read.parquet(out_dir))

    batch = sessionize_batch(events, GAP)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    closed_expected = batch.withColumn("rn", F.row_number().over(w)).filter(
        "rn > 1"
    ).drop("rn")
    expected = _norm(closed_expected)
    assert got == expected
    assert len(got) > 0


def test_stream_state_survives_across_drains(spark, workdir):
    """Two availableNow drains: a second-wave event past the gap closes the
    session left open (in the state store) by the first wave."""
    from datetime import datetime as dt

    in_dir, out_dir, ckpt = (str(workdir / "in2"), str(workdir / "out2"), str(workdir / "ck2"))
    w1 = spark.createDataFrame(
        [(7, dt(2024, 1, 1, 10, 0), 1.0), (7, dt(2024, 1, 1, 10, 10), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    w1.write.mode("overwrite").parquet(in_dir)

    def drain():
        stream = spark.readStream.schema(w1.schema).parquet(in_dir)
        q = (
            sessionize_stream(stream, GAP)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out_dir).count() == 0  # session still open

    w2 = spark.createDataFrame(
        [(7, dt(2024, 1, 1, 12, 0), 5.0)], "user_id long, ts timestamp, value double"
    )
    w2.write.mode("append").parquet(in_dir)
    drain()
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 7 and r["n_events"] == 2 and r["value_sum"] == 3.0
    assert r["session_start"] == dt(2024, 1, 1, 10, 0)
    assert r["session_end"] == dt(2024, 1, 1, 10, 10)
