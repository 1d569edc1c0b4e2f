"""Unit tests for the r5 text-quality ops (repetition, PII redaction) and
the JVM-expression media payload builders backing the multimodal oracle
rows. The oracle twins in __spark_entry__ check end-to-end agreement at
sf0.01; these pin the operator semantics on hand-built edge cases."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from belb_spark.operators.text import pii_redact, repetition_score


def test_repetition_score_counts_duplicate_grams(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "a b c a b c a b",      # 8 toks, 6 grams, 3 distinct
                    "x y z w",               # 4 toks, 2 grams, 2 distinct
                    "one two",               # < width: no row
                    "",                      # empty: no row
                ],
            }
        )
    )
    out = {
        r["doc_id"]: r
        for r in repetition_score(df, "doc_id", "text", width=3).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 6 and out[1]["n_distinct"] == 3
    assert out[1]["dup_ratio"] == pytest.approx(3 / 6, abs=1e-4)
    assert out[2]["n_grams"] == 2 and out[2]["n_distinct"] == 2
    assert out[2]["dup_ratio"] == 0.0


def test_pii_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "mail a.b+c@x-corp.io and d@e.org call +1-555-0123 ok",
                    "no pii here",
                ],
            }
        )
    )
    out = {r["doc_id"]: r for r in pii_redact(df, "doc_id", "text").collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 1
    assert out[1]["redacted"] == "mail <EMAIL> and <EMAIL> call <PHONE> ok"
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    assert out[2]["redacted"] == "no pii here"


def test_synth_payload_cols_match_python_bytes(spark):
    """The JVM hex-assembly builders must produce byte-identical payloads
    to a straight Python construction of the same containers — this is what
    lets the mm_* oracle rows treat the closed form as ground truth."""
    from belb_spark.operators.multimodal import synth_ppm_col, synth_wav_col

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 7, 123]}))
    got = {
        r["doc_id"]: (bytes(r["ppm"]), bytes(r["wav"]))
        for r in df.select(
            "doc_id",
            synth_ppm_col(F.col("doc_id")).alias("ppm"),
            synth_wav_col(F.col("doc_id")).alias("wav"),
        ).collect()
    }
    for seed in (0, 7, 123):
        ppm = b"P6\n4 4\n255\n" + b"".join(
            bytes([(seed * 31 + p * 17) % 256] * 3) for p in range(16)
        )
        data = b"".join(
            (((seed * 5 + (i // 2) * 9) % 100) * 40).to_bytes(2, "little")
            for i in range(32)
        )
        fmt = (
            b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        wav = (
            b"RIFF" + (4 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
            + b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
        )
        assert got[seed] == (ppm, wav), seed


def test_zero_shot_slice_anti_join(spark):
    from belb_spark.operators.evaluate import zero_shot_slice

    train = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 2], "event_id": [10, 11]})
    )
    test = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 3, 3], "event_id": [20, 21, 22]})
    )
    out = zero_shot_slice(train, test, "user_id")
    assert sorted(r["event_id"] for r in out.collect()) == [21, 22]


def test_assign_splits_default_train(spark):
    """J9: listed rows take the frozen split; unlisted rows default to
    train (belb/metadata/*/splits.json semantics)."""
    from belb_spark.operators.evaluate import assign_splits

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "source": ["a"] * 4})
    )
    splits = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2, 4], "split": ["dev", "test"]})
    )
    out = assign_splits(docs, splits, "doc_id")
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert got == {1: "train", 2: "dev", 3: "train", 4: "test"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # metadata-sized side must broadcast
