import pytest
from pyspark.sql import functions as F

from belb_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    resize_stub,
    size_bucketed,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=48).cache()


def test_feature_extraction_shape_and_determinism(spark, media):
    feats = extract_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r["feature"]) == 16
        assert len(r["payload_sha"]) == 64
        assert r["n_bytes"] > 0
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_real_decode_is_stubbed(spark, media):
    with pytest.raises(Exception):  # NotImplementedError inside the task
        extract_features(media, fake_decode=False).collect()


def test_size_bucketing_partitions(spark, media):
    b = size_bucketed(media, n_buckets=4)
    assert b.rdd.getNumPartitions() == 4
    assert b.count() == 48


def test_resize_plan_preserves_aspect(spark, media):
    out = resize_stub(media.filter(F.col("kind") == "image"), max_dim=64).collect()
    for r in out:
        assert max(r["target_width"], r["target_height"]) <= 64 or (
            max(r["width"], r["height"]) <= 64
        )


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_ms=5000)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 5000 == 0 for r in rows)
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    vids = {r["media_id"]: r["duration_ms"] for r in media.filter("kind='video'").collect()}
    assert set(by_id) == set(vids)
    for mid, frames in by_id.items():
        assert frames == sorted(frames)
        assert frames[-1] <= vids[mid]
