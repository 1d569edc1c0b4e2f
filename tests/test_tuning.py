from pyspark.sql import functions as F

from belb_spark.operators.evaluate import tune_threshold


def test_tune_threshold_separates_known_margin(spark):
    """Positives score 0.9, negatives 0.4 — any threshold in (0.4, 0.9]
    gives F1=1.0; ties break upward (precision-safe)."""
    scored = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.9), (5, 6, 0.4), (7, 8, 0.4)],
        "uid_a long, uid_b long, score double",
    )
    labeled = spark.createDataFrame(
        [(1, 2, True, "dev"), (3, 4, True, "dev"), (5, 6, False, "dev"), (7, 8, False, "dev")],
        "uid_a long, uid_b long, is_match boolean, split string",
    )
    t, f1s = tune_threshold(scored, labeled, "dev")
    assert 0.4 < t <= 0.9
    assert f1s[t] == 1.0
    # upward tie-break: the LARGEST threshold achieving max F1
    assert t == max(x for x, v in f1s.items() if v == 1.0)


def test_tune_threshold_unscored_pairs_count_as_negative(spark):
    """A labeled pair missing from the scored table (blocked away or
    prefiltered) is a predicted non-match at every threshold."""
    scored = spark.createDataFrame([(1, 2, 0.9)], "uid_a long, uid_b long, score double")
    labeled = spark.createDataFrame(
        [(1, 2, True, "dev"), (8, 9, True, "dev")],
        "uid_a long, uid_b long, is_match boolean, split string",
    )
    t, f1s = tune_threshold(scored, labeled, "dev")
    # recall capped at 0.5 -> best F1 = 2*1*0.5/1.5
    assert abs(f1s[t] - 2 / 3) < 1e-9


def test_pipeline_tuned_run(spark, tiny_spark):
    from belb_spark.pipeline import ERConfig, run_pipeline

    res = run_pipeline(
        spark,
        tiny_spark["repos"],
        tiny_spark["synonym_dict"],
        tiny_spark["labeled_pairs"],
        cfg=ERConfig(tune_on_dev=True),
    )
    assert "tuned_threshold" in res.metrics
    assert res.metrics["eval"]["test"]["f1"] >= 0.99
