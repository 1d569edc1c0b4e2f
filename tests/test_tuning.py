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


def test_pipeline_salted_end_to_end_with_hot_blocks(spark):
    """VERDICT r2 #6: run the WHOLE pipeline with pairs_strategy='salted' on
    a corpus with hot prototypes (datagen SMALL: 4 prototypes with ~100
    members each), and assert (a) quality parity with the capped strategy
    and (b) the observable skew bound: after salting, no candidate-join
    reducer group exceeds ~rows_per_salt members."""
    from belb_spark.datagen import SMALL, generate
    from belb_spark.operators.blocking import block_keys
    from belb_spark.operators.normalize import normalize
    from belb_spark.operators.pairs import PairsConfig, salt_distribution
    from belb_spark.pipeline import ERConfig, run_pipeline

    tables = generate(SMALL)
    repos = spark.createDataFrame(tables["repos"])
    syn = spark.createDataFrame(tables["synonym_dict"])
    labeled = spark.createDataFrame(tables["labeled_pairs"])

    salted = run_pipeline(
        spark, repos, syn, labeled, cfg=ERConfig(pairs_strategy="salted")
    )
    assert salted.metrics["eval"]["test"]["f1"] >= 0.99
    capped = run_pipeline(
        spark, repos, syn, labeled, cfg=ERConfig(pairs_strategy="capped")
    )
    assert salted.metrics["eval"]["all"]["f1"] == capped.metrics["eval"]["all"]["f1"]

    # skew bound on the real blocking keys of this corpus, with a salt
    # granularity small enough to force splitting of the hot blocks
    rows_per_salt = 32
    blocks = block_keys(normalize(repos, syn))
    dist = salt_distribution(blocks, PairsConfig(), rows_per_salt).toPandas()
    assert len(dist) > 0  # hot tier non-empty: the prototypes ARE hot
    assert dist["members"].max() <= 2 * rows_per_salt
    # and the hot blocks genuinely split across several reducer groups
    assert (dist.groupby("block_key")["salt"].nunique() > 1).any()
