"""End-to-end gate: pairwise F1 ≥ 0.99 on the test split (BASELINE.json),
row conservation, sha invariant, deterministic re-run, resume semantics."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from belb_spark.pipeline import ERConfig, run_pipeline


@pytest.fixture(scope="module")
def ckpt_dir():
    d = tempfile.mkdtemp(prefix="belb_e2e_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def result(spark, tiny_spark, ckpt_dir):
    return run_pipeline(
        spark,
        tiny_spark["repos"],
        tiny_spark["synonym_dict"],
        tiny_spark["labeled_pairs"],
        checkpoint_dir=ckpt_dir,
    )


@pytest.fixture(scope="module")
def result_rows(result):
    """Materialized assignment — stays valid after checkpoint invalidation."""
    return sorted((r["uid"], r["cluster"]) for r in result.assignment.collect())


def test_f1_target(result):
    ev = result.metrics["eval"]
    assert ev["test"]["f1"] >= 0.99, ev
    assert ev["dev"]["f1"] >= 0.99, ev
    assert ev["all"]["f1"] >= 0.99, ev


def test_row_conservation(result, tiny_spark):
    n_in = tiny_spark["repos"].count()
    assert result.assignment.count() == n_in
    assert result.assignment.select("uid").distinct().count() == n_in


def test_cluster_id_is_min_uid(result):
    bad = (
        result.assignment.groupBy("cluster")
        .agg(F.min("uid").alias("mn"))
        .filter(F.col("cluster") != F.col("mn"))
    )
    assert bad.count() == 0


def test_matches_gold_exactly(result, tiny_spark):
    """Beyond pairwise F1: the full partition equals the gold partition."""
    pred = result.assignment
    gold = tiny_spark["gold"]
    joined = pred.join(gold, "uid")
    # same-partition check: predicted cluster ids map 1:1 to gold cluster ids
    pairs = joined.select("cluster", "gold_cluster").distinct()
    assert pairs.count() == pairs.select("cluster").distinct().count()
    assert pairs.count() == pairs.select("gold_cluster").distinct().count()


def test_resume_skips_committed_stages(spark, tiny_spark, ckpt_dir, result):
    res2 = run_pipeline(
        spark,
        tiny_spark["repos"],
        tiny_spark["synonym_dict"],
        labeled_pairs=None,
        checkpoint_dir=ckpt_dir,
    )
    assert all(s["resumed"] for s in res2.stages), res2.stages
    diff = res2.assignment.exceptAll(result.assignment).count()
    assert diff == 0


def test_partial_resume_after_invalidation(spark, tiny_spark, ckpt_dir, result_rows):
    """Kill-after-stage-N simulation: only the invalidated stage rebuilds;
    earlier committed stages are read back; output is identical."""
    from belb_spark.checkpoint import CheckpointStore

    store = CheckpointStore(spark, ckpt_dir)
    store.invalidate("05_clusters")
    res = run_pipeline(
        spark,
        tiny_spark["repos"],
        tiny_spark["synonym_dict"],
        labeled_pairs=None,
        checkpoint_dir=ckpt_dir,
    )
    by_stage = {s["stage"]: s["resumed"] for s in res.stages}
    assert by_stage["05_clusters"] is False
    assert by_stage["01_normalize"] is True
    assert by_stage["04_scores"] is True
    got = sorted((r["uid"], r["cluster"]) for r in res.assignment.collect())
    assert got == result_rows


def test_resume_rebuilds_on_config_change(spark, tiny_spark, ckpt_dir):
    cfg = ERConfig(cc_max_iter=29)  # different signature
    res3 = run_pipeline(
        spark,
        tiny_spark["repos"],
        tiny_spark["synonym_dict"],
        labeled_pairs=None,
        checkpoint_dir=ckpt_dir,
        cfg=cfg,
    )
    assert not any(s["resumed"] for s in res3.stages)


def test_checkpoint_modes_agree(spark, tiny_spark):
    """'sync' (r2 behavior), 'async' (overlapped writes, the default) and
    'off' (EphemeralStore, no parquet) are physical strategies for the same
    pipeline — identical clustering and metrics."""
    from belb_spark.pipeline import ERConfig, run_pipeline

    outs = {}
    for mode in ["sync", "async", "off"]:
        res = run_pipeline(
            spark,
            tiny_spark["repos"],
            tiny_spark["synonym_dict"],
            tiny_spark["labeled_pairs"],
            cfg=ERConfig(checkpoint_mode=mode),
        )
        outs[mode] = {
            "f1": res.metrics["eval"]["all"]["f1"],
            "rows": res.metrics["rows_clustered"],
            "pairs": res.metrics["pairs_scored"],
            "assign": sorted(
                (r["uid"], r["cluster"]) for r in res.assignment.collect()
            ),
        }
    assert outs["sync"] == outs["async"] == outs["off"]


def test_bucketed_candidates_agree_and_reregister(spark, tiny_spark):
    """bucket_candidates=N writes 03_candidates as a CLUSTERED BY (h_a, h_b)
    table (the Iceberg bucket-partition twin): identical clustering/metrics
    to the plain-parquet run, and a resume in a session WITHOUT the catalog
    entry re-registers the table from the manifest's stored DDL."""
    d = tempfile.mkdtemp(prefix="belb_bucket_ckpt_")
    try:
        cfg = ERConfig(bucket_candidates=8)
        res = run_pipeline(
            spark,
            tiny_spark["repos"],
            tiny_spark["synonym_dict"],
            tiny_spark["labeled_pairs"],
            checkpoint_dir=d,
            cfg=cfg,
        )
        base = run_pipeline(
            spark,
            tiny_spark["repos"],
            tiny_spark["synonym_dict"],
            tiny_spark["labeled_pairs"],
        )
        assert res.metrics["eval"]["all"]["f1"] == base.metrics["eval"]["all"]["f1"]
        assert res.metrics["pairs_scored"] == base.metrics["pairs_scored"]
        got = sorted((r["uid"], r["cluster"]) for r in res.assignment.collect())
        want = sorted((r["uid"], r["cluster"]) for r in base.assignment.collect())
        assert got == want

        # the scan of the bucketed stage reports its bucket spec (this is
        # the property plain parquet loses): scoring's payload distinct and
        # join-back consume it with no exchange of the pair table
        from belb_spark.checkpoint import CheckpointStore

        store = CheckpointStore(spark, d)
        tbl = store._table_name("03_candidates")
        assert spark.catalog.tableExists(tbl)
        plan = (
            spark.table(tbl)
            .filter(F.col("src") == "block")
            .select("h_a", "h_b")
            .distinct()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in plan, plan  # distinct consumes the scan

        # fresh-session resume: no catalog entry, only files + manifest
        spark.sql(f"DROP TABLE {tbl}")
        res2 = run_pipeline(
            spark,
            tiny_spark["repos"],
            tiny_spark["synonym_dict"],
            labeled_pairs=None,
            checkpoint_dir=d,
            cfg=cfg,
        )
        assert all(s["resumed"] for s in res2.stages), res2.stages
        got2 = sorted((r["uid"], r["cluster"]) for r in res2.assignment.collect())
        assert got2 == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_reps_agree_and_dedup_without_exchange(spark, tiny_spark):
    """bucket_reps=N writes 01_normalize CLUSTERED BY (h): identical
    clustering to the plain run, and the scoring stage's payload-reps
    derivation — dropDuplicates(["h"]) on that table — needs NO exchange
    (the reps path is stage 04's dominant inter-executor transfer in
    multi-executor deployments; measured r5 standalone)."""
    d = tempfile.mkdtemp(prefix="belb_breps_ckpt_")
    try:
        res = run_pipeline(
            spark,
            tiny_spark["repos"],
            tiny_spark["synonym_dict"],
            tiny_spark["labeled_pairs"],
            checkpoint_dir=d,
            cfg=ERConfig(bucket_candidates=8, bucket_reps=8),
        )
        base = run_pipeline(
            spark,
            tiny_spark["repos"],
            tiny_spark["synonym_dict"],
            tiny_spark["labeled_pairs"],
        )
        assert res.metrics["eval"]["all"]["f1"] == base.metrics["eval"]["all"]["f1"]
        got = sorted((r["uid"], r["cluster"]) for r in res.assignment.collect())
        want = sorted((r["uid"], r["cluster"]) for r in base.assignment.collect())
        assert got == want

        from belb_spark.checkpoint import CheckpointStore

        store = CheckpointStore(spark, d)
        tbl = store._table_name("01_normalize")
        assert spark.catalog.tableExists(tbl)
        plan = (
            spark.table(tbl)
            .dropDuplicates(["h"])
            .select("h")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in plan, plan  # reps dedup consumes the scan
    finally:
        shutil.rmtree(d, ignore_errors=True)
