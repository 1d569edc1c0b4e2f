"""End-to-end ER pipeline: normalize → block → pairs → score → cluster → eval.

The skeleton from SURVEY.md §7.2 step 2 — each stage is a pure
DataFrame→DataFrame function checkpointed through CheckpointStore, with the
sha256(content) invariant asserted after every stage that still carries
content (BASELINE.json north rule) and rows-processed / pairs-scored metrics
recorded per stage.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from belb_spark.checkpoint import CheckpointStore, config_signature, input_fingerprint
from belb_spark.operators.blocking import BlockingConfig, block_keys
from belb_spark.operators.clustering import connected_components
from belb_spark.operators.evaluate import metrics_dict, pairwise_metrics
from belb_spark.operators.normalize import normalize
from belb_spark.operators.pairs import (
    PairsConfig,
    candidate_pairs,
    exact_duplicate_edges,
    pair_stats,
)
from belb_spark.operators.scoring import ScoringConfig, edges_from_scores, score_pairs


@dataclass(frozen=True)
class ERConfig:
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    pairs: PairsConfig = field(default_factory=PairsConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    cc_max_iter: int = 30
    # tune the edge threshold on labeled dev pairs (belb split discipline)
    # instead of using scoring.threshold verbatim
    tune_on_dev: bool = False
    # physical strategy for the within-block self-join:
    # 'capped' = anchor-capped join; 'salted' = replicated-anchor salting
    # (same logical pair set — see operators/pairs.py)
    pairs_strategy: str = "capped"
    # explicit ingest partitioning (north rule): 0 = spark default
    # parallelism. A single-file local parquet source otherwise yields ONE
    # input split and serializes every expression-heavy stage.
    input_partitions: int = 0
    # stage-checkpoint mode:
    # 'sync' (default): build → write → read back, serial. This IS the mode
    #   the scaling evidence is collected in (BENCH/BASELINE.md): measured at
    #   xxl on one 16 GB heap, async's persisted builds compete with the
    #   scoring stage for cache and lose ~20% at BOTH parallelism levels
    #   (VERDICT r3 "What's wrong" #1) — the default follows the evidence.
    # 'async': stages 01-03 persist their build and write parquet on a
    #   background thread, overlapped with downstream compute; resume
    #   semantics unchanged (manifest only after a committed write). Wins
    #   below ~10^5 rows where the builds fit comfortably in cache.
    # 'off': EphemeralStore — no parquet at all (no resume); the wall delta
    #   vs 'sync' measures the checkpoint I/O share for the scaling report.
    checkpoint_mode: str = "sync"
    # Write the 03_candidates checkpoint as a bucketed table
    # (CLUSTERED BY (h_a, h_b) INTO n BUCKETS) instead of plain parquet.
    # One extra shuffle at the stage-03 write buys the scoring stage a pair
    # scan that already reports HashPartitioning(h_a, h_b): BOTH the payload
    # distinct and the final score join-back consume it with zero exchange
    # of the pair table — the two largest shuffles of stage 04 (measured in
    # score_stage_lab: carry_h_bucket beat carry_h ~8% at 16c and scaled
    # better N→4N). This is the sandbox twin of Iceberg bucket-partitioning
    # the pair table at prod scale. Sync checkpoint mode only. Pick n as the
    # stage-04 target parallelism (buckets are static once written).
    # None (default, r6 — VERDICT r5 #4) = auto: $BELB_ER_BUCKETS (48)
    # under sync mode — the configuration the r5 scaling evidence is built
    # on — and 0 (off) under async/off modes, where bucketed writes are
    # unsupported. An explicit int keeps the r5 behavior (incl. raising
    # when combined with async).
    bucket_candidates: int | None = None
    # Write the 01_normalize checkpoint CLUSTERED BY (h) INTO n BUCKETS.
    # The scoring stage derives its payload reps from this table with
    # dropDuplicates(["h"]) followed by two h-keyed joins: bucketed by h,
    # the distinct needs NO exchange and both payload joins reuse the
    # bucketing on the reps side — the reps path was the last full shuffle
    # of fat rows (norm_tokens ~0.5 kB/row) in stage 04, and in multi-
    # executor deployments it is the stage's dominant inter-executor
    # transfer (measured r5 standalone: stage-04 clean efficiency 0.63 vs
    # 0.75 in single-JVM local mode — the delta IS this shuffle). Costs one
    # exchange at the stage-01 write, identical at every cluster size.
    # None = auto, as for bucket_candidates.
    bucket_reps: int | None = None


# bump when a stage's checkpoint schema changes (columns added/removed/
# retyped): a resume against parquet written by another version must rebuild
# rather than fail mid-pipeline on a missing column. v2 = binary content key
# h in 01_normalize + pre-keyed h_a/h_b in 03_candidates (r4).
_STAGE_SCHEMA_VERSION = 2


@dataclass
class ERResult:
    assignment: DataFrame           # (uid, cluster)
    metrics: dict[str, Any]         # per-stage rows/pairs + eval f1 if labeled
    stages: list[dict[str, Any]]


def run_pipeline(
    spark: SparkSession,
    repos: DataFrame,
    synonym_dict: DataFrame | None = None,
    labeled_pairs: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    cfg: ERConfig = ERConfig(),
) -> ERResult:
    # resolve the 'auto' bucket defaults BEFORE the signature so resume
    # keys on the EFFECTIVE configuration (None -> 48 under sync, 0 under
    # async/off; see ERConfig)
    if cfg.bucket_candidates is None or cfg.bucket_reps is None:
        import os as _os

        auto = (
            int(_os.environ.get("BELB_ER_BUCKETS", "48"))
            if cfg.checkpoint_mode == "sync"
            else 0
        )
        cfg = dataclasses.replace(
            cfg,
            bucket_candidates=(
                auto if cfg.bucket_candidates is None else cfg.bucket_candidates
            ),
            bucket_reps=auto if cfg.bucket_reps is None else cfg.bucket_reps,
        )
    # the resume signature covers config, input identity AND the stage
    # schema version: re-running the same checkpoint_dir over changed input
    # (ADVICE r1) or across a stage-schema change (r4: candidates carry
    # binary h_a/h_b) rebuilds instead of reusing incompatible parquet
    sig = config_signature(
        {
            "cfg": dataclasses.asdict(cfg),
            "input": input_fingerprint(repos),
            "stage_schema": _STAGE_SCHEMA_VERSION,
        }
    )
    metrics: dict[str, Any] = {}

    if checkpoint_dir is None:
        import tempfile

        checkpoint_dir = tempfile.mkdtemp(prefix="belb_spark_ckpt_")
    if cfg.checkpoint_mode == "off":
        from belb_spark.checkpoint import EphemeralStore

        store = EphemeralStore(spark)
    else:
        store = CheckpointStore(spark, checkpoint_dir)

    # sha-invariant / QAQC count jobs run on a side thread, overlapped with
    # the next stage's compute instead of serializing the critical path
    from concurrent.futures import ThreadPoolExecutor

    checks = ThreadPoolExecutor(max_workers=2)
    # 'nothing outlives the call' must hold on the FAILURE path too: a
    # mid-pipeline exception (sha assert, stage build error) would otherwise
    # abandon in-flight async parquet writes and leak the persisted stage
    # builds + the checks pool into the rest of the Spark session (ADVICE
    # r3). finish()/shutdown() are idempotent, so the success path calling
    # them explicitly first is fine.
    try:
        result = _run_pipeline_body(
            spark, repos, labeled_pairs, checkpoint_dir, cfg, sig, metrics,
            store, checks, synonym_dict,
        )
    except BaseException:
        # abort path: cancel queued sha-count jobs (not just stop accepting
        # new ones) and never let a failed async write raised by finish()
        # mask the root-cause stage exception (ADVICE r4)
        checks.shutdown(wait=False, cancel_futures=True)
        try:
            store.finish()
        except Exception as cleanup_err:  # noqa: BLE001 - secondary error
            import warnings

            warnings.warn(
                f"checkpoint cleanup after pipeline abort failed: {cleanup_err!r}",
                RuntimeWarning,
                stacklevel=2,
            )
        raise
    checks.shutdown(wait=False)
    store.finish()
    return result


def _run_pipeline_body(
    spark, repos, labeled_pairs, checkpoint_dir, cfg, sig, metrics, store,
    checks, synonym_dict,
) -> ERResult:
    def run_stage(name, build, partition_by=None, bucket_by=None):
        if cfg.checkpoint_mode == "async":
            return store.run_async(
                name, sig, build, partition_by=partition_by, bucket_by=bucket_by
            )
        return store.run(
            name, sig, build, partition_by=partition_by, bucket_by=bucket_by
        )

    # explicit partitioning at ingest, before any expression-heavy stage.
    # 3 waves per core, matching shuffle partitions: a straggler split costs
    # 1/3 wave, and — decisive in async mode — every downstream stage reads
    # the PERSISTED build at this same partitioning (no parquet read-back to
    # re-split it), so cores×1 partitions would cap map-side parallelism of
    # stages 02-04 at one task per core
    n_part = cfg.input_partitions or 3 * spark.sparkContext.defaultParallelism
    repos_in = repos.repartition(n_part)
    # content lives ONLY here — uid-addressable for the sha checks. The 01
    # checkpoint stores (uid, content_sha, norm_tokens): content was ~half
    # its bytes and nothing downstream needs it (VERDICT r2 #1).
    from belb_spark.operators.normalize import assign_uids

    repos_uid = assign_uids(repos_in)

    # 1. normalize (content untouched; sha carried). norm_text/token_set are
    # derived again after read — cheap JVM expressions, not worth the bytes.
    # The content key h IS stored: scoring's slim shuffle needs it on three
    # branches (both pair sides + the payload reps), so computing the
    # md5(to_json(tokens)) here once beats re-deriving it 3× per run. Stored
    # as BINARY(16), not hex — it rides the block explode and the candidate
    # pair table (r4: pairs ship pre-keyed so the scoring stage loses both
    # uid→h translation shuffles), and 16 bytes beat 32-char strings on
    # every one of those shuffles.
    norm_res = run_stage(
        "01_normalize",
        lambda: normalize(repos_in, synonym_dict).select(
            "uid",
            "content_sha",
            "norm_tokens",
            F.unhex(F.md5(F.to_json("norm_tokens"))).alias("h"),
        ),
        bucket_by=(cfg.bucket_reps, ["h"]) if cfg.bucket_reps else None,
    )
    norm = norm_res.df.withColumn(
        "norm_text", F.array_join("norm_tokens", " ")
    ).withColumn("token_set", F.array_sort(F.array_distinct("norm_tokens")))
    metrics["rows_in"] = norm_res.rows

    def _sha_violations(df: DataFrame) -> int:
        joined = repos_uid.select("uid", "content").join(
            df.select("uid", "content_sha"), "uid"
        )
        return joined.filter(
            F.sha2(F.col("content"), 256) != F.col("content_sha")
        ).count()

    sha_stage1 = checks.submit(_sha_violations, norm)

    # 2. blocking keys — checkpointed. (Measured alternative at xxl: fusing
    # blocks into the candidates stage saved one stage floor but cost MORE
    # in the fused window tower — the compact parquet round-trip feeds the
    # self-join branches cheaper than re-flowing the live minhash, 52.5s vs
    # 45.8s for 02+03 at local[16]; keep the two-stage shape.)
    blocks_res = run_stage("02_blocks", lambda: block_keys(norm, cfg.blocking))
    blocks = blocks_res.df
    metrics["block_rows"] = blocks_res.rows

    # candidate pairs (+ exact-dup edges, logged drop stats).
    # One checkpoint for both pair families: block candidates (to be scored)
    # and ready exact-duplicate star edges (score 1.0 by construction).
    # The no-silent-caps accounting (emitted vs theoretical, max block,
    # block rows) rides the candidates action as a Spark Observation on the
    # capped path — zero extra jobs, zero re-evaluation of the live block-key
    # derivation. The salted path (evidence/experiments) keeps a side-thread
    # aggregate overlapped with the build.
    from pyspark.sql import Observation

    obs = Observation("pair_stats") if cfg.pairs_strategy != "salted" else None

    def build_candidates() -> DataFrame:
        if cfg.pairs_strategy == "salted":
            from belb_spark.operators.pairs import candidate_pairs_salted

            blk = candidate_pairs_salted(blocks, cfg.pairs)
        else:
            blk = candidate_pairs(blocks, cfg.pairs, observe=obs)
        blk = blk.withColumn("src", F.lit("block"))
        # exact rows are never scored — null content keys keep the union
        # schema aligned with the pre-keyed block pairs
        exact = (
            exact_duplicate_edges(norm)
            .withColumn("src", F.lit("exact"))
            .withColumn("h_a", F.lit(None).cast("binary"))
            .withColumn("h_b", F.lit(None).cast("binary"))
        )
        # a pair that is an exact duplicate needs no scoring — keep the
        # exact row, drop the block duplicate
        blk_only = blk.join(
            exact.select("uid_a", "uid_b"), ["uid_a", "uid_b"], "left_anti"
        )
        return blk_only.unionByName(exact)

    if obs is not None:
        # partitioned by src so per-family row counts come from the manifest
        # (parquet footers) when the write is synchronous
        cand_res = run_stage(
            "03_candidates",
            build_candidates,
            partition_by=["src"],
            bucket_by=(cfg.bucket_candidates, ["h_a", "h_b"])
            if cfg.bucket_candidates
            else None,
        )
        if cand_res.resumed:
            # the observation never fired (no action ran); the stats were
            # annotated into the manifest by the run that built the stage
            stats = store.log[-1].get("metrics") or {}
            if "theoretical" not in stats:  # pre-annotation checkpoint dir
                stats = pair_stats(blocks, cfg.pairs).agg(
                    F.sum("pairs_theoretical").alias("theoretical"),
                    F.sum("pairs_emitted").alias("emitted"),
                    F.max("block_size").alias("max_block"),
                ).collect()[0]
        else:
            stats = obs.get  # ready: the stage action has completed
            store.annotate("03_candidates", dict(stats))
    else:
        from concurrent.futures import ThreadPoolExecutor

        stats_df = pair_stats(blocks, cfg.pairs).agg(
            F.sum("pairs_theoretical").alias("theoretical"),
            F.sum("pairs_emitted").alias("emitted"),
            F.max("block_size").alias("max_block"),
        )
        with ThreadPoolExecutor(max_workers=1) as pool:
            stats_future = pool.submit(lambda: stats_df.collect()[0])
            cand_res = run_stage(
                "03_candidates",
                build_candidates,
                partition_by=["src"],
                bucket_by=(cfg.bucket_candidates, ["h_a", "h_b"])
                if cfg.bucket_candidates
                else None,
            )
        stats = stats_future.result()
    metrics["pairs_theoretical"] = int(stats["theoretical"] or 0)
    metrics["pairs_capped_estimate"] = int(stats["emitted"] or 0)
    metrics["max_block_size"] = int(stats["max_block"] or 0)

    exact_edges = cand_res.df.filter(F.col("src") == "exact").select("uid_a", "uid_b")
    # pre-keyed (h_a/h_b rode the self-join): score_pairs skips both uid→h
    # translation shuffles
    block_pairs = cand_res.df.filter(F.col("src") == "block").select(
        "uid_a", "uid_b", "h_a", "h_b"
    )
    if cand_res.partition_rows:
        n_exact = cand_res.partition_rows.get("src=exact", 0)
    else:  # async/ephemeral: one cheap count off the persisted build
        n_exact = exact_edges.count()
    metrics["exact_dup_edges"] = n_exact
    metrics["candidate_pairs"] = cand_res.rows - n_exact

    # 4. scoring (block candidates only). Join any in-flight background
    # stage writes FIRST: the scoring-stage wall defines the reported
    # pairs-scored/sec metric, and a parquet write overlapping it would
    # silently eat cores out of the measured stage. 01-03 writes still
    # overlap each other's downstream compute; the wait is recorded.
    metrics["ckpt_drain_sec"] = round(store.drain(), 3)
    scores_res = run_stage(
        "04_scores", lambda: score_pairs(block_pairs, norm, cfg.scoring)
    )
    metrics["pairs_scored"] = scores_res.rows
    metrics["scoring_wall_sec"] = scores_res.wall_sec

    threshold = cfg.scoring.threshold
    if cfg.tune_on_dev and labeled_pairs is not None:
        from belb_spark.operators.evaluate import tune_threshold

        threshold, dev_f1s = tune_threshold(scores_res.df, labeled_pairs, "dev")
        metrics["tuned_threshold"] = threshold
        metrics["dev_f1_at_tuned"] = dev_f1s[threshold]

    # 5. edges + connected components to fixpoint.
    # Exact-duplicate groups are pre-contracted to their anchor (they are
    # already star edges); CC runs on the contracted graph — typically far
    # smaller — then membership expands back through the anchor map.
    def build_assignment() -> DataFrame:
        scored_edges = edges_from_scores(scores_res.df, threshold)
        anchor_map = exact_edges.select(
            F.col("uid_b").alias("uid"), F.col("uid_a").alias("anchor")
        )
        node_anchor = (
            norm.select("uid")
            .join(anchor_map, "uid", "left")
            .select("uid", F.coalesce("anchor", F.col("uid")).alias("anchor"))
        )
        a_of = node_anchor.select(
            F.col("uid").alias("uid_a"), F.col("anchor").alias("anchor_a")
        )
        b_of = node_anchor.select(
            F.col("uid").alias("uid_b"), F.col("anchor").alias("anchor_b")
        )
        contracted = (
            scored_edges.join(a_of, "uid_a")
            .join(b_of, "uid_b")
            .select(
                F.least("anchor_a", "anchor_b").alias("uid_a"),
                F.greatest("anchor_a", "anchor_b").alias("uid_b"),
            )
            .filter(F.col("uid_a") != F.col("uid_b"))
        )
        anchors = node_anchor.select(F.col("anchor").alias("uid")).distinct()
        cc = connected_components(contracted, nodes=anchors, max_iter=cfg.cc_max_iter)
        return node_anchor.join(
            cc.withColumnRenamed("uid", "anchor"), "anchor"
        ).select("uid", "cluster")

    # 5 writes synchronously: its read-back df is the RETURNED assignment and
    # must stay valid after the persisted upstream builds are released
    assign_res = store.run("05_clusters", sig, build_assignment)
    assignment = assign_res.df
    metrics["rows_clustered"] = assign_res.rows
    assert assign_res.rows == norm_res.rows, "row conservation broken (FIXTURES §7.2)"

    # final sha invariant: source content joined back through the full
    # lineage (norm sha + assignment) and re-hashed
    sha_final = checks.submit(
        _sha_violations, norm.select("uid", "content_sha").join(assignment, "uid")
    )

    # 6. evaluation
    if labeled_pairs is not None:
        ev = pairwise_metrics(assignment, labeled_pairs)
        metrics["eval"] = metrics_dict(ev)

    # resolve the overlapped QAQC jobs, then join in-flight stage writes and
    # release every persisted build (nothing outlives the call)
    violations = sha_stage1.result()
    assert violations == 0, f"sha256 invariant broken in normalize: {violations}"
    violations = sha_final.result()
    assert violations == 0, f"sha256 invariant broken end-to-end: {violations}"
    checks.shutdown()
    store.finish()

    stage_log = store.metrics_table()
    (pathlib.Path(checkpoint_dir) / "metrics.json").write_text(
        json.dumps({"stages": stage_log, "metrics": metrics}, indent=2, default=str)
    )
    # metrics as a queryable table (Iceberg metrics table in prod)
    try:
        import pandas as _pd

        _pd.DataFrame(
            [
                {k: v for k, v in e.items() if not isinstance(v, (list, dict))}
                for e in stage_log
            ]
        ).to_parquet(pathlib.Path(checkpoint_dir) / "metrics.parquet", index=False)
    except Exception:
        pass  # metrics table is best-effort; metrics.json is authoritative
    return ERResult(assignment=assignment, metrics=metrics, stages=stage_log)
