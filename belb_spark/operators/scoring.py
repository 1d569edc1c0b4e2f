"""Stage 4 — pairwise scoring: JVM Jaccard prefilter → one pandas UDF.

Plan shape (what .explain should show): two shuffle joins of the slim
feature projection (uid, token_set, norm_text) onto the pair table — columns
projected *before* the join so the shuffle moves only what the scorer needs
(SURVEY.md §4 "project only needed columns before the UDF") — then a codegen
Jaccard filter, then the ArrowEvalPython node for survivors only.

Combined score = w_jacc·token_jaccard + (1-w_jacc)·rich(norm_text) where
rich = Jaro-Winkler + norm-Levenshtein + char-3gram cosine (simfns.py).
Edges = pairs with score ≥ threshold (threshold tuned on the dev split,
reported on test — belb split discipline, belb/corpora/parser.py:19-27).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from belb_spark.functions.simfns import make_rich_score_udf, token_jaccard


@dataclass(frozen=True)
class ScoringConfig:
    jaccard_prefilter: float = 0.35   # cheap JVM cut before Arrow transfer
    w_jacc: float = 0.5
    w_jw: float = 0.25
    w_lev: float = 0.35
    w_cos: float = 0.40
    clip_chars: int = 600
    threshold: float = 0.62           # final edge cut (dev-tuned)


def score_pairs(
    pairs: DataFrame, normalized: DataFrame, cfg: ScoringConfig = ScoringConfig()
) -> DataFrame:
    """(uid_a, uid_b) + normalized features -> (uid_a, uid_b, score)."""
    feats = normalized.select("uid", "token_set", "norm_text")
    a = feats.select(
        F.col("uid").alias("uid_a"),
        F.col("token_set").alias("ts_a"),
        F.col("norm_text").alias("nt_a"),
    )
    b = feats.select(
        F.col("uid").alias("uid_b"),
        F.col("token_set").alias("ts_b"),
        F.col("norm_text").alias("nt_b"),
    )
    joined = pairs.join(a, "uid_a").join(b, "uid_b")
    joined = joined.withColumn("jacc", token_jaccard("ts_a", "ts_b"))
    joined = joined.filter(F.col("jacc") >= F.lit(cfg.jaccard_prefilter))

    # payload dedup (VERDICT r1): near-dup corpora repeat normalized texts —
    # many candidate pairs carry the SAME (nt_a, nt_b) payload. Score each
    # distinct payload ONCE (keyed by md5 — 128-bit, collision-free at any
    # realistic scale) and hash-join the rich score back onto the slim pair
    # rows; the Arrow transfer and the kernels see only distinct payloads.
    keyed = joined.withColumn(
        "pk", F.md5(F.concat_ws("\u0000", "nt_a", "nt_b"))
    )
    spark = joined.sparkSession
    # spread the Python-UDF stage across all workers: AQE happily coalesces
    # the (byte-wise small) shuffle to 1-2 partitions, which would serialize
    # the CPU-bound scorer. 3 waves per core: a straggler partition costs
    # 1/3 wave, not a full one.
    payloads = (
        keyed.select("pk", "nt_a", "nt_b")
        .dropDuplicates(["pk"])
        .repartition(3 * spark.sparkContext.defaultParallelism)
    )
    rich = make_rich_score_udf(cfg.w_jw, cfg.w_lev, cfg.w_cos, cfg.clip_chars)
    payload_scores = payloads.select(
        "pk", rich(F.col("nt_a"), F.col("nt_b")).alias("rich")
    )
    scored = keyed.select("uid_a", "uid_b", "jacc", "pk").join(
        payload_scores, "pk"
    ).withColumn(
        "score", F.col("jacc") * cfg.w_jacc + F.col("rich") * (1.0 - cfg.w_jacc)
    )
    return scored.select("uid_a", "uid_b", "score")


def edges_from_scores(scored: DataFrame, threshold: float) -> DataFrame:
    return scored.filter(F.col("score") >= F.lit(threshold)).select("uid_a", "uid_b")
