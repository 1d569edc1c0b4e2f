"""score_pairs content-hash keying (ADVICE r2).

The slim scoring shuffle keys payloads by a content hash and scores one
representative per distinct key. The key must be the TOKEN SEQUENCE, not its
space-join: a canonical dictionary symbol containing whitespace makes two
different tokenizations share norm_text — under the old md5(norm_text) key
one of them was silently scored with the other's token_set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from belb_spark.operators.scoring import ScoringConfig, score_pairs


def test_whitespace_symbols_not_conflated(spark):
    # rows 1 and 2 share norm_text "a b c" but have DIFFERENT token sets
    # (multi-word canonical symbols); row 3 is identical to row 1
    rows = [
        (1, ["a b", "c"]),
        (2, ["a", "b c"]),
        (3, ["a b", "c"]),
    ]
    normalized = (
        spark.createDataFrame(rows, "uid long, norm_tokens array<string>")
        .withColumn("norm_text", F.array_join("norm_tokens", " "))
        .withColumn("token_set", F.array_sort(F.array_distinct("norm_tokens")))
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "uid_a long, uid_b long"
    )
    scored = {
        (r["uid_a"], r["uid_b"]): r["score"]
        for r in score_pairs(pairs, normalized, ScoringConfig()).collect()
    }
    # identical token sequences: jaccard 1.0, full score
    assert (1, 3) in scored and scored[(1, 3)] > 0.9
    # disjoint token SETS despite identical norm_text: fails the jaccard
    # prefilter — must NOT inherit row 1's payload through a shared hash
    assert (1, 2) not in scored


def test_hash_joins_equivalent_and_in_plan(spark):
    """hash_joins=True swaps SMJ for shuffled-hash on the pair-table joins
    without changing a single score (pure physical-strategy hint)."""
    rows = [(i, [f"t{i % 7}", f"t{(i * 3) % 11}", "common"]) for i in range(40)]
    normalized = (
        spark.createDataFrame(rows, "uid long, norm_tokens array<string>")
        .withColumn("norm_text", F.array_join("norm_tokens", " "))
        .withColumn("token_set", F.array_sort(F.array_distinct("norm_tokens")))
    )
    pairs = spark.createDataFrame(
        [(i, (i + 1) % 40) for i in range(40)], "uid_a long, uid_b long"
    )
    base = score_pairs(pairs, normalized, ScoringConfig())
    hashed = score_pairs(pairs, normalized, ScoringConfig(hash_joins=True))
    plan = hashed._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    key = lambda r: (r["uid_a"], r["uid_b"])
    b = {key(r): round(r["score"], 9) for r in base.collect()}
    h = {key(r): round(r["score"], 9) for r in hashed.collect()}
    assert b == h and len(b) > 0
