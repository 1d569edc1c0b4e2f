"""Stage 6 — evaluation: pairwise P/R/F1 against labeled pairs.

Mirrors belb's split discipline (train/dev/test frozen membership,
belb/corpora/parser.py:19-27, belb/metadata/*/splits.json) and its
zero-shot slicing idea (belb/scripts/get_mentions_subsets.py:82-108).

A labeled pair (uid_a, uid_b) is predicted "match" iff both uids landed in
the same final cluster — evaluation is on the *clustering*, not on raw edge
scores, so transitive merges count (and wrong transitive merges hurt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_metrics(
    assignment: DataFrame, labeled_pairs: DataFrame
) -> DataFrame:
    """assignment(uid, cluster) × labeled(uid_a, uid_b, is_match, split)
    -> per-split precision/recall/f1 (+ overall row, split='all')."""
    a = assignment.select(
        F.col("uid").alias("uid_a"), F.col("cluster").alias("cluster_a")
    )
    b = assignment.select(
        F.col("uid").alias("uid_b"), F.col("cluster").alias("cluster_b")
    )
    joined = (
        labeled_pairs.join(a, "uid_a")
        .join(b, "uid_b")
        .withColumn("pred", F.col("cluster_a") == F.col("cluster_b"))
    )
    with_all = joined.withColumn("split", F.lit("all")).unionByName(joined)
    agg = with_all.groupBy("split").agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(1.0))
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(1.0))
    out = agg.withColumn("precision", p).withColumn("recall", r)
    return out.withColumn(
        "f1",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def tune_threshold(
    scored: DataFrame,
    labeled_pairs: DataFrame,
    split: str = "dev",
    grid: list[float] | None = None,
) -> tuple[float, dict[float, float]]:
    """Pick the edge threshold by pairwise F1 on the dev split (belb split
    discipline: tune on dev, report on test — belb/corpora/parser.py:19-27).

    Evaluates the whole grid in ONE aggregation pass: each labeled dev pair
    is joined to its score once, then per-threshold tp/fp/fn are computed as
    conditional sums — no per-threshold jobs, no driver-side loops over data.

    Note this tunes the *edge* cut, while final evaluation is on clusters
    (transitivity can only merge more) — so the tuned value is a lower-bound
    style choice: the highest-F1 threshold, ties broken upward (precision-
    safe for the clustering step).
    """
    if grid is None:
        grid = [round(0.30 + 0.02 * i, 2) for i in range(31)]  # 0.30..0.90
    lp = labeled_pairs.filter(F.col("split") == split).select(
        "uid_a", "uid_b", "is_match"
    )
    joined = lp.join(scored, ["uid_a", "uid_b"], "left").select(
        "is_match", F.coalesce("score", F.lit(-1.0)).alias("score")
    )
    aggs = []
    for i, t in enumerate(grid):
        pred = F.col("score") >= F.lit(t)
        aggs.append(F.sum(F.when(pred & F.col("is_match"), 1).otherwise(0)).alias(f"tp{i}"))
        aggs.append(F.sum(F.when(pred & ~F.col("is_match"), 1).otherwise(0)).alias(f"fp{i}"))
        aggs.append(F.sum(F.when(~pred & F.col("is_match"), 1).otherwise(0)).alias(f"fn{i}"))
    row = joined.agg(*aggs).collect()[0]
    f1s: dict[float, float] = {}
    for i, t in enumerate(grid):
        tp, fp, fn = row[f"tp{i}"] or 0, row[f"fp{i}"] or 0, row[f"fn{i}"] or 0
        p = tp / (tp + fp) if tp + fp else 1.0
        r = tp / (tp + fn) if tp + fn else 1.0
        f1s[t] = 2 * p * r / (p + r) if p + r else 0.0
    best_f1 = max(f1s.values())
    best_t = max(t for t, v in f1s.items() if v >= best_f1 - 1e-12)
    return best_t, f1s


def metrics_dict(metrics_df: DataFrame) -> dict[str, dict[str, float]]:
    return {
        row["split"]: {
            "precision": float(row["precision"]),
            "recall": float(row["recall"]),
            "f1": float(row["f1"]),
            "n_pairs": int(row["n_pairs"]),
            "tp": int(row["tp"]),
            "fp": int(row["fp"]),
            "fn": int(row["fn"]),
        }
        for row in metrics_df.collect()
    }


def assign_splits(
    df: DataFrame, splits: DataFrame, key: str, default: str = "train"
) -> DataFrame:
    """J9 splits assignment (reference belb/corpora/parser.py:19-27 and
    belb/metadata/*/splits.json): attach frozen split membership to each
    row by ``key``; rows absent from the splits table get ``default``
    (belb treats unlisted documents as train). The splits table is
    metadata-sized next to the corpus, so the join broadcasts — no
    shuffle of ``df`` at any scale."""
    s = F.broadcast(splits.select(key, "split"))
    return df.join(s, key, "left").withColumn(
        "split", F.coalesce(F.col("split"), F.lit(default))
    )


def zero_shot_slice(train, test, key: str):
    """A14 zero-shot evaluation slice (belb/scripts/get_mentions_subsets.py:
    82-108): test rows whose ``key`` value never appears in the train split
    — one broadcast-able left_anti join against the distinct train keys
    (the train key set is dictionary-sized next to the corpus)."""
    return test.join(train.select(key).distinct(), key, "left_anti")
