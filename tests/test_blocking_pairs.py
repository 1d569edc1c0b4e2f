import pytest
from pyspark.sql import functions as F

from belb_spark.operators.blocking import BlockingConfig, block_keys
from belb_spark.operators.normalize import normalize
from belb_spark.operators.pairs import (
    PairsConfig,
    candidate_pairs,
    exact_duplicate_edges,
    pair_stats,
)


@pytest.fixture(scope="module")
def norm(tiny_spark):
    return normalize(tiny_spark["repos"], tiny_spark["synonym_dict"]).cache()


@pytest.fixture(scope="module")
def blocks(norm):
    return block_keys(norm, BlockingConfig()).cache()


def test_block_keys_deterministic(norm):
    a = block_keys(norm, BlockingConfig())
    b = block_keys(norm, BlockingConfig())
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_key_families_present(blocks):
    fams = {
        r["fam"]
        for r in blocks.select(
            F.split("block_key", ":").getItem(0).alias("fam")
        ).distinct().collect()
    }
    assert "exact" in fams and "pfx" in fams
    assert any(f.startswith("mh") for f in fams)


def test_positive_pairs_covered_by_blocking(blocks, tiny_spark):
    """Every labeled positive pair must share at least one blocking key
    (recall precondition for F1 — SURVEY.md §7.2 step 4)."""
    lp = tiny_spark["labeled_pairs"].filter("is_match").select("uid_a", "uid_b")
    a = blocks.select(F.col("uid").alias("uid_a"), "block_key")
    b = blocks.select(F.col("uid").alias("uid_b"), "block_key")
    covered = lp.join(a, "uid_a").join(b, ["uid_b", "block_key"]).select("uid_a", "uid_b").distinct()
    n_lp = lp.count()
    n_cov = covered.count()
    assert n_cov == n_lp, f"blocking lost {n_lp - n_cov} positive pairs"


def test_candidate_pairs_unique_ordered(blocks):
    pairs = candidate_pairs(blocks, PairsConfig())
    assert pairs.filter(F.col("uid_a") >= F.col("uid_b")).count() == 0
    assert pairs.count() == pairs.distinct().count()


def test_anchor_cap_bounds_hot_blocks(blocks):
    """Pairs from a block of size n are ≤ full pairing, and for hot blocks
    ≈ anchor_rank · n (no quadratic blowup)."""
    cfg = PairsConfig(full_join_max=16, anchor_rank=4)
    stats = pair_stats(blocks, cfg)
    hot = stats.filter(F.col("block_size") > 16).collect()
    assert hot, "fixture should contain hot blocks"
    for r in hot:
        assert r["pairs_emitted"] <= 4 * (r["block_size"] - 1)
        assert r["pairs_emitted"] < r["pairs_theoretical"]


def test_salted_strategy_emits_same_pairs(blocks):
    """candidate_pairs_salted is a physical variant (replicated-anchor
    salting) of the anchor-capped join — identical logical pair set."""
    from belb_spark.operators.pairs import candidate_pairs_salted

    cfg = PairsConfig(full_join_max=16, anchor_rank=4)
    plain = candidate_pairs(blocks, cfg)
    salted = candidate_pairs_salted(blocks, cfg, rows_per_salt=8)
    assert salted.filter(F.col("uid_a") >= F.col("uid_b")).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_exact_duplicate_edges_star_shape(norm):
    edges = exact_duplicate_edges(norm)
    assert edges.filter(F.col("uid_a") >= F.col("uid_b")).count() == 0
    # anchor is the min uid of its dup group: anchors never appear as uid_b
    a_set = {r["uid_a"] for r in edges.select("uid_a").distinct().collect()}
    b_set = {r["uid_b"] for r in edges.select("uid_b").distinct().collect()}
    assert not (a_set & b_set)


def test_within_salt_hot_tier_recovers_member_pairs(spark):
    """VERDICT r3 'What's wrong' #3: hot_tier='within_salt' additionally
    emits every pair inside each salt bucket (recall for standalone dedup)
    while each reducer group stays bounded by ~rows_per_salt."""
    import pandas as pd

    from belb_spark.operators.pairs import (
        PairsConfig,
        candidate_pairs_salted,
        salt_distribution,
    )

    # one hot block of 120 rows + one small block of 5
    rows = [(i, "hot") for i in range(120)] + [(1000 + i, "cold") for i in range(5)]
    blocks = spark.createDataFrame(pd.DataFrame(rows, columns=["uid", "block_key"]))
    cfg = PairsConfig(full_join_max=8, anchor_rank=2)

    anchor = candidate_pairs_salted(blocks, cfg, rows_per_salt=16)
    within = candidate_pairs_salted(blocks, cfg, rows_per_salt=16, hot_tier="within_salt")

    a_set = {(r["uid_a"], r["uid_b"]) for r in anchor.collect()}
    w_set = {(r["uid_a"], r["uid_b"]) for r in within.collect()}
    assert a_set <= w_set
    assert len(w_set) > len(a_set)  # member-member pairs recovered

    # expected recovered pairs: all pairs within each (block_key, salt)
    # bucket of the hot tier. Salts recomputed HERE from the raw documented
    # rule (pmod(xxhash64(uid), ceil(bn/rows_per_salt))) — independent of
    # the _salted_hot_members helper under test
    n_salts = -(-120 // 16)  # ceil(bn / rows_per_salt) for the hot block
    salted = blocks.filter(F.col("block_key") == "hot").select(
        "uid",
        "block_key",
        F.pmod(F.xxhash64("uid"), F.lit(n_salts)).cast("int").alias("salt"),
    )
    buckets = {}
    for r in salted.collect():
        buckets.setdefault((r["block_key"], r["salt"]), []).append(r["uid"])
    expected_within = set()
    for uids in buckets.values():
        us = sorted(uids)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                expected_within.add((us[i], us[j]))
    assert expected_within <= w_set
    assert w_set == a_set | expected_within

    # the bound still holds: no reducer group materially over rows_per_salt
    dist = salt_distribution(blocks, cfg, rows_per_salt=16)
    assert dist.agg(F.max("members")).collect()[0][0] <= 2 * 16
