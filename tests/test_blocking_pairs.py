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
