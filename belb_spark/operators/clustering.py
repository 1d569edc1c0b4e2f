"""Stage 5 — transitive clustering: large-star/small-star connected components.

Iterative alternating join + min-aggregation to fixpoint (north rule), after
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14) —
converges in O(log n) rounds vs O(diameter) for plain label propagation.

This generalizes belb's two one-hop merge mechanisms to a true fixpoint:
- identifier history resolution (one hop + manual patches in the reference,
  belb/kbs/kb.py:455-486, belb/utils/__init__.py:100-114),
- identical-synset merge head-selection (belb/kbs/query.py:97-194) where the
  min identifier becomes canonical — here: cluster id = min(uid) of the
  component (FIXTURES.md invariant 4).

Scale notes: every round is two shuffles (groupBy u, join back); lineage is
truncated per round with a reliable checkpoint (on a cluster this lands in
the checkpoint dir on shared storage — the Iceberg scratch area). Reliable
beats localCheckpoint here: localCheckpoint persists each round's RDD in
executor storage and the final result pins the last one forever (an
unbounded leak across repeated calls), while checkpoint files are reclaimed
with their RDDs (spark.cleaner.referenceTracking.cleanCheckpoints).
Convergence is detected with an O(1)-row aggregate (count +
order-independent xxhash64 checksum), not a full set compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from belb_spark.session import ensure_checkpoint_dir


def _canon(edges: DataFrame) -> DataFrame:
    """Orient (u, v) with u > v, drop self-loops, dedupe."""
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    return e.filter(F.col("u") != F.col("v")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("minv"))
    m = m.select("u", F.least(F.col("minv"), F.col("u")).alias("mn"))
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    return _canon(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """For each u over its smaller neighbors N(u): connect N(u) ∪ {u} to
    min(N(u))."""
    e = _canon(edges)  # u > v for every row
    m = e.groupBy("u").agg(F.min("v").alias("mn"))
    via_nbrs = (
        e.join(m, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    self_edge = m.select("u", F.col("mn").alias("v"))
    return _canon(via_nbrs.union(self_edge))


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # order-independent, overflow-free (ANSI-safe) checksum of the edge set
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 30,
) -> DataFrame:
    """edges(uid_a, uid_b) [+ nodes(uid)] -> (uid, cluster), cluster=min(uid)
    of the component; singletons (nodes without edges) map to themselves."""
    ensure_checkpoint_dir(edges.sparkSession)
    e = _canon(
        edges.select(F.col("uid_a").alias("u"), F.col("uid_b").alias("v"))
    ).checkpoint(eager=True)

    prev_fp = None
    for it in range(max_iter):
        e = _small_star(_large_star(e))
        # extra rounds are idempotent once converged — checkpointing AND
        # convergence-checking every 2nd round halves both the disk
        # round-trips and the driver-side jobs (two rounds of lineage
        # materialize in one job; at 4N the per-job scheduling floor was the
        # clusters stage's scaling cap)
        if it % 2 == 1 or it == max_iter - 1:
            e = e.checkpoint(eager=True)
            fp = _fingerprint(e)
            if fp == prev_fp:
                break
            prev_fp = fp

    # converged: e is a star forest (member u -> root v)
    labels = e.select(F.col("u").alias("uid"), F.col("v").alias("cluster")).union(
        e.select(F.col("v").alias("uid"), F.col("v").alias("cluster"))
    ).distinct()

    if nodes is None:
        return labels
    return (
        nodes.select("uid")
        .join(labels, "uid", "left")
        .select("uid", F.coalesce("cluster", "uid").alias("cluster"))
    )
