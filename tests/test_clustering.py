"""Connected components on hand-built graphs (SURVEY.md §5 strategy 3):
chains, stars, cycles, multiple components, singletons."""

from belb_spark.operators.clustering import connected_components


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "uid_a long, uid_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "uid long") if nodes else None
    rows = connected_components(e, n).collect()
    return {r["uid"]: r["cluster"] for r in rows}


def test_chain(spark):
    # 1-2-3-4-5 chain: min-label must propagate end to end (belb only did one
    # hop of history resolution; the fixpoint fixes that, SURVEY.md §2.4 J2)
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_star_and_cycle(spark):
    got = _cc(spark, [(10, 2), (10, 3), (10, 4), (5, 6), (6, 7), (7, 5)])
    assert got == {10: 2, 2: 2, 3: 2, 4: 2, 5: 5, 6: 5, 7: 5}


def test_two_components_and_singletons(spark):
    got = _cc(spark, [(1, 2), (3, 4)], nodes=[1, 2, 3, 4, 99])
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 99: 99}


def test_long_chain_log_rounds(spark):
    n = 64
    edges = [(i, i + 1) for i in range(1, n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == n


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 3)])
    assert got == {1: 1, 2: 1, 3: 1}
