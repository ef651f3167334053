"""Fixed-point PageRank: hand-computed 3-iteration values on a small
graph, the rank-conservation fixed point on a cycle, determinism under
repartitioning, and multi-edge dedup."""

from __future__ import annotations

from serialization_agents_spark.operators.graph import BASE, SCALE, pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_fixed_point(spark):
    """a<->b: every node keeps rank == SCALE forever (BASE + 17/20 of a
    full SCALE contribution is SCALE again) — the conservation
    invariant of the damping arithmetic."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    for iters in (1, 4):
        got = _ranks(pagerank(e, iterations=iters, checkpoint=False))
        assert got == {"a": SCALE, "b": SCALE}
        assert BASE + SCALE * 17 // 20 == SCALE


def test_star_three_iterations_hand_computed(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "src string, dst string"
    )
    assert _ranks(pagerank(e, iterations=3, checkpoint=False)) == {
        "a": 638750,
        "b": 421468,
        "c": 421468,
    }


def test_duplicate_edges_are_deduped(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    dup = _ranks(pagerank(e, iterations=2, checkpoint=False))
    clean = _ranks(
        pagerank(
            spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string"),
            iterations=2,
            checkpoint=False,
        )
    )
    assert dup == clean


def test_partitioning_invariance(spark):
    rows = [(i % 11, (i * 3 + 1) % 11) for i in range(60)]
    e = spark.createDataFrame(rows, "src long, dst long")
    a = _ranks(pagerank(e.repartition(7), iterations=3))
    b = _ranks(pagerank(e.coalesce(1), iterations=3, checkpoint=False))
    assert a == b
