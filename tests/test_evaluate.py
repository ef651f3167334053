"""Pair-counting ER metrics: hand-computed contingency, degenerate
clusterings, integer-exactness."""

from __future__ import annotations

from serialization_agents_spark.operators.evaluate import pairwise_cluster_metrics


def _items(spark, rows):
    return spark.createDataFrame(rows, "item long, gold string, pred string")


def test_pairwise_metrics_hand_computed(spark):
    # gold A = {0,1,2}, B = {3,4}; pred x = {0,1}, y = {2,3,4}
    # cells: (A,x)=2 (A,y)=1 (B,y)=2 -> TP = 1 + 0 + 1 = 2
    # gold_pairs = C(3,2)+C(2,2) = 4; pred_pairs = C(2,2)+C(3,2) = 4
    # precision = recall = 2/4 = 0.5; F1 = 4/8 = 0.5
    rows = [(0, "A", "x"), (1, "A", "x"), (2, "A", "y"),
            (3, "B", "y"), (4, "B", "y")]
    r = pairwise_cluster_metrics(_items(spark, rows), "gold", "pred").collect()[0]
    assert (r["n_items"], r["gold_pairs"], r["pred_pairs"], r["tp_pairs"]) == (5, 4, 4, 2)
    assert r["precision_e4"] == 5000 and r["recall_e4"] == 5000 and r["f1_e4"] == 5000


def test_pairwise_metrics_perfect_and_degenerate(spark):
    rows = [(i, f"g{i % 3}", f"g{i % 3}") for i in range(9)]
    r = pairwise_cluster_metrics(_items(spark, rows), "gold", "pred").collect()[0]
    assert r["precision_e4"] == r["recall_e4"] == r["f1_e4"] == 10000

    # singletons everywhere: no pairs anywhere -> NULL ratios, zero counts
    rows = [(i, f"g{i}", f"p{i}") for i in range(4)]
    r = pairwise_cluster_metrics(_items(spark, rows), "gold", "pred").collect()[0]
    assert r["gold_pairs"] == r["pred_pairs"] == r["tp_pairs"] == 0
    assert r["precision_e4"] is None and r["f1_e4"] is None

    # one giant pred cluster: recall 1, precision = gold_pairs/all_pairs
    rows = [(i, f"g{i % 2}", "all") for i in range(4)]  # gold 2+2, pred 4
    r = pairwise_cluster_metrics(_items(spark, rows), "gold", "pred").collect()[0]
    assert r["recall_e4"] == 10000
    assert r["precision_e4"] == round(2 / 6 * 10000)  # 3333
