"""Entity-resolution quality metrics as a first-class operator.

Pair-counting cluster evaluation (pairwise precision/recall/F1, the
standard ER/coreference metric family): a predicted clustering is
scored against a gold clustering by the item pairs they co-cluster.
With contingency counts n_ij = |gold_i ∩ pred_j| the whole evaluation
reduces to three integer aggregates over the (gold, pred) cell table:

    TP  = Σ_ij C(n_ij, 2)    pairs both clusterings co-cluster
    P   = Σ_j  C(n_·j, 2)    pairs the prediction co-clusters
    G   = Σ_i  C(n_i·, 2)    pairs the gold co-clusters

    precision = TP / P,  recall = TP / G,  F1 = 2·TP / (P + G)

Everything that crosses rows is exact BIGINT arithmetic (C(n,2) =
n(n-1) DIV 2), so the metric is bit-reproducible in any engine; the
three final ratios divide identical integers. No quadratic pair
materialization ever happens — the cell table is one hash agg over the
items (|cells| <= |entities|), and the marginals are two more aggs OVER
THE CELLS, not the items.

No reference analogue (the reference has no evaluation harness; its
test/utils.test.js golden fixtures play this role) — this is the
operator a KG-construction pipeline needs to regression-track linker
quality at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_cluster_metrics(
    items: DataFrame, gold_col: str, pred_col: str
) -> DataFrame:
    """ONE-row frame: (n_items, gold_pairs, pred_pairs, tp_pairs,
    precision_e4, recall_e4, f1_e4). Ratios are integer e4 units
    (round HALF_UP of tp*1e4/denominator); a zero denominator yields
    NULL for that ratio."""
    cells = (
        items.groupBy(
            F.col(gold_col).alias("g"), F.col(pred_col).alias("p")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # feeds tp + both marginals
    )
    pair = F.expr("n * (n - 1) DIV 2")
    tp = cells.agg(
        F.sum(pair).alias("tp_pairs"), F.sum("n").alias("n_items")
    )
    gold = (
        cells.groupBy("g").agg(F.sum("n").alias("n"))
        .agg(F.sum(pair).alias("gold_pairs"))
    )
    pred = (
        cells.groupBy("p").agg(F.sum("n").alias("n"))
        .agg(F.sum(pair).alias("pred_pairs"))
    )

    def e4(num: F.Column, den: F.Column) -> F.Column:
        return F.when(
            den > 0, F.round(num.cast("double") * 10000 / den).cast("long")
        )

    return (
        tp.crossJoin(F.broadcast(gold))
        .crossJoin(F.broadcast(pred))
        .select(
            "n_items", "gold_pairs", "pred_pairs", "tp_pairs",
            e4(F.col("tp_pairs"), F.col("pred_pairs")).alias("precision_e4"),
            e4(F.col("tp_pairs"), F.col("gold_pairs")).alias("recall_e4"),
            e4(
                F.col("tp_pairs") * 2,
                F.col("pred_pairs") + F.col("gold_pairs"),
            ).alias("f1_e4"),
        )
    )
