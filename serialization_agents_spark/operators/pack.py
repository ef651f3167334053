"""Token-budget shard packing — turn a curated corpus into training
shards of ~`budget` tokens each, in a deterministic shuffled order.

A pretraining pipeline's last batch step: documents are laid out in a
reproducible pseudo-random order (an md5 key, NOT corpus order — corpus
order correlates with crawl time/domain and would put correlated docs in
the same shard), the running token count is accumulated along that
order, and a document lands in shard `floor(tokens_before / budget)`.
Same shape as the reference's count-split enumeration pass
(/root/reference/lib/enumerate_agents.js:30-37) generalised to weighted
offsets.

Scale design (10^12 docs): a naive `sum() over (order by key)` global
window funnels the whole corpus through ONE task. Instead the same
two-phase scheme as operators/enumerate_ids.py: range-partition by the
shuffle key, per-partition weighted cumsum (parallel windows), a
driver-side O(num_partitions) cumsum of per-partition token totals, and
a broadcast join of the offsets. The only serial work is the tiny
offset fold; everything else is scan-speed Column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from serialization_agents_spark.functions.text import token_count


def pack_key(id_col, seed: str = "pack"):
    """Deterministic shuffle key: md5(seed:id) — reproducible across
    runs, partitionings, and executor counts (md5 so a DuckDB oracle
    replays the exact layout; swaps to xxhash64 at production scale
    like the MinHash prod flag)."""
    return F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")))


def shard_pack(
    docs: DataFrame,
    budget: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each doc to a training shard of ~`budget` tokens.

    Returns (doc_id, n_tokens, shard_id) where shard_id is
    floor(tokens_before_this_doc / budget) along the md5-shuffled
    order. Every count is integer, so the assignment is bit-exact and
    independent of partitioning (pinned by tests).
    """
    n = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        pack_key(F.col(id_col), seed).alias("_k"),
    )
    parted = base.repartitionByRange(n, F.col("_k")).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.localCheckpoint()  # pin partitioning; sums must match

    totals = (
        parted.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).orderBy("_pid").collect()
    )  # O(num_partitions) rows — the driver-side offset fold
    offsets, acc = {}, 0
    for row in totals:
        offsets[row["_pid"]] = acc
        acc += row["t"]
    offset_df = docs.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _offset LONG"
    )

    w = Window.partitionBy("_pid").orderBy("_k", "doc_id")
    cum = F.sum("n_tokens").over(w)  # inclusive per-partition cumsum
    return (
        parted.join(F.broadcast(offset_df), "_pid")
        .withColumn("_before", F.col("_offset") + cum - F.col("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("_before") / F.lit(int(budget))).cast("long").alias("shard_id"),
        )
    )


def shard_stats(packed: DataFrame) -> DataFrame:
    """Per-shard summary of a shard_pack assignment: (shard_id, n_docs,
    n_tokens). Every shard except the last holds >= budget - max_doc + 1
    and < budget + max_doc tokens by construction."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
