"""Per-partition lineage/metrics — the Spark re-imagining of the
reference's IPC progress counters + Slack crier + `db.logError` rows
(/root/reference/lib/shadowcat_serialize_viaf_agents.js:63-77,
lib/utils.js:238).

Every stage that materializes writes LINEAGE_METRICS rows — (run_id,
stage, partition_id, row_count, key_checksum) — alongside its output.
`key_checksum = bit_xor(xxhash64(key))` is order-independent (and
overflow-free under ANSI arithmetic), so two runs
(or a resumed run) producing the same rows produce the same checksum
regardless of partitioning. This is what makes resume-from-checkpoint
verifiable rather than hopeful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_metrics(df: DataFrame, run_id: str, stage: str, key_col: str) -> DataFrame:
    """Compute LINEAGE_METRICS rows for a materialized stage output."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.bit_xor(F.xxhash64(key_col)).alias("key_checksum"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            "row_count",
            "key_checksum",
        )
    )


def global_checksum(df: DataFrame, key_col: str) -> tuple[int, int]:
    """(row_count, order-independent checksum) — for idempotence tests."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64(key_col)).alias("c")
    ).collect()[0]
    return row["n"], row["c"] or 0
