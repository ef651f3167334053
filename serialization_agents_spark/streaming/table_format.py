"""Table-format abstraction for the incremental agents fold.

`fold_batch_into_agents` needs four durability primitives: a replay
marker (last applied batch id), pruned reads of the buckets a batch
touches, crash-consistent staging, and an atomic-enough partition swap.
On the sandbox's local filesystem those are rename/marker tricks
(`ParquetBucketTable`); on object storage renames are neither atomic nor
cheap, so a real deployment uses a lakehouse table format where the
whole fold collapses into ONE `MERGE INTO` with the fold algebra as
update expressions (`LakehouseAgentsTable`). The streaming driver code
is identical either way — only the table object changes.

Reference parity: this is the durable-store boundary the reference
crosses via serialized MongoDB upserts with unique indexes
(/root/reference/lib/utils.js:216-266); the fold algebra itself lives in
incremental.incremental_merge_batch.
"""

from __future__ import annotations

import os
import shutil
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 64


def bucket_expr(col: str = "entity_key") -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


class AgentsTable(ABC):
    """Durability contract of the incremental fold (exactly-once via
    replay marker + staged writes; O(touched buckets) I/O per batch)."""

    @abstractmethod
    def last_batch_id(self) -> int: ...

    @abstractmethod
    def commit_batch_id(self, batch_id: int) -> None: ...

    @abstractmethod
    def exists(self) -> bool: ...

    @abstractmethod
    def read_buckets(self, spark: SparkSession, buckets: list[int]) -> DataFrame: ...

    @abstractmethod
    def staging_complete(self, batch_id: int) -> bool: ...

    @abstractmethod
    def write_staging(self, folded: DataFrame, batch_id: int) -> None: ...

    @abstractmethod
    def swap_staging(self, spark: SparkSession, batch_id: int) -> None: ...

    @abstractmethod
    def drop_staging(self, batch_id: int) -> None: ...


class ParquetBucketTable(AgentsTable):
    """Local-filesystem implementation: a `bucket=` hash-partitioned
    parquet table, batch-id-keyed staging directories, and an
    atomic-rename marker file. Correct on POSIX filesystems; the marker
    rename and the dynamic-partition-overwrite swap are NOT atomic on
    object stores — use LakehouseAgentsTable there."""

    def __init__(self, agents_dir: str):
        self.agents_dir = agents_dir

    # -- replay marker ----------------------------------------------------
    def last_batch_id(self) -> int:
        path = os.path.join(self.agents_dir, "_last_batch")
        if not os.path.exists(path):
            return -1
        with open(path) as fh:
            return int(fh.read().strip())

    def commit_batch_id(self, batch_id: int) -> None:
        os.makedirs(self.agents_dir, exist_ok=True)
        tmp = os.path.join(self.agents_dir, "_last_batch.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(self.agents_dir, "_last_batch"))

    # -- pruned reads -----------------------------------------------------
    def exists(self) -> bool:
        # dynamic partition overwrite leaves NO root _SUCCESS; the table
        # exists iff bucket= partition dirs do
        return os.path.isdir(self.agents_dir) and any(
            e.startswith("bucket=") for e in os.listdir(self.agents_dir)
        )

    def read_buckets(self, spark: SparkSession, buckets: list[int]) -> DataFrame:
        return (
            spark.read.parquet(self.agents_dir)
            .where(F.col("bucket").isin(buckets))
            .drop("bucket")
        )

    # -- staging + swap ---------------------------------------------------
    def _staging(self, batch_id: int) -> str:
        return os.path.join(self.agents_dir + ".staging", f"b{batch_id}")

    def staging_complete(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self._staging(batch_id), "_SUCCESS"))

    def write_staging(self, folded: DataFrame, batch_id: int) -> None:
        folded.withColumn("bucket", bucket_expr()).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(self._staging(batch_id))

    def swap_staging(self, spark: SparkSession, batch_id: int) -> None:
        # dynamic partition overwrite replaces ONLY the staged buckets
        (
            spark.read.parquet(self._staging(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(self.agents_dir)
        )

    def drop_staging(self, batch_id: int) -> None:
        shutil.rmtree(os.path.dirname(self._staging(batch_id)), ignore_errors=True)


# fold rules per column family (must mirror incremental_merge_batch):
_MERGE_SET_COLS = [
    "viaf", "name_normalized", "alt_forms", "fast", "viaf_merged", "merge_source",
]
_MERGE_SCALAR_COLS = [
    "wikidata", "lc_id", "ulan", "dbpedia", "birth", "death", "type",
]


def merge_into_sql(target: str, source: str) -> str:
    """The entire per-batch fold as ONE ANSI `MERGE INTO` (Iceberg/Delta
    execute this atomically — no marker files, no staging swap; replay
    safety comes from the sink's idempotent-commit ledger keyed by
    epoch/batch id). Update expressions are the SAME algebra as
    incremental_merge_batch: arrays union (capped + sorted), scalars
    existing-wins-then-backfill, counters add, the controlled name folds
    through its carried priority rank.
    """
    set_updates = ",\n  ".join(
        f"{c} = slice(array_sort(array_distinct(concat(t.{c}, s.{c}))), 1, 256)"
        for c in _MERGE_SET_COLS
    )
    scalar_updates = ",\n  ".join(
        f"{c} = coalesce(t.{c}, s.{c})" for c in _MERGE_SCALAR_COLS
    )
    return f"""
MERGE INTO {target} t
USING {source} s
ON t.entity_key = s.entity_key
WHEN MATCHED THEN UPDATE SET
  registry_id = coalesce(t.registry_id, s.registry_id),
  is_controlled = t.is_controlled OR s.is_controlled,
  name_controlled = CASE WHEN coalesce(s.name_pref_rank, 3) < coalesce(t.name_pref_rank, 3)
                         THEN s.name_controlled ELSE t.name_controlled END,
  name_pref_rank = least(coalesce(t.name_pref_rank, 3), coalesce(s.name_pref_rank, 3)),
  primary_source = CASE WHEN s.source_priority < t.source_priority
                        THEN s.primary_source ELSE t.primary_source END,
  {scalar_updates},
  {set_updates},
  mention_count = t.mention_count + s.mention_count,
  source_priority = least(t.source_priority, s.source_priority)
WHEN NOT MATCHED THEN INSERT *
"""


class LakehouseAgentsTable(AgentsTable):
    """MERGE INTO shim for a v2 catalog table (Iceberg/Delta). The fold
    becomes a single atomic statement; markers/staging are no-ops because
    the table format's snapshot commit IS the transaction. Batch-replay
    idempotence keys off a `_batch_ledger` companion table (object-store
    safe — appends only, no renames).

    This container has no lakehouse catalog, so `fold` raises unless the
    session has one configured; `merge_into_sql` (module level) is the
    tested artifact.
    """

    def __init__(self, table_name: str, ledger_table: str | None = None):
        self.table_name = table_name
        self.ledger_table = ledger_table or f"{table_name}_batch_ledger"

    def fold(self, spark: SparkSession, batch_agents: DataFrame, batch_id: int) -> bool:
        if self.last_batch_id_spark(spark) >= batch_id:
            return False
        batch_agents.createOrReplaceTempView("_batch_agents")
        spark.sql(merge_into_sql(self.table_name, "_batch_agents"))
        spark.sql(
            f"INSERT INTO {self.ledger_table} VALUES ({batch_id})"
        )
        return True

    def last_batch_id_spark(self, spark: SparkSession) -> int:
        row = spark.sql(
            f"SELECT max(batch_id) AS m FROM {self.ledger_table}"
        ).first()
        return -1 if row is None or row["m"] is None else int(row["m"])

    # AgentsTable surface: delegated to the catalog's transaction — the
    # parquet-era primitives degenerate to no-ops / catalog queries.
    def last_batch_id(self) -> int:  # pragma: no cover - needs a catalog
        raise NotImplementedError("use last_batch_id_spark(spark)")

    def commit_batch_id(self, batch_id: int) -> None:
        pass  # the MERGE snapshot commit + ledger row are the marker

    def exists(self) -> bool:  # pragma: no cover - needs a catalog
        raise NotImplementedError("catalog tables are created up front")

    def read_buckets(self, spark: SparkSession, buckets: list[int]) -> DataFrame:
        return spark.table(self.table_name)  # format prunes via its index

    def staging_complete(self, batch_id: int) -> bool:
        return False

    def write_staging(self, folded: DataFrame, batch_id: int) -> None:
        pass

    def swap_staging(self, spark: SparkSession, batch_id: int) -> None:
        pass

    def drop_staging(self, batch_id: int) -> None:
        pass
