"""Incremental KG maintenance via Structured Streaming micro-batches.

Why this is correct without reprocessing history: the batch engine
replaced the reference's ORDER-DEPENDENT upserts with a commutative,
associative merge algebra (operators/merge.py, SURVEY.md §4.3). A
commutative fold can be applied incrementally: for each micro-batch,

    1. detect + link the new pages' mentions (dimension joins only),
    2. merge them into per-entity partial rows (same salted aggregation),
    3. fold partials into the persisted agents table keyed by entity_key
       — the same second-phase aggregation the batch job uses between
       salt buckets, so batch(all) == fold(batches) by construction.

The fold is a BUCKETED partial rewrite (`fold_batch_into_agents`): the
agents table is hash-partitioned on entity_key and each micro-batch
rewrites only the buckets its keys touch — O(batch) work per batch, not
O(|agents|) — with a persisted last-batch marker + batch-keyed staging
for replay safety. The durability primitives (marker, pruned read,
staging, swap) live behind streaming/table_format.AgentsTable:
`ParquetBucketTable` is the local-fs implementation used here, and
`LakehouseAgentsTable` collapses the whole fold into one atomic
`MERGE INTO` (table_format.merge_into_sql carries the identical
set-union / priority-coalesce update expressions) for object-storage
deployments where renames are unsafe. Canonicalization (CC) and
enumeration remain periodic batch jobs over the maintained agents
table — exactly the reference's split between continuous serializers
and the final enumerate pass (/root/reference/README.md:22-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serialization_agents_spark.operators.extract import with_extracted_text
from serialization_agents_spark.operators.linking import link_mentions
from serialization_agents_spark.operators.mentions import detect_mentions
from serialization_agents_spark.operators.merge import merge_entities

# columns folded as sets / counters / priority-coalesced scalars
_SET_COLS = ["viaf", "name_normalized", "alt_forms", "fast", "viaf_merged", "merge_source"]
# name_controlled is NOT in this list: it folds through the carried
# (name_pref_rank, value) min — the same lcTerm > viafTerm > local-name
# priority the batch merge uses — so batch(all) == fold(batches) holds
# even for noViaf entities whose normalized name has several raw
# spellings (existing-wins would make the result ingestion-order
# dependent).
_SCALAR_COLS = [
    "wikidata", "lc_id", "ulan", "dbpedia", "birth", "death", "type",
]


def incremental_merge_batch(
    existing: DataFrame | None, batch_agents: DataFrame
) -> DataFrame:
    """Fold one micro-batch of per-entity partial rows into the current
    agents table. Pure DataFrame function — unit-testable without any
    streaming runtime.

    Fold rules mirror `mergeAgentOnNameConflict` + the priority algebra
    (/root/reference/lib/utils.js:274-323): arrays union, scalars keep the
    higher-priority side (existing wins at equal priority, matching the
    reference's existing-beats-new rule, lib/utils.js:307-313), counters add.
    """
    if existing is None:
        return batch_agents
    cols = batch_agents.columns
    tagged_old = existing.select(*cols).withColumn("_gen", F.lit(0))
    tagged_new = batch_agents.withColumn("_gen", F.lit(1))
    both = tagged_old.unionByName(tagged_new)

    prio = F.struct(
        F.col("_gen").alias("g"),
        F.col("source_priority").alias("sp"),
    )

    def argmin_scalar(c: str) -> F.Column:
        return F.min(
            F.when(F.col(c).isNotNull(), F.struct(prio.alias("p"), F.col(c).alias("v")))
        )["v"].alias(c)

    name_pref = F.min(
        F.when(
            F.col("name_controlled").isNotNull(),
            F.struct(
                F.coalesce("name_pref_rank", F.lit(3)).alias("p"),
                F.col("name_controlled").alias("v"),
            ),
        )
    )
    # primary_source folds through the SAME (source_priority, source)
    # lexicographic argmin the batch merge computes — combining partial
    # argmins lexicographically IS the global argmin, so batch == fold.
    src_pref = F.min(
        F.when(
            F.col("primary_source").isNotNull(),
            F.struct(
                F.col("source_priority").alias("p"),
                F.col("primary_source").alias("v"),
            ),
        )
    )

    agg = both.groupBy("entity_key").agg(
        F.first("registry_id", ignorenulls=True).alias("registry_id"),
        F.max("is_controlled").alias("is_controlled"),
        name_pref["v"].alias("name_controlled"),
        name_pref["p"].alias("name_pref_rank"),
        src_pref["v"].alias("primary_source"),
        *[argmin_scalar(c) for c in _SCALAR_COLS],
        *[
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))), 1, 256
            ).alias(c)
            for c in _SET_COLS
        ],
        F.sum("mention_count").alias("mention_count"),
        F.min("source_priority").alias("source_priority"),
    )
    return agg.select(*cols)


def fold_batch_into_agents(
    spark: SparkSession,
    agents_dir: "str | None",
    batch_agents: DataFrame,
    batch_id: int,
    table=None,
) -> bool:
    """Fold one micro-batch into the bucket-partitioned agents table.

    Scale + exactly-once design (SURVEY.md §4.3/§4.4):

    - the agents table is hash-partitioned into N_BUCKETS `bucket=`
      directories on entity_key; a micro-batch touches only the buckets
      its keys land in, so the per-batch fold reads/rewrites
      O(|batch| / |agents| * N_BUCKETS) of the table, not all of it —
      the parquet stand-in for the `MERGE INTO` a lakehouse table format
      runs (streaming/table_format.merge_into_sql is that statement);
    - replay guard: the last applied batch id is persisted next to the
      table; a foreachBatch replay after a crash short-circuits instead
      of double-folding mention counts (parquet overwrite has no sink
      commit log of its own);
    - crash-consistent staging: the folded buckets are staged under a
      batch-id-keyed location BEFORE the swap. A replay that finds the
      staging complete re-runs only the (idempotent) swap + marker; it
      never refolds from a half-swapped table. Staging is dropped after
      the marker commits.

    All durability primitives live behind the `AgentsTable` interface
    (streaming/table_format.py): `ParquetBucketTable` implements them
    with local-fs renames (the sandbox), `LakehouseAgentsTable` with one
    atomic MERGE INTO (object storage). Pass `table` to override the
    default ParquetBucketTable(agents_dir).

    Returns True if the batch was applied, False if skipped as replayed.
    """
    from serialization_agents_spark.streaming.table_format import (
        ParquetBucketTable,
        bucket_expr,
    )

    if table is None:
        table = ParquetBucketTable(agents_dir)

    if batch_id <= table.last_batch_id():
        return False  # replayed batch: already folded

    if not table.staging_complete(batch_id):
        keyed = batch_agents.withColumn("bucket", bucket_expr())
        touched = [r["bucket"] for r in keyed.select("bucket").distinct().collect()]
        # partition-pruned read: only the buckets this batch touches
        current = table.read_buckets(spark, touched) if table.exists() else None
        folded = incremental_merge_batch(current, batch_agents)
        table.write_staging(folded, batch_id)

    table.swap_staging(spark, batch_id)
    table.commit_batch_id(batch_id)
    table.drop_staging(batch_id)
    return True


def stream_pages_to_agents(
    spark: SparkSession,
    pages_dir: str,
    authority: DataFrame,
    agents_dir: str,
    checkpoint_dir: str,
    redirects: DataFrame | None = None,
    blacklist: DataFrame | None = None,
    trigger_available_now: bool = True,
    include_subjects: bool = True,
):
    """readStream(new page parquet files) -> link -> merge -> fold into
    the persisted bucket-partitioned agents table (fold_batch_into_agents
    carries the per-batch exactly-once + partial-rewrite semantics).

    `include_subjects` defaults True to MATCH the batch pipeline
    (plans/pipeline.py runs detect_mentions(include_subjects=True)) —
    the batch(all) == fold(batches) contract requires both paths to scan
    the same span kinds."""
    from serialization_agents_spark.sources.pages import read_pages_stream

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=16)

    def process_batch(batch_pages: DataFrame, batch_id: int) -> None:
        if batch_pages.isEmpty():
            return
        px = with_extracted_text(batch_pages)
        mentions = detect_mentions(px, include_subjects=include_subjects)
        linked, _dead = link_mentions(mentions, authority, redirects, blacklist)
        fold_batch_into_agents(spark, agents_dir, merge_entities(linked), batch_id)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
