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

The fold is expressed here as read-merge-overwrite per micro-batch
(`foreachBatch`); on an Iceberg/Delta deployment step 3 becomes a single
`MERGE INTO` with the identical set-union / priority-coalesce update
expressions. Canonicalization (CC) and enumeration remain periodic batch
jobs over the maintained agents table — exactly the reference's split
between continuous serializers and the final enumerate pass
(/root/reference/README.md:22-46).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serialization_agents_spark import schemas
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

    agg = both.groupBy("entity_key").agg(
        F.first("registry_id", ignorenulls=True).alias("registry_id"),
        F.max("is_controlled").alias("is_controlled"),
        name_pref["v"].alias("name_controlled"),
        name_pref["p"].alias("name_pref_rank"),
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


def stream_pages_to_agents(
    spark: SparkSession,
    pages_dir: str,
    authority: DataFrame,
    agents_dir: str,
    checkpoint_dir: str,
    redirects: DataFrame | None = None,
    blacklist: DataFrame | None = None,
    trigger_available_now: bool = True,
):
    """readStream(new page parquet files) -> link -> merge -> fold into
    the persisted agents table, one transactional fold per micro-batch.

    Exactly-once: Structured Streaming checkpoints the file-source offsets
    in `checkpoint_dir`; the fold write is idempotent per batch because
    the output is overwritten from (old state + this batch) and the batch
    id is recorded by the sink commit log.
    """
    stream = (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 16)
        .parquet(pages_dir)
    )

    def process_batch(batch_pages: DataFrame, batch_id: int) -> None:
        if batch_pages.isEmpty():
            return
        px = with_extracted_text(batch_pages)
        mentions = detect_mentions(px)
        linked, _dead = link_mentions(mentions, authority, redirects, blacklist)
        batch_agents = merge_entities(linked)

        current = None
        if os.path.exists(os.path.join(agents_dir, "_SUCCESS")):
            current = spark.read.parquet(agents_dir)
        folded = incremental_merge_batch(current, batch_agents)
        # stage-then-swap keeps the read path consistent mid-write
        tmp = agents_dir + f".b{batch_id}"
        folded.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(agents_dir)
        # Iceberg/Delta deployment: replace these two writes with
        # `MERGE INTO agents USING batch_agents ON entity_key ...`

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
