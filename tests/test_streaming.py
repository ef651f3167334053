"""Incremental fold: batch(all pages) == fold(page batches), and the
Structured Streaming wrapper drains a directory with availableNow."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from serialization_agents_spark import synth
from serialization_agents_spark.operators.extract import with_extracted_text
from serialization_agents_spark.operators.linking import link_mentions
from serialization_agents_spark.operators.mentions import detect_mentions
from serialization_agents_spark.operators.merge import merge_entities
from serialization_agents_spark.streaming.incremental import (
    incremental_merge_batch,
    stream_pages_to_agents,
)


def _agents_for(spark, pages, authority):
    # include_subjects=True matches BOTH the batch pipeline and the
    # streaming default — the two paths must scan the same span kinds.
    px = with_extracted_text(pages)
    linked, _ = link_mentions(
        detect_mentions(px, include_subjects=True), authority
    )
    return merge_entities(linked)


def test_incremental_fold_equals_batch(spark):
    pages = synth.synth_pages(spark, n_pages=300, n_auth=80)
    authority = synth.synth_authority(spark, n_auth=80)
    full = _agents_for(spark, pages, authority)

    half1 = pages.where(F.xxhash64("url") % 2 == 0)
    half2 = pages.where(F.xxhash64("url") % 2 != 0)
    folded = incremental_merge_batch(
        _agents_for(spark, half1, authority), _agents_for(spark, half2, authority)
    )

    f = {r["entity_key"]: r for r in full.collect()}
    g = {r["entity_key"]: r for r in folded.collect()}
    assert set(f) == set(g)
    for k in f:
        assert f[k]["name_controlled"] == g[k]["name_controlled"], k
        assert f[k]["mention_count"] == g[k]["mention_count"], k
        assert sorted(f[k]["viaf"]) == sorted(g[k]["viaf"]), k
        assert sorted(f[k]["name_normalized"]) == sorted(g[k]["name_normalized"]), k


def test_bucketed_fold_touches_only_batch_buckets(spark, tmp_path):
    """The per-batch fold must rewrite ONLY the buckets containing batch
    keys (the scale contract) and skip replayed batch ids (the
    exactly-once contract)."""
    import os

    from serialization_agents_spark.streaming.incremental import (
        fold_batch_into_agents,
    )

    pages = synth.synth_pages(spark, n_pages=200, n_auth=50)
    authority = synth.synth_authority(spark, n_auth=50)
    agents_dir = str(tmp_path / "agents_bucketed")

    half1 = pages.where(F.xxhash64("url") % 2 == 0)
    half2 = pages.where(F.xxhash64("url") % 2 != 0)
    assert fold_batch_into_agents(spark, agents_dir, _agents_for(spark, half1, authority), 0)

    # snapshot per-bucket file listings after batch 0
    def bucket_files():
        out = {}
        for d in os.listdir(agents_dir):
            if d.startswith("bucket="):
                p = os.path.join(agents_dir, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(p, f)))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return out

    before = bucket_files()

    # batch 1 touches only a couple of entities -> a few buckets
    # (deterministic filter: limit() picks different rows per job)
    tiny = pages.where(F.pmod(F.xxhash64("url"), F.lit(37)) == 0)
    batch1 = _agents_for(spark, tiny, authority)
    touched = {
        r[0]
        for r in batch1.selectExpr(
            "pmod(xxhash64(entity_key), 64) AS b"
        ).distinct().collect()
    }
    assert fold_batch_into_agents(spark, agents_dir, batch1, 1)
    after = bucket_files()

    for d, files in before.items():
        b = int(d.split("=")[1])
        if b not in touched:
            assert after[d] == files, f"untouched {d} was rewritten"
    # replay of batch 1 must be skipped (no double-fold)
    count_before = spark.read.parquet(agents_dir).count()
    mention_sum = spark.read.parquet(agents_dir).agg(F.sum("mention_count")).first()[0]
    assert not fold_batch_into_agents(spark, agents_dir, batch1, 1)
    assert spark.read.parquet(agents_dir).count() == count_before
    assert (
        spark.read.parquet(agents_dir).agg(F.sum("mention_count")).first()[0]
        == mention_sum
    )

    # folded table == batch-merge of everything folded so far
    want = incremental_merge_batch(
        _agents_for(spark, half1, authority), batch1
    )
    got = spark.read.parquet(agents_dir).drop("bucket")
    w = {r["entity_key"]: r["mention_count"] for r in want.collect()}
    g = {r["entity_key"]: r["mention_count"] for r in got.collect()}
    assert w == g


def test_merge_into_sql_covers_fold_columns():
    """The lakehouse MERGE INTO shim must carry an update rule for every
    column the parquet-era fold maintains — guards drift between
    table_format.merge_into_sql and incremental_merge_batch."""
    from serialization_agents_spark.streaming.incremental import (
        _SCALAR_COLS,
        _SET_COLS,
    )
    from serialization_agents_spark.streaming.table_format import merge_into_sql

    sql = merge_into_sql("agents", "batch")
    for c in [*_SET_COLS, *_SCALAR_COLS,
              "name_controlled", "name_pref_rank", "primary_source",
              "mention_count", "source_priority", "is_controlled",
              "registry_id"]:
        assert f"{c} =" in sql, c
    assert "MERGE INTO agents" in sql and "WHEN NOT MATCHED THEN INSERT" in sql


def test_stream_drains_directory(spark, tmp_path):
    pages = synth.synth_pages(spark, n_pages=200, n_auth=50)
    authority = synth.synth_authority(spark, n_auth=50)
    pages_dir = str(tmp_path / "pages")
    agents_dir = str(tmp_path / "agents")
    ckpt = str(tmp_path / "ckpt")
    pages.write.mode("overwrite").parquet(pages_dir)

    q = stream_pages_to_agents(spark, pages_dir, authority, agents_dir, ckpt)
    q.awaitTermination(300)

    out = spark.read.parquet(agents_dir)
    want = _agents_for(spark, pages, authority)
    assert out.count() == want.count()
    got_names = {r["entity_key"]: r["name_controlled"] for r in out.collect()}
    want_names = {r["entity_key"]: r["name_controlled"] for r in want.collect()}
    assert got_names == want_names
