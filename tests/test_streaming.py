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
    px = with_extracted_text(pages)
    linked, _ = link_mentions(detect_mentions(px), authority)
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
