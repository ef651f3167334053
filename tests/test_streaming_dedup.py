"""Streaming canonical-URL dedup: first-capture admission across
variants, in-horizon re-crawl suppression across micro-batches, and
beyond-horizon re-admission (the bounded-state trade, composed away by
the batch keep-latest)."""

from __future__ import annotations

import datetime as dt

from serialization_agents_spark.streaming.dedup import streaming_url_dedup

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _row(url, minute):
    return (
        url,
        dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(minutes=minute),
        b"<p>x</p>",
        None,
        "en",
    )


def _run(spark, pages_dir, out_dir, ckpt):
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    q = (
        streaming_url_dedup(stream, watermark="30 minutes")
        .select("canon_url", "url", "warc_ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "streaming dedup query timed out"
    return spark.read.parquet(out_dir)


def test_streaming_dedup_admits_once_within_horizon(spark, tmp_path):
    pages_dir, out_dir, ckpt = (
        str(tmp_path / "pages"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # batch 1: three variants of ONE canonical URL (scheme/www/tracking)
    # plus a distinct page — exactly two admissions expected.
    run1 = [
        _row("https://www.a.example/x?utm_source=f", 0),
        _row("http://a.example/x", 1),
        _row("https://a.example/x#frag", 2),
        _row("https://b.example/y", 3),
    ]
    spark.createDataFrame(run1, PAGES_SCHEMA).write.mode("overwrite").parquet(pages_dir)
    out1 = _run(spark, pages_dir, out_dir, ckpt)
    assert {r["canon_url"] for r in out1.collect()} == {
        "a.example/x",
        "b.example/y",
    }
    assert out1.count() == 2

    # batch 2: an in-horizon re-crawl of a.example/x (minute 12, state
    # still held) must be suppressed; a fresh page admits.
    run2 = [_row("https://a.example/x", 12), _row("https://c.example/z", 13)]
    spark.createDataFrame(run2, PAGES_SCHEMA).write.mode("append").parquet(pages_dir)
    out2 = _run(spark, pages_dir, out_dir, ckpt)
    assert out2.count() == 3
    assert {r["canon_url"] for r in out2.collect()} == {
        "a.example/x",
        "b.example/y",
        "c.example/z",
    }

    # batch 3: advance the watermark far past the horizon, then re-crawl
    # a.example/x beyond it -> RE-ADMITTED (bounded state: the key was
    # purged). The downstream batch keep-latest collapses such pairs.
    run3 = [_row("https://d.example/adv", 120)]
    spark.createDataFrame(run3, PAGES_SCHEMA).write.mode("append").parquet(pages_dir)
    _run(spark, pages_dir, out_dir, ckpt)
    run4 = [_row("http://www.a.example/x", 125)]
    spark.createDataFrame(run4, PAGES_SCHEMA).write.mode("append").parquet(pages_dir)
    out4 = _run(spark, pages_dir, out_dir, ckpt)
    admissions = [r for r in out4.collect() if r["canon_url"] == "a.example/x"]
    assert len(admissions) == 2  # first capture + beyond-horizon re-admit
