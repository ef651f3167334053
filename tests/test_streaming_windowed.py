"""Watermarked windowed metrics: append-mode finalization, late-data
drop, and stream == batch on on-time rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from serialization_agents_spark.streaming.windowed import (
    stream_windowed_metrics_to_parquet,
    windowed_page_metrics,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
HTML = b'<p><span class="agent">Ann Andrews</span></p>'


def _rows(ts_list, tag):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    return [
        (f"u://{tag}/{i}", base + dt.timedelta(minutes=m), HTML, None, "en")
        for i, m in enumerate(ts_list)
    ]


def test_windowed_metrics_finalize_and_drop_late_rows(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    # run 1: W[600:610) x3, W[610:620) x2, plus an advancer at minute 660
    # -> watermark 660-30=630: the two 10:00-windows finalize, the
    # advancer's own window stays open.
    run1 = _rows([601, 602, 603], "w1") + _rows([612, 615], "w2") + _rows([660], "adv")
    spark.createDataFrame(run1, PAGES_SCHEMA).write.mode("overwrite").parquet(pages_dir)
    q = stream_windowed_metrics_to_parquet(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)

    got1 = {
        (r["window_start"].minute + 60 * r["window_start"].hour): r["n_pages"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got1 == {600: 3, 610: 2}

    # run 2: a LATE row for the finalized 600-window (must be dropped)
    # plus an advancer at 705 -> watermark 675: the 660-window finalizes
    # WITHOUT the late row; the finalized 600-window is never re-emitted.
    run2 = _rows([605], "late") + _rows([705], "adv2")
    spark.createDataFrame(run2, PAGES_SCHEMA).write.mode("append").parquet(pages_dir)
    q = stream_windowed_metrics_to_parquet(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir).collect()
    got2 = {
        (r["window_start"].minute + 60 * r["window_start"].hour): r["n_pages"]
        for r in out
    }
    assert got2 == {600: 3, 610: 2, 660: 1}  # late row dropped everywhere
    assert all(r["n_mentions"] == r["n_pages"] for r in out)  # 1 span/page

    # stream == batch on the on-time rows of finalized windows
    on_time = spark.createDataFrame(run1, PAGES_SCHEMA)
    batch = {
        (r["window_start"].minute + 60 * r["window_start"].hour): r["n_pages"]
        for r in windowed_page_metrics(on_time).collect()
    }
    assert {k: batch[k] for k in got2} == got2
