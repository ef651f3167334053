"""applyInPandasWithState: running totals accumulate across checkpointed
restarts (state survives), and only changed keys emit per batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.streaming.stateful import (
    stream_running_totals_to_parquet,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _page(url, *names):
    html = "".join(f'<p><span class="agent">{n}</span></p>' for n in names)
    return (url, None, html.encode(), None, "en")


def _totals(spark, out_dir):
    df = spark.read.parquet(out_dir)
    return {
        r["name_norm"]: r["mx"]
        for r in df.groupBy("name_norm").agg(F.max("total").alias("mx")).collect()
    }


def test_state_accumulates_across_checkpointed_runs(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "totals")
    ckpt = str(tmp_path / "ckpt")

    run1 = [
        _page("u://1", "Ann Andrews", "Bob Brown"),
        _page("u://2", "Ann Andrews"),
    ]
    spark.createDataFrame(run1, PAGES_SCHEMA).write.mode("overwrite").parquet(pages_dir)
    q = stream_running_totals_to_parquet(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)
    assert _totals(spark, out_dir) == {"ann andrews": 2, "bob brown": 1}

    # restart with NEW files only: the running total must RESUME from
    # checkpointed state (3 = 2 + 1), not restart from zero.
    run2 = [_page("u://3", "Ann Andrews", "Cay Cole")]
    spark.createDataFrame(run2, PAGES_SCHEMA).write.mode("append").parquet(pages_dir)
    q = stream_running_totals_to_parquet(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)
    assert _totals(spark, out_dir) == {
        "ann andrews": 3, "bob brown": 1, "cay cole": 1,
    }

    # update-mode economy: the second run emitted ONLY the changed keys
    second = spark.read.parquet(out_dir).groupBy("name_norm").count().collect()
    emitted_twice = {r["name_norm"] for r in second if r["count"] > 1}
    assert emitted_twice == {"ann andrews"}
