"""Streaming canonical-URL dedup: keep the first capture per canonical
URL on an unbounded crawl stream, with watermark-bounded state.

The batch pipeline dedups captures retrospectively (keep-LATEST per
canonical URL, operators/urls.py); a live crawl ingester needs the
prospective rule — admit a page the FIRST time its canonical URL is
seen, drop re-crawls — with state that does not grow forever. Spark's
`dropDuplicatesWithinWatermark` holds each key only until the watermark
passes its event time + delay: a re-crawl inside the horizon is
deduplicated exactly; one beyond it is re-admitted (and the downstream
batch keep-latest collapses those — the two operators compose, which is
why the streaming rule can afford a bounded horizon at all).

State at web scale: keys in flight = unique canonical URLs seen within
the watermark horizon, not the corpus — with a 24 h horizon that is the
daily crawl frontier (~10^8), sharded across executors by key shuffle;
the horizon dial trades re-admit rate for state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serialization_agents_spark.operators.urls import canonical_url


def streaming_url_dedup(
    pages: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
    url_col: str = "url",
) -> DataFrame:
    """pages (stream; `ts_col` must be a timestamp) -> the admitted
    captures, one per canonical URL within the watermark horizon, with
    the canonical key attached."""
    canon = pages.withColumn("canon_url", canonical_url(F.col(url_col)))
    return canon.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["canon_url"]
    )
