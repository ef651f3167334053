"""Source connectors: schema-enforced readers/writers for the page corpus
and the authority dimensions.

The reference pulls from MongoDB collections and live VIAF/LCNAF HTTP
(/root/reference/lib/db.js, lib/viaf.js:11-128); at 10^12 documents those
become table scans of a lakehouse corpus plus small snapshot dimensions.
These helpers pin three things every scan at that scale depends on:

1. **Schema enforcement** — every reader applies the canonical
   StructType (schemas.PAGES / AUTHORITY / VIAF_REDIRECTS), so drift in
   the underlying files fails loudly at plan time, not 3 stages later,
   and json/csv readers never pay inference scans over 100 TB.
2. **Partition layout** — `write_pages_partitioned` lays the corpus out
   by crawl date (`warc_ts` day), the natural ingestion key; date-ranged
   jobs then prune partitions at the source (verify: PartitionFilters in
   `.explain`), which is the difference between scanning a day and
   scanning the archive.
3. **Streaming parity** — `read_pages_stream` is the same schema over
   `readStream` (used by streaming/incremental.py), so batch and
   incremental jobs cannot diverge on input interpretation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serialization_agents_spark import schemas

PAGE_FORMATS = ("parquet", "json", "csv")


def read_pages(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    dates: tuple[str, str] | None = None,
) -> DataFrame:
    """Read a page corpus with the canonical schema applied.

    parquet: schema asserted column-by-column (pushdown + pruning intact);
    json/csv: schema SUPPLIED (no inference pass). csv cannot carry raw
    binary html; it is read as a base64 string column and decoded —
    the interchange convention used by `write_pages_partitioned`.

    `dates=(start, end)` (inclusive, 'YYYY-MM-DD') filters on the
    `crawl_date` PARTITION column laid down by write_pages_partitioned —
    the filter prunes at the source listing (PartitionFilters in
    `.explain`), which a predicate on `warc_ts` cannot do.
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
        if dates is not None:
            if "crawl_date" not in df.columns:
                raise ValueError(f"pages at {path} are not date-partitioned")
            df = df.where(F.col("crawl_date").between(*dates))
        missing = [f.name for f in schemas.PAGES.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"pages at {path} missing columns: {missing}")
        return df.select([f.name for f in schemas.PAGES.fields])
    # html travels base64-encoded in text formats
    txt_schema = "url string, warc_ts timestamp, html_b64 string, text string, lang string"
    if fmt == "json":
        df = spark.read.schema(txt_schema).json(path)
    elif fmt == "csv":
        # multiLine: page text legitimately embeds newlines inside quotes.
        # (Costs input-split parallelism — csv is an interchange path, not
        # the scale path; 100 TB corpora live in parquet.)
        df = (
            spark.read.schema(txt_schema)
            .option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    else:
        raise ValueError(f"unknown pages format {fmt!r}; one of {PAGE_FORMATS}")
    if dates is not None:
        # crawl_date is a discovered partition column (appended by Spark
        # beyond the supplied schema) when the layout came from
        # write_pages_partitioned; prunes at the source listing.
        if "crawl_date" not in df.columns:
            raise ValueError(f"pages at {path} are not date-partitioned")
        df = df.where(F.col("crawl_date").between(*dates))
    return df.select(
        "url", "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text", "lang",
    )


def write_pages_partitioned(
    pages: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    """Write the corpus partitioned by crawl day (`crawl_date=` dirs) so
    date-ranged reads prune at the source listing."""
    out = pages.withColumn("crawl_date", F.to_date("warc_ts"))
    if fmt == "parquet":
        out.write.mode("overwrite").partitionBy("crawl_date").parquet(path)
    elif fmt in ("json", "csv"):
        # column order pinned to read_pages' supplied schema — csv maps
        # columns POSITIONALLY (json by name), so writer and reader must
        # agree on order, not just names
        txt = out.withColumn("html_b64", F.base64("html")).select(
            "url", "warc_ts", "html_b64", "text", "lang", "crawl_date"
        )
        writer = txt.write.mode("overwrite").partitionBy("crawl_date")
        if fmt == "json":
            writer.json(path)
        else:
            # escape='"' = standard doubled-quote CSV, matching read_pages
            writer.option("header", "true").option("escape", '"').csv(path)
    else:
        raise ValueError(f"unknown pages format {fmt!r}; one of {PAGE_FORMATS}")


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """The streaming twin of read_pages (parquet only): same schema, file
    -discovery micro-batches (used by streaming/incremental.py)."""
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def read_authority(spark: SparkSession, path: str) -> DataFrame:
    """Authority snapshot dimension (the VIAF cluster table the reference
    queries live, lib/utils.js:75-77) — schema-checked parquet."""
    df = spark.read.parquet(path)
    missing = [f.name for f in schemas.AUTHORITY.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"authority at {path} missing columns: {missing}")
    return df.select([f.name for f in schemas.AUTHORITY.fields])


def read_redirects(spark: SparkSession, path: str) -> DataFrame:
    """VIAF redirects snapshot (stands in for live redirect chasing,
    lib/viaf.js:57-101)."""
    df = spark.read.parquet(path)
    missing = [
        f.name for f in schemas.VIAF_REDIRECTS.fields if f.name not in df.columns
    ]
    if missing:
        raise ValueError(f"redirects at {path} missing columns: {missing}")
    return df.select([f.name for f in schemas.VIAF_REDIRECTS.fields])
