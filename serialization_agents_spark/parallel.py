"""Scale-adaptive scan fan-out.

A parquet file is only splittable at row-group boundaries; a table
written as one file with one row group (exactly what the small test
corpora are) pins its scan — and every NARROW operation chained after
it (gram explode, per-shingle hashing, Arrow kernels) — to a single
task, no matter how many cores the session has. That is the "one huge
unsplittable file" input-skew case of the optimization playbook: fix it
by repartitioning immediately after the read.

``spread`` is deliberately conditional so it stays a no-op at real
scale: when the source already plans at least the session's default
parallelism worth of partitions (any multi-file / multi-row-group table
at 100 TB does, by thousands), the DataFrame is returned unchanged and
NO exchange is added. Only an under-parallel scan pays the one cheap
round-robin shuffle (bytes = the projected columns only — callers
project before spreading) that buys every downstream narrow stage full
parallelism.

The round-robin repartition is retry-safe (Spark sorts before
round-robin repartitioning by default, SPARK-23207) and uses an
EXPLICIT partition count so AQE cannot coalesce the fan-out away —
coalescing would be byte-optimal and throughput-pessimal here, since
the expensive work happens after this exchange, not before it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# The planned-partition probe (DataFrame -> RDD conversion) costs tens of
# milliseconds per call; its answer depends only on the logical plan (the
# file listing is part of it) and the session, so memoize per
# (application, semanticHash). Bounded: one entry per distinct projected
# scan per session.
_PROBE_CACHE: dict[tuple[str, int], int] = {}


def _planned_partitions(df: DataFrame) -> int:
    sc = df.sparkSession.sparkContext
    try:
        key = (
            sc.applicationId,
            df._jdf.queryExecution().logical().semanticHash(),
        )
    except Exception:
        key = None
    if key is not None and key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    n = df.rdd.getNumPartitions()
    if key is not None:
        _PROBE_CACHE[key] = n
    return n


def spread(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Fan ``df`` out to ``defaultParallelism * multiplier`` partitions
    before per-row-expensive work, unless it already has that many.

    Set ``SPARK_GRAFT_SPREAD=0`` to disable (measurement control), or to
    an integer to override the target partition count.
    """
    env = os.environ.get("SPARK_GRAFT_SPREAD")
    if env is not None and env.strip() == "0":
        return df
    sc = df.sparkSession.sparkContext
    target = (
        int(env) if env else sc.defaultParallelism * multiplier
    )
    if _planned_partitions(df) >= target:
        return df
    return df.repartition(target)
