"""Embedding similarity search over an `array<float>` column.

- ``cosine_topk``       — brute-force top-k: the correctness baseline.
  Cross join is bounded by an explicit query-set size; score computed
  JVM-side (zip_with + aggregate), no Python.
- ``lsh_bucket_topk``   — the scale path: random-hyperplane LSH buckets
  (sign of dot(v, r_i) for H deterministic pseudo-random planes) so each
  query only scans its bucket. One shuffle keyed by bucket signature.

At 100 TB / billions of vectors the brute force is only for re-ranking
within buckets; the LSH variant is the default. A real deployment would
add IVF centroids (k-means) — the bucketing skeleton is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Brute-force cosine top-k: every query row against every corpus row.
    queries must be small (it is broadcast); corpus side streams."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = scored.select("query_id", "neighbor_id", sim.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine",
            F.col("rank").cast("long").alias("rank"),  # BIGINT parity w/ SQL engines
        )
    )


def _hyperplane(dim: int, seed: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (no RNG state): components
    from a hash-like LCG of (seed, plane, i), centered on 0."""
    out = []
    x = (seed * 1_000_003 + plane * 7919 + 12345) & 0x7FFFFFFF
    for _ in range(dim):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((x / 0x7FFFFFFF) * 2.0 - 1.0)
    return out


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit signature over n_planes.
    Query and corpus rows meet in a hash join on the bucket key, then
    exact cosine re-ranks within the bucket. Recall < 1 by construction;
    raise n_planes' table count (multi-probe) for higher recall."""
    planes = [_hyperplane(dim, seed, p) for p in range(n_planes)]

    def signature(vec: Column) -> Column:
        bits = [
            F.when(
                _dot(vec, F.array(*[F.lit(float(w)) for w in plane])) >= 0, "1"
            ).otherwise("0")
            for plane in planes
        ]
        return F.concat(*bits)

    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", signature(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", signature(F.col("qv")))

    scored = (
        c.join(q, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )
