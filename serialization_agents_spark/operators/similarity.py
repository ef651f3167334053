"""Embedding similarity search over an `array<float>` column.

- ``cosine_topk``       — brute-force top-k: the correctness baseline.
  Cross join is bounded by an explicit query-set size; score computed
  JVM-side (zip_with + aggregate), no Python.
- ``lsh_bucket_topk``   — the scale path: random-hyperplane LSH buckets
  (sign of dot(v, r_i) for H deterministic pseudo-random planes) so each
  query only scans its bucket. One shuffle keyed by bucket signature.
  Corpus-side signatures come from an Arrow-batched numpy matmul (one
  BLAS call per batch); the JVM expression path stays available as the
  reference implementation (`corpus_arrow=False`).

At 100 TB / billions of vectors the brute force is only for re-ranking
within buckets; the LSH variant is the default. A real deployment would
add IVF centroids (k-means) — the bucketing skeleton is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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
    from a hash-like LCG of (seed, plane, i), centered on 0. The driver
    oracle transcribes this exact LCG as a recursive CTE (DuckDB), so
    buckets are cross-engine reproducible."""
    out = []
    x = (seed * 1_000_003 + plane * 7919 + 12345) & 0x7FFFFFFF
    for _ in range(dim):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((x / 0x7FFFFFFF) * 2.0 - 1.0)
    return out


def _bucket_kernel(planes: list[list[float]], id_out: str, vec_out: str):
    """mapInPandas kernel computing LSH bucket signatures with ONE numpy
    matmul per Arrow batch (BLAS dgemm), instead of per-row interpreted
    F.aggregate HOFs x n_planes x dim — the JVM expression path never
    enters codegen and dominates at corpus scale. Vector math is the one
    case where Arrow-batched Python beats interpreted JVM expressions.

    Sign parity note: summation order differs from the sequential fold
    (BLAS is blocked/SIMD), so a dot within ~1e-15 of 0 could flip
    engines' sign. Components are O(1) draws, so in practice signs —
    hence buckets — agree (asserted vs the expression path in
    tests/test_similarity.py and vs DuckDB by the driver gate).
    """
    import numpy as np

    P = np.asarray(planes, dtype=np.float64)  # (H, dim)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit = np.array(["0", "1"])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_out]])
            D = V @ P.T  # (n, H): one BLAS call per batch
            sigs = ["".join(r) for r in bit[(D >= 0).astype(np.int8)]]
            yield pd.DataFrame(
                {id_out: pdf[id_out].values, vec_out: pdf[vec_out].values,
                 "bucket": sigs}
            )

    return kernel


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 0,
    corpus_arrow: bool = True,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit signature over n_planes.
    Query and corpus rows meet in a hash join on the bucket key, then
    exact cosine re-ranks within the bucket.

    `n_probes` > 0 enables MULTI-PROBE: each query additionally probes
    the buckets reached by flipping its `n_probes` lowest-|margin| sign
    bits (the planes the vector sits closest to — where hashing noise
    most likely flipped a true neighbor). Recall rises steeply with a
    few probes while the corpus side stays one-bucket-per-vector, so the
    join fan-out is only (1 + n_probes) x queries — not corpus-sized.

    The CORPUS side (billions of vectors at scale) computes its bucket
    via an Arrow-batched numpy matmul (`corpus_arrow=True`, the default
    — see _bucket_kernel); `corpus_arrow=False` keeps the pure-JVM
    expression path as the reference implementation. The query side is
    small and stays on expressions (its per-plane margins also drive the
    multi-probe bit ranking).
    """
    planes = [_hyperplane(dim, seed, p) for p in range(n_planes)]

    def dots(vec: Column) -> Column:
        return F.array(
            *[_dot(vec, F.array(*[F.lit(float(w)) for w in plane])) for plane in planes]
        )

    def sig_from_dots(d: Column) -> Column:
        return F.array_join(
            F.transform(d, lambda x: F.when(x >= 0, "1").otherwise("0")), ""
        )

    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    if corpus_arrow:
        c = c.mapInPandas(
            _bucket_kernel(planes, "neighbor_id", "cv"),
            "neighbor_id long, cv array<double>, bucket string",
        )
    else:
        c = c.withColumn("bucket", sig_from_dots(dots(F.col("cv"))))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("_d", dots(F.col("qv")))
    base_sig = sig_from_dots(F.col("_d"))
    if n_probes > 0:
        # indices of the n_probes smallest |margin| bits, via sorted
        # (|margin|, idx) structs; flip each in the base signature.
        ranked = F.slice(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_planes - 1)),
                    lambda i: F.struct(
                        F.abs(F.element_at(F.col("_d"), i + 1)).alias("m"),
                        i.alias("i"),
                    ),
                )
            ),
            1, n_probes,
        )

        def _flip(sig: Column, i: Column) -> Column:
            return F.concat(
                F.substr(sig, F.lit(1), i),
                F.when(F.substr(sig, i + 1, F.lit(1)) == "1", "0").otherwise("1"),
                F.substr(sig, i + 2, F.lit(n_planes)),
            )

        probes = F.transform(ranked, lambda s: _flip(base_sig, s["i"]))
        q = q.withColumn(
            "bucket", F.explode(F.array_union(F.array(base_sig), probes))
        ).drop("_d")
    else:
        q = q.withColumn("bucket", base_sig).drop("_d")

    scored = (
        c.join(q, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
        # multi-probe: a pair can meet in several probed buckets
        .dropDuplicates(["query_id", "neighbor_id"])
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
