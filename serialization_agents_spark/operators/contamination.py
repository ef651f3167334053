"""Benchmark decontamination: flag / drop corpus documents that share
word n-grams with an evaluation benchmark (the standard train/test
leakage gate of an LLM training-data pipeline; no analogue in the
reference — its inputs are catalog records, serialization-agents
index.js — this is a first-class web-corpus addition like dedup/ANN).

Scale notes (100 TB corpus, benchmark suites ~10^6 grams):
- The benchmark side is tiny by construction (eval suites are MBs, not
  TBs): its distinct n-gram set is ALWAYS the broadcast side. The
  corpus side explodes into n-grams (narrow, no shuffle) and probes the
  broadcast hash table — the whole flag pass is shuffle-free until the
  final per-doc aggregation, ONE hash agg on doc_id.
- `hash_grams=True` joins on xxhash64 of the gram instead of the gram
  string: the broadcast table shrinks ~10x (8-byte keys vs ~40-byte
  strings) and probe equality is long-vs-long. False positives need a
  64-bit collision against a benchmark gram — negligible, and the gate
  is conservative (a false positive only drops one training doc).
  Default False so the DuckDB oracle replays string-equality exactly.
- `decontaminate` anti-joins flagged ids back: broadcastable whenever
  the contamination rate is sane; plain shuffled anti-join otherwise
  (Spark/AQE picks at runtime — we only hint when we KNOW it is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from serialization_agents_spark.operators.dedup import SHINGLE_K, shingles
from serialization_agents_spark.parallel import spread


def benchmark_ngrams(
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = SHINGLE_K,
    hash_grams: bool = False,
) -> DataFrame:
    """Distinct word k-grams of the benchmark suite — the (small)
    lookup side of the contamination join."""
    grams = benchmark.select(
        F.explode(shingles(F.col(text_col), k)).alias("gram")
    ).distinct()
    if hash_grams:
        grams = grams.select(F.xxhash64("gram").alias("gram"))
    return grams


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    hash_grams: bool = False,
) -> DataFrame:
    """One row per contaminated corpus doc: (doc_id, n_hits) where
    n_hits counts the doc's distinct k-grams that appear anywhere in
    the benchmark. Corpus grams explode narrowly and probe the
    broadcast benchmark set; the only shuffle is the final doc_id agg.
    """
    grams = benchmark_ngrams(benchmark, text_col=text_col, k=k, hash_grams=hash_grams)
    # the gram explode + hash probe is the narrow hot loop — fan an
    # under-parallel corpus scan out before paying it, and materialize
    # the token array so the gram lambda does not re-split per position
    from serialization_agents_spark.operators.dedup import (
        _tokens,
        shingles_from_tokens,
    )

    toked = (
        spread(corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", _tokens(F.col(text_col)).alias("_toks"))
        .localCheckpoint(eager=False)
    )
    doc_grams = toked.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("_toks"), k)).alias("gram"),
    )
    if hash_grams:
        doc_grams = doc_grams.select("doc_id", F.xxhash64("gram").alias("gram"))
    return (
        doc_grams.join(broadcast(grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    min_hits: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Corpus minus documents with >= min_hits benchmark n-grams.

    `min_hits` > 1 tolerates incidental single-gram collisions (common
    short phrases) — the usual production dial. Returns the surviving
    corpus rows unchanged.
    """
    flagged = contamination_report(
        corpus, benchmark, text_col=text_col, id_col=id_col, k=k,
        hash_grams=hash_grams,
    ).where(F.col("n_hits") >= min_hits).select("doc_id")
    return corpus.join(
        flagged, corpus[id_col] == flagged["doc_id"], "left_anti"
    )
