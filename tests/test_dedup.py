"""Dedup operators: exact groups, MinHash-LSH recall on known near-dups,
Jaccard verification, SimHash locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.operators import dedup as D


def test_lsh_bucket_cap_prevents_quadratic_blowup(spark):
    """1000 identical docs share every band -> uncapped would be ~500k
    pairs x 4 bands; the cap drops the degenerate buckets, reports them,
    and the job stays linear (SURVEY.md §4.4: caps never drop silently)."""
    import time

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate text here").alias("text")
    )
    t0 = time.time()
    pairs, dropped = D.minhash_candidate_pairs_capped(docs, max_bucket=64)
    assert pairs.count() == 0  # every bucket degenerate -> all dropped
    rows = dropped.collect()
    assert [r["bucket_size"] for r in rows] == [1000] * 4  # one per band
    assert time.time() - t0 < 120


def test_xxhash64_minhash_finds_same_near_dups(spark):
    """The production xxhash64 hash family must recover the known
    near-duplicate pairs the md5 (oracle-parity) family finds — same
    s-curve, different hash family."""
    docs = _docs(spark)
    md5_pairs = {tuple(r) for r in D.minhash_candidate_pairs(docs).collect()}
    xx_pairs = {
        tuple(r)
        for r in D.minhash_candidate_pairs(docs, hash_fn="xxhash64").collect()
    }
    # the planted near-dup pairs (Jaccard >= ~0.7 by construction)
    truth = {p for p in md5_pairs}
    strong = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs).collect()
        if r["jaccard"] >= 0.7
    }
    assert strong <= xx_pairs  # every strong near-dup recovered
    assert strong <= truth


def test_lsh_cap_keeps_normal_buckets(spark):
    """Distinct-text docs keep their candidate pairs under the cap."""
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique words for doc number "), F.col("id")).alias("text"),
    )
    capped, dropped = D.minhash_candidate_pairs_capped(docs, max_bucket=64)
    uncapped, _ = D.minhash_candidate_pairs_capped(docs, max_bucket=None)
    assert dropped.count() == 0
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tomorrow")),  # near dup of 0
        (3, "completely different text about spark query engines and shuffles"),
        (4, "another unrelated document mentioning parquet files and columns"),
        (5, ""),  # degenerate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    out = {r["content_hash"]: r for r in D.exact_duplicates(_docs(spark)).collect()}
    dups = [r for r in out.values() if r["dup_count"] > 1]
    assert len(dups) == 1
    assert dups[0]["keeper_id"] == 0 and dups[0]["dup_count"] == 2


def test_minhash_finds_near_dups_not_unrelated(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(_docs(spark)).collect()
    }
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares bands
    assert (3, 4) not in pairs      # unrelated docs don't


def test_ngram_jaccard_scores(spark):
    scored = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(_docs(spark)).collect()
    }
    assert scored[(0, 1)] == 1.0
    assert 0.5 < scored[(0, 2)] < 1.0


def test_simhash_locality(spark):
    sk = {r["doc_id"]: r["simhash"] for r in D.simhash(_docs(spark)).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert sk[0] == sk[1]  # identical text -> identical sketch
    assert hamming(sk[0], sk[2]) < hamming(sk[0], sk[3])  # near < far
