"""Dedup operators: exact groups, MinHash-LSH recall on known near-dups,
Jaccard verification, SimHash locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.operators import dedup as D


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
