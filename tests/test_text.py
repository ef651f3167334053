"""Text-analysis functions: language ID, quality, token counts, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.functions import text as T


def _df(spark):
    rows = [
        (0, "the cat and the dog sat in a house that it was warm"),
        (1, "der hund und die katze ist nicht mit den kindern"),
        (2, "le chat est dans la maison pour les enfants"),
        (3, "el perro es una mascota en la casa con los gatos"),
        (4, "zzz qqq xxx"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id(spark):
    out = {r["doc_id"]: r["lang"] for r in _df(spark).select(
        "doc_id", T.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "fr"
    assert out[3] == "es"
    assert out[4] == "und"
    assert out[5] == "und"


def test_token_counts(spark):
    out = {r["doc_id"]: (r["ws"], r["bpe"]) for r in _df(spark).select(
        "doc_id",
        T.token_count(F.col("text")).alias("ws"),
        T.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()}
    assert out[0] == (13, 13)
    assert out[5][0] == 0
    df = spark.createDataFrame([(9, "don't stop-me now!")], "doc_id long, text string")
    row = df.select(T.bpe_ish_token_count(F.col("text")).alias("n")).collect()[0]
    # don | ' | t | stop | - | me | now | !  -> 8
    assert row["n"] == 8


def test_quality_orders_real_text_above_junk(spark):
    out = {r["doc_id"]: r["q"] for r in _df(spark).select(
        "doc_id", T.quality_score(F.col("text")).alias("q")).collect()}
    assert out[0] > out[4] > out[5] or (out[0] > out[4] and out[5] <= out[4])
    assert 0.0 <= min(out.values()) and max(out.values()) <= 1.0


def test_fingerprint_word_order_invariant(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma alpha beta gamma"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[0] == out[1]       # order + multiplicity invariant
    assert out[0] != out[2]
