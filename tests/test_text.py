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


def test_repetition_fractions_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),        # words: 4/6 dup; 2grams: 3/5 dup
            (1, "one two three four"),  # no repetition at all
            (2, "x"),                  # single token: no n-grams
            (3, ""),                   # empty
        ],
        "doc_id long, text string",
    )
    r = T.repetition_features(F.col("text"))
    out = {
        row["doc_id"]: row
        for row in df.select(
            "doc_id",
            F.round(r["dup_word_fraction"], 4).alias("w"),
            F.round(r["dup_2gram_fraction"], 4).alias("g2"),
            F.round(r["dup_3gram_fraction"], 4).alias("g3"),
        ).collect()
    }
    assert out[0]["w"] == round(1 - 2 / 6, 4)
    # 2-grams of 'a b a b a b': [a b, b a, a b, b a, a b] -> 2 distinct of 5
    assert out[0]["g2"] == round(1 - 2 / 5, 4)
    # 3-grams: [a b a, b a b, a b a, b a b] -> 2 distinct of 4
    assert out[0]["g3"] == 0.5
    assert tuple(out[1])[1:] == (0.0, 0.0, 0.0)
    assert tuple(out[2])[1:] == (0.0, 0.0, 0.0)
    assert tuple(out[3])[1:] == (0.0, 0.0, 0.0)


def test_pii_scrub_counts_and_order(spark):
    """Emails go first (so the ip pass never sees their digits), then
    ipv4, then phone-shaped numbers; counts match the replacements."""
    from serialization_agents_spark.functions.text import pii_features

    rows = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "host 192.168.0.1 and 10.0.0.7 up"),
        (3, "call 555-0134 re a@b.io at 8.8.8.8"),
        (4, "no pii here at all"),
        (5, "not-an-ip 1.2.3.4.5 still scrubs the first four octets"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = pii_features(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", p["scrubbed"].alias("s"), p["n_emails"].alias("e"),
            p["n_ips"].alias("i"), p["n_phones"].alias("ph"),
        ).collect()
    }
    assert out[1]["s"] == "mail <EMAIL> now" and out[1]["e"] == 1
    assert out[2]["s"] == "host <IP> and <IP> up" and out[2]["i"] == 2
    assert out[3]["s"] == "call <PHONE> re <EMAIL> at <IP>"
    assert (out[3]["e"], out[3]["i"], out[3]["ph"]) == (1, 1, 1)
    assert out[4]["s"] == "no pii here at all"
    assert (out[4]["e"], out[4]["i"], out[4]["ph"]) == (0, 0, 0)
