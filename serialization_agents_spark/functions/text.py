"""Text-analysis functions for training-data curation: language ID,
quality scoring, token counting, document fingerprinting. All pure Column
expressions (whole-stage codegen) — no Python in the plan — and all
reproducible in ANSI SQL for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (n-gram heuristic): language id
# = argmax of marker-token hit counts, 'und' (undetermined) when no hits.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "en", "que", "por", "con"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: alnum runs + standalone punctuation marks,
    the standard pre-tokenizer regex shape."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax over marker-set hit counts; deterministic tie-break by
    language code order en < de < fr < es priority (score, -ordinal)."""
    scores = lang_scores(text)
    # build struct array (score, priority, lang) and take max
    entries = [
        F.struct(
            scores[lang].alias("s"), F.lit(-i).alias("p"), F.lit(lang).alias("l")
        )
        for i, lang in enumerate(LANG_MARKERS)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] <= 0, F.lit("und")).otherwise(best["l"])


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic quality signals (Gopher/C4-style filters, public recipe):
    length, mean word length, stopword ratio, punctuation density,
    alpha ratio, repetition (distinct/total tokens)."""
    toks = tokens(text)
    n_tok = token_count(text)
    n_chars = F.length(text)
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS_EN]))
    )
    # explicit class (not \w) so DuckDB/Java regex semantics agree exactly
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    n_alpha = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]"), F.lit(0)))
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(
        F.lit(0.0)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_word_len": F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0)),
        "distinct_token_ratio": distinct_ratio,
    }


def quality_score(text: Column) -> Column:
    """Scalar quality in [0,1]: mean of clamped signal scores. A document
    scores high when it has enough tokens, sane word lengths, some
    stopwords, and low punctuation density."""
    q = quality_features(text)
    len_ok = F.least(q["n_tokens"] / F.lit(20.0), F.lit(1.0))
    word_ok = F.when(
        (q["mean_word_len"] >= 3) & (q["mean_word_len"] <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    stop_ok = F.least(q["stopword_ratio"] * F.lit(10.0), F.lit(1.0))
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - q["punct_ratio"] * F.lit(5.0))
    return F.round((len_ok + word_ok + stop_ok + punct_ok) / F.lit(4.0), 4)


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Word n-grams as a string array (pure Column exprs; element_at is
    1-based). Fewer than n tokens -> empty array."""
    toks = tokens(text)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(k >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_features(text: Column) -> dict[str, Column]:
    """Within-document repetition signals — the Gopher-rule family
    (duplicate-line/-n-gram fractions; Rae et al. 2021, public recipe)
    adapted to whitespace corpora: fraction of duplicate words and of
    duplicate word-2-grams/3-grams. High values mark boilerplate and
    degenerate SEO text. All pure Column expressions (codegen'd;
    O(tokens log tokens) per row, no shuffle, no Python), so the filter
    runs at scan speed over 100 TB."""

    def dup_fraction(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0, F.lit(1.0) - F.size(F.array_distinct(arr)) / n
        ).otherwise(F.lit(0.0))

    empty = F.length(F.trim(text)) == 0
    toks = F.when(empty, F.array().cast("array<string>")).otherwise(tokens(text))
    return {
        "dup_word_fraction": dup_fraction(toks),
        "dup_2gram_fraction": dup_fraction(word_ngrams(text, 2)),
        "dup_3gram_fraction": dup_fraction(word_ngrams(text, 3)),
    }


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint robust to word order: md5 of the
    sorted distinct token set (canonical bag-of-words form)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


# PII patterns, written in the RE2-compatible subset of Java regex (no
# backreferences / lookaround, [0-9] not \d) so DuckDB's regexp functions
# match byte-for-byte and the scrub is oracle-certifiable cross-engine.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}-[0-9]{4}\b"


def pii_features(text: Column) -> dict[str, Column]:
    """PII redaction for training-data pipelines: replace emails, IPv4
    addresses and phone-shaped numbers with typed placeholder tokens and
    count each category. Pure Column expressions (regexp_replace /
    regexp_count are codegen'd JVM regex — no Python, no shuffle), so the
    scrub runs at scan speed over 100 TB. Replacement order matters and
    is fixed (email -> ip -> phone): an email is redacted before the ip
    pass can see digits inside it.

    Returns {"scrubbed", "n_emails", "n_ips", "n_phones"}.
    """
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL))
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(after_email, F.lit(PII_IPV4))
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(after_ip, F.lit(PII_PHONE))
    scrubbed = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return {
        "scrubbed": scrubbed,
        "n_emails": n_emails.cast("long"),
        "n_ips": n_ips.cast("long"),
        "n_phones": n_phones.cast("long"),
    }
