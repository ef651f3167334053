"""Corpus vocabulary statistics: per-term frequencies over the corpus.

The tokenizer-building step of a training-data pipeline: explode the
whitespace tokens of every document and aggregate term frequency (total
occurrences) and document frequency (distinct docs containing the term).
This is the input to BPE/unigram vocabulary induction and to IDF-style
weighting (reference has no analogue — it is an LLM-pipeline addition,
like dedup/ANN).

Scale shape: one explode (narrow, no shuffle) followed by ONE hash
aggregation on the term key. `count(*)` gets a map-side partial combine;
`count(distinct doc_id)` expands via Spark's standard two-phase distinct
aggregation (partial dedupe of (term, doc_id) pairs map-side, then one
shuffle on term) — at 100 TB this is the canonical inverted-index build
and the term key is near-uniform after the explode, so no salting is
needed. Output stays integer-only to keep the DuckDB oracle hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serialization_agents_spark.functions.text import tokens


def vocab_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Per-term (term_freq, doc_freq) over the corpus.

    Returns one row per distinct whitespace token with columns
    `term`, `term_freq` (total occurrences), `doc_freq` (distinct
    documents). Empty-string tokens (blank docs) are dropped. Terms
    below `min_doc_freq` documents are filtered after the aggregate —
    the standard vocabulary cut, applied post-shuffle so the aggregate
    itself stays a single pass.
    """
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    agg = exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    if min_doc_freq > 1:
        agg = agg.where(F.col("doc_freq") >= min_doc_freq)
    return agg


def bpe_pair_stats(
    docs: DataFrame,
    text_col: str = "text",
    min_pair_freq: int = 1,
) -> DataFrame:
    """Adjacent-token-pair frequencies — the merge-candidate table of
    one BPE induction iteration over a whitespace-pre-tokenized corpus.

    Returns (tok_left, tok_right, pair_freq), one row per distinct
    adjacent pair. Documents with < 2 tokens contribute nothing (the
    pair array is NULL and explode drops the row).

    Scale shape: the pair array is a narrow per-row transform (no
    shuffle), then ONE hash aggregation on the pair key with map-side
    partial combine — the same inverted-index shape as `vocab_stats`.
    The real BPE loop re-runs this after each merge; each iteration
    stays a single shuffle, which is what makes corpus-scale BPE
    induction tractable (the alternative — driver-side counting — is
    exactly the collect() anti-pattern).
    """
    toks = tokens(F.col(text_col))
    pair_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("tok_left"),
                F.element_at(toks, i + 2).alias("tok_right"),
            ),
        ),
    )
    agg = (
        docs.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.tok_left").alias("tok_left"),
            F.col("p.tok_right").alias("tok_right"),
        )
        .agg(F.count(F.lit(1)).alias("pair_freq"))
    )
    if min_pair_freq > 1:
        agg = agg.where(F.col("pair_freq") >= min_pair_freq)
    return agg
