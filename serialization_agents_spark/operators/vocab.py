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


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Per-document top-k terms by tf-idf: (doc_id, term, score, rank).

    idf = ln(N/df) rounded to 4dp BEFORE the tf multiply, and the
    product rounded to 4dp again — ranking and output both use the
    coarsened value, so a sub-ulp libm difference between engines
    cannot flip an ordering. Ties break on term ascending.

    Scale shape: explode -> hash agg on (doc_id, term) for tf; doc_freq
    derives from tf (one agg on term — never a second corpus scan); the
    doc_freq side joins back broadcast (after the min_doc_freq cut a
    web-scale vocabulary is ~10^7 rows — broadcastable; raise the cut,
    not the join strategy, when it is not); final top-k is one
    row_number window on doc_id. N comes from one count() — at scale,
    table statistics."""
    from pyspark.sql.window import Window

    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    tf = exploded.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("doc_freq"))
    if min_doc_freq > 1:
        dfreq = dfreq.where(F.col("doc_freq") >= min_doc_freq)
    idf = F.round(F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 4)
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * idf, 4).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )


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
