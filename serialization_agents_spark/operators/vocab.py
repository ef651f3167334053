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

from serialization_agents_spark.parallel import spread

from pyspark.sql.window import Window

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

    Scale shape: explode -> hash agg on (doc_id, term) for tf, then tf
    is localCheckpointed ONCE — it feeds both the doc_freq aggregate
    and the join probe, and without the materialization Catalyst plans
    the whole corpus scan + explode + agg TWICE (ReuseExchange does not
    fire across the branches). doc_freq is a plain count on the term
    key (tf is unique per (doc_id, term); countDistinct would re-shuffle
    (term, doc_id) for nothing) — an AGGREGATE, not a term-window,
    because hot stopword terms make a window group O(corpus) on one
    reducer while the agg's map-side combine flattens them. The
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
    tf = (
        exploded.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = docs.count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
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
        _adjacent_pairs(toks),
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


def _adjacent_pairs(toks):
    """Array of (tok_left, tok_right) structs for adjacent positions."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("tok_left"),
            F.element_at(toks, i + 2).alias("tok_right"),
        ),
    )


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    joiner: str = "▁",
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges over the whitespace-pre-tokenized
    corpus: each iteration picks the globally most frequent adjacent
    pair (ties: lexicographic (left, right) asc — deterministic under
    any partitioning) and rewrites every document's token array with
    the pair fused as `left + joiner + right`. Returns the learned
    merge table [(left, right, pair_freq), ...] in merge order.

    This is the CC-loop pattern applied to tokenizer induction: the
    driver holds only the argmax row per iteration (a bounded 1-row
    collect — the loop CONTROL, not the data); the corpus-side rewrite
    is a pure-JVM `F.aggregate` left fold over each token array (fuse
    greedily left-to-right, exactly like the pure-Python reference in
    tests). Each iteration costs one narrow map + one pair-count
    shuffle; lineage is truncated per iteration with localCheckpoint.

    Oracle note: not SQL-certifiable — DuckDB 1.0's list_reduce bleeds
    accumulator state across rows when lambda CASE branches diverge
    (see the repo verify notes), so this operator is pinned by the
    pure-Python parity pytest instead of a driver gate row.
    """
    cur = docs.select(tokens(F.col(text_col)).alias("w")).where(F.size("w") >= 2)
    cur = cur.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            # guard: a doc can shrink below 2 tokens after a merge, and
            # sequence(0, size-2) would run DESCENDING into ANSI
            # out-of-bounds element_at; the NULL array explodes to nothing
            cur.select(
                F.explode(
                    F.when(F.size("w") >= 2, _adjacent_pairs(F.col("w")))
                ).alias("p")
            )
            .groupBy("p.tok_left", "p.tok_right")
            .agg(F.count(F.lit(1)).alias("pair_freq"))
            .orderBy(
                F.col("pair_freq").desc(),
                F.col("tok_left").asc(),
                F.col("tok_right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0]["tok_left"], top[0]["tok_right"], top[0]["pair_freq"]
        merges.append((left, right, freq))
        fused = left + joiner + right
        # Greedy left-to-right fold with a struct accumulator (done
        # tokens + the pending last token, so no tail surgery / negative
        # indexing is ever needed): if the pending token is `left` and
        # the incoming one is `right`, fuse them into the pending slot;
        # otherwise flush pending and stage the incoming token.
        zero = F.struct(
            F.expr("CAST(array() AS ARRAY<STRING>)").alias("done"),
            F.lit(None).cast("string").alias("pending"),
        )

        def _step(acc, t):
            return (
                F.when(
                    acc["pending"].isNull(),
                    F.struct(acc["done"].alias("done"), t.alias("pending")),
                )
                .when(
                    (acc["pending"] == F.lit(left)) & (t == F.lit(right)),
                    F.struct(
                        acc["done"].alias("done"), F.lit(fused).alias("pending")
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(acc["done"], F.array(acc["pending"])).alias("done"),
                        t.alias("pending"),
                    )
                )
            )

        def _finish(acc):
            return F.when(
                acc["pending"].isNull(), acc["done"]
            ).otherwise(F.concat(acc["done"], F.array(acc["pending"])))

        cur = cur.select(
            F.aggregate(F.col("w"), zero, _step, _finish).alias("w")
        ).localCheckpoint(eager=False)
    return merges


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 16,
) -> DataFrame:
    """Per-term posting-list head: (term, term_freq, doc_freq,
    truncated, postings_head) where postings_head is the
    `max_postings` SMALLEST doc ids as a comma-joined string — the
    segment-index shape a search/retrieval layer builds over a corpus
    (full postings stay doc-partitioned on disk; the head + doc_freq
    is the driver-safe summary).

    Scale design (10^12 docs): a stopword's posting list is the whole
    corpus, so no stage may materialize one in memory. The (term, doc)
    pre-aggregation bounds duplicate work; the head is selected by a
    sort-based row_number window (spills, never holds a term's list),
    and the only collect_list runs AFTER the rn <= max_postings filter
    — it can never see more than `max_postings` rows per term.
    """
    e = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    # the (term, doc) pre-aggregate feeds BOTH the stats agg and the
    # head window; without materialization Catalyst plans the corpus
    # scan + explode + agg twice (ReuseExchange does not fire across
    # the branches — same pitfall as tfidf_topk)
    perdoc = (
        e.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    stats = perdoc.groupBy("term").agg(
        F.sum("tf").alias("term_freq"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    heads = (
        perdoc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_postings)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    return stats.join(heads, "term").select(
        "term",
        "term_freq",
        "doc_freq",
        (F.col("doc_freq") > max_postings).alias("truncated"),
        "postings_head",
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Token n-gram count table (the KenLM-style corpus statistic):
    (ngram, n_occurrences) over every length-n token window, thresholded
    at `min_count` AFTER the aggregate (the standard LM count cut).

    One narrow per-row transform + ONE hash agg on the gram; map-side
    partial combine absorbs the Zipf head before the shuffle. Docs
    shorter than n tokens contribute nothing (the `when` guard also
    keeps ANSI `sequence` from running descending on short docs; the
    explode drops the resulting NULLs).
    """
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    )
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )


def perplexity_buckets(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       exact_quantiles: bool = True) -> DataFrame:
    """CCNet-style language-model quality buckets: score every document
    by its average negative log-probability under the corpus's own
    add-one-smoothed unigram LM, then split the corpus at the exact
    p25/p75 quartiles into 'head' (most LM-typical), 'middle', 'tail'
    — the standard perplexity-filtering step of webtext curation
    pipelines (CCNet buckets by LM perplexity exactly this way).

    Cross-engine determinism: per-token cost is an INTEGER micro-nll
    (round(-ln((c+1)/(N+V)) * 1e4) as BIGINT), so per-doc sums are exact
    integer arithmetic — no float sum-order drift — and the quartile
    interpolation runs on integers at binary-exact fractions (.25/.75).

    Scale shape: one token explode + hash agg builds the LM (map-side
    combine absorbs the Zipf head), one dim-join of tokens against the
    per-term cost table (hot stop-word keys are join-skew on the probe
    side only; AQE skew-join splits them), one per-doc agg, and a
    single-row quantile agg broadcast back — never a global sort or
    single-partition window. Docs with zero non-empty tokens carry no
    LM evidence and are excluded (the explode drops them).

    exact_quantiles=True (the cross-engine-replayable default) uses
    `percentile`, whose ObjectHashAggregate buffers every doc's score
    in one final task — exact, but O(n_docs) driver-side-style memory.
    At 10^10+ docs pass False: `percentile_approx` (t-digest, bounded
    sketch, mergeable map-side) moves the thresholds by at most the
    sketch error, which only reassigns docs within noise of the
    quartile boundary — the standard CCNet-scale trade.
    """
    tok = (
        spread(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", F.explode(tokens(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
    )
    # Reduce to per-(doc, term) occurrence counts FIRST: nll is a sum of
    # per-term integer costs, so sum(cost * n) over distinct (doc, term)
    # equals the sum over raw occurrences EXACTLY (all integer — no
    # float order anywhere). The materialized frame that feeds BOTH the
    # LM aggregate and the scoring join (Catalyst won't reuse an agg
    # subtree across consumers) shrinks from every token occurrence to
    # distinct (doc, term) pairs — bounded by docs x vocab — and the
    # map-side combine absorbs the Zipf head before the shuffle.
    dt = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tn"))
        .localCheckpoint(eager=False)
    )
    counts = dt.groupBy("term").agg(F.sum("tn").alias("c"))
    nv = counts.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    lm = counts.crossJoin(F.broadcast(nv)).select(
        "term",
        F.round(
            -F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n_total") + F.col("v_size")).cast("double")
            )
            * 10000
        ).cast("long").alias("cost"),
    )
    scored = (
        dt.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cost") * F.col("tn")).alias("nll"),
            F.sum("tn").alias("n_tokens"),
        )
        .select(
            "doc_id", "n_tokens",
            F.round(F.col("nll").cast("double") / F.col("n_tokens"))
            .cast("long").alias("avg_nll_e4"),
        )
        .localCheckpoint(eager=False)  # feeds the quantile AND the output
    )
    pct_fn = "percentile" if exact_quantiles else "percentile_approx"
    q = scored.agg(
        F.expr(f"{pct_fn}(avg_nll_e4, array(0.25D, 0.75D))").alias("q")
    ).select(F.col("q")[0].alias("p25"), F.col("q")[1].alias("p75"))
    return scored.crossJoin(F.broadcast(q)).select(
        "doc_id", "n_tokens", "avg_nll_e4",
        F.when(F.col("avg_nll_e4") <= F.col("p25"), "head")
        .when(F.col("avg_nll_e4") > F.col("p75"), "tail")
        .otherwise("middle").alias("bucket"),
    )
