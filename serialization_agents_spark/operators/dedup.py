"""Corpus deduplication operators — first-class components of a
training-data pipeline at 100 TB (exact, MinHash-LSH, SimHash, n-gram
Jaccard). All built-in expressions; hashes are md5-based so DuckDB /
pure-Python oracles can reproduce results bit-for-bit.

Scale notes:
- exact dedup: one shuffle on the content hash (map-side partial agg).
- MinHash-LSH: signatures are narrow per-row work; candidate pairing is
  ONE shuffle keyed by band (each doc contributes `bands` rows, never the
  O(n^2) cross join). Band width/count tuned for ~0.8 Jaccard threshold.
- SimHash: narrow per-row 64-bit sketch + one shuffle on the sketch (or
  on rotated prefixes for Hamming-neighbor search).
- n-gram Jaccard verify: runs only on LSH candidate pairs (tiny set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from serialization_agents_spark.parallel import spread

N_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows: s-curve threshold ~ (1/4)^(1/4) ~ 0.7
SHINGLE_K = 3


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles_from_tokens(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles over an ALREADY-TOKENIZED column.

    Prefer this over `shingles` when the caller can materialize the
    token array first (checkpoint/exchange barrier): expressions inside
    an interpreted HOF lambda are re-evaluated per element, so an
    inlined split() re-tokenizes once per gram position."""
    return F.array_distinct(
        F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles of a text column (JVM-side)."""
    return shingles_from_tokens(_tokens(text), k)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    surviving (min) id and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-doc MinHash signature + LSH band keys.

    h_i(doc) = min over shingles of hash(i, shingle); band key b_j =
    hash of the concatenated signature slice.

    hash_fn='md5' (default): hex-string hashes, min taken
    lexicographically — deliberately chosen so DuckDB/Python oracles can
    reproduce signatures bit-for-bit (the driver correctness gate).
    hash_fn='xxhash64': 64-bit long hashes, ~4x cheaper per shingle —
    the production setting at 100 TB, where cross-engine replay is not
    needed (same s-curve; pair sets differ only by hash family).
    """
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    # n_hashes hash passes per shingle are the dominant narrow cost —
    # fan an under-parallel scan out BEFORE paying them (and project to
    # the two columns the signature needs so the fan-out shuffles only
    # those bytes).
    df = spread(df.select(F.col(id_col), F.col(text_col)))
    # materialize tokens before the shingle transform (see
    # shingles_from_tokens: an inlined split re-tokenizes per position)
    toked = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    ).localCheckpoint(eager=False)
    sh = shingles_from_tokens(F.col("_toks")).alias("sh")

    def _mh(seed: int):
        if hash_fn == "xxhash64":
            return lambda s: F.xxhash64(F.lit(seed), s)
        prefix = f"{seed}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    # Explode the (distinct) shingles to rows and hash in PROJECTED,
    # whole-stage-codegen'd columns, then take the per-doc min of each
    # hash family with a map-side partial aggregation — one array
    # traversal total instead of n_hashes interpreted
    # array_min(transform(...)) passes per row (higher-order functions
    # never enter codegen). min(long)/min(string) over the exploded rows
    # equals array_min over the array: same values, same lexicographic
    # string order. The null guard keeps null-text parity with the HOF
    # path (null shingle -> null hash -> null signature; xxhash64 would
    # otherwise hash a null away and produce a non-null signature).
    # NOTE: assumes id_col is unique per row (it is a doc id everywhere
    # in this repo) — duplicate ids would merge signatures.
    sh_rows = toked.select(F.col(id_col), sh).select(
        F.col(id_col), F.explode_outer("sh").alias("_sh")
    )
    hash_cols = [
        F.when(F.col("_sh").isNotNull(), _mh(i)(F.col("_sh"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    with_sig = (
        sh_rows.select(F.col(id_col), *hash_cols)
        .groupBy(id_col)
        .agg(*[F.min(f"h{i}").alias(f"mh{i}") for i in range(n_hashes)])
    )
    n_bands = n_hashes // band_size

    def _band(b: int) -> F.Column:
        members = [F.col(f"mh{b * band_size + r}") for r in range(band_size)]
        if hash_fn == "xxhash64":
            return F.xxhash64(F.lit(b), *members).alias(f"band{b}")
        return F.md5(
            F.concat_ws("|", F.lit(str(b)), *[m.cast("string") for m in members])
        ).alias(f"band{b}")

    band_cols = [_band(b) for b in range(n_bands)]
    return with_sig.select(F.col(id_col), *[F.col(f"mh{i}") for i in range(n_hashes)], *band_cols)


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """LSH bucket-join: docs sharing any band key become a candidate pair.
    Shuffle is keyed by band value — never a cross join.

    `max_bucket` caps the bucket size (None = uncapped, the exact-oracle
    default). Use minhash_candidate_pairs_capped at scale — it also
    returns the dropped-bucket accounting."""
    pairs, _dropped = minhash_candidate_pairs_capped(
        df, text_col, id_col, n_hashes, band_size, max_bucket, hash_fn
    )
    return pairs


def minhash_candidate_pairs_capped(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = 256,
    hash_fn: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """LSH candidate pairs with a degenerate-bucket cap.

    A band bucket of k docs yields k(k-1)/2 pairs; boilerplate-identical
    or empty documents can land a whole corpus slice in ONE bucket and
    go quadratic at scale. Standard practice is to drop (or sample)
    buckets over a threshold and account for the drop — near-identical
    docs in a dropped bucket are still caught by exact dedup on the
    content hash (operators/dedup.py:exact_duplicates).

    Returns (pairs, dropped_buckets(band, bucket_size)) — route the
    second into the S15 error/audit side table.
    """
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, band_size, hash_fn)
    n_bands = n_hashes // band_size
    # (id, band) needs no cross-row dedup: signatures carry one row per
    # doc and every band value hashes its band INDEX in, so a doc's
    # bands are distinct by construction (and the terminal pair-level
    # dropDuplicates guards the result regardless) — the old
    # .dropDuplicates() here cost a full Exchange of the band set.
    bands = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(f"band{b}") for b in range(n_bands)])).alias("band"),
    )

    if max_bucket is not None:
        sizes = bands.groupBy("band").agg(F.count(F.lit(1)).alias("bucket_size"))
        dropped = sizes.where(F.col("bucket_size") > max_bucket)
        # anti-join keeps the fact flow one broadcastable dimension away
        # from the uncapped plan (dropped buckets are few by construction)
        bands = bands.join(broadcast(dropped.select("band")), "band", "left_anti")
    else:
        dropped = (
            bands.select("band").limit(0).withColumn("bucket_size", F.lit(0).cast("long"))
        )

    a = bands.select(F.col("band"), F.col(id_col).alias("id_a"))
    b = bands.select(F.col("band"), F.col(id_col).alias("id_b"))
    pairs = (
        a.join(b, "band")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    return pairs, dropped


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (default: LSH candidates).
    Verification stage of the near-dup pipeline; only candidate pairs are
    scored, so cost is O(candidates), not O(n^2)."""
    if pairs is None:
        pairs = minhash_candidate_pairs(df, text_col, id_col)
    sh = df.select(F.col(id_col), shingles(F.col(text_col)).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    scored = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash sketch: per-token md5-derived bit pattern, majority vote per
    bit. Narrow per-row computation (explode + two groupBys on id).

    32 bits (not 64) so the per-bit integer stays exact in cross-engine
    comparisons; near-dup lookup groups on the sketch or prefix bands.
    """
    toks = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok")
    )
    # token hash: first 8 hex chars of md5 -> 32-bit int
    toks = toks.withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    bit_votes = toks.select(
        F.col(id_col),
        *[
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{b}")
            for b in range(bits)
        ],
    ).groupBy(id_col).agg(*[F.sum(f"b{b}").alias(f"b{b}") for b in range(bits)])
    sketch = bit_votes.select(
        F.col(id_col),
        sum(
            [F.when(F.col(f"b{b}") > 0, F.lit(2**b)).otherwise(F.lit(0)) for b in range(bits)],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sketch


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 12,
    paragraph_delim: str | None = None,
    fan_out: bool = True,
) -> DataFrame:
    """Paragraph/chunk-level exact dedup (the CCNet recipe, Wenzek et al.
    2020 — public): split every document into units, hash each unit, keep
    only the globally FIRST occurrence of each distinct unit (ordered by
    (id, position)), and reassemble the surviving text per document.
    Boilerplate paragraphs (nav bars, cookie banners, footers) repeat
    across millions of pages and vanish here while unique prose survives.

    `paragraph_delim` (a split regex, e.g. r"\\n{2,}") selects real
    paragraph mode for corpora with layout; corpora without newlines
    (or token streams) use fixed `chunk_words` windows over the
    whitespace tokens — same algebra, same dedup semantics.

    Scale shape: one narrow explode (each doc yields its own chunks), ONE
    shuffle on the chunk hash for the keep-first window (hash groups are
    duplicate-sets — tiny), and ONE shuffle back on the doc id for
    reassembly. No self-joins, no all-pairs anything; survives 100 TB.

    Returns (id, total_chunks, kept_chunks, dedup_text) — docs whose text
    has no non-empty chunk produce no row.
    """
    from pyspark.sql.window import Window

    # fan_out=False for callers whose input is ALREADY distributed by an
    # upstream exchange (e.g. the curate cascade's survivor frame): the
    # spread probe would re-plan the caller's whole subtree just to learn
    # the repartition is a no-op.
    df = df.select(F.col(id_col), F.col(text_col))
    if fan_out:
        df = spread(df)
    if paragraph_delim is not None:
        chunks = F.filter(
            F.transform(
                F.split(F.col(text_col), paragraph_delim), lambda p: F.trim(p)
            ),
            lambda p: p != "",
        )
    else:
        toks = _tokens(F.col(text_col))
        n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_words))).cast("int")
        chunks = F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * chunk_words + 1, chunk_words), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    exploded = (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .where(F.col("chunk") != "")
        .withColumn("chunk_hash", F.md5("chunk"))
    )
    w = Window.partitionBy("chunk_hash").orderBy(F.col(id_col), F.col("chunk_idx"))
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_chunks"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("kept_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct(F.col("chunk_idx"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


def neardup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH candidate pairs closed under
    transitivity via the pipeline's connected-components operator, so a
    chain a~b~c dedupes to ONE representative even when (a, c) never
    collide in any band. This is the step that turns pairwise dedup into
    corpus dedup (keep one doc per component) — and it runs the exact CC
    loop the knowledge-graph canonicalizer uses (operators/canonicalize.py),
    giving that loop an INDEPENDENT cross-engine oracle (DuckDB recursive
    transitive closure) on top of its composite kg_* certification.

    Each candidate pair becomes a bipartite edge pair (doc -> pair-key);
    doc ids are zero-padded to width 12 so the component representative
    (lexicographic-min key) is also the NUMERIC min doc id. Only docs that
    appear in at least one candidate pair are emitted — everything else is
    trivially its own singleton.

    Scale shape: pair generation is the banded LSH equi-join (never
    all-pairs); the CC loop is candidate-scale (orders of magnitude below
    corpus scale) with broadcast label maps and explicit entity-width
    repartitioning.

    Returns (id, cluster_rep) with cluster_rep = min doc id of the
    component.
    """
    from serialization_agents_spark.operators.canonicalize import (
        connected_components,
    )

    pairs = minhash_candidate_pairs(df, text_col, id_col, hash_fn=hash_fn)
    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
    pair_key = F.concat(F.lit("pair:"), pad("id_a"), F.lit(":"), pad("id_b"))
    edges = (
        pairs.select(pad("id_a").alias("entity_key"), pair_key.alias("merge_key"))
        .unionByName(
            pairs.select(pad("id_b").alias("entity_key"), pair_key.alias("merge_key"))
        )
    )
    labels, _iters = connected_components(edges)
    return labels.select(
        F.col("entity_key").cast("long").alias(id_col),
        F.col("component").cast("long").alias("cluster_rep"),
    )


def repeated_span_stats(
    docs: DataFrame,
    k: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated-span statistics — the cheap relative of
    suffix-array ExactSubstr dedup (Lee et al., 'Deduplicating Training
    Data Makes Language Models Better'): every k-token window (stride 1
    = every position, exact for ANY shared span of >= k tokens, any
    alignment), where non-overlapping chunk dedup (chunk_dedup) only
    catches chunk-aligned repeats. `stride > 1` is a cost knob that
    trades recall for rows: with BOTH sides sampled at stride s, only
    offset differences divisible by s are caught — keep s = 1 unless a
    winnowing-style content-defined sampler replaces it. A window
    occurrence is 'duplicated' when its text appears in >= 2 DISTINCT
    documents; within-doc repetition is the repetition_features gate's
    job, not this one's.

    Returns (doc_id, n_windows, dup_windows, dup_fraction) per doc with
    at least one full window (shorter docs carry no k-token evidence).

    Scale shape: one narrow window transform + explode (stride bounds
    the blow-up at len/stride rows per doc), one distinct + hash agg on
    the window text (map-side combine absorbs boilerplate heads), one
    equi-join back (hot boilerplate keys are probe-side skew; AQE
    splits them), one per-doc agg. dup_fraction divides two identical
    integers in both engines — no float drift.
    """
    docs = spread(docs.select(F.col(id_col), F.col(text_col)))
    toks = _tokens(F.col(text_col))
    # Materialize tokens once (interpreted HOF lambdas re-evaluate an
    # inlined split() per window position), then build each window gram
    # and hash it to a 64-bit key IN THE SAME transform: the dup
    # decision only needs equality, so the shuffles (distinct, dup agg,
    # probe join) carry 8-byte longs instead of ~60-char window strings
    # — ~8x fewer shuffle bytes, long-vs-long comparisons. The window
    # TEXT never leaves the map side. (The DuckDB oracle still groups
    # by the string; the certification run is what proves the hash key
    # introduces no collision on gate data — a 64-bit collision among
    # ~10^6 distinct windows has probability ~1e-7.)
    toked = (
        docs.where(F.size(toks) >= k)
        .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .localCheckpoint(eager=False)
    )
    n_wins = F.floor((F.size(F.col("_toks")) - k) / stride) + 1
    win_hashes = F.transform(
        F.sequence(F.lit(0), (n_wins - 1).cast("int")),
        lambda i: F.xxhash64(
            F.array_join(F.slice(F.col("_toks"), i * stride + 1, k), " ")
        ),
    )
    occ = toked.select(
        "doc_id", F.explode(win_hashes).alias("win")
    ).localCheckpoint(eager=False)  # feeds the dup agg AND the join probe
    dup_wins = (
        occ.select("doc_id", "win")
        .distinct()
        .groupBy("win")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("win", F.lit(1).alias("is_dup"))
    )
    return (
        occ.join(dup_wins, "win", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("dup_windows"),
        )
        .select(
            "doc_id", "n_windows", "dup_windows",
            F.round(
                F.col("dup_windows").cast("double") / F.col("n_windows"), 4
            ).alias("dup_fraction"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 10,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-token gram, then keep the MINIMUM
    hash of each window of `w` consecutive gram hashes. Guarantee: any
    span shared by two documents of length >= k + w - 1 tokens shares
    at least one fingerprint, at ~2/(w+1) sampling density — the
    content-defined sampler that makes span-level dedup affordable
    where repeated_span_stats' stride-1 enumeration is the exact but
    row-heavy path.

    hash_fn='md5' keeps hex-string hashes so a SQL oracle reproduces
    fingerprints bit-for-bit (lexicographic min); 'xxhash64' is the
    ~4x-cheaper 64-bit production family (same guarantee).

    Returns DISTINCT (doc_id, fp) pairs. All work is per-row array
    expressions (narrow) + one distinct; docs shorter than k + w - 1
    tokens emit nothing.
    """
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    docs = spread(docs.select(F.col(id_col), F.col(text_col)))
    toks = _tokens(F.col(text_col))
    # Materialize the token array ONCE before the gram pass: expressions
    # inside an interpreted HOF lambda are re-evaluated per element (no
    # codegen, no common-subexpression elimination), so an inlined
    # split() re-tokenizes per gram position — measured ~2x the gram
    # stage at sf1.0. The gram build and hash then FUSE into a single
    # transform (no intermediate gram-string array materialized).
    toked = (
        docs.where(F.size(toks) >= k + w - 1)
        .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .localCheckpoint(eager=False)
    )
    _hash = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    hs = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_toks")) - k),
        lambda i: _hash(F.array_join(F.slice(F.col("_toks"), i + 1, k), " ")),
    )
    # MATERIALIZE the gram-hash array before the window pass too:
    # without this checkpoint the per-window lambda re-evaluates the
    # ENTIRE hs transform — O(len^2 * k) hash calls per doc, measured
    # 60x slower at sf0.1. One linear hash pass, then O(len * w) mins.
    hashed = toked.select("doc_id", hs.alias("_hs")).localCheckpoint(eager=False)
    # Sliding-window min via two doubling zip_with passes (w = 4):
    #   a[j] = min(hs[j], hs[j+1]);  b[j] = min(a[j], a[j+2])
    #         = min(hs[j..j+3])  for j <= L-4
    # — two linear array passes instead of one slice + array_min
    # allocation PER WINDOW POSITION. zip_with pads the shorter side
    # with nulls and least() skips nulls, so the tail entries of a/b are
    # partial-window junk; the final slice keeps exactly the L-w+1 full
    # windows. Same mins, same values (least == array_min over the same
    # 4 elements, longs and md5 hex strings alike).
    if w != 4:  # generic fallback for non-default windows
        fps = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(F.col("_hs")) - w),
                lambda j: F.array_min(F.slice(F.col("_hs"), j + 1, w)),
            )
        )
    else:
        hs_c = F.col("_hs")
        a = F.zip_with(
            hs_c, F.slice(hs_c, 2, F.size(hs_c) - 1), lambda x, y: F.least(x, y)
        )
        b = F.zip_with(
            a, F.slice(a, 3, F.size(hs_c) - 2), lambda x, y: F.least(x, y)
        )
        fps = F.array_distinct(F.slice(b, 1, F.size(hs_c) - (w - 1)))
    # (doc_id, fp) is globally DISTINCT by construction: `hashed` has one
    # row per doc and fps is array_distinct per row — a cross-row
    # .distinct() here would re-shuffle every fingerprint to prove a
    # property the algebra already guarantees (it cost a full Exchange
    # of the fingerprint set until round 6).
    return hashed.select("doc_id", F.explode(fps).alias("fp"))


def winnow_pairs(
    docs: DataFrame,
    k: int = 10,
    w: int = 4,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    max_bucket: int | None = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Document pairs sharing >= min_shared winnowing fingerprints:
    (id_a, id_b, n_shared). The fingerprint is the blocking key — a
    within-fingerprint self-join, never all-pairs — with the same
    bucket-cap + drop-audit contract as minhash_candidate_pairs_capped
    (boilerplate fingerprints are the hot keys at 100 TB; capped
    buckets are reported, not silently joined).

    Returns (pairs, dropped_fingerprints(fp, bucket_size)).
    """
    fps = winnow_fingerprints(
        docs, k=k, w=w, text_col=text_col, id_col=id_col, hash_fn=hash_fn
    ).localCheckpoint(eager=False)  # feeds bucket sizes + both join sides
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("bucket_size"))
    if max_bucket is not None:
        dropped = sizes.where(F.col("bucket_size") > max_bucket)
        keep = fps.join(
            F.broadcast(dropped.select("fp")), "fp", "left_anti"
        )
    else:
        dropped = sizes.where(F.lit(False))
        keep = fps
    a = keep.select(F.col("fp"), F.col("doc_id").alias("id_a"))
    b = keep.select(F.col("fp"), F.col("doc_id").alias("id_b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs, dropped.select("fp", "bucket_size")
