"""Headline benchmark: runs the flagship KG pipeline + representative
operators at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Every query is forced with .count() (full execution, nothing cached
between queries). `kg_triples` is the end-to-end pipeline: extract ->
mentions -> link -> merge -> CC canonicalize -> triples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from serialization_agents_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "kg_triples",
    "kg_agents",
    "kg_extract_text",
    "dedup_exact",
    # the xxhash64 production hash (md5 stays on the CORRECTNESS row,
    # where DuckDB must replay signatures bit-for-bit)
    "dedup_minhash_pairs_prod",
    "dedup_simhash",
    # chunk-level (CCNet-style) dedup: explode + one hash shuffle + one
    # doc-id shuffle — the paragraph-dedup workhorse of a webtext pipeline
    "dedup_chunks",
    # the one-call filter-dedup cascade (exact dedup -> lang -> quality
    # -> repetition -> chunk dedup) — the flagship training-data query
    "webtext_curate",
    # crawl-capture canonical-URL dedup (window keep-latest, one shuffle)
    "url_dedup_latest",
    # benchmark decontamination (gram explode + broadcast probe + one agg)
    "text_decontaminate",
    # co-mention relatedness edges (capped pair expansion, no self-join)
    "kg_cooccurrence",
    "ann_cosine_top3",
    "ann_ivf_top3",
    # quantized Lloyd refinement: per-round Arrow assignment + one
    # (cells x dim) mean shuffle
    "ann_kmeans_refine",
    "dedup_embedding_neardup",
    # stride-1 repeated-span fraction (ExactSubstr-lite): window explode
    # + one hash agg + one equi-join back
    "dedup_repeated_spans",
    # winnowing fingerprints at ~2/5 density + fp-blocked pair join
    # (xxhash64 prod family; md5 stays on the CORRECTNESS row)
    "dedup_winnow_pairs_prod",
    # CCNet-style LM quality buckets: LM hash agg + dim join + quantile
    "text_perplexity_bucket",
    # bucketized point-in-interval join (events x validity windows)
    "o9_interval_join",
    "text_quality",
    "text_lang_id",
    "j1_broadcast_lookup_join",
    "o2_window_top1_orders",
    "a5_groupby_set_union",
    "o4_sessionize",
    "j4_fuzzy_scores",
    "j5_variant_match",
]


def run(sf_dir: str, cpus: str) -> dict:
    spark = get_spark(
        app_name="sas-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # JVM/codegen warmup
    qs = entrymod.queries()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        rows[name] = n
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
    # Release the memoized kg pipeline's pinned persists AND its
    # localCheckpoint blocks (ContextCleaner path — see kg_cache_clear's
    # docstring), then ASSERT the storage is actually empty so a
    # refactor can't silently re-grow the per-corpus residual.
    released = entrymod.kg_cache_clear(wait_cleanup_s=15.0)
    leaked = [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    print(f"# cache_clear released {released} entries, "
          f"{len(leaked)} RDDs still cached", file=sys.stderr)
    assert not leaked, (
        f"kg_cache_clear left {len(leaked)} RDDs in executor storage"
    )
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    triples_per_sec = round(rows.get("kg_triples", 0) / max(times.get("kg_triples", 1e-9), 1e-9), 1)
    return {
        "metric": "headline_queries_total_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": int(cpus),
        "rows": rows,
        "triples_per_sec_end_to_end": triples_per_sec,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    result = run(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
