"""Similarity search: brute-force exactness, LSH recall of the top match."""

from __future__ import annotations

import math

from serialization_agents_spark.operators import similarity as S


def _emb(spark):
    # 8-dim vectors: 0/1 nearly parallel, 2 orthogonal-ish, 3 opposite of 0
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0, -0.5, 0.0, 0.0, 0.0]),
        (4, [0.85, 0.15, 0.05, 0.0, 0.5, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(spark):
    emb = _emb(spark)
    q = emb.where("vec_id = 0")
    corpus = emb.where("vec_id != 0")
    out = S.cosine_topk(corpus, q, k=3, round_digits=None).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order[0] in (1, 4) and order[1] in (1, 4)  # the two near-parallels
    assert order[2] == 2
    # verify the actual cosine value against numpy-free math
    a = [1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0]
    b = [0.9, 0.1, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0]
    want = sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )
    got = {r["neighbor_id"]: r["cosine"] for r in out}[1]
    assert abs(got - want) < 1e-9


def test_lsh_bucket_topk_finds_parallel_vector(spark):
    emb = _emb(spark)
    q = emb.where("vec_id = 0")
    corpus = emb.where("vec_id != 0")
    out = S.lsh_bucket_topk(corpus, q, k=3, n_planes=4, dim=8).collect()
    # sign-signature of near-parallel vectors matches the query's bucket
    ids = {r["neighbor_id"] for r in out}
    assert 1 in ids or 4 in ids
    assert 3 not in ids  # opposite vector lands in the complement bucket


def test_lsh_arrow_buckets_match_expression_path(spark):
    """The Arrow/numpy corpus-side bucket kernel (production path) must
    return exactly the rows of the pure-JVM expression path on a real
    embeddings table — same buckets, same re-ranked neighbors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 5")
    corpus = emb.where("vec_id >= 5")

    def rows(df):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
            for r in df.collect()
        )

    for probes in (0, 3):
        arrow = S.lsh_bucket_topk(corpus, q, k=3, n_probes=probes, corpus_arrow=True)
        expr = S.lsh_bucket_topk(corpus, q, k=3, n_probes=probes, corpus_arrow=False)
        assert rows(arrow) == rows(expr), f"n_probes={probes}"


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe must (a) never return duplicate (query, neighbor)
    pairs, (b) reach recall >= the single-bucket variant, measured
    against brute-force ground truth on a deterministic corpus."""
    import random

    rng = random.Random(11)
    n_q, dim = 24, 16
    rows = []
    for i in range(n_q):  # queries 0..23
        rows.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    for i in range(n_q):  # planted near-duplicate twin of each query
        rows.append(
            (100 + i, [v + rng.uniform(-0.05, 0.05) for v in rows[i][1]])
        )
    for i in range(200):  # background noise
        rows.append((1000 + i, [rng.uniform(-1, 1) for _ in range(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id < 100")
    corpus = emb.where("vec_id >= 100")

    def top1_hits(df):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in df.collect()
            if r["rank"] == 1 and r["neighbor_id"] == r["query_id"] + 100
        }

    single_df = S.lsh_bucket_topk(corpus, q, k=3, n_planes=8, dim=dim)
    multi_df = S.lsh_bucket_topk(corpus, q, k=3, n_planes=8, dim=dim, n_probes=3)
    multi_rows = multi_df.collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in multi_rows]
    assert len(set(pairs)) == len(pairs)  # no duplicate pairs across probes
    r_single = len(top1_hits(single_df)) / n_q
    r_multi = len(top1_hits(multi_df)) / n_q
    # each twin is the true top-1; probing the 3 lowest-margin bit flips
    # must recover strictly more twins than the single bucket alone
    assert r_multi > r_single
    assert r_multi >= 0.9
