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


def _twin_corpus(spark):
    """24 queries, a planted near-duplicate twin per query, 200 noise
    vectors — deterministic; twins are the brute-force top-1s."""
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
    return emb, n_q, dim


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe must (a) never return duplicate (query, neighbor)
    pairs, (b) reach recall >= the single-bucket variant, measured
    against brute-force ground truth on a deterministic corpus."""
    emb, n_q, dim = _twin_corpus(spark)
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


def test_ivf_arrow_matches_expression_path(spark):
    """IVF cell assignment via the numpy kernel must return exactly the
    expression path's rows on a real embeddings table."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 5")
    corpus = emb.where("vec_id >= 5")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    arrow = S.ivf_topk(corpus, q, k=3, corpus_arrow=True)
    expr = S.ivf_topk(corpus, q, k=3, corpus_arrow=False)
    assert rows(arrow) == rows(expr)


def test_ivf_recall_on_planted_twins(spark):
    """With 4 of 16 cells probed, a query's planted twin (a small
    perturbation — its cell is almost always among the query's best
    cells) must surface as rank-1 for most queries."""
    emb, n_q, dim = _twin_corpus(spark)
    out = S.ivf_topk(
        emb.where("vec_id >= 100"), emb.where("vec_id < 100"),
        k=3, n_centroids=16, n_probes=4, dim=dim,
    ).collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in out]
    assert len(set(pairs)) == len(pairs)  # one cell per corpus row: no dups
    hits = {
        r["query_id"] for r in out
        if r["rank"] == 1 and r["neighbor_id"] == r["query_id"] + 100
    }
    assert len(hits) / n_q >= 0.75


def test_kmeans_refine_reduces_sse(spark):
    """Lloyd refinement over two tight blobs must cut within-cell SSE."""
    import random

    import numpy as np

    rng = random.Random(5)
    dim = 8
    mu_a = [1.0] * dim
    mu_b = [-1.0] * dim
    rows = []
    for i in range(60):
        mu = mu_a if i % 2 == 0 else mu_b
        rows.append((i, [m + rng.uniform(-0.1, 0.1) for m in mu]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c0 = S.ivf_centroids(4, dim=dim)

    def sse(cents):
        C = np.asarray(cents)
        V = np.asarray([r[1] for r in rows])
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    c1 = S.kmeans_refine(emb, c0, n_iters=2)
    assert len(c1) == 4 and len(c1[0]) == dim
    assert sse(c1) < sse(c0) * 0.5


def test_embedding_neardup_finds_planted_twins(spark):
    """The LSH-blocked cosine near-dup pass must surface planted twin
    pairs above threshold, never duplicate a pair, and respect the
    threshold on every returned row."""
    emb, n_q, dim = _twin_corpus(spark)
    pairs_df, dropped = S.embedding_neardup_pairs(
        emb, threshold=0.9, n_planes=4, dim=dim
    )
    rows = pairs_df.collect()
    assert dropped.count() == 0
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(set(keys)) == len(keys)
    assert all(r["cosine"] >= 0.9 for r in rows)
    twin_hits = {a for a, b in keys if b == a + 100}
    # sign-LSH at 4 planes keeps ~(1 - theta/pi)^4 of near-identical
    # pairs in one bucket; twins are ~cos 0.99 so most survive blocking
    assert len(twin_hits) / n_q >= 0.5


def test_pair_arrow_rerank_matches_expression_path(spark):
    """Round-4: the in-bucket/in-cell exact-cosine re-rank moved into an
    Arrow kernel (raw dot/norms in numpy, round(4) kept JVM-side). It
    must return EXACTLY the expression path's rows on real embeddings —
    pinning that BLAS summation order never crosses a rounding boundary
    on this data, the precondition for oracle parity."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 8")
    corpus = emb.where("vec_id >= 8")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    arrow = S.lsh_bucket_topk(corpus, q, k=3, n_probes=2, pair_arrow=True)
    expr = S.lsh_bucket_topk(corpus, q, k=3, n_probes=2, pair_arrow=False)
    assert rows(arrow) == rows(expr)

    arrow = S.ivf_topk(corpus, q, k=3, pair_arrow=True)
    expr = S.ivf_topk(corpus, q, k=3, pair_arrow=False)
    assert rows(arrow) == rows(expr)

    a_p, _ = S.embedding_neardup_pairs(emb, threshold=0.2, pair_arrow=True)
    e_p, _ = S.embedding_neardup_pairs(emb, threshold=0.2, pair_arrow=False)
    assert rows(a_p) == rows(e_p)


def test_kernels_tolerate_null_and_ragged_vectors(spark):
    """ADVICE round-3: a NULL or wrong-length embedding must not kill the
    job (np.stack would raise) — the kernels route such rows to a NULL
    bucket/cell, which drops out of every equi-join, mirroring the
    expression path's NULL degradation."""
    import random

    rng = random.Random(7)
    dim = 8
    good = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(20)]
    bad = [(100, None), (101, [1.0, 2.0]), (102, [])]
    emb = spark.createDataFrame(good + bad, "vec_id long, embedding array<double>")
    q = emb.where("vec_id < 3")

    # Both corpus paths must agree on the NULL posture (ADVICE round-4:
    # without _guard_dim the expression path pooled malformed rows in
    # the all-zeros bucket instead of a NULL drop).
    for corpus_arrow in (True, False):
        out = S.lsh_bucket_topk(emb.where("vec_id >= 3"), q, k=3,
                                n_planes=4, dim=dim,
                                corpus_arrow=corpus_arrow).collect()
        assert {r["neighbor_id"] for r in out}.isdisjoint({100, 101, 102})

        out = S.ivf_topk(emb.where("vec_id >= 3"), q, k=3,
                         n_centroids=4, n_probes=4, dim=dim,
                         corpus_arrow=corpus_arrow).collect()
        assert {r["neighbor_id"] for r in out}.isdisjoint({100, 101, 102})

        pairs, _ = S.embedding_neardup_pairs(emb, threshold=0.0,
                                             n_planes=2, dim=dim,
                                             corpus_arrow=corpus_arrow)
        ids = {x for r in pairs.collect() for x in (r["id_a"], r["id_b"])}
        assert ids.isdisjoint({100, 101, 102})


def _py_kmeans_lloyd(vectors, n_centroids, n_iters, dim, seed=42):
    """Pure-Python replay of kmeans_lloyd's quantized Lloyd contract:
    argmax-dot assignment with lowest-index ties, HALF_UP 4dp means."""

    def half_up(x):
        return math.copysign(math.floor(abs(x) * 10000 + 0.5) / 10000, x) + 0.0

    cents = S.ivf_centroids(n_centroids, dim, seed)
    counts = {}
    for _ in range(n_iters):
        members = {}
        for vid, v in vectors:
            if v is None or len(v) != dim:
                continue
            dots = [sum(a * b for a, b in zip(v, c)) for c in cents]
            cell = max(range(n_centroids), key=lambda i: (dots[i], -i))
            members.setdefault(cell, []).append(v)
        new = [list(c) for c in cents]
        counts = {}
        for cell, vs in members.items():
            counts[cell] = len(vs)
            for p in range(dim):
                new[cell][p] = half_up(sum(v[p] for v in vs) / len(vs))
        cents = new
    return {
        (c, p): (cents[c][p], counts.get(c, 0))
        for c in range(n_centroids)
        for p in range(dim)
    }


def test_kmeans_lloyd_matches_python_reference(spark):
    # 4-dim corpus in two tight blobs plus a NULL and a ragged vector
    # (dropped from the vote); n_centroids=4 guarantees empty cells that
    # must keep their LCG init with n_members = 0.
    rows = [(i, [1.0 + (i % 3) * 0.01, 0.2, -0.5, 0.0]) for i in range(6)]
    rows += [(10 + i, [-0.9, 1.1 + (i % 2) * 0.02, 0.4, -1.0]) for i in range(5)]
    rows += [(99, None), (98, [1.0, 2.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["cell"], r["pos"]): (r["c_val"], r["n_members"])
        for r in S.kmeans_lloyd(emb, n_centroids=4, n_iters=2, dim=4).collect()
    }
    want = _py_kmeans_lloyd(
        [(i, v) for i, v in rows], n_centroids=4, n_iters=2, dim=4
    )
    assert got == want
    # both blobs found, at least one empty cell kept its init
    n_by_cell = {c: n for (c, p), (_v, n) in got.items() if p == 0}
    assert sorted(v for v in n_by_cell.values() if v) == [5, 6]
    assert 0 in n_by_cell.values()


def test_kmeans_lloyd_no_negative_zero(spark):
    # means that land exactly on -0.0 must fold to +0.0 (oracle parity:
    # DuckDB's round keeps the sign, Spark's drops it)
    rows = [(0, [-1e-9, 1.0]), (1, [1e-9, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for r in S.kmeans_lloyd(emb, n_centroids=2, n_iters=1, dim=2).collect():
        assert math.copysign(1.0, r["c_val"]) > 0 or r["c_val"] != 0.0


def _py_sq8(corpus, queries, k, dim):
    import math as _m

    lo = [min(v[i] for _, v in corpus) for i in range(dim)]
    hi = [max(v[i] for _, v in corpus) for i in range(dim)]
    span = [h - l if h > l else 1.0 for l, h in zip(lo, hi)]

    def code(v):
        return [
            int(_m.copysign(_m.floor(abs((x - l) * 255 / s) + 0.5), (x - l)))
            for x, l, s in zip(v, lo, span)
        ]

    cc = {i: code(v) for i, v in corpus}
    out = {}
    for qid, qv in queries:
        qc = code(qv)
        scored = sorted(
            ((sum(a * b for a, b in zip(qc, c)), -nid) for nid, c in cc.items()),
            reverse=True,
        )
        out[qid] = [(-n, d) for d, n in scored[:k]]
    return out


def test_sq8_topk_matches_python_reference(spark):
    import random

    rng = random.Random(3)
    corpus = [(10 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    queries = [(0, [rng.uniform(-1, 1) for _ in range(8)]),
               (1, [rng.uniform(-1, 1) for _ in range(8)])]
    c = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(queries, "vec_id long, embedding array<double>")
    got = {}
    for r in S.sq8_topk(c, q, k=3, dim=8).collect():
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["dot_q"], r["rank"])
        )
    want = _py_sq8(corpus, queries, 3, 8)
    for qid in want:
        rows = sorted(got[qid], key=lambda t: t[2])
        assert [(n, d) for n, d, _ in rows] == want[qid]


def test_sq8_degenerate_dim_and_ragged(spark):
    # dim 1 is constant across the corpus (span defaults to 1.0, code 0);
    # a ragged vector is excluded from both the grid and the results
    corpus = [(10, [0.5, 7.0]), (11, [-0.5, 7.0]), (12, [0.1])]
    queries = [(0, [0.4, 7.0])]
    c = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(queries, "vec_id long, embedding array<double>")
    rows = S.sq8_topk(c, q, k=5, dim=2).collect()
    assert {r["neighbor_id"] for r in rows} == {10, 11}  # 12 dropped
    codes, mins, maxs = S.sq8_codes(c, dim=2)
    assert mins == [-0.5, 7.0] and maxs == [0.5, 7.0]
    got = {r["vid"]: r["code"] for r in codes.collect()}
    assert got[10] == [255, 0] and got[11] == [0, 0]


def test_rp_projection_preserves_neighborhoods(spark):
    """JL sanity on planted twins: in the 16-dim projected space, most
    planted near-duplicates must still be their query's top-1."""
    emb, n_q, dim = _twin_corpus(spark)
    out = S.rp_topk(
        emb.where("vec_id >= 100"), emb.where("vec_id < 100"),
        k=3, out_dim=8, dim=dim,
    ).collect()
    hits = {
        r["query_id"] for r in out
        if r["rank"] == 1 and r["neighbor_id"] == r["query_id"] + 100
    }
    assert len(hits) / n_q >= 0.9
    # projection is deterministic: same planes, same result
    again = S.rp_topk(
        emb.where("vec_id >= 100").repartition(9),
        emb.where("vec_id < 100"), k=3, out_dim=8, dim=dim,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_rp_project_nulls_and_shape(spark):
    rows = [(0, [1.0] * 4), (1, None), (2, [1.0, 2.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vid"]: r["rv"] for r in S.rp_project(emb, out_dim=2, dim=4).collect()}
    assert got[1] is None and got[2] is None
    assert len(got[0]) == 2
    import numpy as np

    P = np.asarray([S._hyperplane(4, 42, S.RP_BASE + j) for j in range(2)])
    assert np.allclose(got[0], P @ np.ones(4))
