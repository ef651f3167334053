"""X1/X2/X3 semantics, pinned by the reference's own fixture strings
(/root/reference/test/utils.test.js)."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.functions.normalize import (
    fuzzy_score_py,
    normalize_name_expr,
    normalize_name_py,
    percent_overlap_py,
)

GOLDEN = {
    # test/utils.test.js:254,261 — normalized forms in the Zawidzka fixture
    "Zawidzka-Manteuffel, Wanda, 1906-1994": "zawidzka manteuffel wanda 1906 1994",
    "Zawidzka, Wanda, 1906-1994": "zawidzka wanda 1906 1994",
    # :78,157 — nameLocal normalization
    "Coooooool Old Guy.": "coooooool old guy",
    # :66 — authority normalized forms
    "Plato v427-v347": "plato v427 v347",
    "Wehrli, A. G. (Swiss photographer, active early 20th century)":
        "wehrli a g swiss photographer active early 20th century",
    # diacritics (MMS fixture :296)
    "Katsukawa, Shunchô (fl. 1783-1821)": "katsukawa shuncho fl 1783 1821",
}


def test_normalize_py_golden():
    for raw, want in GOLDEN.items():
        assert normalize_name_py(raw) == want


def test_normalize_expr_matches_py(spark):
    rows = [(r,) for r in GOLDEN]
    df = spark.createDataFrame(rows, "raw string").select(
        "raw", normalize_name_expr(F.col("raw")).alias("norm")
    )
    for row in df.collect():
        assert row["norm"] == normalize_name_py(row["raw"]), row["raw"]


def test_normalize_handles_null_and_empty():
    assert normalize_name_py(None) is None
    assert normalize_name_py("") == ""
    assert normalize_name_py("!!!") == ""


def test_normalize_expr_matches_py_full_latin_range(spark):
    """Property: the JVM translate path and the canonical NFD impl agree
    for EVERY char in Basic Latin .. Latin Extended-B, the bare combining
    marks, and Latin Extended Additional (e.g. 'Nguyễn'), embedded in a
    name (catches table gaps like ő/ễ, non-decomposables like ø/ł/đ, and
    pre-decomposed input)."""
    sweep = [*range(0x20, 0x250), *range(0x300, 0x370), *range(0x1E00, 0x1F00)]
    rows = [(f"Na{chr(cp)}me, Test", cp) for cp in sweep]
    df = spark.createDataFrame(rows, "raw string, cp int").select(
        "raw", "cp", normalize_name_expr(F.col("raw")).alias("norm")
    )
    bad = [
        (r["cp"], r["raw"], r["norm"], normalize_name_py(r["raw"]))
        for r in df.collect()
        if r["norm"] != normalize_name_py(r["raw"])
    ]
    assert not bad, bad[:10]


def test_normalize_duckdb_sql_matches_py_sweep():
    """NORMALIZE_SQL (the DuckDB fragment) agrees with the canonical fold
    over the same sweep, except the single documented U+034F divergence
    (combining grapheme joiner: class 0, stripped by strip_accents)."""
    import duckdb

    from serialization_agents_spark.functions.normalize import NORMALIZE_SQL

    con = duckdb.connect()
    sql = NORMALIZE_SQL.format(col="?")
    sweep = [*range(0x20, 0x250), *range(0x300, 0x370), *range(0x1E00, 0x1F00)]
    bad = []
    for cp in sweep:
        s = f"Na{chr(cp)}me, Test"
        got = con.execute(f"SELECT {sql}", [s]).fetchone()[0]
        if got != normalize_name_py(s):
            bad.append(hex(cp))
    assert bad == ["0x34f"], bad[:10]


def test_normalize_non_decomposable_folds():
    assert normalize_name_py("Søren Łukasz Đorđe") == "soren lukasz dorde"
    # ligatures are out of scope for 1:1 translate -> whitespace in both
    assert normalize_name_py("Ælfric") == "lfric"


def test_fuzzy_score_identity_and_ordering():
    assert fuzzy_score_py("plato", "plato") == 1.0
    assert fuzzy_score_py("plato", "") == 0.0
    # exact block-mate beats a divergent candidate
    s_same = fuzzy_score_py("andrews ann 1890 1986", "andrews ann 1890 1986")
    s_other = fuzzy_score_py("andrews ann 1890 1986", "andrews bob 1900 1950")
    assert s_same > s_other
    # scores bounded
    for t, q in [("abc", "xyz"), ("a", "aaaa"), ("plato lc test", "plato")]:
        assert 0.0 <= fuzzy_score_py(t, q) <= 1.0


def test_percent_overlap():
    assert percent_overlap_py("a b c", "a b c") == 100.0
    assert percent_overlap_py("a b", "a c") == 50.0
    assert percent_overlap_py("", "x") == 0.0


def _random_pairs(n=400, seed=7):
    import random

    rng = random.Random(seed)
    alphabet = "abcDEF gh# 123.&'-"
    pairs = [
        ("plato", "plato"), ("plato", ""), ("", ""), ("a", "aaaa"),
        ("hello world", "hw"), ("customer 000000041", "Customer#000000041"),
    ]
    for _ in range(n):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        q = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        pairs.append((t, q))
    return pairs


def test_fuzzy_expr_parity_sweep(spark):
    """The pure-JVM fuzzy_score_expr (production path) must equal
    fuzzy_score_py (canonical impl) on hundreds of random strings."""
    from serialization_agents_spark.functions.normalize import fuzzy_score_expr

    pairs = _random_pairs()
    df = spark.createDataFrame(pairs, "t string, q string").select(
        "t", "q", fuzzy_score_expr(F.col("t"), F.col("q")).alias("s")
    )
    for row in df.collect():
        want = fuzzy_score_py(row["t"], row["q"])
        assert abs(row["s"] - want) < 1e-9, (row["t"], row["q"], row["s"], want)


def test_fuzzy_duckdb_oracle_parity_sweep():
    """The DuckDB recursive-CTE transcription used by the j4 oracle must
    walk identically to fuzzy_score_py (rounding excluded — compare raw)."""
    import duckdb

    rel = "strpos(substr(lower(t), s + 1), substr(lower(q), i + 1, 1))"
    walk = f"""
    WITH RECURSIVE walk AS (
      SELECT t, q, 0 AS i, CAST(0.0 AS DOUBLE) AS r, 0 AS s,
             CAST(1.0 AS DOUBLE) AS f FROM pq
      UNION ALL
      SELECT t, q, i + 1,
             CASE WHEN rel = 0 THEN r ELSE r
               + (CASE WHEN rel = 1 THEN 0.7 ELSE 0.1
                  + (CASE WHEN substr(t, s + rel - 1, 1) = ' ' THEN 0.8 ELSE 0.0 END) END)
               + (CASE WHEN substr(t, s + rel, 1) = substr(q, i + 1, 1) THEN 0.1 ELSE 0.0 END)
             END,
             CASE WHEN rel = 0 THEN s ELSE s + rel END,
             CASE WHEN rel = 0 THEN f + 0.5 ELSE f END
      FROM (SELECT t, q, i, r, s, f, {rel} AS rel FROM walk WHERE i < length(q)) x
    )
    SELECT t, q,
           CASE WHEN t = q THEN 1.0 WHEN length(q) = 0 THEN 0.0
                WHEN substr(lower(q),1,1) = substr(lower(t),1,1)
                     AND (0.5 * (w.r / length(t) + w.r / length(q)) / w.f) < 0.85
                THEN (0.5 * (w.r / length(t) + w.r / length(q)) / w.f) + 0.15
                ELSE (0.5 * (w.r / length(t) + w.r / length(q)) / w.f) END AS fz
    FROM walk w WHERE i = length(q)
    """
    pairs = [(t, q) for t, q in _random_pairs() if t != "" or q != ""]
    con = duckdb.connect()
    con.execute("CREATE TABLE pq (t VARCHAR, q VARCHAR)")
    con.executemany("INSERT INTO pq VALUES (?, ?)", pairs)
    got = {(t, q): v for t, q, v in con.execute(walk).fetchall()}
    for t, q in pairs:
        want = fuzzy_score_py(t, q)
        assert abs(got[(t, q)] - want) < 1e-9, (t, q, got[(t, q)], want)


def test_percent_overlap_expr_parity(spark):
    from serialization_agents_spark.functions.normalize import percent_overlap_expr

    pairs = [
        ("a b c", "a b c"), ("a b", "a c"), ("", "x"), ("", ""),
        ("a  b", "a b"), (" lead", "lead"), ("x y z w", "z"),
    ] + _random_pairs(100)
    df = spark.createDataFrame(pairs, "a string, b string").select(
        "a", "b", percent_overlap_expr(F.col("a"), F.col("b")).alias("p")
    )
    for row in df.collect():
        want = percent_overlap_py(row["a"], row["b"])
        assert abs(row["p"] - want) < 1e-9, (row["a"], row["b"], row["p"], want)
