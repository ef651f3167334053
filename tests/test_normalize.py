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
