"""TMS multi-variant matching golden tests — ports the reference's
utils_tms assertions (/root/reference/test/utils.test.js:316-385) onto
the J5/X7/X8/A4 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.operators.variants import (
    build_agent_from_variant_match,
    build_check_names,
    clean_agent_dates,
    match_by_check_names,
)

_AGENT_SCHEMA = (
    "agent_id long, name_alpha string, name_display string, "
    "date_start string, date_end string"
)
_AUTH_SCHEMA = (
    "viaf_id string, viaf_all array<string>, type string, lc_id string, "
    "getty_id string, wikidata_id string, lc_term string, viaf_term string, "
    "birth string, death string, dbpedia_id string, "
    "normalized array<string>, fast array<long>"
)

# Wehrli fixture, test/utils.test.js:316-357 (normalized form shortened to
# the name-blockable variant so the J5 path, not a VIAF id, makes the hit).
_WEHRLI_AUTH = (
    "96139673", ["96139673"], "Personal", None, "500066483", None,
    None, "Wehrli, A. G. (Swiss photographer, active early 20th century)",
    "1870", "1960", None, ["wehrli a g"], [],
)


def _run(spark, agents_rows, auth_rows):
    agents = spark.createDataFrame(agents_rows, _AGENT_SCHEMA)
    auth = spark.createDataFrame(auth_rows, _AUTH_SCHEMA)
    staged = build_check_names(clean_agent_dates(agents))
    return build_agent_from_variant_match(match_by_check_names(staged, auth))


def test_check_names_golden_order(spark):
    """X8 — the exact ordered variants of the reference fixtures."""
    agents = spark.createDataFrame(
        [
            (1700, "Wehrli, A. G.", "A. G. Wehrli", "1900", "1919"),
            (13485, "Lincoln, Abraham President", "President Abraham Lincoln",
             "1809", "1865"),
        ],
        _AGENT_SCHEMA,
    )
    rows = {
        r["agent_id"]: r["check_names"]
        for r in build_check_names(clean_agent_dates(agents)).collect()
    }
    assert rows[1700] == [
        "Wehrli, A. G., 1900-1919",
        "Wehrli, A. G., 1900-",
        "Wehrli, A. G.",
        "A. G. Wehrli",
    ]
    assert rows[13485] == [
        "Lincoln, Abraham President, 1809-1865",
        "Lincoln, Abraham President, 1809-",
        "Lincoln, Abraham President",
        "President Abraham Lincoln",
    ]


def test_wehrli_matched_agent(spark):
    """A4 with VIAF data: viafTerm wins (lcTerm absent), authority dates
    override the TMS dates — test/utils.test.js:316-357."""
    out = _run(
        spark,
        [(1700, "Wehrli, A. G.", "A. G. Wehrli", "1900", "1919")],
        [_WEHRLI_AUTH],
    ).collect()[0]
    assert out["viaf"] == "96139673"
    assert out["matched_variant"] == 3  # plain nameAlpha variant
    assert out["agent_type"] == "personal"
    assert out["death"] == "1960"
    assert (
        out["name_controlled"]
        == "Wehrli, A. G. (Swiss photographer, active early 20th century)"
    )


def test_lincoln_unmatched_agent(spark):
    """A4 without VIAF data: checkNames[0] (the dated form) is the
    controlled name, cleaned dates become birth/death —
    test/utils.test.js:358-385."""
    out = _run(
        spark,
        [(13485, "Lincoln, Abraham President", "President Abraham Lincoln",
          "1809", "1865")],
        [_WEHRLI_AUTH],
    ).collect()[0]
    assert out["viaf"] is None
    assert out["matched_variant"] is None
    assert out["agent_type"] == "personal"
    assert out["death"] == "1865"
    assert out["birth"] == "1809"
    assert out["name_controlled"] == "Lincoln, Abraham President, 1809-1865"


def test_date_cleanup_rules(spark):
    """X7 — 0 -> null; start+100 == end -> null; the JS `false+100`
    coercion quirk; non-numeric -> null
    (lib/tms_serialize_objects_agents.js:167-172)."""
    agents = spark.createDataFrame(
        [
            (1, "A", "A d", "0", "1900"),     # start nulled, end kept
            (2, "B", "B d", "1800", "1900"),  # end = start+100 -> nulled
            (3, "C", "C d", "0", "100"),      # JS quirk: null start coerces to 0
            (4, "D", "D d", "c. 1800", "1900"),  # non-numeric start -> null
            (5, "E", "E d", "1800", "1850"),  # both kept
            (6, "F", "F d", "1950ca", "2050"),   # parseInt prefix: 1950; +100 -> end nulled
            (7, "G", "G d", None, "100"),        # source-NULL start: NaN+100 keeps end
            (8, "H", "H d", " +1850", "1900"),   # parseInt sign/whitespace
        ],
        _AGENT_SCHEMA,
    )
    rows = {
        r["agent_id"]: (r["date_start"], r["date_end"])
        for r in clean_agent_dates(agents).collect()
    }
    assert rows[1] == (None, 1900)
    assert rows[2] == (1800, None)
    assert rows[3] == (None, None)
    assert rows[4] == (None, 1900)
    assert rows[5] == (1800, 1850)
    assert rows[6] == (1950, None)
    assert rows[7] == (None, 100)
    assert rows[8] == (1850, 1900)


def test_first_hit_wins_priority(spark):
    """J5 — when several variants have hits, the EARLIEST checkNames
    position wins (lib/utils_tms.js:104-110 first-hit backfill)."""
    # authority knows both the dated form (pos 1) and the display (pos 4)
    auth = [
        ("11", ["11"], "Personal", None, None, None, None, "Dated Hit",
         None, None, None, ["x y 1800 1850"], []),
        ("22", ["22"], "Personal", None, None, None, None, "Display Hit",
         None, None, None, ["the x y"], []),
    ]
    out = _run(spark, [(9, "X Y", "The X Y", "1800", "1850")], auth).collect()[0]
    assert out["matched_variant"] == 1
    assert out["viaf"] == "11"
    assert out["name_controlled"] == "Dated Hit"


def test_ampersand_corporate_heuristic(spark):
    """X9 on the TMS path — '&' in namePart => corporate
    (lib/utils_tms.js:146-147)."""
    out = _run(
        spark, [(7, "Smith & Sons", "The Smith & Sons", None, None)], [_WEHRLI_AUTH]
    ).collect()[0]
    assert out["agent_type"] == "corporate"
    assert out["name_controlled"] == "Smith & Sons"
