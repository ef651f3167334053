"""Garbage-input robustness: malformed pages must flow through
detect_mentions + link_mentions without exceptions, producing exactly the
rows the semantics call for (never crashing the 100 TB job on one bad
record — the reference wraps these in logError, lib/utils.js:238)."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.operators.extract import with_extracted_text
from serialization_agents_spark.operators.linking import link_mentions
from serialization_agents_spark.operators.mentions import detect_mentions

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, h, None, "en") for u, h in rows], PAGES_SCHEMA
    )


def test_malformed_pages_survive_detection(spark):
    pages = _pages(
        spark,
        [
            ("u://null-html", None),
            ("u://empty-html", b""),
            # invalid utf-8 bytes: cast to string must not throw
            ("u://bad-bytes", b"\xff\xfe<p>\x80\x81</p>"),
            # empty span body: [^<]+ does not match -> no mention row
            ("u://empty-span", b'<p><span class="agent"></span></p>'),
            # punctuation-only name normalizes to '' -> filtered
            ("u://punct-name", b'<p><span class="agent">!!!</span></p>'),
            # unterminated span: no closing tag -> regex never matches
            ("u://unterminated", b'<p><span class="agent">Ann Andrews'),
            # data-lcnaf URI without /names/ tail -> lc_hint NULL, name kept
            ("u://bad-lcnaf",
             b'<p><span class="agent" data-lcnaf="http://example.org/x">'
             b"Ann Andrews</span></p>"),
            # empty data-viaf attribute -> viaf_hint NULL, name kept
            ("u://empty-viaf",
             b'<p><span class="agent" data-viaf="">Bob Brown</span></p>'),
            # a normal row as control
            ("u://ok",
             b'<p><span class="agent" data-viaf="53706985">Ann Andrews</span></p>'),
        ],
    )
    m = detect_mentions(pages, include_subjects=True)
    rows = {r["url"]: r for r in m.collect()}
    assert set(rows) == {"u://bad-lcnaf", "u://empty-viaf", "u://ok"}
    assert rows["u://bad-lcnaf"]["lc_hint"] is None
    assert rows["u://bad-lcnaf"]["viaf_hint"] is None
    assert rows["u://empty-viaf"]["viaf_hint"] is None
    assert rows["u://ok"]["viaf_hint"] == "53706985"


def test_malformed_pages_survive_linking_and_extraction(spark):
    from serialization_agents_spark import synth

    pages = _pages(
        spark,
        [
            ("u://null-html", None),
            ("u://bad-bytes", b"\xff\xfe<p>\x80\x81</p>"),
            ("u://bad-lcnaf",
             b'<p><span class="agent" data-lcnaf="nope">Ann Andrews</span></p>'),
        ],
    )
    authority = synth.synth_authority(spark, n_auth=20)
    linked, dead = link_mentions(
        detect_mentions(with_extracted_text(pages), include_subjects=True),
        authority,
        redirects=synth.synth_redirects(spark),
        blacklist=synth.synth_blacklist(spark),
    )
    out = linked.collect()
    assert dead.count() == 0
    # the one well-formed mention links by name or gets a noViaf key;
    # nothing throws, nothing silently duplicates
    assert [r["url"] for r in out] == ["u://bad-lcnaf"]
    assert out[0]["entity_key"].startswith(("viaf:", "noViaf:"))


def test_empty_corpus_through_full_cascade(spark):
    """Zero pages -> zero mentions -> zero linked rows, no exceptions
    anywhere in the cascade (guards count-based width derivations)."""
    from serialization_agents_spark import synth
    from serialization_agents_spark.operators.canonicalize import canonicalize_agents
    from serialization_agents_spark.operators.merge import merge_entities, score_alt_forms

    pages = _pages(spark, []).limit(0)
    authority = synth.synth_authority(spark, n_auth=5)
    linked, _dead = link_mentions(detect_mentions(pages), authority)
    agents = merge_entities(linked)
    canonical, iters = canonicalize_agents(agents)
    assert score_alt_forms(canonical).count() == 0
