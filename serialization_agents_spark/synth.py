"""Deterministic synthetic corpus generator (FIXTURES.md shapes).

- ``synth_authority`` — VIAF-like dimension (shape of `registry.viaf`,
  /root/reference/lib/utils.js:89) built driver-side (it is small by
  design: authorities are a dimension, pages are the fact table). The
  golden rows from the reference's unit fixtures
  (/root/reference/test/utils.test.js: Plato :24-65, Andrews :163-198,
  Zawidzka :233-275, Wehrli :317-350) are appended verbatim so ported
  tests assert identical merge outputs.
- ``synth_pages`` — Common-Crawl-style pages built **distributively**:
  `spark.range(n)` + deterministic `xxhash64`-derived pseudo-randomness,
  so the generator itself scales to any page count with zero driver
  memory. One "celebrity" agent appears in ~10% of pages (head-entity
  skew, FIXTURES.md §1); remaining names quadratically skewed.
- ``synth_redirects`` / ``synth_blacklist`` — small static fixtures
  (golden rows from /root/reference/test/viaf.test.js:8-63 and the TMS
  blacklist, lib/tms_serialize_objects_agents.js:211).

Every value is a pure function of (row id, seed): re-running at any
parallelism yields byte-identical tables.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from serialization_agents_spark import schemas
from serialization_agents_spark.functions.normalize import normalize_name_py

SEED = 42

FIRST_NAMES = [
    "Ann", "Wanda", "Abraham", "Aristocles", "Maria", "Johann", "Elena", "Pierre",
    "Ingrid", "Carlos", "Yuki", "Amara", "Niels", "Sofia", "Viktor", "Leila",
    "Marcus", "Freya", "Dmitri", "Clara", "Hassan", "Beatrix", "Otto", "Lucia",
    "Edgar", "Miriam", "Stefan", "Paloma", "Henrik", "Zora", "Felix", "Nadia",
    "Oscar", "Greta", "Ivan", "Celeste", "Rudolf", "Anya", "Tobias", "Margit",
]
LAST_NAMES = [
    "Andrews", "Zawidzka", "Lincoln", "Wehrli", "Okafor", "Lindgren", "Moreau",
    "Takahashi", "Petrov", "Silva", "Novak", "Haugen", "Keller", "Rossi",
    "Vargas", "Olsen", "Brandt", "Kowalski", "Duran", "Eriksen", "Falk",
    "Grimaldi", "Holst", "Ibarra", "Jensen", "Krause", "Lorenz", "Meyer",
    "Nilsson", "Ortega", "Palmer", "Quint", "Richter", "Sorensen", "Tanaka",
    "Ulrich", "Vogel", "Weiss", "Xavier", "Ypsilanti",
]

CELEBRITY_NAME = "Plato"  # authority index 0: the head entity (~10% of pages)

NAV_HTML = '<nav class="site-nav"><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a></nav>'
AD_HTML = '<div class="ad">Buy widgets now! Limited offer.</div>'
FOOTER_HTML = '<footer>&copy; 2024 Example Archive. All rights reserved.</footer>'


# ---------------------------------------------------------------------------
# Authority dimension
# ---------------------------------------------------------------------------
def _golden_authority_rows() -> list[dict]:
    """The four reference unit-test fixtures, verbatim (data, not code)."""
    return [
        dict(
            viaf_id="108159964",
            viaf_all=["108159964", "299190368", "306339535", "261509958", "85932949",
                      "257631224", "262857497", "288392106", "104723617", "85932965",
                      "59087945", "79033290", "250661051", "104718382", "265620858",
                      "305056294", "312737481", "264723928"],
            source_count=31, type="Personal", has_lc=True, lc_id="n79139459",
            getty_id="500248317", wikidata_id="Q859", lc_term="Plato LC TEST",
            dnb_term="Plato v427-v347", viaf_term="Plato", birth="-427-01-01",
            death="-347", dbpedia_id="Plato",
            normalized=["plato", "plato v427 v347"], fast=[46610],
        ),
        dict(
            viaf_id="53706985", viaf_all=["53706985"], source_count=1,
            type="Personal", has_lc=True, lc_id="no89014249", getty_id=None,
            wikidata_id=None, lc_term="Andrews, Ann, 1890-1986", dnb_term=None,
            viaf_term="Andrews, Ann, 1890-1986", birth="1890-10-13",
            death="1986-01-23", dbpedia_id=None,
            normalized=["andrews ann 1890 1986"], fast=[1492506, 1727006],
        ),
        dict(
            viaf_id="9096637", viaf_all=["9096637"], source_count=7,
            type="Personal", has_lc=True, lc_id="n95078597", getty_id=None,
            wikidata_id="Q7967152", lc_term="Zawidzka-Manteuffel, Wanda, 1906-1994",
            dnb_term="Zawidzka-Manteuffel, Wanda, 1906-1994",
            viaf_term="Zawidzka, Wanda, 1906-1994", birth="1906-02-07",
            death="1994-05-04", dbpedia_id="Wanda_Zawidzka-Manteuffel",
            normalized=["zawidzka manteuffel wanda 1906 1994",
                        "zawidzka wanda 1906 1994"], fast=[359929],
        ),
        dict(
            viaf_id="96139673", viaf_all=["96139673"], source_count=1,
            type="Personal", has_lc=False, lc_id=None, getty_id="500066483",
            wikidata_id=None, lc_term=None, dnb_term=None,
            viaf_term="Wehrli, A. G. (Swiss photographer, active early 20th century)",
            birth="1870", death="1960", dbpedia_id=None,
            normalized=["wehrli a g swiss photographer active early 20th century"],
            fast=[],
        ),
    ]


def authority_records(n_auth: int = 400) -> list[dict]:
    """Deterministic authority rows (pure arithmetic, no RNG state)."""
    rows = []
    for i in range(n_auth):
        if i == 0:
            first, last = "", CELEBRITY_NAME  # mononym head entity
            display = CELEBRITY_NAME
            viaf_term = CELEBRITY_NAME
        else:
            first = FIRST_NAMES[(i * 7) % len(FIRST_NAMES)]
            last = LAST_NAMES[(i * 13) % len(LAST_NAMES)]
            # Mostly-unique names (middle initial), with a deliberate ~6%
            # collision rate (i % 17 == 0 drops the initial) so the
            # name-conflict merge path (A5/CC) stays exercised.
            if i % 17 == 0:
                display = f"{first} {last}"
                viaf_term = f"{last}, {first}"
            else:
                mid = chr(65 + (i * 3) % 26)
                display = f"{first} {mid}. {last}"
                viaf_term = f"{last}, {first} {mid}."
        birth = 1750 + (i * 11) % 200
        death = birth + 40 + (i * 3) % 45
        has_lc = (i % 10) < 7
        lc_term = f"{viaf_term}, {birth}-{death}" if has_lc else None
        is_corp = (i % 10) == 9
        normalized = sorted(
            {normalize_name_py(x) for x in [lc_term, viaf_term, display] if x}
        )
        rows.append(
            dict(
                viaf_id=str(100000000 + i * 97),
                viaf_all=[str(100000000 + i * 97)]
                + ([str(900000000 + i)] if i % 5 == 0 else []),
                source_count=1 + (i % 30),
                type="Corporate" if is_corp else "Personal",
                has_lc=has_lc,
                lc_id=f"n{79000000 + i}" if has_lc else None,
                getty_id=str(500000000 + i) if i % 3 == 0 else None,
                wikidata_id=f"Q{1000 + i}" if i % 2 == 0 else None,
                lc_term=lc_term,
                dnb_term=None,
                viaf_term=viaf_term,
                birth=str(birth) if i % 4 != 3 else None,
                death=str(death) if i % 4 != 3 else None,
                dbpedia_id=display.replace(" ", "_") if i % 6 == 0 else None,
                normalized=normalized,
                fast=[10000 + i] if i % 2 == 0 else [],
                _display=display,  # internal: page-rendering name
            )
        )
    return rows


def synth_authority(spark: SparkSession, n_auth: int = 400) -> DataFrame:
    rows = [
        {k: v for k, v in r.items() if k != "_display"} for r in authority_records(n_auth)
    ]
    # Golden fixtures appended after the synthetic block (Plato is already
    # index 0 with different ids; golden Plato has viaf 108159964 and is
    # only used by the ported unit tests, not by page rendering).
    rows += _golden_authority_rows()
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf, schema=schemas.AUTHORITY)


def synth_redirects(spark: SparkSession) -> DataFrame:
    """Golden rows from /root/reference/test/viaf.test.js:8-63."""
    rows = [
        ("264030008", "137799745", None, None),
        ("9431627", None, None, None),  # deleted
        ("137799745", None, "n87890313", None),
        ("85312226", None, "n85367769", "22324673"),
    ]
    return spark.createDataFrame(rows, schema=schemas.VIAF_REDIRECTS)


def synth_blacklist(spark: SparkSession) -> DataFrame:
    rows = [("Unknown",), ("Anonymous",), ("[no name]",), ("Unidentified",)]
    return spark.createDataFrame(rows, schema=schemas.NAME_BLACKLIST)


# ---------------------------------------------------------------------------
# Pages fact table — fully distributed generation
# ---------------------------------------------------------------------------
def _h(col_id: Column, tag: str, mod: int) -> Column:
    """Deterministic pseudo-random int in [0, mod) from (id, tag, SEED)."""
    return F.pmod(F.xxhash64(col_id, F.lit(tag), F.lit(SEED)), F.lit(mod))


def _mention_html(name: Column, viaf: Column, lc: Column, mode: Column) -> Column:
    """Render one mention sentence. mode 1 carries a data-viaf attribute
    (the analogue of the reference's VIAF-backed `sc:agents` entries);
    mode 2 carries a data-lcnaf URI (the P3 path, analogue of the MMS
    valueURI records, /root/reference/lib/utils_mms.js:67-70) when the
    authority has an LC id; everything else is a plain span that must be
    linked by name (the non-VIAF pass)."""
    return (
        F.when(
            mode == 1,
            F.format_string(
                '<p>Work by <span class="agent" data-viaf="%s">%s</span> reviewed.</p>',
                viaf, name,
            ),
        )
        .when(
            (mode == 2) & lc.isNotNull(),
            F.format_string(
                '<p>Work by <span class="agent" '
                'data-lcnaf="http://id.loc.gov/authorities/names/%s">%s</span>'
                " reviewed.</p>",
                lc, name,
            ),
        )
        .otherwise(
            F.format_string(
                '<p>Work by <span class="agent">%s</span> reviewed.</p>', name
            )
        )
    )


def _mention_text(name: Column) -> Column:
    return F.format_string("Work by %s reviewed.", name)


def synth_pages(
    spark: SparkSession,
    n_pages: int = 2000,
    n_auth: int = 400,
    n_noise: int = 50,
    partitions: int | None = None,
    html_kb: int = 2,
) -> DataFrame:
    """Distributed page generator. Each page gets 1-5 agent mentions:

    - slot C: the celebrity (authority[0]) in ~10% of pages (skew);
    - slot 1: always, quadratically-skewed authority pick;
    - slot 2: 60% of pages, independent skewed pick;
    - slot N: 25% of pages, a noise name absent from the authority
      (exercises the noViaf surrogate-key path);
    - slot S: 20% of pages, a name-typed subject block (P4 promotion,
      priority 2) + 10% a topic-typed block that must be ignored.

    Slots 1/2 mix hint kinds: 60% data-viaf, 15% data-lcnaf URIs (P3 —
    plain when the pick has no LC id), rest plain name-linked spans.

    `text` is pre-extracted for ~70% of rows and NULL otherwise (forcing
    the extraction path); `lang` is 85% 'en' with de/fr/es tails.

    Implementation note: authority picks are resolved through broadcast
    JOINS against a small (idx, name, viaf) dimension — NOT through
    element_at over a literal array. A plan carrying n_auth inline
    literals makes every downstream Catalyst analysis pass O(n_auth),
    which dominates wall time for every action whose lineage includes the
    generator.
    """
    auth = authority_records(n_auth)
    dim = spark.createDataFrame(
        [(i, r["_display"], r["viaf_id"], r["lc_id"]) for i, r in enumerate(auth)],
        "idx int, dim_name string, dim_viaf string, dim_lc string",
    )

    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    cid = F.col("id")

    def pick(tag: str) -> Column:
        # Quadratic skew toward low indices (Zipf-ish tail).
        u = _h(cid, tag, 1_000_000) / F.lit(1_000_000.0)
        return (u * u * F.lit(n_auth)).cast("int")

    def dim_as(slot_n: int) -> DataFrame:
        return dim.select(
            F.col("idx").alias(f"idx{slot_n}"),
            F.col("dim_name").alias(f"name{slot_n}"),
            F.col("dim_viaf").alias(f"viaf{slot_n}"),
            F.col("dim_lc").alias(f"lc{slot_n}"),
        )

    df = (
        df.withColumn("idx1", pick("m1"))
        .withColumn("idx2", pick("m2"))
        .withColumn("idx3", pick("m3"))
        .join(F.broadcast(dim_as(1)), "idx1")
        .join(F.broadcast(dim_as(2)), "idx2")
        .join(F.broadcast(dim_as(3)), "idx3")
    )

    def slot(tag: str, present: Column, name: Column, viaf: Column, lc: Column):
        # mention mode: 60% viaf-hinted, 15% lcnaf-annotated (P3; plain
        # when the pick has no LC id), 25% plain name-linked spans.
        draw = _h(cid, tag + "_hint", 100)
        mode = F.when(draw < 60, 1).when(draw < 75, 2).otherwise(0)
        html = F.when(present, _mention_html(name, viaf, lc, mode))
        text = F.when(present, _mention_text(name))
        return html, text

    celeb_present = _h(cid, "celeb", 100) < 10
    celeb_name = F.lit(auth[0]["_display"])
    celeb_viaf = F.lit(auth[0]["viaf_id"])
    celeb_hinted = F.when(_h(cid, "celeb_hint", 100) < 60, 1).otherwise(0)
    c_html = F.when(
        celeb_present,
        _mention_html(celeb_name, celeb_viaf, F.lit(None).cast("string"), celeb_hinted),
    )
    c_text = F.when(celeb_present, _mention_text(celeb_name))

    s1_html, s1_text = slot("m1", F.lit(True), F.col("name1"), F.col("viaf1"), F.col("lc1"))
    s2_present = _h(cid, "p2", 100) < 60
    s2_html, s2_text = slot("m2", s2_present, F.col("name2"), F.col("viaf2"), F.col("lc2"))

    noise_present = _h(cid, "pn", 100) < 25
    noise_name = F.format_string("Unlisted Person %d", _h(cid, "noise", n_noise))
    n_html = F.when(
        noise_present,
        _mention_html(noise_name, F.lit(""), F.lit(None).cast("string"), F.lit(0)),
    )
    n_text = F.when(noise_present, _mention_text(noise_name))

    # P4 coverage: 20% of pages carry a name-typed subject block (promoted
    # into the agents stream at priority 2) and 10% a topic-typed one
    # (which must stay OUT of the graph).
    subj_present = _h(cid, "subj", 100) < 20
    subj_html = F.when(
        subj_present,
        F.format_string(
            '<p>Subjects: <span class="subject" data-type="name">%s</span></p>',
            F.col("name3"),
        ),
    )
    subj_text = F.when(subj_present, F.format_string("Subjects: %s", F.col("name3")))
    topic_present = _h(cid, "topic", 100) < 10
    topic_html = F.when(
        topic_present,
        F.format_string(
            '<p>Theme: <span class="subject" data-type="topic">Topic T%d</span></p>',
            _h(cid, "topicn", 20),
        ),
    )
    topic_text = F.when(
        topic_present, F.format_string("Theme: Topic T%d", _h(cid, "topicn", 20))
    )

    filler = F.format_string("Page %d of the example archive.", cid)
    # Realistic page weight (real crawl pages are tens of KB): padding
    # prose that flows through extraction and mention scanning like any
    # other body text. Deterministic, mention-free.
    pad_unit = "lorem ipsum dolor sit amet consetetur sadipscing elitr sed diam nonumy "
    n_units = max(1, (html_kb * 1024) // len(pad_unit))
    padding = F.rtrim(F.repeat(F.lit(pad_unit), n_units))
    body_text = F.concat_ws(
        " ", c_text, s1_text, s2_text, n_text, subj_text, topic_text, filler, padding
    )
    body_html = F.concat_ws(
        "", c_html, s1_html, s2_html, n_html, subj_html, topic_html,
        F.format_string("<p>%s</p>", filler),
        F.concat(F.lit("<p>"), padding, F.lit("</p>")),
    )
    html = F.concat(
        F.lit("<html><head><title>Example</title>"
              "<script>track();</script><style>.x{}</style></head><body>"),
        F.lit(NAV_HTML), body_html, F.lit(AD_HTML), F.lit(FOOTER_HTML),
        F.lit("</body></html>"),
    )

    lang_bucket = _h(cid, "lang", 100)
    lang = (
        F.when(lang_bucket < 85, "en")
        .when(lang_bucket < 90, "de")
        .when(lang_bucket < 95, "fr")
        .otherwise("es")
    )
    has_text = _h(cid, "hastext", 100) < 70

    return df.select(
        F.format_string("https://example.org/site%d/page%d", cid % 1000, cid).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + cid % 86400).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.when(has_text, body_text).alias("text"),
        lang.alias("lang"),
    )
