"""End-to-end gates:

1. Spark triples vs the pure-Python oracle — precision/recall >= 0.95
   (BASELINE.json north_rule; in practice they should be identical).
2. Deterministic re-run: identical output checksums.
3. Resume-from-checkpoint: killing after stage k and re-running skips
   completed stages and yields byte-identical results.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from serialization_agents_spark import oracle, synth
from serialization_agents_spark.plans.lineage import global_checksum
from serialization_agents_spark.plans.pipeline import run_pipeline

N_PAGES = 400
N_AUTH = 120


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synth.synth_pages(spark, n_pages=N_PAGES, n_auth=N_AUTH)
    authority = synth.synth_authority(spark, n_auth=N_AUTH)
    redirects = synth.synth_redirects(spark)
    blacklist = synth.synth_blacklist(spark)
    return pages, authority, redirects, blacklist


def _pr(spark_triples: set, oracle_triples: set) -> tuple[float, float]:
    tp = len(spark_triples & oracle_triples)
    precision = tp / len(spark_triples) if spark_triples else 0.0
    recall = tp / len(oracle_triples) if oracle_triples else 0.0
    return precision, recall


def test_error_log_side_table(spark, corpus, tmp_path):
    """S15 — corrupted/blacklisted/dead inputs produce audit rows in the
    `_errors` side table instead of disappearing silently
    (reference lib/utils.js:238 logError)."""
    pages, authority, redirects, blacklist = corpus
    junk = spark.createDataFrame(
        [
            # html that strips to nothing -> extract/empty_text
            ("u://junk/1", None, b"<html><head><title>x</title></head><body>"
             b"<nav>only nav</nav></body></html>", None, "en"),
            # blacklisted junk name -> link/blacklisted_name
            ("u://junk/2", None, b'<p><span class="agent">Unknown</span></p>',
             None, "en"),
            # golden deleted VIAF id 9431627 (test/viaf.test.js:22-30)
            # -> link/dead_viaf
            ("u://junk/3", None,
             b'<p><span class="agent" data-viaf="9431627">Ghost</span></p>',
             None, "en"),
        ],
        pages.schema,
    )
    res = run_pipeline(
        spark, pages.unionByName(junk), authority, redirects, blacklist,
        out_dir=str(tmp_path / "out"),
    )
    errs = res.errors.collect()
    by_reason = {}
    for r in errs:
        by_reason.setdefault(r["reason"], []).append(r)
    assert [e["url"] for e in by_reason["empty_text"]] == ["u://junk/1"]
    assert [(e["url"], e["detail"]) for e in by_reason["blacklisted_name"]] == [
        ("u://junk/2", "Unknown")
    ]
    assert [(e["url"], e["detail"]) for e in by_reason["dead_viaf"]] == [
        ("u://junk/3", "9431627")
    ]
    for e in errs:
        assert e["stage"] in ("extract", "link")
    # errors must NOT leak into the graph: blacklisted/dead mentions are
    # dropped or name-linked, never viaf-linked to the dead id
    assert res.triples.where(F.col("obj").contains("9431627")).count() == 0


def test_triples_match_oracle(spark, corpus):
    pages, authority, redirects, blacklist = corpus
    res = run_pipeline(spark, pages, authority, redirects, blacklist)
    spark_triples = {
        (r["subj"], r["pred"], r["obj"]) for r in res.triples.collect()
    }

    pages_rows = [r.asDict() for r in pages.collect()]
    auth_rows = [r.asDict() for r in authority.collect()]
    red_rows = [r.asDict() for r in redirects.collect()]
    bl = [r["name"] for r in blacklist.collect()]
    _, oracle_triples = oracle.run_oracle(pages_rows, auth_rows, red_rows, bl)

    precision, recall = _pr(spark_triples, oracle_triples)
    only_spark = list(spark_triples - oracle_triples)[:5]
    only_oracle = list(oracle_triples - spark_triples)[:5]
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f}\n+spark {only_spark}\n+oracle {only_oracle}"
    )


def test_rerun_is_deterministic(spark, corpus):
    pages, authority, redirects, blacklist = corpus
    r1 = run_pipeline(spark, pages, authority, redirects, blacklist)
    r2 = run_pipeline(spark, pages, authority, redirects, blacklist)
    c1 = global_checksum(
        r1.triples.select(F.concat_ws("", "subj", "pred", "obj").alias("k")), "k"
    )
    c2 = global_checksum(
        r2.triples.select(F.concat_ws("", "subj", "pred", "obj").alias("k")), "k"
    )
    assert c1 == c2


def test_resume_from_checkpoint(spark, corpus, tmp_path):
    pages, authority, redirects, blacklist = corpus
    out = str(tmp_path / "ckpt")

    full = run_pipeline(spark, pages, authority, redirects, blacklist, out_dir=out)
    assert full.stages_computed and not full.stages_resumed
    # A7 — observe() counters piggyback each computed stage's write and
    # must equal the materialized row counts (the reference's progress
    # counters, lib/shadowcat_serialize_viaf_agents.js:63-77)
    assert set(full.observations) == set(full.stages_computed)
    for stage, df in [("mentions", full.mentions), ("triples", full.triples)]:
        assert full.observations[stage].get["row_count"] == df.count(), stage
    want = global_checksum(
        full.triples.select(F.concat_ws("", "subj", "pred", "obj").alias("k")), "k"
    )

    # simulate a crash after 'linked': drop everything later
    for stage in ["agents", "canonical", "triples"]:
        shutil.rmtree(f"{out}/{stage}", ignore_errors=True)

    resumed = run_pipeline(spark, pages, authority, redirects, blacklist, out_dir=out)
    assert set(resumed.stages_resumed) >= {"extract", "mentions", "linked"}
    assert set(resumed.stages_computed) == {"agents", "canonical", "triples"}
    got = global_checksum(
        resumed.triples.select(F.concat_ws("", "subj", "pred", "obj").alias("k")), "k"
    )
    assert got == want


def test_until_agents_skips_downstream_and_resumes_forward(spark, corpus, tmp_path):
    """`until="agents"` is the maintenance-job shape: downstream stages
    (CC, triples, errors) are never declared — no output dirs, None
    frames — and a later FULL run resumes the already-computed prefix
    instead of recomputing it."""
    import os

    pages, authority, redirects, blacklist = corpus
    out = str(tmp_path / "until_run")
    res = run_pipeline(
        spark, pages, authority, redirects, blacklist,
        out_dir=out, until="agents",
    )
    assert res.canonical is None and res.triples is None and res.errors is None
    assert res.agents.count() > 0
    assert set(res.stages_computed) == {"extract", "mentions", "linked", "agents"}
    for stage in ("canonical", "triples", "_errors"):
        assert not os.path.exists(os.path.join(out, stage)), stage

    full = run_pipeline(spark, pages, authority, redirects, blacklist, out_dir=out)
    assert {"extract", "mentions", "linked", "agents"} <= set(full.stages_resumed)
    assert {"canonical", "triples"} <= set(full.stages_computed)
    assert full.triples.count() > 0


def test_agents_table_without_out_dir_raises(spark, corpus):
    """ADVICE round-4: agents_table with out_dir=None was silently
    ignored (materialize returns early) — must fail loudly instead."""
    import pytest

    pages, authority, redirects, blacklist = corpus
    with pytest.raises(ValueError, match="agents_table requires out_dir"):
        run_pipeline(
            spark, pages, authority, redirects, blacklist,
            agents_table="t_orphan",
        )


def test_bucketed_agents_stage_joins_without_exchange(spark, corpus, tmp_path):
    """VERDICT round-3 #5: with `agents_table` set, the agents stage is
    persisted BUCKETED on entity_key and handed downstream through the
    catalog — an entity_key aggregation or self-join over it plans with
    NO shuffle Exchange on the agents side, and the pipeline output is
    unchanged."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    def _plan(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    pages, authority, redirects, blacklist = corpus
    out = str(tmp_path / "bucketed_run")
    res = run_pipeline(
        spark, pages, authority, redirects, blacklist,
        out_dir=out, agents_table="t_agents_stage",
    )
    # the catalog-read agents frame aggregates on its bucket key with no
    # Exchange — the maintenance-join contract as a PIPELINE behavior
    agg = res.agents.groupBy("entity_key").agg(
        F.sum("mention_count").alias("m")
    )
    assert "Exchange" not in _plan(agg), "bucketed agents agg shuffled"
    join = res.agents.hint("merge").join(
        res.agents.select("entity_key"), "entity_key"
    )
    assert "Exchange" not in _plan(join), "bucketed agents join shuffled"

    # output parity with the plain-parquet run
    plain = run_pipeline(spark, pages, authority, redirects, blacklist)
    want = {r["entity_key"]: r["mention_count"] for r in plain.agents.collect()}
    got = {r["entity_key"]: r["mention_count"] for r in res.agents.collect()}
    assert got == want

    # resume path: re-run reuses the catalog table (agents not recomputed)
    res2 = run_pipeline(
        spark, pages, authority, redirects, blacklist,
        out_dir=out, agents_table="t_agents_stage",
    )
    assert "agents" in res2.stages_resumed
    assert "Exchange" not in _plan(
        res2.agents.groupBy("entity_key").agg(F.count(F.lit(1)).alias("c"))
    )
