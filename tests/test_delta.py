"""snapshot_diff: keyed CDC classification between two snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from serialization_agents_spark.operators.delta import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, fingerprint STRING")


def test_snapshot_diff_classifies_all_three_kinds(spark):
    old = _snap(spark, [(1, "aa"), (2, "bb"), (3, "cc"), (4, "dd")])
    new = _snap(spark, [(1, "aa"), (2, "XX"), (4, "dd"), (5, "ee")])
    got = {
        r["doc_id"]: (r["change"], r["old_fingerprint"], r["new_fingerprint"])
        for r in snapshot_diff(old, new).collect()
    }
    # 1 and 4 are unchanged -> absent; 2 changed, 3 removed, 5 added.
    assert got == {
        2: ("changed", "bb", "XX"),
        3: ("removed", "cc", None),
        5: ("added", None, "ee"),
    }


def test_snapshot_diff_empty_old_marks_everything_added(spark):
    old = _snap(spark, [])
    new = _snap(spark, [(7, "zz")])
    rows = snapshot_diff(old, new).collect()
    assert [(r["doc_id"], r["change"]) for r in rows] == [(7, "added")]


def test_snapshot_diff_identical_snapshots_is_empty(spark):
    snap = _snap(spark, [(1, "aa"), (2, "bb")])
    assert snapshot_diff(snap, snap.select("*")).count() == 0


def test_snapshot_diff_custom_key_and_fingerprint_cols(spark):
    old = spark.createDataFrame([("u1", "h1")], "url STRING, h STRING")
    new = spark.createDataFrame([("u1", "h2")], "url STRING, h STRING")
    rows = snapshot_diff(old, new, key_col="url", fingerprint_col="h").collect()
    assert [(r["url"], r["change"]) for r in rows] == [("u1", "changed")]


def test_snapshot_diff_projects_before_join(spark):
    """Wide payload columns must not ride the join: the plan's join node
    sees only (key, fingerprint)."""
    old = _snap(spark, [(1, "aa")]).withColumn("html", F.repeat(F.lit("x"), 10))
    new = _snap(spark, [(1, "bb")]).withColumn("html", F.repeat(F.lit("y"), 10))
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "html" not in plan
