"""As-of join semantics: backward/forward, at-or-equal timestamps,
equal-ts tie resolution, tolerance, no-match NULLs, partitioning
invariance, and the one-shuffle plan shape."""

from __future__ import annotations

import contextlib
import io
import re

from serialization_agents_spark.operators.asof import asof_join


def _left(spark):
    return spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u2", 50), (4, "u3", 10)],
        "lid long, user string, ts long",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("u1", 90, 900),   # before lid=1
            ("u1", 100, 901),  # AT lid=1's ts  -> wins (<= semantics)
            ("u1", 100, 902),  # same ts, larger tiebreak -> this one wins
            ("u1", 200, 903),  # latest before lid=2
            ("u2", 60, 904),   # after lid=3 -> no backward match
        ],
        "user string, ts long, rid long",
    )


def test_backward_with_equal_ts_and_ties(spark):
    out = {
        r["lid"]: r
        for r in asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            right_ts="ts", tiebreak="rid",
        ).collect()
    }
    assert out[1]["asof_rid"] == 902 and out[1]["asof_ts"] == 100
    assert out[2]["asof_rid"] == 903 and out[2]["asof_ts"] == 200
    assert out[3]["asof_rid"] is None  # only future right rows
    assert out[4]["asof_rid"] is None  # no right rows at all


def test_forward(spark):
    out = {
        r["lid"]: r
        for r in asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            right_ts="ts", direction="forward", tiebreak="rid",
        ).collect()
    }
    # earliest at-or-after; equal-ts tie resolves to the LEAST tiebreak
    assert out[1]["asof_rid"] == 901 and out[1]["asof_ts"] == 100
    assert out[2]["asof_rid"] is None  # nothing at/after 205
    assert out[3]["asof_rid"] == 904 and out[3]["asof_ts"] == 60


def test_tolerance(spark):
    out = {
        r["lid"]: r
        for r in asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            right_ts="ts", tiebreak="rid", tolerance=4,
        ).collect()
    }
    # lid=2 at 205: match at 200 is within 5 > tolerance 4 -> nulled
    assert out[2]["asof_rid"] is None
    # lid=1 at 100: match at 100 is within tolerance
    assert out[1]["asof_rid"] == 902


def test_partitioning_invariance(spark):
    a = asof_join(
        _left(spark).repartition(5), _right(spark).repartition(3),
        on="user", left_ts="ts", right_ts="ts", tiebreak="rid",
    ).collect()
    b = asof_join(
        _left(spark).coalesce(1), _right(spark).coalesce(1),
        on="user", left_ts="ts", right_ts="ts", tiebreak="rid",
    ).collect()
    key = lambda r: r["lid"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_asof_is_one_shuffle_no_join(spark):
    """The union-window form: exactly ONE Exchange (on the key), zero
    join nodes — the property that keeps it viable at 10^12 events
    where a range join would explode candidates per key."""
    df = asof_join(
        _left(spark), _right(spark), on="user", left_ts="ts",
        right_ts="ts", tiebreak="rid",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "Join" not in plan
