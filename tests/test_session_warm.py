"""The session warm-up's KG stage must actually execute (r6 change 16).

`_warm_session` wraps it in a broad try/except so a stripped environment
can still build sessions — which means a regression (an operator
signature change, a synth schema drift) would fail SILENTLY and move the
flagship pipeline's cold-start cost back inside the first measured
query. This test calls the un-guarded helper directly so any such break
surfaces at pytest time, and checks it leaves no NEW storage pinned
(the ContextCleaner contract the bench's end-of-run assert relies on).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from serialization_agents_spark.session import _warm_kg_stack


def _cached_rdd_ids(spark) -> set[int]:
    return {
        info.id() for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_warm_kg_stack_runs_and_releases(spark):
    before = _cached_rdd_ids(spark)
    _warm_kg_stack(spark)  # raises on any operator/synth drift
    # the pass dereferences everything and nudges GC; ContextCleaner
    # drains asynchronously — poll briefly like kg_cache_clear does
    deadline = time.time() + 30.0
    leaked = _cached_rdd_ids(spark) - before
    while leaked and time.time() < deadline:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)
        leaked = _cached_rdd_ids(spark) - before
    assert not leaked, f"warm pass left storage pinned: {leaked}"
