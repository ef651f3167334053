"""Phase-level timing of the kg pipeline chain (diagnostic only; not a
bench). Forces each stage of _kg_canonical's dependency chain in order
and prints the incremental wall time per phase, so the serial
driver-action cost is attributable. Extra .count() forcings make the
TOTAL slightly larger than kg_triples' bench line; the per-phase deltas
are what matter.

    SPARK_GRAFT_SF_DIR=... python tools/kg_phase_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from serialization_agents_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="kg-phase",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    t = time.time()

    def mark(label):
        nonlocal t
        now = time.time()
        print(f"{label}: {now - t:.2f}s", file=sys.stderr)
        t = now

    from serialization_agents_spark.operators.canonicalize import canonicalize_agents
    from serialization_agents_spark.operators.linking import link_mentions
    from serialization_agents_spark.operators.merge import merge_entities, score_alt_forms

    mentions = e._kg_mentions(spark, sf_dir)
    auth = e._kg_authority(spark, sf_dir).localCheckpoint(eager=False)
    mark("build mentions+auth frames (lazy)")
    linked, _dead = link_mentions(mentions, auth, redirects=e._kg_redirects(spark, sf_dir))
    mark("link_mentions construction (incl. its eager actions, if any)")
    linked = linked.persist()
    linked.count()
    mark("force linked (fact path: scan+extract+link)")
    agents = merge_entities(linked).localCheckpoint(eager=False)
    agents.count()
    mark("force agents merge")
    canonical, iters = canonicalize_agents(agents)
    mark(f"canonicalize (CC iters={iters})")
    canonical = score_alt_forms(canonical).persist()
    canonical.count()
    mark("score_alt_forms + persist")
    # triples view on top of the frames just built (same algebra as the
    # kg_triples query, no second pipeline build)
    from serialization_agents_spark.operators.triples import materialize_triples

    n = materialize_triples(canonical, linked).count()
    mark(f"materialize_triples count ({n} rows)")


if __name__ == "__main__":
    main()
