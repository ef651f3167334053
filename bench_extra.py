"""Optimization-loop helper bench (bench.py is frozen for measurement).

Times an arbitrary subset of queries() with the same methodology as
bench.py (.count() forcing, same session config), optionally with the
noop sink instead (guide §1.4) to time full-column materialization.

    python bench_extra.py [--noop] <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the
driver's measurement scale), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from serialization_agents_spark.session import get_spark  # noqa: E402


def main():
    args = sys.argv[1:]
    noop = "--noop" in args
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sas-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    times = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
            n = -1
        else:
            n = df.count()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
    entrymod.kg_cache_clear(wait_cleanup_s=5.0)
    print(json.dumps({"queries": times, "sf_dir": sf_dir, "noop": noop}))


if __name__ == "__main__":
    main()
