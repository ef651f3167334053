"""Scaling-efficiency evidence (BASELINE.json north_rule: N -> 4N executor
throughput scaling efficiency >= 0.8, sandboxed as local[8] vs local[32]).

Runs the identical end-to-end KG pipeline (extract -> mentions -> link ->
merge -> CC -> triples) over the identical deterministic synthetic corpus
at two parallelism levels, in SEPARATE processes (one JVM each), and
reports docs/sec + triples/sec at both plus efficiency
(throughput32 / throughput8) / 4.

    python tools/bench_scaling.py [n_pages] [out_md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from serialization_agents_spark.session import get_spark
from serialization_agents_spark import synth
from serialization_agents_spark.plans.pipeline import run_pipeline

cores = int(os.environ["BENCH_CORES"])
# BENCH_PAGES_LIST runs several corpus sizes in ONE JVM (one startup, one
# warmup; both cells of a marginal pair share identical JIT state, so
# their difference is cleaner); BENCH_PAGES keeps the one-cell contract.
sizes = [int(s) for s in os.environ.get(
    "BENCH_PAGES_LIST", os.environ.get("BENCH_PAGES", "200000")
).split(",")]
spark = get_spark(
    app_name=f"scaling-{cores}",
    master=f"local[{cores}]",
    shuffle_partitions=max(cores * 2, 8),
    extra_conf={"spark.driver.memory": "24g"},
)
spark.range(10_000_000).selectExpr("sum(id)").collect()  # warmup

html_kb = int(os.environ.get("BENCH_HTML_KB", "30"))
for n_pages in sizes:
    pages = synth.synth_pages(
        spark, n_pages=n_pages, n_auth=2000,
        partitions=max(cores * 3, 16),  # bound per-partition bytes at low core counts
        html_kb=html_kb,
    )
    authority = synth.synth_authority(spark, n_auth=2000)
    redirects = synth.synth_redirects(spark)
    blacklist = synth.synth_blacklist(spark)

    t0 = time.time()
    res = run_pipeline(spark, pages, authority, redirects, blacklist)
    n_triples = res.triples.count()
    wall = time.time() - t0
    n_entities = res.canonical.count()
    print(json.dumps({
        "cores": cores, "n_pages": n_pages, "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_pages / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
        "n_triples": n_triples, "n_entities": n_entities,
        "cc_iterations": res.cc_iterations,
    }), flush=True)
    for df in (res.linked, res.canonical):
        try:
            df.unpersist()
        except Exception:
            pass
"""


def run_at(cores: int, n_pages: int, timeout: float = 3600) -> dict:
    env = dict(os.environ, BENCH_CORES=str(cores), BENCH_PAGES=str(n_pages))
    env.pop("BENCH_PAGES_LIST", None)
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"worker at {cores} cores produced no JSON")
    return json.loads(lines[-1])


def run_pair(cores: int, sizes: list[int], timeout: float = 3600) -> list[dict]:
    """Run several corpus sizes in ONE JVM (see BENCH_PAGES_LIST in the
    worker). On timeout, returns whatever cells completed (caller treats
    a short list as a capped/aborted pair)."""
    env = dict(os.environ, BENCH_CORES=str(cores),
               BENCH_PAGES_LIST=",".join(str(s) for s in sizes))
    try:
        out = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=timeout,
        )
        stdout = out.stdout
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
    return [json.loads(l) for l in stdout.strip().splitlines() if l.startswith("{")]


def _burn(_):
    x = 0
    for i in range(10_000_000):
        x += i * i
    return x


def cpu_ceiling(n: int) -> float:
    """Measured parallel-CPU capacity at n processes relative to 1
    (captures SMT / shared-host throttling so the pipeline's efficiency
    can be judged against what the hardware actually provides)."""
    import multiprocessing as mp
    import time

    t0 = time.time()
    with mp.Pool(n) as p:
        p.map(_burn, range(n))
    return time.time() - t0


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH/BASELINE.md"
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_big = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    t_small, t_big = cpu_ceiling(n_small), cpu_ceiling(n_big)
    # hardware ceiling for the N->4N throughput ratio at fixed per-proc work
    hw_ratio = (n_big / n_small) * (t_small / t_big)
    print(f"hardware: {n_small} procs {t_small:.2f}s, {n_big} procs {t_big:.2f}s "
          f"-> attainable throughput ratio {hw_ratio:.2f}x of {n_big // n_small}x")

    r8 = run_at(n_small, n_pages)
    print(f"local[{n_small}] :", json.dumps(r8))
    r32 = run_at(n_big, n_pages)
    print(f"local[{n_big}]:", json.dumps(r32))

    ratio = r32["triples_per_sec"] / r8["triples_per_sec"]
    eff = ratio / (n_big / n_small)
    eff_vs_hw = ratio / hw_ratio
    summary = {
        "n_pages": n_pages,
        f"local{n_small}": r8,
        f"local{n_big}": r32,
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "hardware_attainable_ratio": round(hw_ratio, 3),
        "efficiency_vs_hardware_ceiling": round(eff_vs_hw, 3),
        "target": 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(out_md) or ".", exist_ok=True)
    with open(out_md, "a") as f:
        f.write(f"""
# Scaling evidence — identical job, identical input, N={n_small} vs 4N={n_big} cores

North rule criterion: N -> 4N executor throughput scaling efficiency >= 0.8.
No multi-node cluster exists in this sandbox, so the two cluster sizes are
evidenced as two local parallelism levels in separate JVMs over the same
deterministic synthetic corpus ({n_pages:,} Common-Crawl-style pages,
2,000 authorities, head entity in ~10% of pages).

Pipeline measured end-to-end: extract -> mention-detect -> link (broadcast
joins + fuzzy top-1 window) -> salted two-phase merge -> CC canonicalize ->
triples (count forced).

| config | wall (s) | docs/sec | triples/sec | triples | CC iters |
|---|---|---|---|---|---|
| local[{n_small}]  (N)  | {r8['wall_sec']} | {r8['docs_per_sec']} | {r8['triples_per_sec']} | {r8['n_triples']} | {r8['cc_iterations']} |
| local[{n_big}] (4N) | {r32['wall_sec']} | {r32['docs_per_sec']} | {r32['triples_per_sec']} | {r32['n_triples']} | {r32['cc_iterations']} |

**Scaling efficiency (throughput@4N / throughput@N) / 4 = {eff:.3f}** (target >= 0.8)

Hardware context (measured in this sandbox with pure-CPU burns, no Spark):
{n_big} concurrent processes complete only {hw_ratio:.2f}x the throughput of
{n_small} (SMT / shared-host ceiling), so the maximum achievable
"efficiency" on this box is {hw_ratio / (n_big / n_small):.3f}.
**Pipeline efficiency relative to the hardware ceiling = {eff_vs_hw:.3f}.**

Determinism check: triple counts identical at both parallelism levels
({r8['n_triples']} == {r32['n_triples']}: {r8['n_triples'] == r32['n_triples']}),
entities {r8['n_entities']} == {r32['n_entities']}:
{r8['n_entities'] == r32['n_entities']}.
""")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
