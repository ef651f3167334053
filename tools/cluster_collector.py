"""Round-long collector for the N -> 4N criterion in local-cluster mode.

The north rule wants the SAME job at N and 4N EXECUTORS with >= 0.8
throughput scaling efficiency. This sandbox's host throttles sustained
multithreaded SINGLE processes in waves (BENCH/BASELINE.md sections 6-8),
so `local-cluster[n,2,mem]` — n REAL executor JVMs, 2 threads each, netty
shuffle between them — is both the closest shape to the criterion a
single box offers AND keeps every JVM below the cap's multithread
trigger. Round 4's one-shot cluster run was still wave-poisoned
(4exec@300k slower than 4exec@600k); the fix is the round-3/4 lesson
applied to cluster mode:

- TRIPLE protocol per session: [warmup (discarded), small hot, big hot]
  in ONE driver+executor set, so both marginal cells share identical JIT
  state and the marginal is warm-bias-free;
- calm-gated: a session only launches after the JVM probe
  (tools/marginal_scaling.jvm_is_calm) passes; the probe predicts only
  the next ~30-60 s, so every cell is ALSO screened at assembly;
- collected across the whole round (this script appends one JSONL row
  per cell and loops), because clean windows are minutes long and
  unpredictable;
- assembled as per-slot MINIMA (a wave only ever slows a cell, so minima
  converge on clean walls from above) with the physical monotonicity
  screen m1 >= m4 before any efficiency is reported.

Usage:
    python tools/cluster_collector.py collect [log] [max_sessions]
        # alternates 4exec / 1exec triple sessions, calm-gated, forever
        # (or max_sessions); touch /tmp/cluster_collector.pause to make
        # it idle (checked between sessions), rm to resume.
    python tools/cluster_collector.py assemble [log]
        # slot-minima quadruple + efficiency + determinism report
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

PAUSE_FILE = "/tmp/cluster_collector.pause"
WARMUP, SMALL, MID, BIG = 30_000, 150_000, 300_000, 600_000
SLOT_PAGES = {"small": SMALL, "mid": MID, "big": BIG}
MEM_MB = 4096
# Seconds of idle between the warmup cell and the hot cell: the cap
# engages ~30-45 s into SUSTAINED load, so a pause lets its clock reset
# while the JVMs' JIT state stays warm — the hot cell then starts with
# the full ~30-45 s of grace instead of whatever the warmup left.
COOLDOWN = 25
# generous clean-wall priors (seconds) keyed by (executors, cores) —
# used only for in-session early abort (skip the big cell when the
# small one already ran capped) and per-session subprocess budgets;
# assembly relies on minima, not these.
EXPECT_SMALL = {(1, 2): 45.0, (4, 2): 40.0, (1, 1): 90.0, (4, 1): 55.0}
SESSION_BUDGET = {(1, 2): 900, (4, 2): 700, (1, 1): 1200, (4, 1): 900}

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from serialization_agents_spark.session import get_spark
from serialization_agents_spark import synth
from serialization_agents_spark.plans.pipeline import run_pipeline

n_exec = int(os.environ["CC_EXECUTORS"])
cores = int(os.environ["CC_CORES"])
mem = int(os.environ["CC_MEM_MB"])
sizes = [int(s) for s in os.environ["CC_SIZES"].split(",")]  # warmup first
abort_small = float(os.environ["CC_ABORT_SMALL"])
total_cores = n_exec * cores
spark = get_spark(
    app_name=f"cluster-collect-{n_exec}x{cores}",
    master=f"local-cluster[{n_exec},{cores},{mem}]",
    shuffle_partitions=max(total_cores * 2, 8),
    extra_conf={
        "spark.driver.memory": "8g",
        "spark.executor.memory": f"{mem}m",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    },
)
spark.range(10_000_000).selectExpr("sum(id)").collect()

canary_max = float(os.environ.get("CC_CANARY_MAX", "6"))
warmup_max = float(os.environ.get("CC_ABORT_WARMUP", "100"))


def canary() -> float:
    # in-session weather check: a fixed pure-JVM range-sum across the
    # executors; waves that cap the cluster show up here in ~1 s
    t0 = time.time()
    spark.range(500_000_000).selectExpr("sum(id)").collect()
    return time.time() - t0


small_pages = int(os.environ["CC_SMALL"])
mid_pages = int(os.environ.get("CC_MID", "300000"))
cooldown = float(os.environ.get("CC_COOLDOWN", "0"))

for i, n_pages in enumerate(sizes):
    slot = "warmup" if i == 0 else (
        "small" if n_pages == small_pages
        else ("mid" if n_pages == mid_pages else "big")
    )
    if slot != "warmup" and cooldown > 0:
        # idle gap: let the host's sustained-load clock reset while the
        # executors' JIT stays warm, so the hot cell starts with full grace
        time.sleep(cooldown)
    c = canary()
    print(json.dumps({"executors": n_exec, "slot": "canary",
                      "before": slot, "wall_sec": round(c, 2)}), flush=True)
    if c > canary_max:
        print(json.dumps({"executors": n_exec, "slot": "abort",
                          "reason": f"canary {c:.1f}s before {slot}"}),
              flush=True)
        break
    pages = synth.synth_pages(
        spark, n_pages=n_pages, n_auth=2000,
        partitions=max(total_cores * 3, 16), html_kb=30,
    )
    authority = synth.synth_authority(spark, n_auth=2000)
    redirects = synth.synth_redirects(spark)
    blacklist = synth.synth_blacklist(spark)
    t0 = time.time()
    res = run_pipeline(spark, pages, authority, redirects, blacklist)
    n_triples = res.triples.count()
    wall = time.time() - t0
    print(json.dumps({
        "executors": n_exec, "cores_per_executor": cores,
        "n_pages": n_pages, "slot": slot, "wall_sec": round(wall, 2),
        "triples_per_sec": round(n_triples / wall, 1),
        "n_triples": n_triples,
    }), flush=True)
    for df in (res.linked, res.canonical):
        try:
            df.unpersist()
        except Exception:
            pass
    if slot == "small" and wall > abort_small:
        print(json.dumps({"executors": n_exec, "slot": "abort",
                          "reason": f"small cell {wall:.1f}s > {abort_small}s"
                          }), flush=True)
        break
    if slot == "warmup" and wall > warmup_max:
        print(json.dumps({"executors": n_exec, "slot": "abort",
                          "reason": f"warmup {wall:.1f}s > {warmup_max}s"
                          }), flush=True)
        break
spark.stop()
"""


def run_session(
    n_exec: int, sizes: tuple[int, ...] | None = None, cores: int = 2
) -> list[dict]:
    env = dict(
        os.environ,
        CC_EXECUTORS=str(n_exec), CC_CORES=str(cores),
        CC_MEM_MB=str(MEM_MB),
        CC_SIZES=",".join(str(s) for s in (sizes or (WARMUP, SMALL, BIG))),
        CC_SMALL=str(SMALL), CC_MID=str(MID),
        CC_COOLDOWN=str(COOLDOWN),
        CC_ABORT_SMALL=str(EXPECT_SMALL[(n_exec, cores)] * 1.7),
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=SESSION_BUDGET[(n_exec, cores)],
        )
        stdout = out.stdout
        if out.returncode != 0 and not stdout.strip():
            print(out.stderr[-1500:], file=sys.stderr)
    except subprocess.TimeoutExpired as e:
        stdout = e.stdout or ""
        if isinstance(stdout, bytes):
            stdout = stdout.decode()
    return [json.loads(l) for l in stdout.strip().splitlines()
            if l.startswith("{")]


# The host cap strikes ~30-45 s into sustained load and discriminates by
# AGGREGATE thread count, not process count: 1exec[2] (2 threads) lands
# clean routinely while 4exec[2] (8 threads across 4 real JVMs) is
# struck in nearly every window. Two hedged tracks, both the criterion's
# 1-vs-4-executor shape at fixed cores-per-executor:
#   cores=2 track — 1exec minima are converged; the missing 4exec hot
#     cells get the most windows, preferring MID (~30 s of 8-thread
#     exposure — inside the cap's grace window) over BIG (~40 s — at
#     its edge);
#   cores=1 track — 1 vs 4 aggregate threads, far below the cap trigger;
#     slower cells but much higher clean odds.
# All hot cells are DUO sessions ([warmup, cooldown, one hot cell] —
# consistent post-warmup temperature per slot) except the proven
# 1exec[2] triple. Any small->mid, mid->big, or small->big clean pair
# yields a marginal; assembly reports every pair both tracks complete.
SCHEDULE = (
    (4, 1, (WARMUP, SMALL)),
    (4, 2, (WARMUP, MID)),
    (1, 1, (WARMUP, SMALL)),
    (4, 2, (WARMUP, BIG)),
    (4, 1, (WARMUP, MID)),
    (1, 2, (WARMUP, MID)),
    (4, 1, (WARMUP, BIG)),
    (1, 1, (WARMUP, MID)),
    (4, 2, (WARMUP, MID)),
    (1, 1, (WARMUP, BIG)),
    (4, 1, (WARMUP, SMALL)),
    (1, 2, (WARMUP, SMALL, BIG)),
)


def collect(log_path: str, max_sessions: int) -> None:
    from tools.marginal_scaling import jvm_is_calm

    done = 0
    while done < max_sessions:
        if os.path.exists(PAUSE_FILE):
            time.sleep(30)
            continue
        calm, j2, j8 = jvm_is_calm()
        print(f"[{time.strftime('%H:%M:%S')}] probe local[2] {j2:.1f}s "
              f"local[8] {j8:.1f}s calm={calm}", flush=True)
        if not calm:
            time.sleep(60)
            continue
        n_exec, cores, sizes = SCHEDULE[done % len(SCHEDULE)]
        t0 = time.time()
        rows = run_session(n_exec, sizes, cores=cores)
        stamp = time.time()
        with open(log_path, "a") as f:
            for r in rows:
                r.update(ts=round(stamp, 1), probe_j2=round(j2, 1),
                         probe_j8=round(j8, 1))
                f.write(json.dumps(r) + "\n")
        print(f"  session {n_exec}exec[{cores}]: {len(rows)} rows in "
              f"{time.time() - t0:.0f}s: "
              + " ".join(f"{r.get('slot')}={r.get('wall_sec')}" for r in rows),
              flush=True)
        done += 1
        time.sleep(15)


def assemble(log_path: str) -> dict:
    rows = [json.loads(l) for l in open(log_path) if l.strip()]
    cells = [r for r in rows if r.get("slot") in ("small", "mid", "big")]
    minima: dict[tuple[int, int, str], dict] = {}
    counts: dict[tuple[int, int, str], int] = {}
    for r in cells:
        k = (r["executors"], r["cores_per_executor"], r["slot"])
        counts[k] = counts.get(k, 0) + 1
        if k not in minima or r["wall_sec"] < minima[k]["wall_sec"]:
            minima[k] = r
    tri: dict[int, set] = {}
    for r in cells:
        tri.setdefault(r["n_pages"], set()).add(r["n_triples"])
    out: dict = {
        "mode": f"local-cluster[N,cores,{MEM_MB}] duo/triple protocol, "
                "slot minima over all observations",
        "sizes": {"warmup": WARMUP, "small": SMALL, "mid": MID, "big": BIG},
        "slot_minima_wall_sec": {
            f"{e}exec[{c}]@{s}": minima[(e, c, s)]["wall_sec"]
            for (e, c, s) in sorted(minima)
        },
        "slot_observations": {
            f"{e}exec[{c}]@{s}": counts[(e, c, s)]
            for (e, c, s) in sorted(counts)
        },
        # every session (either cluster size, any weather) must emit the
        # identical triple count per corpus size
        "deterministic_across_cluster_sizes": all(
            len(v) == 1 for v in tri.values()
        ),
        "triple_counts": {str(k): sorted(v) for k, v in tri.items()},
        "target": 0.8,
        "tracks": {},
    }
    for cores in (1, 2):
        track: dict = {"pairs": {}, "same_input_throughput_ratio": {}}
        for s in ("small", "mid", "big"):
            if (1, cores, s) in minima and (4, cores, s) in minima:
                track["same_input_throughput_ratio"][s] = round(
                    minima[(1, cores, s)]["wall_sec"]
                    / minima[(4, cores, s)]["wall_sec"], 2)
        # every (lo, hi) size pair both executor counts completed gives an
        # independent marginal estimate; fixed per-session costs cancel
        for lo, hi in (("small", "mid"), ("mid", "big"), ("small", "big")):
            have = all((e, cores, s) in minima
                       for e in (1, 4) for s in (lo, hi))
            if not have:
                continue
            d = SLOT_PAGES[hi] - SLOT_PAGES[lo]
            m1 = (minima[(1, cores, hi)]["wall_sec"]
                  - minima[(1, cores, lo)]["wall_sec"]) / d
            m4 = (minima[(4, cores, hi)]["wall_sec"]
                  - minima[(4, cores, lo)]["wall_sec"]) / d
            track["pairs"][f"{lo}->{hi}"] = {
                "marginal_us_per_page": {"1exec": round(m1 * 1e6, 1),
                                         "4exec": round(m4 * 1e6, 1)},
                "monotone": m1 >= m4 > 0,
                "marginal_scaling_efficiency_1_to_4": (
                    round(m1 / m4 / 4, 3) if m1 >= m4 > 0 else None
                ),
            }
        if track["pairs"] or track["same_input_throughput_ratio"]:
            out["tracks"][f"cores={cores}"] = track
    print(json.dumps(out, indent=1))
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "collect"
    log = sys.argv[2] if len(sys.argv) > 2 else "BENCH/cluster_collector_r05.jsonl"
    if mode == "collect":
        max_sessions = int(sys.argv[3]) if len(sys.argv) > 3 else 10**6
        collect(log, max_sessions)
    elif mode == "assemble":
        assemble(log)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
