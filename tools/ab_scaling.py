"""Interleaved A/B scaling measurement to separate machine noise from the
real parallelism signal: runs the pipeline worker alternately at two core
counts, several repetitions each, and reports per-run walls + medians.

    python tools/ab_scaling.py [n_pages] [coresA] [coresB] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, "/root/repo")
from tools.bench_scaling import run_at  # noqa: E402


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    walls: dict[int, list[float]] = {a: [], b: []}
    for i in range(reps):
        for cores in (a, b):
            r = run_at(cores, n_pages)
            walls[cores].append(r["wall_sec"])
            print(f"rep{i} local[{cores}]: {r['wall_sec']}s "
                  f"({r['triples_per_sec']} triples/s)", flush=True)
    med_a = statistics.median(walls[a])
    med_b = statistics.median(walls[b])
    best_a, best_b = min(walls[a]), min(walls[b])
    print(json.dumps({
        "walls": walls,
        "median": {a: med_a, b: med_b},
        "best": {a: best_a, b: best_b},
        "eff_median": round((med_a / med_b) / (b / a), 3),
        "eff_best": round((best_a / best_b) / (b / a), 3),
    }))


if __name__ == "__main__":
    main()
