"""Hunt ONE clean scaling cell through host-cap waves.

Fallback for windows where a full interleaved 4-cell rep never lands
clean (waves shorter than a rep): hunt the missing cap-vulnerable cell
alone — the cap-immune local[2] cells land on-curve in any weather
(observed across rounds 3-4), so a marginal-cost pair can be assembled
from per-cell bests, each individually wave-checked against its known
clean wall. A wave can only SLOW a cell, so best-of clean observations
is conservative.

    python tools/cell_hunt.py CORES PAGES CLEAN_WALL [max_attempts]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.bench_scaling import run_at  # noqa: E402
from tools.marginal_scaling import CAP_FACTOR, jvm_is_calm  # noqa: E402


def main():
    cores = int(sys.argv[1])
    pages = int(sys.argv[2])
    clean = float(sys.argv[3])
    max_attempts = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    import time

    for attempt in range(max_attempts):
        calm, j2, j8 = jvm_is_calm()
        print(f"attempt {attempt}: jvm probe local[2] {j2:.1f}s "
              f"local[8] {j8:.1f}s calm={calm}", flush=True)
        if not calm:
            time.sleep(90)
            continue
        r = run_at(cores, pages)
        wall = r["wall_sec"]
        ok = wall <= clean * CAP_FACTOR
        print(f"attempt {attempt}: local[{cores}] {pages}: {wall}s "
              f"({r['triples_per_sec']} triples/s) clean={ok}", flush=True)
        if ok:
            print(json.dumps({"cores": cores, "pages": pages, **r}))
            return
        time.sleep(60)
    print("NO CLEAN CELL IN WINDOW")
    sys.exit(3)


if __name__ == "__main__":
    main()
