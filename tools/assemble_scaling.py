"""Assemble the round-4 scaling evidence from every cell measured tonight.

Inputs: the JSONL logs of the pair/triple collectors (one dict per rep
with walls per corpus size). Method:

- WITHIN-REP marginals: the cells of one rep share a JVM and a time
  window; a rep whose every cell passes its plausibility screen yields a
  directly usable marginal.
- SLOT MINIMA: the host cap only ever SLOWS a cell, so the minimum wall
  observed for a (cores, size, temperature) slot across all reps
  converges on the clean wall from above; marginals from slot minima are
  the best available estimate when no single rep lands fully clean.
- CONSISTENCY SCREEN: marginals must decrease with cores (m1 >= m2 >=
  m4 >= m8); any slot assignment violating that is flagged, not hidden.

    python tools/assemble_scaling.py <log> [<log> ...]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main():
    # slot -> list of walls. Slots are (cores, pages, slot_index) where
    # slot_index encodes temperature: triples are [warmup@small,
    # hot@big, hot@small]; pairs are [coldish@big, hot@small].
    slot_walls: dict[tuple, list] = defaultdict(list)
    reps = []
    for path in sys.argv[1:]:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            if "walls" in d:  # triple collector format
                reps.append(d)
                sizes = [300_000, 600_000, 300_000]
                for i, w in enumerate(d["walls"]):
                    slot_walls[(d["cores"], sizes[i], i)].append(w)
            elif "cells" in d:  # pair collector format
                reps.append(d)
                for p, w in d["cells"].items():
                    slot_walls[(d["cores"], int(p), "pair")].append(w)

    print("== slot minima (s) ==")
    minima = {}
    for k in sorted(slot_walls, key=str):
        minima[k] = min(slot_walls[k])
        print(f"  cores={k[0]:>2} pages={k[1]:>6} slot={k[2]}: "
              f"min {minima[k]:.2f}  (n={len(slot_walls[k])}, "
              f"all={sorted(round(w, 1) for w in slot_walls[k])})")

    # hot-slot marginals from triple protocol (slots 1=big, 2=small)
    print("\n== marginals from HOT slot minima (triple protocol) ==")
    m = {}
    for cores in (1, 2, 4, 8):
        b = minima.get((cores, 600_000, 1))
        s = minima.get((cores, 300_000, 2))
        if b is not None and s is not None:
            m[cores] = (b - s) / 300_000 * 1e6
            print(f"  m{cores} = ({b:.2f} - {s:.2f}) / 300k = {m[cores]:.1f} us/page")
    print("\n== pair-protocol marginals (coldish big - hot small; "
          "upper-bound biased) ==")
    mp = {}
    for cores in (1, 2, 4, 8):
        b = minima.get((cores, 600_000, "pair"))
        s = minima.get((cores, 300_000, "pair"))
        if b is not None and s is not None:
            mp[cores] = (b - s) / 300_000 * 1e6
            print(f"  m{cores} = ({b:.2f} - {s:.2f}) / 300k = {mp[cores]:.1f} us/page")

    for tag, mm in (("triple-hot", m), ("pair", mp)):
        print(f"\n== efficiencies ({tag}) ==")
        for lo, hi in ((1, 4), (2, 8), (1, 2), (2, 4), (4, 8)):
            if lo in mm and hi in mm:
                eff = (mm[lo] / mm[hi]) / (hi / lo)
                mark = " <-- criterion pair" if hi == 4 * lo else ""
                print(f"  {lo} -> {hi}: ({mm[lo]:.1f}/{mm[hi]:.1f})/{hi // lo}"
                      f" = {eff:.3f}{mark}")
        mono = all(
            mm[a] >= mm[b] for a, b in ((1, 2), (2, 4), (4, 8)) if a in mm and b in mm
        )
        print(f"  monotonicity (m1>=m2>=m4>=m8): {'OK' if mono else 'VIOLATED'}")


if __name__ == "__main__":
    main()
