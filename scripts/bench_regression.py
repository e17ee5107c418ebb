"""Regression gate against the round-2 bench anchor (BENCH_r02.json).

Usage: python scripts/bench_regression.py <fresh_bench.json> [anchor]

A query > 1.3x slower than the anchor is a regression that needs a
PLANS.md entry (algorithm swap, semantics change, ...); queries absent
from the anchor are reported as new. Exits nonzero on unexplained
regressions so the check can gate a commit.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 1.3

# Regressions with a PLANS.md justification (query -> note). Keep in
# sync with the "plan changes and bench-delta notes" section.
EXPLAINED: dict[str, str] = {}


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver-recorded BENCH_r{N}.json wrapper
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    fresh = load(sys.argv[1])
    anchor = load(sys.argv[2] if len(sys.argv) > 2
                  else os.path.join(REPO, "BENCH_r02.json"))
    bad = []
    for q, t in sorted(fresh.items()):
        if q not in anchor:
            print(f"  new      {q:24s} {t:8.3f}s")
            continue
        ratio = t / anchor[q] if anchor[q] else float("inf")
        tag = ("REGRESSED" if ratio > THRESHOLD and q not in EXPLAINED
               else "explained" if ratio > THRESHOLD
               else "ok")
        print(f"  {tag:9s} {q:24s} {t:8.3f}s vs {anchor[q]:.3f}s "
              f"({ratio:.2f}x)")
        if tag == "REGRESSED":
            bad.append(q)
    if bad:
        print(f"\n{len(bad)} unexplained regression(s) > {THRESHOLD}x: "
              f"{bad} — add a PLANS.md entry or fix.")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
