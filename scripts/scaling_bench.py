"""Two-parallelism scaling benchmark (BASELINE.json north_rule: the
N -> 4N executor scaling criterion, evidenced in-sandbox by running the
identical bench at local[8] and local[32] on the same input).

Writes BENCH/BASELINE.md with per-level throughput and the scaling
efficiency = (T_8 / T_32) / 4 for the parallel suite.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_MODE="scaling")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    print(f"[scaling] running bench at local[{lo}] ...", file=sys.stderr)
    r_lo = run_bench(lo, sf_dir)
    print(f"[scaling] running bench at local[{hi}] ...", file=sys.stderr)
    r_hi = run_bench(hi, sf_dir)

    t_lo, t_hi = r_lo["value"], r_hi["value"]
    speedup = t_lo / t_hi
    eff = speedup / (hi / lo)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        f"Same input ({sf_dir}), identical queries, two local parallelism",
        f"levels standing in for N vs 4N executors (north_rule).",
        "",
        "| metric | local[8] | local[32] |",
        "|---|---|---|",
        f"| suite wall (s) | {t_lo} | {t_hi} |",
        f"| docs/sec | {r_lo['docs_per_sec']} | {r_hi['docs_per_sec']} |",
        f"| tiles/sec | {r_lo['tiles_per_sec']} | {r_hi['tiles_per_sec']} |",
        "",
        f"**Speedup 8->32: {speedup:.2f}x; scaling efficiency: "
        f"{eff:.2f}** (target >= 0.8 of the ideal 4x -> eff >= 0.8 means"
        f" speedup >= 3.2x; note JVM/Python-worker startup and the"
        f" single-partition exact-path operators bound the local ceiling).",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in r_lo["queries"]:
        lines.append(f"| {q} | {r_lo['queries'][q]} | "
                     f"{r_hi['queries'].get(q, '-')} |")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"speedup": round(speedup, 3),
                      "efficiency": round(eff, 3),
                      "local8_s": t_lo, "local32_s": t_hi}))


if __name__ == "__main__":
    main()
