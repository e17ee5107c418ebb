#!/bin/bash
# Scaling cohort driver: N sequential runs of the committed HEAD
# protocol (scripts/scaling_bench.py), one JSON per run. The
# inclusion rule (BENCH/NOTES.md) is: every completed run is graded.
# Usage: run_scaling_cohort.sh [runs] [round_tag]
set -u
RUNS=${1:-8}
TAG=${2:-r5}
cd /root/repo
for i in $(seq 1 "$RUNS"); do
  out="BENCH/scaling_${TAG}_run${i}.json"
  if [ -s "$out" ]; then echo "skip existing $out"; continue; fi
  echo "[cohort] run $i/$RUNS start $(date -u +%H:%M:%S)"
  python scripts/scaling_bench.py > "${out}.tmp" 2> "BENCH/scaling_${TAG}_run${i}.log"
  rc=$?
  if [ $rc -eq 0 ] && [ -s "${out}.tmp" ]; then
    mv "${out}.tmp" "$out"
    echo "[cohort] run $i done $(date -u +%H:%M:%S)"
  else
    echo "[cohort] run $i FAILED rc=$rc (kept log; will NOT count as completed)"
    rm -f "${out}.tmp"
  fi
done
echo "[cohort] all done"
