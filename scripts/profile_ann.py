"""Per-stage N-vs-4N profile of the cosine_topk ANN DAG (round-4
verdict #2: identify the ~10% data-proportional serial fraction that
pins cosine_topk_256k at ~0.68 scaling efficiency).

Runs the EXACT scaling-cohort workload (256k synthetic vectors,
32 partitions, local-cluster executors, pre-touched heaps) with Spark
event logging on, then decomposes the timed run into:

* per-stage wall time (completion - submission) and executor run time
  (sum over tasks) — a stage whose wall does NOT shrink N -> 4N is
  parallel-starved (skew / too few tasks / serialized resource);
* inter-stage DRIVER GAPS (wall time inside the timed region not
  covered by any running stage) — driver-side planning, collects,
  broadcast builds, blocking unpersists: the classic serial fraction.

Usage: python scripts/profile_ann.py [n_executors] [n_vectors]
Prints one JSON line per run plus a human table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EXEC = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N_VEC = int(sys.argv[2]) if len(sys.argv) > 2 else 256_000
CORES = int(os.environ.get("ANNPROF_CORES", "2"))
MEM_MB = int(os.environ.get("ANNPROF_MEM_MB", "22528"))

evdir = tempfile.mkdtemp(prefix="annprof_")
os.environ["SPARK_GRAFT_MASTER"] = f"local-cluster[{N_EXEC},{CORES},{MEM_MB}]"
os.environ["SPARK_GRAFT_PRETOUCH"] = "1"
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "6g"
os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
    f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir};"
    f"spark.eventLog.compress=false;"
    f"spark.eventLog.rolling.enabled=false"
    + (";" + os.environ["ANNPROF_EXTRA"]
       if os.environ.get("ANNPROF_EXTRA") else ""))

from go_spatial_spark.session import get_spark  # noqa: E402
from go_spatial_spark.operators import similarity  # noqa: E402
from bench import _synthetic_vectors  # noqa: E402


def _wait_quiet(max_wait: float = 180.0) -> None:
    """Block until prior Spark executor/worker JVMs are gone — a
    previous run's 4 x 22 GB pre-touched heaps tearing down during
    this run's timed region measurably distorts it (observed: the
    N=1 build stage at 244 executor-run seconds but only 44 CPU
    seconds — 200 s of descheduled wait — when launched right after
    a 4-executor run). Same barrier as scaling_bench."""
    import subprocess
    import time as _t
    pattern = ("CoarseGrainedExecutorBackend"
               "|deploy\\.worker\\.Worker"
               "|LocalSparkCluster")
    deadline = _t.time() + max_wait
    while _t.time() < deadline:
        n = subprocess.run(["pgrep", "-f", "-c", pattern],
                           capture_output=True, text=True)
        if n.returncode != 0 or int(n.stdout.strip() or 0) == 0:
            return
        _t.sleep(1.0)


def main() -> None:
    _wait_quiet()
    spark = get_spark("annprof", cpus=N_EXEC * CORES,
                      shuffle_partitions=32)
    emb = _synthetic_vectors(spark, N_VEC, 64).repartition(32).cache()
    n = emb.count()

    # warm-ups (JIT/codegen/AQE), same as the cohort protocol
    for _ in range(2):
        similarity.cosine_topk(emb, n_rows=n).count()

    t0 = time.time() * 1000
    w0 = time.perf_counter()
    similarity.cosine_topk(emb, n_rows=n).count()
    wall = time.perf_counter() - w0
    t1 = time.time() * 1000
    app_id = spark.sparkContext.applicationId
    spark.stop()

    stages = []
    jobs = {}
    # Spark 4 event-log layout: eventlog_v2_<appid>/events_*_<appid>
    import glob
    cands = (glob.glob(os.path.join(evdir, f"*{app_id}*", "events*"))
             or glob.glob(os.path.join(evdir, f"*{app_id}*")))
    lines = []
    for path in sorted(c for c in cands if os.path.isfile(c)):
        with open(path) as f:
            lines.extend(f)
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None or sub < t0 or sub > t1:
                    continue
                run_ms = 0
                for acc in si.get("Accumulables", []):
                    if acc.get("Name") == "internal.metrics.executorRunTime":
                        run_ms = int(acc.get("Value", 0))
                stages.append({
                    "id": si["Stage ID"], "name": si["Stage Name"][:70],
                    "sub": sub, "comp": comp,
                    "wall_s": round((comp - sub) / 1000, 3),
                    "exec_run_s": round(run_ms / 1000, 3),
                    "tasks": si.get("Number of Tasks")})
            elif et == "SparkListenerJobStart":
                if ev.get("Submission Time", 0) >= t0:
                    jobs[ev["Job ID"]] = {"start": ev["Submission Time"]}
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    stages.sort(key=lambda s: s["sub"])
    # wall not covered by ANY running stage = driver-serial time
    covered = 0.0
    cur_end = t0
    for s in stages:
        a, b = max(s["sub"], cur_end), max(s["comp"], cur_end)
        if a < b:
            covered += b - a
            cur_end = b
        cur_end = max(cur_end, s["comp"])
    gap_s = round((t1 - t0 - covered) / 1000, 3)

    print(f"\n== {N_EXEC} exec x {CORES} cores, {N_VEC} vectors: "
          f"wall {wall:.2f}s, stage-covered {covered/1000:.2f}s, "
          f"DRIVER GAPS {gap_s:.2f}s ==", file=sys.stderr)
    print(f"{'stage':>5} {'wall':>7} {'execrun':>8} {'tasks':>5}  name",
          file=sys.stderr)
    for s in stages:
        print(f"{s['id']:>5} {s['wall_s']:>7.2f} {s['exec_run_s']:>8.2f} "
              f"{s['tasks']:>5}  {s['name']}", file=sys.stderr)
    print(json.dumps({"n_exec": N_EXEC, "cores": CORES, "n_vec": N_VEC,
                      "wall_s": round(wall, 3), "gap_s": gap_s,
                      "stages": stages}))


if __name__ == "__main__":
    main()
