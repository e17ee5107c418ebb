"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY.md §2.7 — batch only);
this module adds the streaming half a web-scale ingest pipeline needs:

- windowed aggregation with watermarked late-data handling
  (`hourly_counts`): tumbling 1-hour windows over event time;
- custom stateful sessionization (`sessionize`) via
  applyInPandasWithState — gap-based sessions (30 min), emitting a
  session row when the gap closes it (timeout-driven);
- batch equivalence: with Trigger.AvailableNow over a static directory
  the streaming results must equal the batch query — that equivalence
  is the correctness gate (tests/test_streaming.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
                 "event_type string, value double, props string")

SESSION_GAP_S = 1800


def read_events_stream(spark, path: str,
                       max_files: int = 4) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(path))


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time windows with a watermark; emits
    (window_start_s, event_type, n, sum_value). Works identically on a
    batch DataFrame (window agg without watermark semantics)."""
    ev = events.withColumn("ts2", F.col("ts").cast("timestamp"))
    if ev.isStreaming:
        ev = ev.withWatermark("ts2", watermark)
    return (ev.groupBy(F.window("ts2", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("win.start").cast("long").alias("window_start_s"),
                    "event_type", "n", "sum_value"))


_SESSION_OUT = ("user_id long, session_start_s long, session_end_s long, "
                "n_events long")
_SESSION_STATE = "start_s long, end_s long, n long"


def _session_fn(key, pdfs, state: GroupState):
    """Gap-based sessionizer: closes a session when no event arrives
    within SESSION_GAP_S of the last one (processing-timeout driven)."""
    (user_id,) = key
    if state.hasTimedOut:
        start_s, end_s, n = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [user_id],
                            "session_start_s": [start_s],
                            "session_end_s": [end_s], "n_events": [n]})
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    secs = (rows["ts"].astype("int64") // 1_000_000_000).sort_values()
    out = []
    if state.exists:
        start_s, end_s, n = state.get
    else:
        start_s = end_s = None
        n = 0
    for s in secs:
        s = int(s)
        if start_s is None:
            start_s, end_s, n = s, s, 1
        elif s - end_s > SESSION_GAP_S:
            out.append((user_id, start_s, end_s, n))
            start_s, end_s, n = s, s, 1
        else:
            # late (out-of-order) events extend the open session in
            # both directions — keeps start <= end invariant under
            # arbitrary file-arrival order
            start_s = min(start_s, s)
            end_s = max(end_s, s)
            n += 1
    state.update((start_s, end_s, n))
    state.setTimeoutDuration(SESSION_GAP_S * 1000)
    if out:
        yield pd.DataFrame(out, columns=["user_id", "session_start_s",
                                         "session_end_s", "n_events"])


def sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState)."""
    return (events.groupBy("user_id")
            .applyInPandasWithState(_session_fn, _SESSION_OUT,
                                    _SESSION_STATE, "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         output_mode: str = "complete",
                         stateful: bool = False,
                         max_wait_s: float = 300.0):
    """Drive a stream into an in-memory table until all available data
    is processed, then stop.

    Stateless queries drain cleanly with Trigger.AvailableNow. Stateful
    queries with processing-time timeouts never self-terminate (pending
    timeouts keep the query alive — 30 min for the sessionizer — and
    even processAllAvailable blocks on them), so they run on a 1s
    micro-batch trigger and are stopped after two consecutive
    zero-input batches."""
    import time
    w = stream_df.writeStream.format("memory").queryName(name) \
        .outputMode(output_mode)
    if not stateful:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.trigger(processingTime="1 second").start()
        deadline = time.time() + max_wait_s
        idle = 0
        last_batch = -1
        while time.time() < deadline and idle < 2:
            time.sleep(2.0)
            lp = q.lastProgress
            if not lp or lp.get("batchId") == last_batch:
                continue
            last_batch = lp.get("batchId")
            idle = idle + 1 if lp.get("numInputRows", 0) == 0 else 0
        q.stop()
        q.awaitTermination()
    return stream_df.sparkSession.table(name)


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once ingest dedup: drops replayed copies of the same
    event_id. Streaming: dropDuplicatesWithinWatermark bounds the
    dedup state to the watermark horizon (at 10^12-event scale the
    state store only holds ids newer than the horizon — unbounded
    dropDuplicates would OOM the state store). Batch: plain
    dropDuplicates on the key, same observable result when duplicate
    rows are exact copies within the horizon."""
    ev = events.withColumn("ts2", F.col("ts").cast("timestamp"))
    if ev.isStreaming:
        ev = (ev.withWatermark("ts2", watermark)
              .dropDuplicatesWithinWatermark(["event_id"]))
    else:
        ev = ev.dropDuplicates(["event_id"])
    return ev.drop("ts2")
