"""Watermarked tumbling-window aggregation: append-mode finalization and
late-event drop semantics.

Spark guarantee note (pinned by this test): late-row dropping is
best-effort WITHIN one run — under availableNow the batch offsets are
planned with the watermark known at planning time, so a late row landing
in the very next microbatch of the same run may still be aggregated into
a not-yet-finalized window. The hard guarantees are (a) a finalized
(emitted) window is never updated again, and (b) after a restart the
checkpointed watermark drops older-than-watermark input. The test
asserts the guaranteed behavior across a restart.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from py_mongo_sync_spark.streaming.windows import windowed_event_counts

BASE = 1_699_999_980  # multiple of 60 → window-aligned epoch


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for u, t in rows:
            f.write(json.dumps({"event_type": u, "epoch": t}) + "\n")
    os.utime(path, (mtime, mtime))


def test_windowed_counts_finalize_and_drop_late(spark, tmp_path):
    ev_dir = tmp_path / "ev"
    out = str(tmp_path / "out")
    os.makedirs(ev_dir)

    def run():
        stream = (
            spark.readStream.schema("event_type string, epoch long")
            .option("maxFilesPerTrigger", "1").json(str(ev_dir))
            .selectExpr("event_type", "timestamp_seconds(epoch) AS ts")
        )
        q = (
            windowed_event_counts(stream, ts_col="ts", key_col="event_type",
                                  window="60 seconds", watermark="30 seconds")
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return q

    # run 1: windows [0,60): a×2 b×1; [60,120): a×1; [120,180): a×1.
    # max event time 130 → watermark 100 → [0,60) and [60,120) finalize.
    _write(ev_dir / "b0.json",
           [("a", BASE + 10), ("a", BASE + 20), ("b", BASE + 15),
            ("a", BASE + 70), ("a", BASE + 130)],
           1_700_000_000)
    run()

    # run 2 (restart from checkpoint): a@+25 is LATE (checkpointed
    # watermark 100 > its window end 60) → DROPPED, guaranteed; c@+300
    # advances the watermark to 270, finalizing [120,180).
    _write(ev_dir / "b1.json",
           [("a", BASE + 25), ("c", BASE + 300)],
           1_700_000_001)
    q = run()
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress for s in (p.get("stateOperators") or [])
    )
    assert dropped == 1

    got = {
        (int(r["window_start"].timestamp()) - BASE, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (0, "a"): 2, (0, "b"): 1,        # late a@+25 NOT counted
        (60, "a"): 1,
        (120, "a"): 1,
    }
    # append-once: no window/key appears twice in the sink
    n_rows = spark.read.parquet(out).count()
    assert n_rows == len(got)
    # [300,360) is still open — not emitted
    assert not any(k[0] == 300 for k in got)