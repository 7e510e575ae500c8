"""Sustained-throughput evidence for the BASELINE.json metric.

The north-rule metric is *sustained* CDC apply throughput at 10^10-event
scale: what matters is not one 4-batch burst but whether batch N+k costs
the same as batch N once the table has absorbed the stream for a while —
i.e. per-batch work must stay O(batch + changed buckets) as versions,
delta files, and compactions accumulate, never O(table history). The
4-batch run in bench.py cannot show that; this tool replays a 4x longer
stream (default 16 microbatches of 1M events, MoR — the scale write
mode) and reports the per-batch wall/throughput series plus a
steady-state ratio:

    steady_state = mean ev/s over the last quarter of batches
                   / mean ev/s over the first quarter (batch 0 excluded —
                     it pays JVM/codegen warmup for the whole run)

A ratio near 1.0 means the engine neither slows down as the table grows
(manifest reads, delta resolution, checkpoint appends are all bounded)
nor silently defers work (MoR compactions triggered along the way are
INSIDE the measured batches — visible as periodic wall spikes, amortized
by design, not skipped). Run on an otherwise-idle host; one JSON line on
stdout like bench.py.

Usage:  python tools/bench_sustained.py
Env:    SPARK_BENCH_SUSTAINED_EVENTS (default 16_000_000)
        SPARK_BENCH_SUSTAINED_BATCHES (default 16)
        SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _spark/_warmup/_stamp_segment_mtimes)

N_EVENTS = int(os.environ.get("SPARK_BENCH_SUSTAINED_EVENTS", "16000000"))
N_BATCHES = int(os.environ.get("SPARK_BENCH_SUSTAINED_BATCHES", "16"))
N_CONVS = max(1000, N_EVENTS // 20)


def main() -> None:
    from py_mongo_sync_spark.config import SyncConfig
    from py_mongo_sync_spark.sources.generate import (
        gen_oplog_events,
        gen_transcripts_snapshot,
    )
    from py_mongo_sync_spark.sources.oplog import read_oplog_stream
    from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

    bench._pkg_on_executors()
    data_dir = tempfile.mkdtemp(prefix="cdc_sustained_data_")
    snap_dir = os.path.join(data_dir, "snapshot")
    ev_dir = os.path.join(data_dir, "events")

    spark = bench._spark(bench.CPUS)
    gen_transcripts_snapshot(
        spark, N_CONVS, bench.TURNS, with_tool=True, with_score=True
    ).write.mode("overwrite").parquet(snap_dir)
    gen_oplog_events(
        spark, N_CONVS, bench.TURNS, N_EVENTS, hot_frac=0.05
    ).repartitionByRange(N_BATCHES, "ts").write.mode("overwrite").parquet(ev_dir)
    bench._stamp_segment_mtimes(ev_dir)

    work = tempfile.mkdtemp(prefix="cdc_sustained_run_")
    cfg = SyncConfig(
        dst_path=os.path.join(work, "lake"),
        checkpoint_path=os.path.join(work, "cplog"),
        n_buckets=64,
        write_mode="mor",
    )
    pipe = CdcPipeline(spark, cfg)
    bench._warmup(spark)
    t0 = time.monotonic()
    pipe.initial_sync(spark.read.parquet(snap_dir))
    t_snap = time.monotonic() - t0
    stream = read_oplog_stream(
        spark, ev_dir, max_files_per_trigger=1, fmt="parquet"
    )
    t1 = time.monotonic()
    pipe.run_stream(stream, os.path.join(work, "spark_cp"))
    t_apply = time.monotonic() - t1
    final_rows = pipe.table.read().count()

    batches = [
        {
            "batch_id": s.get("batch_id"),
            "n_events": s.get("n_events"),
            "wall_sec": round(s.get("wall_ms", 0) / 1000.0, 2),
            "events_per_sec": round(
                s.get("n_events", 0) / max(s.get("wall_ms", 1) / 1000.0, 1e-9), 1
            ),
            "t_write": s.get("t_write"),
            "compacted": s.get("compacted"),
        }
        for s in pipe.last_stats
    ]
    # steady-state ratio: last quarter vs first quarter, batch 0 excluded.
    # NOTE this includes compaction batches, so on runs long enough to
    # enter the compaction phase it mixes the amortized rewrite debt into
    # the tail; t_write_ratio below isolates the MERGE itself (the
    # does-per-batch-work-grow-with-table-history question).
    rates = [b["events_per_sec"] for b in batches if b["n_events"]]
    q = max(1, (len(rates) - 1) // 4)
    head = rates[1 : 1 + q]
    tail = rates[-q:]
    steady = round((sum(tail) / len(tail)) / (sum(head) / len(head)), 3)
    writes = [b["t_write"] for b in batches if b["t_write"]]
    whead, wtail = writes[1 : 1 + q], writes[-q:]
    t_write_ratio = round(
        (sum(wtail) / len(wtail)) / (sum(whead) / len(whead)), 3
    )

    spark.stop()
    shutil.rmtree(data_dir, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "sustained MoR CDC apply throughput over a long stream",
                "unit": "sec",
                "n_events": N_EVENTS,
                "n_batches": len(batches),
                "snapshot_sec": round(t_snap, 2),
                "apply_sec": round(t_apply, 2),
                "events_per_sec": round(N_EVENTS / t_apply, 1),
                "final_rows": final_rows,
                "steady_state_ratio_tail_vs_head": steady,
                "t_write_ratio_tail_vs_head": t_write_ratio,
                "batches": batches,
            }
        )
    )


if __name__ == "__main__":
    main()
