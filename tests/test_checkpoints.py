"""Checkpoint/watermark table tests — port of the optime round-trip tests
(/root/reference/mongosync/optime_logger.py:56-78, incl. the max-uint32
edge) onto the lineage table, plus the stale-resume gate."""

from __future__ import annotations

import pytest

from py_mongo_sync_spark.plans.checkpoints import CheckpointLog

MAX_U32 = 2**32 - 1


def _row(batch_id, pid, max_ts, n=10):
    return {
        "batch_id": batch_id, "partition_id": pid, "max_ts": max_ts,
        "n_events": n, "wall_ms": 5, "committed_at_seq": batch_id,
    }


def test_roundtrip_and_watermark(spark, tmp_path):
    cp = CheckpointLog(spark, str(tmp_path / "cp"))
    assert cp.high_watermark() is None
    cp.append([_row(0, 0, 100), _row(0, 1, 105)])
    cp.append([_row(1, 0, 230)])
    assert cp.high_watermark() == 230
    pdf = cp.read().toPandas()
    assert len(pdf) == 3 and set(pdf["batch_id"]) == {0, 1}


def test_max_uint32_optime_edge(spark, tmp_path):
    # the reference packs optimes as 2×uint32 (optime_logger.py:25-28);
    # our long column must round-trip the boundary losslessly
    cp = CheckpointLog(spark, str(tmp_path / "cp"))
    cp.append([_row(0, 0, MAX_U32)])
    assert cp.high_watermark() == MAX_U32
    cp.append([_row(1, 0, MAX_U32 + 7)])  # beyond uint32 — we don't wrap
    assert cp.high_watermark() == MAX_U32 + 7


def test_stale_resume_aborts(spark, tmp_path):
    cp = CheckpointLog(spark, str(tmp_path / "cp"))
    cp.append([_row(0, 0, 500)])
    cp.assert_not_stale(first_event_ts=501)   # contiguous: fine
    cp.assert_not_stale(first_event_ts=200)   # replayed overlap: fine
    with pytest.raises(RuntimeError, match="stale"):
        cp.assert_not_stale(first_event_ts=502)  # gap: history lost


def test_append_is_crash_atomic(spark, tmp_path):
    # each append lands as whole files via atomic rename: a reader never
    # sees a partial batch. Emulate by interleaving reads.
    cp = CheckpointLog(spark, str(tmp_path / "cp"))
    for b in range(5):
        cp.append([_row(b, p, 100 * b + p) for p in range(4)])
        assert cp.read().count() == (b + 1) * 4


def test_progress_listener_records_batches(spark, tmp_path):
    """A3: streaming progress rows (rates, durations) persist per microbatch."""
    import json

    from py_mongo_sync_spark.config import SyncConfig
    from py_mongo_sync_spark.sources.generate import (
        gen_oplog_events,
        gen_transcripts_snapshot,
        write_events_jsonl,
    )
    from py_mongo_sync_spark.sources.oplog import read_oplog_stream
    from py_mongo_sync_spark.streaming.pipeline import CdcPipeline
    from py_mongo_sync_spark.streaming.progress import ProgressLogListener

    log_path = str(tmp_path / "progress.jsonl")
    listener = ProgressLogListener(log_path)
    spark.streams.addListener(listener)
    try:
        cfg = SyncConfig(dst_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "c"), n_buckets=2)
        pipe = CdcPipeline(spark, cfg)
        pipe.initial_sync(gen_transcripts_snapshot(spark, 10, 3))
        ev = gen_oplog_events(spark, 10, 3, 200)
        write_events_jsonl(ev, str(tmp_path / "ev"), n_files=2)
        pipe.run_stream(read_oplog_stream(spark, str(tmp_path / "ev"), max_files_per_trigger=1),
                        str(tmp_path / "spark_cp"))
        import time
        for _ in range(20):  # listener events are async
            recs = [json.loads(l) for l in open(log_path)] if __import__("os").path.exists(log_path) else []
            if sum(1 for r in recs if r["event"] == "progress" and r["numInputRows"] > 0) >= 2:
                break
            time.sleep(0.5)
        prog = [r for r in recs if r["event"] == "progress" and r["numInputRows"] > 0]
        assert len(prog) >= 2
        assert all("durationMs" in r for r in prog)
    finally:
        spark.streams.removeListener(listener)


def test_checkpoint_log_compaction(spark, tmp_path):
    """10^6 microbatches = 10^6 per-batch files without compaction; merging
    must preserve every lineage row, the watermark, and be idempotent."""
    import os

    from py_mongo_sync_spark.plans.checkpoints import CheckpointLog

    log = CheckpointLog(spark, str(tmp_path / "cp"))
    for b in range(300):
        log.append([{"batch_id": b, "partition_id": p, "max_ts": 1000 + b,
                     "n_events": 5, "wall_ms": 1, "committed_at_seq": b}
                    for p in range(2)])
    files_before = len(os.listdir(str(tmp_path / "cp")))
    assert files_before == 300

    merged = log.compact(min_files=256, keep_recent=8)
    assert merged == 292
    files_after = len([f for f in os.listdir(str(tmp_path / "cp"))
                       if f.endswith(".parquet")])
    assert files_after == 9                      # 1 compacted + 8 recent

    assert log.read().count() == 600             # every lineage row intact
    assert log.high_watermark() == 1299
    assert log.compact(min_files=256, keep_recent=8) == 0   # idempotent


def test_lineage_records_table_version_for_changelog_consumers(spark, tmp_path):
    """Lineage rows carry the committed table version, so a downstream
    consumer maps batch → version → LakeTable.read_changes without
    touching the manifest chain."""
    from py_mongo_sync_spark.config import SyncConfig
    from py_mongo_sync_spark.sources.generate import (
        gen_oplog_events,
        gen_transcripts_snapshot,
    )
    from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

    cfg = SyncConfig(dst_path=str(tmp_path / "l"),
                     checkpoint_path=str(tmp_path / "c"), n_buckets=2)
    pipe = CdcPipeline(spark, cfg)
    pipe.initial_sync(gen_transcripts_snapshot(spark, 8, 3))
    ev = gen_oplog_events(spark, 8, 3, 120)
    pipe.apply_batch(ev.where("ts % 2 = 0"), 0)
    pipe.apply_batch(ev.where("ts % 2 = 1"), 1)

    cp = pipe.cplog.read().toPandas()
    versions = (cp.groupby("batch_id")["table_version"].first().to_dict())
    assert set(versions) == {0, 1}
    v0, v1 = int(versions[0]), int(versions[1])
    assert v1 > v0 >= 1
    # consumer contract: diff the versions the lineage names
    ch = pipe.table.read_changes(v0, v1)
    assert ch.count() > 0
    assert set(ch.select("_change_type").distinct().toPandas()["_change_type"]) \
        <= {"insert", "update", "delete"}


def test_replication_lag_metric(spark, tmp_path):
    """SURVEY §2.9 delay gauge (reference common_syncer.py:246-260):
    wall clock minus last applied optime, from the committed watermark;
    None before any commit; ts_base shifts fixture-relative optimes."""
    from py_mongo_sync_spark.plans.checkpoints import CheckpointLog

    log = CheckpointLog(spark, str(tmp_path / "cp"))
    assert log.replication_lag_seconds() is None
    log.append([
        {"batch_id": 0, "partition_id": 0, "max_ts": 1000,
         "n_events": 5, "wall_ms": 10, "committed_at_seq": 0},
        {"batch_id": 0, "partition_id": 1, "max_ts": 1200,
         "n_events": 5, "wall_ms": 10, "committed_at_seq": 0},
    ])
    # fixture optimes are relative: base 1_700_000_000, watermark 1200
    got = log.replication_lag_seconds(now=1_700_000_000 + 1260,
                                      ts_base=1_700_000_000)
    assert got == 60.0
    assert log.replication_lag_seconds(now=1_700_000_000, ts_base=1_700_000_000) == 0.0


def test_pipeline_emits_replication_lag_and_batch_hook(spark, tmp_path):
    """apply_batch stamps replication_lag_sec on its stats and invokes the
    per-batch hook the CLI --follow mode uses."""
    from py_mongo_sync_spark.config import SyncConfig
    from py_mongo_sync_spark.sources.generate import (
        gen_oplog_events, gen_transcripts_snapshot,
    )
    from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

    cfg = SyncConfig(dst_path=str(tmp_path / "l"),
                     checkpoint_path=str(tmp_path / "c"), n_buckets=2)
    pipe = CdcPipeline(spark, cfg)
    pipe.initial_sync(gen_transcripts_snapshot(spark, 5, 2))
    seen = []
    pipe.on_batch_stats = seen.append
    res = pipe.apply_batch(gen_oplog_events(spark, 5, 2, 30), 0)
    assert res["replication_lag_sec"] > 0          # replaying past optimes
    assert seen and seen[0] is res                 # hook fired with the stats
