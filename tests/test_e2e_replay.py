"""End-to-end golden replay: snapshot + oplog events → LakeTable equals the
independent pandas oracle (FIXTURES.md `basic`; the content-equality upgrade
of /root/reference/check.py:72-146)."""

from __future__ import annotations

import pandas as pd

from py_mongo_sync_spark.check import check_consistency
from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.schema import KEY_COLS
from py_mongo_sync_spark.sources.generate import (
    gen_oplog_events,
    gen_transcripts_snapshot,
    oracle_replay,
    write_events_jsonl,
)
from py_mongo_sync_spark.sources.oplog import read_oplog_stream
from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

N_CONVS, TURNS, N_EVENTS = 100, 10, 5000


def _expected_df(spark, snap, events, cfg=None, **kw):
    exp_pdf = oracle_replay(snap.toPandas(), events.toPandas(), cfg, **kw)
    return spark.createDataFrame(exp_pdf)


def test_basic_replay(spark, tmp_path):
    cfg = SyncConfig(
        dst_path=str(tmp_path / "lake"),
        checkpoint_path=str(tmp_path / "cp"),
        n_buckets=8,
    )
    snap = gen_transcripts_snapshot(spark, N_CONVS, TURNS)
    events = gen_oplog_events(spark, N_CONVS, TURNS, N_EVENTS)
    write_events_jsonl(events, str(tmp_path / "events"), n_files=5)

    pipe = CdcPipeline(spark, cfg)
    pipe.initial_sync(snap)
    stream = read_oplog_stream(spark, str(tmp_path / "events"), max_files_per_trigger=1)
    pipe.run_stream(stream, str(tmp_path / "spark_cp"))

    actual = pipe.table.read()
    expected = _expected_df(spark, snap, events)
    rep = check_consistency(expected, actual, KEY_COLS, ["role", "text", "ts"])
    assert rep["ok"], rep

    # multiple microbatches actually ran and were checkpointed
    cp = pipe.cplog.read().toPandas()
    assert cp["batch_id"].nunique() >= 2
    assert int(cp["max_ts"].max()) == int(events.toPandas()["ts"].max())


def test_batch_replay_equals_stream(spark, tmp_path):
    """Same net state whether applied as 1 batch or many microbatches —
    the commutativity the LWW fold + ts guard are supposed to buy."""
    cfg = SyncConfig(dst_path=str(tmp_path / "lake"), checkpoint_path=str(tmp_path / "cp"), n_buckets=4)
    snap = gen_transcripts_snapshot(spark, 20, 5)
    events = gen_oplog_events(spark, 20, 5, 1000)

    pipe = CdcPipeline(spark, cfg)
    pipe.initial_sync(snap)
    pipe.replay_batch(events, batch_id=0)

    actual = pipe.table.read()
    expected = _expected_df(spark, snap, events)
    rep = check_consistency(expected, actual, KEY_COLS, ["role", "text", "ts"])
    assert rep["ok"], rep


def test_follow_mode_continuous_tail(spark, tmp_path):
    """The continuous (processing-time) trigger — the reference's infinite
    tail loop analogue: events appearing AFTER the stream starts are
    applied without restarting, and the query stops cleanly."""
    import json as _json
    import os
    import time as _time

    cfg = SyncConfig(
        dst_path=str(tmp_path / "lake"), checkpoint_path=str(tmp_path / "cp"),
        n_buckets=4,
    )
    snap = gen_transcripts_snapshot(spark, 5, 2)
    pipe = CdcPipeline(spark, cfg)
    pipe.initial_sync(snap)

    ev_dir = tmp_path / "events"
    os.makedirs(ev_dir)

    def drop(name, rows, mtime):
        p = ev_dir / name
        with open(p, "w") as f:
            for ts, conv in rows:
                f.write(_json.dumps({
                    "ts": ts, "op": "i", "ns": "chat.transcripts",
                    "doc": _json.dumps({"conv_id": conv, "turn_idx": 0,
                                        "role": "user", "text": f"t{ts}"}),
                }) + "\n")
        os.utime(p, (mtime, mtime))

    drop("b0.json", [(2000, "live_a")], 1_700_000_000)
    stream = read_oplog_stream(spark, str(ev_dir))
    q = pipe.run_stream(stream, str(tmp_path / "scp"),
                        available_now=False, processing_time="1 second")
    try:
        def wait_for(conv, timeout=60):
            t0 = _time.monotonic()
            while _time.monotonic() - t0 < timeout:
                if pipe.table.read().where(
                        f"conv_id = '{conv}'").count() == 1:
                    return True
                _time.sleep(1)
            return False

        assert wait_for("live_a"), "initial file never applied"
        # a file dropped while the query is RUNNING is picked up
        drop("b1.json", [(2001, "live_b")], 1_700_000_001)
        assert wait_for("live_b"), "file added mid-stream never applied"
    finally:
        q.stop()
        q.awaitTermination()
    assert pipe.table.read().where(
        "conv_id IN ('live_a', 'live_b')").count() == 2
