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
