"""Multi-namespace routing: one change stream → one table per namespace
(reference: per-collection sync of the whole replica set)."""

from __future__ import annotations

import pandas as pd

from py_mongo_sync_spark.check import check_consistency
from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.schema import KEY_COLS
from py_mongo_sync_spark.sources.generate import (
    gen_oplog_events,
    gen_transcripts_snapshot,
    oracle_replay,
)
from py_mongo_sync_spark.streaming.pipeline import MultiCdcPipeline


def test_multi_namespace_routing(spark, tmp_path):
    cfg = SyncConfig(
        dst_path=str(tmp_path / "lakes"),
        checkpoint_path=str(tmp_path / "cps"),
        n_buckets=4,
    )
    snap = gen_transcripts_snapshot(spark, 20, 5)
    # 60% chat.transcripts, 40% notes.transcripts
    ev = gen_oplog_events(spark, 20, 5, 1200, ns_extra=[("notes.transcripts", 40)])
    multi = MultiCdcPipeline(spark, cfg, ["chat.transcripts", "notes.transcripts"])
    multi.initial_sync({"chat.transcripts": snap, "notes.transcripts": snap})
    res = multi.apply_batch(ev, 0)
    assert set(res) == {"chat.transcripts", "notes.transcripts"}

    snap_pdf, ev_pdf = snap.toPandas(), ev.toPandas()
    for ns in res:
        exp = oracle_replay(snap_pdf, ev_pdf, dst_ns=ns)
        exp = exp.where(pd.notnull(exp), None)
        rep = check_consistency(
            spark.createDataFrame(exp), multi.pipes[ns].table.read(),
            KEY_COLS, ["role", "text", "ts"],
        )
        assert rep["ok"], (ns, rep)
    # the two tables genuinely diverged (different event subsets)
    a = multi.pipes["chat.transcripts"].table.read().count()
    b = multi.pipes["notes.transcripts"].table.read().count()
    assert a != b
