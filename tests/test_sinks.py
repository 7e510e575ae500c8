"""Second sink flavor: the ES-analogue SearchDocSink behind
SearchSyncPipeline (reference dispatch sync.py:25-34; ES syncer
es/syncer.py). Same transform/fold, different destination semantics:
physical deletes, atomic index swaps, partial-update translation."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.sinks import SearchSyncPipeline
from py_mongo_sync_spark.sources.generate import (
    gen_oplog_events,
    gen_transcripts_snapshot,
    oracle_replay,
)

NS = "chat.transcripts"


def _pipe(spark, tmp_path):
    cfg = SyncConfig(dst_path=str(tmp_path / "index"),
                     checkpoint_path=str(tmp_path / "cp"), n_buckets=2)
    return SearchSyncPipeline(spark, cfg)


def test_search_sink_matches_oracle_over_batches(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    snap = gen_transcripts_snapshot(spark, 10, 3)
    ev = gen_oplog_events(spark, 10, 3, 240)
    pipe.initial_sync(snap)
    # contiguous optime ranges: the oplog source contract is in-order
    # delivery across microbatches (patch composition equality with the
    # sequential oracle requires it; disorder-tolerance is covered by the
    # tombstone/LWW tests)
    lo = ev.agg(F.min("ts")).first()[0]
    for i in range(3):
        pipe.apply_batch(
            ev.where((F.col("ts") >= lo + i * 80) & (F.col("ts") < lo + (i + 1) * 80)), i
        )

    expected = oracle_replay(snap.toPandas(), ev.toPandas())
    got = pipe.read().toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    cols = [c for c in expected.columns if c in got.columns]
    pd.testing.assert_frame_equal(
        got[cols], expected[cols].reset_index(drop=True), check_dtype=False
    )


def test_search_sink_deletes_are_physical_and_replays_skip(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    pipe.initial_sync(gen_transcripts_snapshot(spark, 6, 2))
    d = spark.createDataFrame(
        [(50, "d", NS, json.dumps({"conv_id": "conv_000001", "turn_idx": 1}))],
        "ts long, op string, ns string, doc string",
    )
    assert not pipe.apply_batch(d, 0)["skipped"]
    keys = {(r["conv_id"], r["turn_idx"]) for r in pipe.read().collect()}
    assert ("conv_000001", 1) not in keys
    assert pipe.apply_batch(d, 0)["skipped"]  # idempotent on batch_id


def test_search_sink_partial_update_translation(spark, tmp_path):
    """$set/$unset/$inc → the ES partial-update analogue
    (es/syncer.py:182-216), resolved against the current doc."""
    pipe = _pipe(spark, tmp_path)
    pipe.initial_sync(gen_transcripts_snapshot(spark, 6, 2))
    ev = spark.createDataFrame([
        (60, "u", NS, json.dumps({"conv_id": "conv_000000", "turn_idx": 0,
                                  "$set": {"text": "patched"}})),
        (61, "u", NS, json.dumps({"conv_id": "conv_000000", "turn_idx": 0,
                                  "$unset": {"role": ""}})),
        (62, "u", NS, json.dumps({"conv_id": "conv_000000", "turn_idx": 1,
                                  "$inc": {"score": 2.5}})),
        (63, "u", NS, json.dumps({"conv_id": "ghost", "turn_idx": 0,
                                  "$set": {"text": "x"}})),  # absent → no-op
    ], "ts long, op string, ns string, doc string")
    pipe.apply_batch(ev, 0)
    got = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in pipe.read().collect()}
    assert got[("conv_000000", 0)]["text"] == "patched"
    assert got[("conv_000000", 0)]["role"] is None
    assert got[("conv_000000", 1)]["score"] == 2.5  # evolved via the event
    assert ("ghost", 0) not in got
