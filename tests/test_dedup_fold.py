"""Unit tests for LWW dedup and the per-key event fold (the in-batch form of
the reference's sequential apply, multi_oplog_replayer.py:99-121)."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_mongo_sync_spark.operators.dedup import fold_net_events, lww_dedup
from py_mongo_sync_spark.operators.salt import salted_repartition

SCHEMA = "conv_id string, turn_idx int, ts long, op string, is_patch boolean, text string, role string"


def _fold(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = fold_net_events(
        df, key_cols=["conv_id", "turn_idx"], payload_cols=["text", "role"], ts_col="ts"
    )
    return {(r["conv_id"], r["turn_idx"]): r.asDict() for r in out.collect()}


def test_lww_dedup(spark):
    df = spark.createDataFrame(
        [("c", 0, 1, "i", False, "a", None), ("c", 0, 3, "u", False, "b", None),
         ("c", 0, 2, "u", False, "x", None), ("c", 1, 1, "i", False, "z", None)],
        SCHEMA,
    )
    out = lww_dedup(df, ["conv_id", "turn_idx"], "ts").collect()
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out}
    assert got == {("c", 0): "b", ("c", 1): "z"}


def test_fold_last_replace_wins(spark):
    net = _fold(spark, [
        ("c", 0, 1, "i", False, "a", "user"),
        ("c", 0, 2, "u", False, "b", "user"),
    ])
    r = net[("c", 0)]
    assert r["_op"] == "u" and r["text"] == "b" and not r["_is_patch"] and r["ts"] == 2


def test_fold_patch_composes_over_replace(spark):
    net = _fold(spark, [
        ("c", 0, 1, "i", False, "a", "user"),
        ("c", 0, 2, "u", True, "patched", None),   # $set text only
    ])
    r = net[("c", 0)]
    assert r["text"] == "patched" and r["role"] == "user" and not r["_is_patch"]


def test_fold_delete_then_reinsert(spark):
    net = _fold(spark, [
        ("c", 0, 1, "d", False, None, None),
        ("c", 0, 2, "i", False, "fresh", "user"),
    ])
    assert net[("c", 0)]["_op"] == "u" and net[("c", 0)]["text"] == "fresh"


def test_fold_patch_after_delete_is_noop(spark):
    # UpdateOne without upsert on a deleted key: net effect = the delete
    net = _fold(spark, [
        ("c", 0, 1, "i", False, "a", "user"),
        ("c", 0, 2, "d", False, None, None),
        ("c", 0, 3, "u", True, "ghost", None),
    ])
    assert net[("c", 0)]["_op"] == "d"


def test_fold_leading_patch_stays_patch(spark):
    # first event for the key is a patch → must stay a patch so the MERGE
    # can resolve it against the target (or drop it if the key is absent)
    net = _fold(spark, [
        ("c", 0, 5, "u", True, "p1", None),
        ("c", 0, 6, "u", True, None, "assistant"),  # second patch, other field
    ])
    r = net[("c", 0)]
    assert r["_is_patch"] and r["text"] == "p1" and r["role"] == "assistant" and r["ts"] == 6


def test_salted_repartition_spreads_hot_key(spark):
    df = spark.range(1000).select(
        F.lit("hot").alias("conv_id"), F.col("id").cast("int").alias("turn_idx")
    )
    out = salted_repartition(df, ["conv_id"], salt_from=["turn_idx"], n_salt=8, n_partitions=8)
    sizes = out.groupBy(F.spark_partition_id()).count().collect()
    assert len(sizes) > 1  # one key no longer serializes into one partition
    assert max(r["count"] for r in sizes) < 1000
