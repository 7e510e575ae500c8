"""Port of the reference's only unit tests, re-targeted at our engine:
DataFilter semantics incl. ``db.*`` wildcard and valid_oplog rules
(/root/reference/mongosync/data_filter.py:63-95), both driver-side
(SyncConfig) and as column expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.functions.namespace import (
    ns_coll,
    ns_db,
    rename_ns,
    system_ns_filter,
    valid_oplog_filter,
)


def test_config_filter_semantics():
    # data_filter.py:63-95 cases
    f = SyncConfig(include_colls=frozenset({"db0.*", "db1.coll1"}))
    assert f.valid_db("db0") and f.valid_db("db1") and not f.valid_db("db2")
    assert f.valid_coll("db0", "anything")          # wildcard
    assert f.valid_coll("db1", "coll1")
    assert not f.valid_coll("db1", "coll2")
    assert f.valid_ns("db0.x.y")                    # first-dot split
    assert not f.valid_ns("db2.coll")
    # valid_oplog: 'n' dropped when active; 'c' by db; others by ns
    assert not f.valid_oplog("n", "db0.coll")
    assert f.valid_oplog("c", "db1.$cmd")
    assert not f.valid_oplog("c", "db2.$cmd")
    assert f.valid_oplog("i", "db0.whatever")
    assert not f.valid_oplog("i", "db2.c")
    # inactive filter passes everything, including no-ops
    empty = SyncConfig()
    assert empty.valid_oplog("n", "any.ns")
    assert empty.valid_db("anything")


def test_column_filter_matches_config(spark):
    cfg = SyncConfig(include_colls=frozenset({"db0.*", "db1.coll1"}))
    rows = [
        ("i", "db0.c1"), ("i", "db1.coll1"), ("i", "db1.coll2"),
        ("n", "db0.c1"), ("c", "db1.$cmd"), ("c", "db2.$cmd"),
        ("u", "db2.x"), ("d", "db0.deep.dotted"),
    ]
    df = spark.createDataFrame(rows, "op string, ns string")
    got = {
        (r["op"], r["ns"])
        for r in df.where(valid_oplog_filter(cfg, F.col("op"), F.col("ns"))).collect()
    }
    expect = {(op, ns) for op, ns in rows if cfg.valid_oplog(op, ns)}
    assert got == expect


def test_system_ns_exclusion(spark):
    df = spark.createDataFrame(
        [("admin.users",), ("local.oplog.rs",), ("app.system.indexes",), ("app.data",)],
        "ns string",
    )
    kept = [r["ns"] for r in df.where(system_ns_filter(F.col("ns"))).collect()]
    assert kept == ["app.data"]


def test_rename_mapping(spark):
    cfg = SyncConfig(
        db_mapping={"chat_src": "chat"},
        ns_mapping={"special.src": "special.dst"},
    )
    assert cfg.map_ns("chat_src.transcripts") == "chat.transcripts"
    assert cfg.map_ns("special.src") == "special.dst"
    assert cfg.map_ns("untouched.ns") == "untouched.ns"
    df = spark.createDataFrame(
        [("chat_src.transcripts",), ("special.src",), ("untouched.ns",)], "ns string"
    )
    got = [r[0] for r in df.select(rename_ns(cfg, F.col("ns"))).collect()]
    assert got == ["chat.transcripts", "special.dst", "untouched.ns"]


def test_ns_split_first_dot(spark):
    df = spark.createDataFrame([("db.with.dots",)], "ns string")
    r = df.select(ns_db(F.col("ns")).alias("d"), ns_coll(F.col("ns")).alias("c")).first()
    assert (r["d"], r["c"]) == ("db", "with.dots")


def test_flat_nested_roundtrip(spark):
    """P7 general reshaping: dotted flat columns ⇄ arbitrarily deep structs
    (doc_utils.py:4-34 full analogue, not just single-level extraction)."""
    from py_mongo_sync_spark.functions.project import flat_to_nested, nested_to_flat

    df = spark.createDataFrame(
        [(1, "u1", "click", 3.5, "x")],
        ["id", "`user.id`", "`user.meta.kind`", "`user.meta.weight`", "other"],
    ).toDF("id", "user.id", "user.meta.kind", "user.meta.weight", "other")
    nested = flat_to_nested(df, ["user.id", "user.meta.kind", "user.meta.weight"])
    assert set(nested.columns) == {"id", "other", "user"}
    row = nested.first()
    assert row["user"]["id"] == "u1"
    assert row["user"]["meta"]["kind"] == "click"
    assert row["user"]["meta"]["weight"] == 3.5

    flat = nested_to_flat(nested)
    assert set(flat.columns) == {"id", "other", "user.id", "user.meta.kind", "user.meta.weight"}
    back = flat.first()
    assert back["user.meta.kind"] == "click" and back["user.id"] == "u1"
