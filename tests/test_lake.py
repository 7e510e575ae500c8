"""LakeTable unit tests: ACID commit, time travel, bucket pruning,
idempotent MERGE, monotone-ts guard, tombstones, schema evolution, vacuum."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from py_mongo_sync_spark.plans.lake import LakeTable

KEYS = ["conv_id", "turn_idx"]


def _mk(spark, tmp_path, rows, n_buckets=4):
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, ts timestamp")
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(df, key_cols=KEYS, ts_col="ts", n_buckets=n_buckets)
    return t


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp, _op string, _is_patch boolean"
    )


TS = [dt.datetime(2024, 1, 1, 0, 0, s) for s in range(10)]


def test_create_read_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0]), ("b", 1, "y", TS[1])])
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert got == {("a", 0): "x", ("b", 1): "y"}
    assert t.latest_version() == 1


def test_merge_upsert_delete_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0]), ("b", 1, "y", TS[1])])
    src = _src(spark, [
        ("a", 0, "x2", TS[2], "u", False),       # update
        ("c", 2, "new", TS[3], "u", False),      # insert
        ("b", 1, None, TS[4], "d", False),       # delete
    ])
    res = t.merge(src, batch_id=1)
    assert not res["skipped"]
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    assert got == {("a", 0): "x2", ("c", 2): "new"}
    # time travel to v1: pre-merge state intact
    old = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read(version=1).collect()}
    assert old == {("a", 0): "x", ("b", 1): "y"}
    # the delete is a tombstone, not a physical drop
    dead = t.read(include_tombstones=True).where("_deleted").collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in dead] == [("b", 1)]


def test_merge_idempotent_on_batch_id(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    src = _src(spark, [("a", 0, "x2", TS[1], "u", False)])
    assert not t.merge(src, batch_id=7)["skipped"]
    assert t.merge(src, batch_id=7)["skipped"]
    assert t.read().first()["text"] == "x2"


def test_monotone_ts_guard_blocks_stale_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "newer", TS[5])])
    stale = _src(spark, [
        ("a", 0, "old", TS[1], "u", False),
        ("a", 0, None, TS[2], "d", False),
    ])
    # stale replay in two separate batches: neither the old update nor the
    # old delete may beat the newer row
    t.merge(stale.where("_op = 'u'"), batch_id=1)
    t.merge(stale.where("_op = 'd'"), batch_id=2)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["text"] == "newer"


def test_tombstone_blocks_resurrection(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    t.merge(_src(spark, [("a", 0, None, TS[5], "d", False)]), batch_id=1)
    # replayed stale insert arrives after the delete
    t.merge(_src(spark, [("a", 0, "zombie", TS[1], "u", False)]), batch_id=2)
    assert t.read().count() == 0
    # but a genuinely newer insert resurrects (ReplaceOne upsert semantics)
    t.merge(_src(spark, [("a", 0, "reborn", TS[7], "u", False)]), batch_id=3)
    assert t.read().first()["text"] == "reborn"


def test_patch_semantics_in_merge(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    # patch on existing row: only non-null fields overwrite
    t.merge(_src(spark, [("a", 0, "patched", TS[1], "u", True)]), batch_id=1)
    assert t.read().first()["text"] == "patched"
    # patch on missing key: no-op (UpdateOne without upsert)
    t.merge(_src(spark, [("nope", 9, "ghost", TS[2], "u", True)]), batch_id=2)
    assert t.read().count() == 1
    # patch on tombstoned key: no resurrection
    t.merge(_src(spark, [("a", 0, None, TS[3], "d", False)]), batch_id=3)
    t.merge(_src(spark, [("a", 0, "ghost", TS[4], "u", True)]), batch_id=4)
    assert t.read().count() == 0


def test_bucket_pruning_rewrites_only_changed_buckets(spark, tmp_path):
    rows = [(f"c{i}", 0, "x", TS[0]) for i in range(64)]
    t = _mk(spark, tmp_path, rows, n_buckets=8)
    before = t.manifest()["buckets"]
    res = t.merge(_src(spark, [("c1", 0, "y", TS[1], "u", False)]), batch_id=1)
    assert res["changed_buckets"] == 1
    after = t.manifest()["buckets"]
    unchanged = [b for b in after if after[b] == before[b]]
    assert len(unchanged) == 7  # 7 of 8 buckets share files with v1 untouched


def test_schema_evolution_adds_column(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    src = spark.createDataFrame(
        [("b", 1, "y", TS[1], "calculator", "u", False)],
        "conv_id string, turn_idx int, text string, ts timestamp, tool string, _op string, _is_patch boolean",
    )
    t.merge(src, batch_id=1)
    got = {(r["conv_id"], r["turn_idx"]): r["tool"] for r in t.read().collect()}
    assert got == {("a", 0): None, ("b", 1): "calculator"}  # old files read NULL
    assert "tool" in [f.name for f in t.schema().fields]


def test_all_null_new_column_not_evolved(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    src = spark.createDataFrame(
        [("b", 1, "y", TS[1], None, "u", False)],
        "conv_id string, turn_idx int, text string, ts timestamp, tool string, _op string, _is_patch boolean",
    )
    t.merge(src, batch_id=1)
    assert "tool" not in [f.name for f in t.schema().fields]


def test_vacuum_tombstones(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0]), ("b", 1, "y", TS[1])])
    t.merge(_src(spark, [("a", 0, None, TS[2], "d", False)]), batch_id=1)
    assert t.read(include_tombstones=True).where("_deleted").count() == 1
    t.vacuum_tombstones(before_ts=TS[5])
    assert t.read(include_tombstones=True).where("_deleted").count() == 0
    assert t.read().count() == 1  # live rows untouched


def test_expire_versions_removes_unreferenced_files(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    for i in range(1, 4):
        t.merge(_src(spark, [("a", 0, f"v{i}", TS[i], "u", False)]), batch_id=i)
    removed = t.expire_versions(keep=1)
    assert removed > 0
    assert t.read().first()["text"] == "v3"  # latest still reads fine


def test_pipeline_expires_old_versions(spark, tmp_path):
    """Continuous streams must not grow storage unboundedly: the pipeline
    expires old versions' data files on a batch cadence."""
    from py_mongo_sync_spark.config import SyncConfig
    from py_mongo_sync_spark.sources.generate import gen_oplog_events, gen_transcripts_snapshot
    from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

    cfg = SyncConfig(
        dst_path=str(tmp_path / "l"), checkpoint_path=str(tmp_path / "c"),
        n_buckets=2, keep_versions=2, expire_every=2,
    )
    pipe = CdcPipeline(spark, cfg)
    pipe.initial_sync(gen_transcripts_snapshot(spark, 5, 2))
    ev = gen_oplog_events(spark, 5, 2, 40)
    stats = [pipe.apply_batch(ev.where(f"ts % 4 = {i}"), i) for i in range(4)]
    assert any(s.get("expired_files", 0) > 0 for s in stats)
    assert pipe.table.read().count() > 0  # latest version intact


def test_epoch_guard_prevents_fresh_checkpoint_skip(spark, tmp_path):
    """r2 ADVICE data-loss fix: batch ids restart at 0 under a NEW streaming
    checkpoint; without an epoch the below-window rule silently skips every
    early batch of the new stream (reproduced end-to-end in the verify
    drive). With epochs: a different epoch is never 'committed', the first
    commit resets the window, and same-epoch replay protection survives."""
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    t.epoch = "stream-A"
    for b in range(3):
        t.merge(_src(spark, [("a", 0, f"v{b}", TS[b + 1], "u", False)]), batch_id=b)
    assert t.is_committed(1) and t.is_committed(0)

    # same table, NEW stream instance: ids restart at 0 — must NOT skip
    t2 = LakeTable(spark, t.path)
    t2.epoch = "stream-B"
    assert not t2.is_committed(0)
    res = t2.merge(_src(spark, [("a", 0, "fresh", TS[5], "u", False)]), batch_id=0)
    assert not res["skipped"]
    assert t2.read().first()["text"] == "fresh"

    # window was reset to the new epoch: old epoch's ids gone, new id held
    assert t2.is_committed(0)
    assert not t2.is_committed(1)

    # restart of the SAME instance (same epoch) keeps replay protection
    t3 = LakeTable(spark, t.path)
    t3.epoch = "stream-B"
    assert t3.is_committed(0)
    assert t3.merge(_src(spark, [("a", 0, "dup", TS[6], "u", False)]),
                    batch_id=0)["skipped"]


def test_epoch_is_stable_per_checkpoint_dir(tmp_path):
    from py_mongo_sync_spark.streaming.pipeline import checkpoint_epoch

    d1, d2 = str(tmp_path / "cp1"), str(tmp_path / "cp2")
    assert checkpoint_epoch(d1) == checkpoint_epoch(d1)
    assert checkpoint_epoch(d1) != checkpoint_epoch(d2)


def test_commit_conflict_detected_not_lost(spark, tmp_path):
    """Optimistic concurrency: two writers racing to the same version —
    the loser gets CommitConflict instead of silently overwriting the
    winner's manifest (dual-committer / zombie-driver case)."""
    import pytest

    from py_mongo_sync_spark.plans.lake import CommitConflict

    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    t2 = LakeTable(spark, t.path)          # second handle = second writer
    m1 = t.manifest()
    m2 = t2.manifest()
    t._commit(dict(m1, version=m1["version"] + 1, note="winner"))
    with pytest.raises(CommitConflict):
        t2._commit(dict(m2, version=m2["version"] + 1, note="loser"))
    assert t.manifest()["note"] == "winner"  # winner's commit intact


def test_commit_skips_crashed_writer_orphan(spark, tmp_path):
    """A manifest claimed by a writer that crashed LONG AGO (file exists,
    pointer never advanced, claim older than the grace period) must not
    wedge the table: the next commit skips over it."""
    import json as _json
    import os

    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    v = t.latest_version()
    orphan = os.path.join(t._versions_dir, f"v{v + 1:08d}.json")
    with open(orphan, "w") as f:
        _json.dump({"version": v + 1, "crashed": True}, f)
    old = 1_700_000_000  # well past ORPHAN_GRACE_SECONDS
    os.utime(orphan, (old, old))
    res = t.merge(_src(spark, [("a", 0, "x2", TS[1], "u", False)]), batch_id=1)
    assert not res["skipped"]
    assert t.latest_version() == v + 2     # orphan v+1 skipped, not wedged
    assert t.read().first()["text"] == "x2"


def test_commit_conflicts_on_inflight_young_claim(spark, tmp_path):
    """TOCTOU guard: a FRESH claimed-but-unpointed manifest is a concurrent
    writer inside its claim→pointer-swap window, NOT a crashed orphan.
    Skipping it would commit the next version on the stale pre-claim
    manifest and silently lose the in-flight MERGE — the commit must raise
    CommitConflict so the caller re-reads and retries."""
    import json as _json
    import os

    import pytest

    from py_mongo_sync_spark.plans.lake import CommitConflict

    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    v = t.latest_version()
    claim = os.path.join(t._versions_dir, f"v{v + 1:08d}.json")
    with open(claim, "w") as f:
        _json.dump({"version": v + 1, "inflight": True}, f)  # mtime = now
    with pytest.raises(CommitConflict, match="in-flight"):
        t.merge(_src(spark, [("a", 0, "x2", TS[1], "u", False)]), batch_id=1)
    assert t.latest_version() == v  # loser wrote nothing past the claim


def test_history_inspection(spark, tmp_path):
    """history() lists every version with commit metadata, marks the
    latest, and tolerates a crashed writer's partial manifest."""
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    t.merge(_src(spark, [("a", 0, "x2", TS[1], "u", False)]), batch_id=1)
    t.merge(_src(spark, [("b", 1, "y", TS[2], "u", False)]), batch_id=2)
    # partial manifest from a crashed writer: ignored, not fatal
    import os
    with open(os.path.join(t._versions_dir, "v99999999.json"), "w") as f:
        f.write("{not json")
    h = {r["version"]: r for r in t.history().collect()}
    assert set(h) == {1, 2, 3}
    assert h[3]["is_latest"] and not h[1]["is_latest"]
    assert h[3]["max_batch_id"] == 2 and h[2]["max_batch_id"] == 1
    assert h[1]["n_columns"] == 4 and h[1]["write_mode"] == "cow"
    assert h[3]["n_data_files"] > 0


def test_rebucket_evolves_bucket_count(spark, tmp_path):
    """Bucket-count evolution: rows, tombstones, and CDC behavior survive
    the rewrite; subsequent merges use the new layout from the manifest."""
    t = _mk(spark, tmp_path, [(f"c{i}", 0, f"t{i}", TS[i % 10]) for i in range(20)],
            n_buckets=2)
    t.merge(_src(spark, [("c1", 0, None, TS[5], "d", False)]), batch_id=1)
    assert t.manifest()["n_buckets"] == 2

    res = t.rebucket(8)
    assert res["n_buckets"] == 8 and t.manifest()["n_buckets"] == 8
    got = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert len(got) == 19 and "c1" not in got          # delete survived
    dead = t.read(include_tombstones=True).where("_deleted").count()
    assert dead == 1                                   # as a tombstone

    # post-rebucket merges work against the new layout, and the stale-ts
    # guard still blocks resurrection of the tombstoned key
    r2 = t.merge(_src(spark, [
        ("c2", 0, "updated", TS[8], "u", False),
        ("c1", 0, "zombie", TS[2], "i", False),        # older than delete
    ]), batch_id=2)
    assert not r2["skipped"]
    got2 = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert got2["c2"] == "updated" and "c1" not in got2
    # bucket pruning operates on the NEW count (a 1-key batch ≤ few buckets)
    r3 = t.merge(_src(spark, [("c3", 0, "x", TS[9], "u", False)]), batch_id=3)
    assert r3["changed_buckets"] <= 2


def test_rebucket_mor_folds_deltas(spark, tmp_path):
    """MoR: pending per-bucket deltas fold into the rebucketed base (kept
    deltas would re-apply residual patches on the next read)."""
    df = spark.createDataFrame(
        [(f"c{i}", 0, f"t{i}", TS[i % 10]) for i in range(10)],
        "conv_id string, turn_idx int, text string, ts timestamp")
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create_or_replace(df, key_cols=KEYS, ts_col="ts", n_buckets=2,
                        write_mode="mor")
    t.merge(_src(spark, [("c0", 0, "patched", TS[9], "u", False)]), batch_id=1)
    assert t.manifest().get("deltas")                  # delta pending
    t.rebucket(4)
    m = t.manifest()
    assert m["n_buckets"] == 4 and not m.get("deltas")
    assert {r["conv_id"]: r["text"] for r in t.read().collect()}["c0"] == "patched"


def test_read_changes_incremental_changelog(spark, tmp_path):
    """Incremental read between versions: inserts/updates/deletes appear
    with the right change type, rewritten-but-identical rows in a touched
    bucket do NOT appear, and untouched-version pairs return nothing."""
    t = _mk(spark, tmp_path, [
        ("a", 0, "x", TS[0]), ("b", 1, "y", TS[1]), ("c", 2, "z", TS[2]),
    ], n_buckets=2)
    v1 = t.latest_version()
    t.merge(_src(spark, [
        ("a", 0, "x2", TS[3], "u", False),        # update
        ("d", 3, "new", TS[4], "u", False),       # insert
        ("b", 1, None, TS[5], "d", False),        # delete
    ]), batch_id=1)
    v2 = t.latest_version()

    ch = {(r["conv_id"], r["turn_idx"]): r for r in
          t.read_changes(v1, v2).collect()}
    types = {k: v["_change_type"] for k, v in ch.items()}
    assert types == {("a", 0): "update", ("d", 3): "insert", ("b", 1): "delete"}
    assert ch[("a", 0)]["text"] == "x2"           # new values carried
    assert ch[("b", 1)]["text"] == "y"            # delete: last-known values
    # ("c", 2) shares a bucket with changed keys but is unchanged → absent

    # a later batch diffed against v2 sees only ITS changes
    t.merge(_src(spark, [("c", 2, "z2", TS[6], "u", False)]), batch_id=2)
    ch2 = {(r["conv_id"], r["turn_idx"]): r["_change_type"]
           for r in t.read_changes(v2).collect()}
    assert ch2 == {("c", 2): "update"}
    # full span: union of both diffs
    ch_all = {(r["conv_id"], r["turn_idx"]): r["_change_type"]
              for r in t.read_changes(v1).collect()}
    assert ch_all == {("a", 0): "update", ("d", 3): "insert",
                      ("b", 1): "delete", ("c", 2): "update"}
    # identical versions: empty
    assert t.read_changes(v2, v2).count() == 0


def test_read_changes_roundtrip_reconstructs_new_state(spark, tmp_path):
    """The consumer contract: OLD live snapshot + changelog = NEW live
    snapshot, exactly — (inserts ∪ updates) upsert, deletes remove."""
    t = _mk(spark, tmp_path, [
        (f"c{i}", i % 3, f"t{i}", TS[i % 10]) for i in range(12)
    ], n_buckets=4)
    v1 = t.latest_version()
    t.merge(_src(spark, [
        ("c1", 1, "u1", TS[5], "u", False),
        ("c4", 1, None, TS[6], "d", False),
        ("x9", 9, "nine", TS[7], "u", False),
    ]), batch_id=1)
    t.merge(_src(spark, [
        ("c2", 2, "u2", TS[8], "u", False),
        ("x9", 9, None, TS[9], "d", False),   # insert then delete across span
    ]), batch_id=2)

    old = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in t.read(version=v1).collect()}
    new = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()}
    state = dict(old)
    for r in t.read_changes(v1).collect():
        key = (r["conv_id"], r["turn_idx"])
        if r["_change_type"] == "delete":
            state.pop(key, None)
        else:
            state[key] = r["text"]
    assert state == new
    # x9: inserted after v1 and deleted again before the end — classified
    # as neither insert nor delete relative to (v1, latest)
    keys = {(r["conv_id"], r["turn_idx"]) for r in t.read_changes(v1).collect()}
    assert ("x9", 9) not in keys


def test_crashed_rename_repaired_on_next_open(spark, tmp_path):
    """A crash between rename_to's directory move and its manifest prefix
    rewrite must NOT strand the table: the persisted _PENDING_RENAME_FROM
    marker makes the next open re-run the (idempotent) rewrite, so reads
    resolve the moved data files. Previously the repair was only claimed in
    a docstring — manifests kept absolute paths under the dead old prefix
    and every read() failed until manual surgery."""
    import os

    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0]), ("b", 1, "y", TS[1])])
    old_path = os.path.normpath(t.path)
    new_path = os.path.join(str(tmp_path), "moved_table")
    # simulate the crash window: marker written, dir moved, process dies
    # BEFORE any manifest is rewritten
    marker = os.path.join(old_path, LakeTable._RENAME_MARKER)
    with open(marker, "w") as f:
        f.write(old_path)
    os.rename(old_path, new_path)

    t2 = LakeTable(spark, new_path)  # fresh open, as after restart
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t2.read().collect()}
    assert got == {("a", 0): "x", ("b", 1): "y"}
    assert not os.path.exists(os.path.join(new_path, LakeTable._RENAME_MARKER))
    # repair must be durable: the manifests themselves now carry new-prefix
    # paths (not just this handle's in-memory view)
    m = LakeTable(spark, new_path).manifest()
    for fs in m["buckets"].values():
        for p in fs:
            assert p.startswith(new_path + os.sep)


def test_merge_retries_after_losing_commit_race(spark, tmp_path):
    """Optimistic-concurrency retry (the Iceberg commit loop): a writer
    whose claim loses to a concurrent commit must re-read the manifest and
    re-run its MERGE on the new state — both writers' changes land, none
    lost. If the concurrent winner committed the SAME batch id, the retry
    resolves to an idempotent skip instead."""
    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    t2 = LakeTable(spark, t.path)
    orig = t2._merge_attempt
    calls = {"n": 0}

    def hooked(source, bid, m, *a):
        calls["n"] += 1
        if calls["n"] == 1:
            # a concurrent writer wins the race in t2's read-to-claim window
            t.merge(_src(spark, [("z", 9, "w", TS[2], "u", False)]), batch_id=50)
        return orig(source, bid, m, *a)

    t2._merge_attempt = hooked
    res = t2.merge(_src(spark, [("a", 0, "x2", TS[3], "u", False)]), batch_id=51)
    assert not res["skipped"] and calls["n"] == 2  # one conflict, one success
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t2.read().collect()}
    assert got == {("a", 0): "x2", ("z", 9): "w"}  # both commits present

    # same-batch race: winner already committed batch 60 → retry skips
    calls["n"] = 0

    def hooked_same(source, bid, m, *a):
        calls["n"] += 1
        if calls["n"] == 1:
            t.merge(_src(spark, [("q", 5, "v", TS[4], "u", False)]), batch_id=60)
        return orig(source, bid, m, *a)

    t2._merge_attempt = hooked_same
    res2 = t2.merge(_src(spark, [("q", 5, "OTHER", TS[5], "u", False)]), batch_id=60)
    assert res2["skipped"]                          # no double-apply
    assert t2.read().where("conv_id = 'q'").first()["text"] == "v"


def test_expire_versions_reaps_conflict_loser_staging(spark, tmp_path):
    """The unique per-attempt staging dirs (dual-writer isolation) must not
    leak forever: a commit-conflict loser's staged parquet files are
    unreferenced by any manifest, and expire_versions reaps them."""
    import glob
    import json as _json
    import os

    import pytest

    from py_mongo_sync_spark.plans.lake import CommitConflict

    t = _mk(spark, tmp_path, [("a", 0, "x", TS[0])])
    v = t.latest_version()
    claim = os.path.join(t._versions_dir, f"v{v + 1:08d}.json")
    with open(claim, "w") as f:
        _json.dump({"version": v + 1, "inflight": True}, f)  # young claim
    with pytest.raises(CommitConflict):
        t.merge(_src(spark, [("a", 0, "x2", TS[1], "u", False)]),
                batch_id=1, retries=0)
    all_parquet = glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                            recursive=True)
    m = t.manifest()
    referenced = {p for fs in m["buckets"].values() for p in fs}
    orphans = [p for p in all_parquet if p not in referenced]
    assert orphans, "loser should have staged files"
    t.expire_versions(keep=1)
    left = glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                     recursive=True)
    assert set(left) == referenced  # orphans reaped, committed files intact
    assert t.read().first()["text"] == "x"


def test_bucket_stats_health_telemetry(spark, tmp_path):
    """bucket_stats: manifest+stat-call-only table health — sizes, skew,
    deltas, and a rebucket advisory keyed on AVERAGE bucket size (max
    alone is skew, which salting handles; resizing wouldn't)."""
    rows = [(f"c{i}", 0, "x" * 50, TS[0]) for i in range(64)]
    t = _mk(spark, tmp_path, rows, n_buckets=4)
    st = t.bucket_stats()
    assert st["n_buckets"] == 4 and st["version"] == t.latest_version()
    assert st["total_bytes"] > 0
    assert st["pending_delta_files"] == 0
    assert st["rebucket_advised"] is False and st["advised_n_buckets"] is None
    assert st["skew_max_over_median"] >= 1.0


def test_bucket_cols_decoupled_from_key(spark, tmp_path):
    """A table bucketed on a PROBE column (not its unique key): reads
    pruned by the probe column's bucket return exactly the matching rows,
    MERGE routes source rows to the right buckets, and rebucket/compact
    keep the layout (the ingest signature-index pattern)."""
    from py_mongo_sync_spark.plans.lake import bucket_expr, manifest_bucket_cols

    df = spark.createDataFrame(
        [("a", 0, "k1", TS[0]), ("b", 1, "k1", TS[0]),
         ("c", 2, "k2", TS[0]), ("d", 3, "k3", TS[0])],
        "conv_id string, turn_idx int, probe string, ts timestamp",
    )
    t = LakeTable(spark, str(tmp_path / "bc"))
    t.create_or_replace(df, key_cols=KEYS, ts_col="ts", n_buckets=4,
                        bucket_cols=["probe"])
    assert manifest_bucket_cols(t.manifest()) == ["probe"]

    # pruned read: the bucket k1 hashes to holds ALL k1 rows, none missed
    bid = df.where("probe = 'k1'").select(
        bucket_expr(["probe"], 4).alias("b")).first()["b"]
    got = {r["conv_id"] for r in t.read(buckets=[bid]).collect()
           if r["probe"] == "k1"}
    assert got == {"a", "b"}
    full = {r["conv_id"] for r in t.read().collect() if r["probe"] == "k1"}
    assert full == got

    # MERGE with a new k1 row + an update: lands in k1's bucket, pruned
    # read sees it
    src = spark.createDataFrame(
        [("e", 4, "k1", TS[1], "u", False), ("a", 0, "k1", TS[2], "u", False)],
        "conv_id string, turn_idx int, probe string, ts timestamp, "
        "_op string, _is_patch boolean",
    )
    t.merge(src, batch_id=1)
    got2 = {r["conv_id"] for r in t.read(buckets=[bid]).collect()
            if r["probe"] == "k1"}
    assert got2 == {"a", "b", "e"}
    assert t.read().count() == 5

    # dropping the bucket column is refused like key/ts
    import pytest as _pt
    with _pt.raises(ValueError, match="bucket"):
        t.drop_column("probe")

    # rebucket preserves the probe-column layout
    t.rebucket(8)
    bid8 = df.where("probe = 'k1'").select(
        bucket_expr(["probe"], 8).alias("b")).first()["b"]
    got3 = {r["conv_id"] for r in t.read(buckets=[bid8]).collect()
            if r["probe"] == "k1"}
    assert got3 == {"a", "b", "e"}
