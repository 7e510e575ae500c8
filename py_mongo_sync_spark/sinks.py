"""Pluggable second sink flavor — the search-document store.

The reference proves its sink is pluggable by shipping TWO syncers behind
one dispatch (``sync.py:25-34``): MongoSyncer (authoritative replica,
upserts by _id) and EsSyncer (search index: bulk index/update/delete
actions, /root/reference/mongosync/es/syncer.py + es/handler.py:38-43).
This module is the Spark analogue of the second: a **SearchDocSink** that
maintains the CURRENT document set only —

- deletes remove documents physically (a search index keeps no tombstones
  or history; contrast plans/lake.py where deletes persist as tombstones
  for replay safety);
- updates are partial-document merges ($set/$unset/$inc translated exactly
  like the ES syncer's partial-update scripts, es/syncer.py:182-216);
- each batch applies as one atomic index swap (versioned metadata +
  pointer rename — the refresh-visibility analogue), idempotent on
  batch_id;
- the index is HASH-BUCKETED on the key (the lake's bucket layout,
  plans/lake.py bucket_expr): a batch reads and rewrites ONLY the buckets
  its keys touch, so per-batch I/O is O(touched buckets), not O(index) —
  the r2 full-index-rewrite scale killer is gone. Unchanged buckets stay
  referenced from their previous version directories.

``SearchSyncPipeline`` reuses CdcPipeline's transform + per-key fold and
routes the net events here instead of the lake MERGE — the engine-level
proof that sources/transforms are sink-agnostic.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from py_mongo_sync_spark.operators.dedup import fold_net_events
from py_mongo_sync_spark.plans.lake import bucket_expr

_SB = "_sbucket"


class SearchDocSink:
    """Current-state document store: hash-bucketed, atomic versioned swaps."""

    def __init__(self, spark: SparkSession, path: str,
                 key_cols: list[str], ts_col: str = "ts",
                 n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.ts_col = ts_col
        self.n_buckets = n_buckets
        #: stream-instance identity, same contract as LakeTable.epoch: a
        #: fresh streaming checkpoint restarts batch ids at 0, and without
        #: the epoch the below-window replay rule would skip the new
        #: stream's batches (the lake's r2 data-loss bug — same guard here)
        self.epoch: str | None = None

    # ---------------------------------------------------------------- io

    @property
    def _ptr(self) -> str:
        return os.path.join(self.path, "_LATEST_INDEX")

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.path, "_meta", f"v{version:08d}.json")

    def exists(self) -> bool:
        return os.path.exists(self._ptr)

    def _meta(self) -> dict:
        with open(self._ptr) as f:
            version = int(f.read().strip())
        with open(self._meta_path(version)) as f:
            return json.load(f)

    def is_committed(self, batch_id: int) -> bool:
        if not self.exists():
            return False
        m = self._meta()
        if self.epoch is not None and m.get("epoch") != self.epoch:
            # different id sequence — INCLUDING an epoch-less meta written
            # by direct batch callers (bulk_load / apply without a stream):
            # replaying is idempotent-safe, skipping is data loss
            return False
        recent = m.get("recent_batch_ids", [])
        return batch_id in recent or (bool(recent) and batch_id < min(recent))

    def _commit(self, version: int, schema_json: dict, batch_id: int | None,
                buckets: dict[str, int | None]) -> None:
        prev = self._meta() if self.exists() else {"recent_batch_ids": []}
        if (self.epoch is not None and prev.get("epoch") != self.epoch):
            recent: list[int] = []  # new epoch: old ids are another sequence
        else:
            recent = list(prev.get("recent_batch_ids", []))
        if batch_id is not None:
            recent = sorted(set(recent) | {batch_id})[-64:]
        meta = {"version": version, "schema": schema_json,
                "recent_batch_ids": recent,
                "epoch": self.epoch if self.epoch is not None else prev.get("epoch"),
                "n_buckets": self.n_buckets, "buckets": buckets}
        os.makedirs(os.path.dirname(self._meta_path(version)), exist_ok=True)
        tmp = self._meta_path(version) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(version))
        ptmp = self._ptr + f".tmp.{uuid.uuid4().hex}"
        with open(ptmp, "w") as f:
            f.write(str(version))
        os.replace(ptmp, self._ptr)

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.path, "index", f"v{version:08d}")

    def _bucket_dir(self, version: int, bucket: int) -> str:
        return os.path.join(self._data_dir(version), f"{_SB}={bucket}")

    # -------------------------------------------------------------- write

    def _write_bucketed(self, docs: DataFrame, version: int) -> set[int]:
        """Write docs partitioned by key-hash bucket under the version dir;
        return the set of buckets that produced files. Repartitioning on the
        bucket keeps file counts bounded (one task per bucket)."""
        out = (
            docs.withColumn(_SB, bucket_expr(self.key_cols, self.n_buckets))
            .repartition(self.n_buckets, _SB)
        )
        out.write.mode("overwrite").partitionBy(_SB).parquet(self._data_dir(version))
        written = set()
        ddir = self._data_dir(version)
        if os.path.isdir(ddir):
            for d in os.listdir(ddir):
                if d.startswith(f"{_SB}="):
                    written.add(int(d.split("=", 1)[1]))
        return written

    def bulk_load(self, docs: DataFrame) -> None:
        """Initial index build (reference: ES snapshot bulk index,
        es/syncer.py:65-84)."""
        version = (self._meta()["version"] + 1) if self.exists() else 1
        written = self._write_bucketed(docs, version)
        buckets: dict[str, int | None] = {
            str(b): (version if b in written else None)
            for b in range(self.n_buckets)
        }
        self._commit(version, docs.schema.jsonValue(), None, buckets)

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current document set; ``buckets`` restricts to those key-hash
        buckets (the per-batch read path — bucket pruning)."""
        from pyspark.sql import types as T

        if not self.exists():
            raise FileNotFoundError(f"no index at {self.path}")
        m = self._meta()
        schema = T.StructType.fromJson(m["schema"])
        # the COMMITTED bucket count is authoritative: a reader handle
        # constructed with the default n_buckets against an index built
        # with more would otherwise silently return only the first
        # default-count buckets (apply_net_events already refreshes)
        self.n_buckets = m.get("n_buckets", self.n_buckets)
        want = range(self.n_buckets) if buckets is None else buckets
        paths = [
            self._bucket_dir(m["buckets"][str(b)], b)
            for b in want
            if m["buckets"].get(str(b)) is not None
        ]
        if not paths:
            return self.spark.createDataFrame([], schema)
        # explicit schema: buckets written before a schema evolution lack
        # the new columns — the reader fills them with NULL
        return self.spark.read.schema(schema).parquet(*paths)

    def apply_net_events(self, source: DataFrame, batch_id: int) -> dict:
        """Apply one microbatch of per-key net events (``_op``/``_is_patch``
        + optional ``_unset_cols``/``_inc_map``, the same contract as
        LakeTable.merge): the batch's key-hash buckets are probed (one
        ≤ n_buckets-row aggregate), ONLY those buckets' current docs feed
        the engine fold, deletes drop out physically, and the touched
        buckets swap to the next version — unchanged buckets keep their
        old pointers (per-batch I/O ∝ touched buckets, never the index).
        ES-action mapping per es/syncer.py:242-258: replace→index,
        patch→update, d→delete."""
        from pyspark import StorageLevel

        t0 = time.monotonic()
        if self.is_committed(batch_id):
            return {"skipped": True, "batch_id": batch_id}
        m = self._meta()
        self.n_buckets = m.get("n_buckets", self.n_buckets)
        source = source.persist(StorageLevel.DISK_ONLY)
        changed = sorted(
            r[0]
            for r in source.select(
                bucket_expr(self.key_cols, self.n_buckets).alias("_b")
            ).distinct().collect()
        )
        if not changed:
            source.unpersist()
            self._commit(m["version"] + 1, m["schema"], batch_id, m["buckets"])
            return {"skipped": False, "batch_id": batch_id,
                    "changed_buckets": 0, "version": m["version"] + 1,
                    "wall_ms": int((time.monotonic() - t0) * 1000)}
        cur = self.read(buckets=changed)
        # schema evolution: event columns absent from the index map in
        table_cols = cur.columns
        new_cols = [
            c for c in source.columns
            if c not in table_cols and not c.startswith("_")
        ]
        for c in new_cols:
            cur = cur.withColumn(c, F.lit(None).cast(dict(source.dtypes)[c]))
        table_cols = cur.columns
        payload = [c for c in table_cols
                   if c not in self.key_cols and c != self.ts_col]

        cur_ev = cur.select(
            *table_cols,
            F.lit("u").alias("_op"), F.lit(False).alias("_is_patch"),
            F.lit(None).cast("array<string>").alias("_unset_cols"),
            F.lit(None).cast("map<string,double>").alias("_inc_map"),
            F.lit(-1).cast("long").alias("_bseq"),
        )
        src_ev = source.select(
            *[
                F.col(c).cast(dict(cur.dtypes)[c]) if c in source.columns
                else F.lit(None).cast(dict(cur.dtypes)[c]).alias(c)
                for c in table_cols
            ],
            F.col("_op"), F.col("_is_patch"),
            (F.col("_unset_cols") if "_unset_cols" in source.columns
             else F.lit(None).cast("array<string>")).alias("_unset_cols"),
            (F.col("_inc_map") if "_inc_map" in source.columns
             else F.lit(None).cast("map<string,double>")).alias("_inc_map"),
            F.lit(batch_id).cast("long").alias("_bseq"),
        )
        folded = fold_net_events(
            cur_ev.unionByName(src_ev),
            key_cols=self.key_cols, payload_cols=payload, ts_col=self.ts_col,
            op_col="_op", patch_col="_is_patch", seq_col="_bseq",
            unset_col="_unset_cols", inc_col="_inc_map",
        )
        docs = folded.where(
            (F.col("_op") != "d") & ~F.col("_is_patch")
        ).select(*table_cols)
        version = m["version"] + 1
        written = self._write_bucketed(docs, version)
        source.unpersist()
        stray = written - set(changed)
        if stray:
            raise RuntimeError(
                f"search-index bucket-math mismatch: probe said {changed}, "
                f"write produced {sorted(stray)}"
            )
        buckets = dict(m["buckets"])
        for b in changed:  # a changed bucket with no surviving docs → empty
            buckets[str(b)] = version if b in written else None
        # evolved schema applies to the whole index (old buckets NULL-fill)
        self._commit(version, docs.schema.jsonValue(), batch_id, buckets)
        return {
            "skipped": False, "batch_id": batch_id, "version": version,
            "changed_buckets": len(changed),
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }


    def expire_versions(self, keep: int = 3) -> int:
        """Storage lifecycle (the lake's ``expire_versions`` analogue): a
        continuous stream creates one index version per batch, but each new
        version only REWRITES the touched buckets — untouched buckets stay
        referenced from older version dirs. Drop bucket directories not
        referenced by any of the newest ``keep`` metas; returns files
        removed."""
        import shutil

        if not self.exists():
            return 0
        latest = self._meta()["version"]
        referenced: set[str] = set()
        for v in range(max(1, latest - keep + 1), latest + 1):
            try:
                with open(self._meta_path(v)) as f:
                    m = json.load(f)
            except FileNotFoundError:
                continue
            for b, ver in m.get("buckets", {}).items():
                if ver is not None:
                    referenced.add(self._bucket_dir(ver, int(b)))
        removed = 0
        root = os.path.join(self.path, "index")
        if os.path.isdir(root):
            for vdir in sorted(os.listdir(root)):
                full = os.path.join(root, vdir)
                for bdir in list(os.listdir(full)):
                    bfull = os.path.join(full, bdir)
                    if bdir.startswith(f"{_SB}=") and bfull not in referenced:
                        removed += sum(len(fs) for _, _, fs in os.walk(bfull))
                        shutil.rmtree(bfull, ignore_errors=True)
                if not os.listdir(full):
                    os.rmdir(full)
        return removed


class SearchSyncPipeline:
    """CdcPipeline with the search-document sink in place of the lake — the
    dispatch analogue of ``sync.py:25-34`` picking EsSyncer over
    MongoSyncer. Transform + fold are literally CdcPipeline's."""

    def __init__(self, spark: SparkSession, cfg, dst_ns: str = "chat.transcripts"):
        from py_mongo_sync_spark.schema import KEY_COLS
        from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

        self._helper = CdcPipeline(spark, cfg, dst_ns=dst_ns)
        self.sink = SearchDocSink(spark, cfg.dst_path, KEY_COLS,
                                  n_buckets=cfg.n_buckets)
        self.cfg = cfg

    def initial_sync(self, snapshot: DataFrame) -> None:
        self.sink.bulk_load(snapshot)

    def apply_batch(self, events: DataFrame, batch_id: int) -> dict:
        from py_mongo_sync_spark.schema import FIXTURE_EPOCH

        if self.sink.is_committed(batch_id):
            return {"skipped": True, "batch_id": batch_id}
        parsed = self._helper.transform(events)
        folded = self._helper._fold(parsed)
        source = folded.withColumn(
            "ts", F.timestamp_seconds(F.lit(FIXTURE_EPOCH) + F.col("ts"))
        )
        res = self.sink.apply_net_events(source, batch_id)
        if (not res.get("skipped") and self.cfg.expire_every
                and (batch_id + 1) % self.cfg.expire_every == 0):
            res["expired_files"] = self.sink.expire_versions(self.cfg.keep_versions)
        return res

    def run_stream(self, events_stream: DataFrame, spark_checkpoint_dir: str,
                   available_now: bool = True):
        """Same streaming shape as CdcPipeline.run_stream, targeting the
        search index; wires the checkpoint epoch so batch ids restarting
        under a fresh checkpoint are never mistaken for replays."""
        from py_mongo_sync_spark.streaming.pipeline import checkpoint_epoch

        self.sink.epoch = checkpoint_epoch(spark_checkpoint_dir)
        writer = (
            events_stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df, bid)
            )
            .option("checkpointLocation", spark_checkpoint_dir)
            .outputMode("update")
        )
        q = writer.trigger(availableNow=True).start() if available_now else (
            writer.trigger(processingTime="1 second").start()
        )
        if available_now:
            q.awaitTermination()
        return q

    def read(self) -> DataFrame:
        return self.sink.read()
