"""CdcPipeline — snapshot load + oplog tail + foreachBatch MERGE apply.

The Spark re-expression of the reference's whole query lifecycle
(SURVEY §3.1; /root/reference/mongosync/common_syncer.py:90-118 stage
machine, mongo/syncer.py:239-366 replay loop):

1. ``initial_sync``      — batch read → LakeTable.create_or_replace (K1)
2. ``run_stream``        — readStream → transform → ``foreachBatch``:
   a. per-source-partition metrics (A3/A4: progress + max-ts watermark)
   b. staleness assertion on resume (S4, mongo/syncer.py:277-284)
   c. ns filter / rename / projection (P1-P6) — column expressions
   d. vectorized doc parse (pandas UDF)
   e. per-key LWW fold to net events (H2/H3 ordering invariant)
   f. LakeTable.merge — bucket-pruned copy-on-write MERGE (K2/K3/K4),
      idempotent on batch_id, monotone-ts guarded
   g. CheckpointLog.append — lineage/metrics rows (optime_logger analogue)

Stage telemetry mirrors the reference's 4-stage machine
(STOPPED → INITIAL_SYNC → POST_INITIAL_SYNC → OPLOG_SYNC,
common_syncer.py:15-25) — under MERGE semantics the post-initial-sync
duplicate-tolerance window vanishes, so the stage is telemetry only.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.functions.namespace import (
    rename_ns,
    system_ns_filter,
    valid_oplog_filter,
)
from py_mongo_sync_spark.functions.parse import parsed_events
from py_mongo_sync_spark.functions.project import project_fields
from py_mongo_sync_spark.operators.dedup import fold_net_events
from py_mongo_sync_spark.plans.checkpoints import CheckpointLog
from py_mongo_sync_spark.plans.lake import LakeTable
from py_mongo_sync_spark.schema import FIXTURE_EPOCH, KEY_COLS

STAGES = ("STOPPED", "INITIAL_SYNC", "POST_INITIAL_SYNC", "OPLOG_SYNC")
PAYLOAD_COLS = ["conv_id", "turn_idx", "role", "text", "tool"]


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: SyncConfig,
        dst_ns: str = "chat.transcripts",
    ):
        self.spark = spark
        self.cfg = cfg
        self.dst_ns = dst_ns
        self.table = LakeTable(spark, cfg.dst_path)
        self.cplog = CheckpointLog(spark, cfg.checkpoint_path)
        self.stage = "STOPPED"
        self._resume_checked = not self.cplog.exists()
        self.last_stats: list[dict] = []

    # ------------------------------------------------------------ snapshot

    def initial_sync(self, snapshot: DataFrame) -> LakeTable:
        """Phase A: atomic full load (idempotent — re-runs replace the
        version; reference K1 upsert-convergence, mongo/syncer.py:104-123)."""
        self.stage = "INITIAL_SYNC"
        self.table.create_or_replace(
            snapshot,
            key_cols=KEY_COLS,
            ts_col="ts",
            n_buckets=self.cfg.n_buckets,
            files_per_bucket=self.cfg.files_per_bucket,
        )
        self.stage = "POST_INITIAL_SYNC"
        return self.table

    # ----------------------------------------------------------- transform

    def transform(self, events: DataFrame) -> DataFrame:
        """Envelope → parsed/filtered/renamed/projected payload rows.
        All column expressions + one Arrow-vectorized parse UDF."""
        op, ns = F.col("op"), F.col("ns")
        df = events.where(
            valid_oplog_filter(self.cfg, op, ns) & system_ns_filter(ns)
        ).withColumn("ns", rename_ns(self.cfg, ns))
        df = df.where(F.col("ns") == self.dst_ns).where(op.isin("i", "u", "d"))
        df = parsed_events(df, with_tool=True)
        df = project_fields(
            df, self.cfg,
            always_keep=["ts", "op", "is_patch", "conv_id", "turn_idx"],
        )
        return df.where(F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())

    # --------------------------------------------------------------- apply

    def apply_batch(self, events: DataFrame, batch_id: int) -> dict:
        """The foreachBatch function. Idempotent per batch_id."""
        t0 = time.monotonic()
        events = events.persist()
        try:
            # (a) per-source-partition watermark/metrics — computed on the raw
            # envelope before any shuffle (A4: max-ts watermark per partition)
            pstats = (
                events.groupBy(F.spark_partition_id().alias("pid"))
                .agg(
                    F.max("ts").alias("max_ts"),
                    F.min("ts").alias("min_ts"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            n_events = sum(r["n"] for r in pstats)

            # (b) resume staleness gate (reference mongo/syncer.py:277-284)
            if not self._resume_checked and pstats:
                first_ts = min(r["min_ts"] for r in pstats)
                self.cplog.assert_not_stale(first_ts)
            self._resume_checked = True
            self.stage = "OPLOG_SYNC"

            # (c)+(d) transform, (e) fold to one net event per key
            parsed = self.transform(events)
            payload = [c for c in PAYLOAD_COLS if c in parsed.columns]
            folded = fold_net_events(
                parsed, key_cols=KEY_COLS, payload_cols=payload,
                ts_col="ts", op_col="op", patch_col="is_patch",
            )
            # envelope optime → the table's row timestamp
            source = folded.withColumn(
                "ts", F.timestamp_seconds(F.lit(FIXTURE_EPOCH) + F.col("ts"))
            )

            # (f) MERGE
            res = self.table.merge(source, batch_id=batch_id)

            # (g) lineage/metrics
            wall_ms = int((time.monotonic() - t0) * 1000)
            self.cplog.append(
                [
                    {
                        "batch_id": batch_id,
                        "partition_id": r["pid"],
                        "max_ts": r["max_ts"],
                        "n_events": r["n"],
                        "wall_ms": wall_ms,
                        "committed_at_seq": batch_id,
                    }
                    for r in pstats
                ]
            )
            res.update(n_events=n_events, wall_ms=wall_ms)
            self.last_stats.append(res)
            return res
        finally:
            events.unpersist()

    # -------------------------------------------------------------- stream

    def run_stream(
        self,
        events_stream: DataFrame,
        spark_checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str = "1 second",
    ):
        """Phase B: the oplog tail. With ``available_now`` the query drains
        everything and stops (test/bench mode); otherwise it runs continuous
        microbatches like the reference's infinite tail loop
        (mongo/syncer.py:239-366)."""
        writer = (
            events_stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df, bid)
            )
            .option("checkpointLocation", spark_checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return q
        return writer.trigger(processingTime=processing_time).start()

    # --------------------------------------------------------------- batch

    def replay_batch(self, events: DataFrame, batch_id: int = 0) -> dict:
        """One-shot batch replay (no streaming machinery) — used by bench
        and by callers that already hold the full change set."""
        return self.apply_batch(events, batch_id)
