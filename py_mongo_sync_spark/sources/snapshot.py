"""Snapshot (initial-sync) source — S1/S2.

Reference: exhaust-cursor full scan with ``$snapshot`` isolation
(/root/reference/mongosync/mongo/syncer.py:93-96) and the ``_id``-range
split of >1M-doc collections across 8 worker processes
(common_syncer.py:137-172, mongo/syncer.py:151-169). Both collapse to a
plain ``spark.read`` — Spark's split planning parallelizes the scan and the
LakeTable version pin gives snapshot isolation; no custom code, by design
(SURVEY §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from py_mongo_sync_spark.schema import TRANSCRIPT_SCHEMA, TRANSCRIPT_SCHEMA_V0


def read_snapshot(
    spark: SparkSession, path: str, with_tool: bool = True, fmt: str = "parquet"
) -> DataFrame:
    schema = TRANSCRIPT_SCHEMA if with_tool else TRANSCRIPT_SCHEMA_V0
    reader = spark.read.schema(schema)
    return reader.parquet(path) if fmt == "parquet" else reader.json(path)
