"""Oplog change-event sources — S3/S4.

Reference: the tailable-await cursor on ``local.oplog.rs`` with the
``ts >= start_optime`` / ``fromMigrate``-absent predicate pushed to the
server (/root/reference/mongosync/mongo/handler.py:122-135). Spark form: a
Structured Streaming file source (JSON lines or parquet segments) with an
explicit schema; Kafka is a one-line swap (``format("kafka")`` +
``startingOffsets``) kept behind the same helper signature. The start-optime
predicate is a plain filter — pushed into the scan by Catalyst; offset
tracking/resume is the stream checkpointLocation (S4's locate-start
behavior, common_syncer.py:93-102, comes free) plus our staleness assertion
(plans/checkpoints.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from py_mongo_sync_spark.schema import OPLOG_SCHEMA


def read_oplog_batch(
    spark: SparkSession, path: str, start_optime: int | None = None, fmt: str = "json"
) -> DataFrame:
    reader = spark.read.schema(OPLOG_SCHEMA)
    df = reader.parquet(path) if fmt == "parquet" else reader.json(path)
    if start_optime is not None:
        df = df.where(F.col("ts") >= start_optime)  # pushdown analogue of the $gte predicate
    return df


def read_oplog_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    start_optime: int | None = None,
    fmt: str = "json",
) -> DataFrame:
    reader = spark.readStream.schema(OPLOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path) if fmt == "parquet" else reader.json(path)
    if start_optime is not None:
        df = df.where(F.col("ts") >= start_optime)
    return df


def kafka_value_projection(raw: DataFrame) -> DataFrame:
    """Kafka record → oplog envelope: the ``value`` payload (binary JSON,
    Kafka's wire shape) parses against OPLOG_SCHEMA. Pure column
    expressions over any DataFrame carrying a ``value`` column, so the
    contract is unit-testable without a broker (the connector jar is absent
    in this environment); a record whose value is not valid JSON yields a
    NULL envelope row, which the pipeline's op filter drops rather than
    poisoning the batch."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), OPLOG_SCHEMA).alias("e")
    ).select("e.*")


def read_oplog_kafka(
    spark: SparkSession, bootstrap: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """Production-shape source (requires the Kafka connector jar, absent in
    this environment — the stream read itself is gated/untested here, but
    the value→envelope projection contract is unit-tested). Everything
    downstream is identical to the file source."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_value_projection(raw)
