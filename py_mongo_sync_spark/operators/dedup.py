"""Last-writer-wins dedup and per-key event folding.

The reference preserves per-key order by routing equal keys to the same
sub-batch and applying ops sequentially
(/root/reference/mongosync/multi_oplog_replayer.py:69-87). We get a stronger
guarantee declaratively: inside each microbatch, all events for a key are
folded in ``ts`` order into ONE net event (so the MERGE source has exactly
one row per key). Two forms:

- :func:`lww_dedup` — plain ``row_number() over (partition by key order by
  ts desc) = 1`` for streams with full-row events only (no ``$set``).
- :func:`fold_net_events` — a per-key ordered fold (``collect_list`` →
  ``array_sort`` → ``aggregate``) that replays the reference's op semantics
  (multi_oplog_replayer.py:99-121, mongo/handler.py:143-165):

  * 'd' → tombstone
  * 'i' / 'u'-replace → full row
  * 'u'-patch over a row → field merge (``$set``, es/syncer.py:182-196)
  * 'u'-patch over a tombstone → no-op (UpdateOne without upsert)
  * 'u'-patch first in batch → stays a patch; resolved against the target
    inside the MERGE (coalesce) or dropped if the key is absent.

Everything is JVM-side (higher-order functions, no UDF). The fold's
per-key arrays are bounded by events-per-key-per-microbatch — small even at
10^10 total events. Partitioning is by the FULL key ``(conv_id, turn_idx)``,
so a hot conversation spreads over its turns; see operators/salt.py for the
residual single-turn hot-spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F, types as T


def lww_dedup(df: DataFrame, key_cols: list[str], ts_col: str = "ts") -> DataFrame:
    w = W.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def fold_net_events(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    patch_col: str = "is_patch",
) -> DataFrame:
    """Reduce a microbatch to one net event per key.

    Input: one row per event with key cols, ``ts``, ``op`` (i/u/d),
    ``is_patch`` and payload columns. Output: one row per key with payload,
    ``ts``, ``_op`` ('d' or 'u') and ``_is_patch``.
    """
    non_key_payload = [c for c in payload_cols if c not in key_cols]
    elem_fields = (
        [T.StructField("ts", df.schema[ts_col].dataType, False),
         T.StructField("op", T.StringType(), True),
         T.StructField("is_patch", T.BooleanType(), True)]
        + [T.StructField(c, df.schema[c].dataType, True) for c in non_key_payload]
    )
    elem_type = T.StructType(elem_fields)

    ev = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(op_col).alias("op"),
        F.coalesce(F.col(patch_col), F.lit(False)).alias("is_patch"),
        *[F.col(c).alias(c) for c in non_key_payload],
    )

    grouped = df.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(ev)).alias("_evs")
    )

    def step(acc, x):
        x_del = x["op"] == F.lit("d")
        x_patch = x["is_patch"]
        acc_del = acc["op"] == F.lit("d")
        patched = F.struct(
            x["ts"].alias("ts"),
            F.lit("u").alias("op"),
            acc["is_patch"].alias("is_patch"),
            *[F.coalesce(x[c], acc[c]).alias(c) for c in non_key_payload],
        )
        return (
            F.when(acc.isNull() | x_del | ~x_patch, x)
            .when(acc_del, acc)
            .otherwise(patched)
        )

    init = F.lit(None).cast(elem_type)
    folded = grouped.withColumn("_net", F.aggregate(F.col("_evs"), init, step))

    return folded.select(
        *key_cols,
        *[F.col(f"_net.{c}").alias(c) for c in non_key_payload],
        F.col("_net.ts").alias(ts_col),
        F.when(F.col("_net.op") == "d", F.lit("d")).otherwise(F.lit("u")).alias("_op"),
        F.coalesce(F.col("_net.is_patch"), F.lit(False)).alias("_is_patch"),
    )
