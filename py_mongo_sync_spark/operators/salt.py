"""Hot-key salting — bound shuffle skew from viral conversations.

Reference analogue: one namespace's ops are fanned across ⌈n/40⌉ sub-vectors
by murmur3(_id) mod n so a hot collection doesn't serialize
(/root/reference/mongosync/multi_oplog_replayer.py:61-78). In Spark the
equivalent hazard is a shuffle partition that receives one giant key group.

Two layers of defense, both used by the pipeline:

1. The dedup/fold groups by the FULL key ``(conv_id, turn_idx)`` — a hot
   ``conv_id`` already spreads over its turns.
2. For any stage keyed on ``conv_id`` alone (or for a single pathological
   turn receiving a flood of updates), :func:`salted_repartition` appends a
   deterministic salt, runs the heavy per-key work per (key, salt), and the
   final fold/MERGE re-combines. AQE skew-join splitting
   (``spark.sql.adaptive.skewJoin.enabled``) backstops the MERGE join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, salt_from: list[str], n_salt: int) -> DataFrame:
    """Deterministic salt derived from finer-grained columns (never random —
    replays must land identically)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salt)).cast("int")
    )


def salted_repartition(
    df: DataFrame, key_cols: list[str], salt_from: list[str], n_salt: int, n_partitions: int
) -> DataFrame:
    """Repartition on (key, salt) so one hot key spans ``n_salt`` partitions.
    Callers doing per-key aggregation must do a partial agg per (key, salt)
    then a final agg per key — classic two-phase combine."""
    return with_salt(df, salt_from, n_salt).repartition(
        n_partitions, *[F.col(c) for c in key_cols], F.col(SALT_COL)
    )
