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
    """Reduce a microbatch to one net event per key — window/row_number
    form (the production path).

    Per key, in descending ``ts`` order:

    - ``base`` = the newest non-patch event (replace/insert/delete); all
      events older than it are superseded and discarded.
    - if ``base`` is a delete → net = delete (patches newer than a delete
      are UpdateOne-no-ops on a missing doc).
    - else net = base patched by every newer patch, later patches winning —
      which in descending order is exactly ``first_value(col, ignorenulls)``
      over [newer patches..., base].
    - no base in the batch (patches only) → net stays a patch; the MERGE
      resolves or drops it against the target.

    Physical shape: ONE hash shuffle on the full key + ONE in-partition sort
    feeding two collapsed window passes — all whole-stage unsafe-row
    processing, no java-object aggregation state (a ``collect_list`` fold,
    kept below as :func:`fold_net_events_agg`, builds per-key JVM object
    buffers and collapses into GC churn at 10^6+ keys per batch).

    Input: one row per event with key cols, ``ts``, ``op`` (i/u/d),
    ``is_patch`` and payload columns. Output: one row per key with payload,
    ``ts``, ``_op`` ('d' or 'u') and ``_is_patch``.
    """
    non_key_payload = [c for c in payload_cols if c not in key_cols]
    is_patch = F.coalesce(F.col(patch_col), F.lit(False))
    w = W.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    wf = w.rowsBetween(W.currentRow, W.unboundedFollowing)

    ranked = df.select(
        *key_cols, F.col(ts_col), F.col(op_col).alias("_ev_op"),
        is_patch.alias("_ev_patch"), *non_key_payload,
    ).withColumn("_rn", F.row_number().over(w)).withColumn(
        "_base_rn",
        F.min(F.when(~F.col("_ev_patch"), F.col("_rn"))).over(
            w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ),
    )
    # keep the newest non-patch and every patch above it (all rows if no base)
    kept = ranked.where(
        F.col("_base_rn").isNull() | (F.col("_rn") <= F.col("_base_rn"))
    )
    base_is_del = F.col("_base_rn").isNotNull() & (
        F.last(F.col("_ev_op")).over(wf) == "d"
    )
    folded_cols = {
        c: F.first(F.col(c), ignorenulls=True).over(wf) for c in non_key_payload
    }
    base_ts = F.last(F.col(ts_col)).over(wf)  # ts of the base (lowest kept row)
    out = (
        kept.select(
            *key_cols,
            *[
                F.when(base_is_del, F.lit(None).cast(dict(df.dtypes).get(c, "string")))
                .otherwise(folded_cols[c]).alias(c)
                for c in non_key_payload
            ],
            F.when(base_is_del, base_ts).otherwise(F.col(ts_col)).alias(ts_col),
            F.when(base_is_del, F.lit("d")).otherwise(F.lit("u")).alias("_op"),
            (F.col("_base_rn").isNull()).alias("_is_patch"),
            F.col("_rn"),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return out


def fold_net_events_agg(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    patch_col: str = "is_patch",
) -> DataFrame:
    """collect_list/aggregate form of the fold — semantically identical to
    :func:`fold_net_events` (property-tested against it); kept as the
    reference implementation because the step function mirrors the
    reference's sequential apply loop most literally."""
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
