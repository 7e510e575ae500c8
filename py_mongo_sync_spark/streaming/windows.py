"""Event-time windowed aggregation with watermark-based late-data handling.

The CDC apply path tolerates disorder through per-key LWW + tombstones
(stronger than windows for replication). This module is the standard
Spark shape for metric/rollup consumers of the same stream: tumbling
event-time windows whose results finalize once the watermark passes the
window end, with events later than the watermark dropped — bounded state
for an unbounded stream (the reference has no analogue; its progress
counters are processing-time only, progress_logger.py:31-86).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window counts in APPEND mode: a window row is emitted
    exactly once, when the watermark (max event time − ``watermark``)
    passes its end; events arriving later than the watermark are dropped
    by the engine — state is bounded by (windows in flight × keys), not
    by stream length. ``ts_col`` must be a timestamp column."""
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if key_col:
        keys.append(F.col(key_col))
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *([F.col(key_col)] if key_col else []),
        "n_events",
    )
