"""Streaming exact deduplication with BOUNDED state.

The streaming member of the dedup family (exact / MinHash / SimHash /
cosine / decontamination): drop repeated keys as the stream flows, instead
of a periodic batch distinct. At-least-once upstreams (Kafka redeliveries,
oplog replays after a resume — the reference replays from the last optime
and relies on idempotent upserts, mongo/syncer.py:277-284) make duplicate
events a NORMAL condition, not an error.

Spark-first: ``dropDuplicatesWithinWatermark`` — one shuffle on the key
into the state store, and the key's dedup state is DROPPED once the
event-time watermark passes it. Plain streaming ``dropDuplicates`` keeps
every key ever seen (state grows with the corpus — a scale killer at
10^10 events); the watermark variant's state tracks only the delay
window, the same bounded-state discipline as the engine's windowed
aggregations. Duplicates separated by longer than the delay are the
documented trade — at-least-once redelivery happens within seconds, not
days, so size the delay to the redelivery horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """events (streaming, ``watermark_col`` must be a timestamp) → the
    stream with repeated ``key_cols`` occurrences dropped; dedup state per
    key is freed once the watermark moves ``delay`` past its event time."""
    return events.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
