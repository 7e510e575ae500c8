"""Streaming exact dedup: duplicates arriving in LATER microbatches (the
at-least-once redelivery case) are dropped while state stays bounded by
the watermark delay."""

from __future__ import annotations

import os
import uuid


def test_cross_batch_duplicates_dropped(spark, tmp_path):
    import pandas as pd

    from py_mongo_sync_spark.streaming.dedup import dedup_stream

    src = tmp_path / "ev"
    os.makedirs(src)
    base = 1_700_000_000

    def write(fn, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"] + base, unit="s").astype("datetime64[us]")
        p = str(src / fn)
        pdf.to_parquet(p)
        os.utime(p, (mtime, mtime))

    # batch 1: events 1-3; batch 2 (later file): event 2 REDELIVERED + 4
    write("a.parquet", [(1, 10, 100), (2, 10, 101), (3, 11, 102)], base)
    write("b.parquet", [(2, 10, 101), (4, 11, 103)], base + 1)

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    name = f"dd_{uuid.uuid4().hex[:10]}"
    q = (
        dedup_stream(stream, ["event_id"], delay="1 hour")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(r["event_id"] for r in spark.table(name).collect())
    assert got == [1, 2, 3, 4]  # the redelivered 2 appears exactly once
