"""Sustained dedup-on-ingest evidence (VERDICT r5 item 8).

bench_sustained.py shows the CDC MERGE's per-batch cost stays flat as the
table absorbs a long stream; this tool shows the same for the OTHER
streaming pipeline — NeardupIngestPipeline — whose state (the kept corpus
+ the banded signature index) grows with the DEDUPED corpus, not the feed.
Per batch it records wall seconds, decision counts and the physical index
size from the manifest (driver-side file sizes, no extra Spark job), and
reports:

    tail_head_ratio = mean wall over the last quarter of batches
                      / mean wall over the first quarter (batch 0 excluded
                        — it pays codegen/JVM warmup for the run)

Flat (≈1.0) means the per-batch probe really is O(batch × touched index
buckets): the index grows ~16x over the run while batch cost does not.

Each batch is an alphabet-rotated copy of the sf0.1 documents corpus
(internally dup-dense like the fixture, disjoint from other batches in
shingle space) PLUS a 10% slice of the PREVIOUS batch's content under
fresh ids — so every batch exercises both within-batch dedup and true
cross-batch index hits.

Usage:  PYTHONPATH=/root/repo python tools/bench_sustained_ingest.py [out.json]
Env:    SPARK_BENCH_INGEST_BATCHES (default 12), SPARK_GRAFT_CPUS,
        SPARK_GRAFT_SF_DIR (documents source, default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (env/TMPDIR setup + _spark)

from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = int(os.environ.get("SPARK_BENCH_INGEST_BATCHES", "12"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rot(docs, r: int, id_base: int):
    rot = ALPHA[r % 26:] + ALPHA[: r % 26]
    return docs.select(
        (F.col("doc_id") + id_base).alias("doc_id"),
        F.translate("text", ALPHA, rot).alias("text"),
    )


def _index_bytes(table) -> int:
    m = table.manifest()
    return sum(
        os.path.getsize(f)
        for files in m["buckets"].values() for f in files if os.path.exists(f)
    )


def main() -> None:
    from py_mongo_sync_spark.streaming.ingest import NeardupIngestPipeline

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sustained_ingest_r06.json"
    spark = bench._spark(bench.CPUS)
    work = tempfile.mkdtemp(prefix="ingest_soak_")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    pipe = NeardupIngestPipeline(
        spark, os.path.join(work, "docs"), os.path.join(work, "bands"),
        n_buckets=16,
    )
    pipe.initial_load(spark.createDataFrame([], "doc_id long, text string"))

    series = []
    for b in range(N_BATCHES):
        batch = _rot(docs, b, b * 1_000_000)
        if b > 0:
            # 10% of the previous batch's content under fresh ids — true
            # cross-batch duplicates the index must catch
            dup_slice = _rot(
                docs.where(F.col("doc_id") % 10 == 0), b - 1,
                b * 1_000_000 + 500_000,
            )
            batch = batch.unionByName(dup_slice)
        t0 = time.monotonic()
        res = pipe.apply_batch(batch, b)
        wall = round(time.monotonic() - t0, 3)
        series.append({
            "batch_id": b, "wall_sec": wall,
            "n_new": res["n_new"], "n_dup": res["n_dup"],
            "n_novel": res["n_novel"],
            "index_bytes": _index_bytes(pipe.bands_table),
            "corpus_bytes": _index_bytes(pipe.docs_table),
        })
        print(json.dumps(series[-1]), file=sys.stderr, flush=True)

    q = max(1, (N_BATCHES - 1) // 4)
    head = [s["wall_sec"] for s in series[1:1 + q]]
    tail = [s["wall_sec"] for s in series[-q:]]
    result = {
        "n_batches": N_BATCHES,
        "series": series,
        "tail_head_ratio": round((sum(tail) / len(tail)) / (sum(head) / len(head)), 3),
        "index_growth_x": round(
            series[-1]["index_bytes"] / max(1, series[0]["index_bytes"]), 1
        ),
        "cross_batch_dup_rate_tail": round(
            series[-1]["n_dup"] / max(1, series[-1]["n_new"]), 3
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "series"}))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
