"""Scale-evidence run for the dedup family (VERDICT r4 item 7).

The O-claims — touched-bucket index probe, capped candidate pairs,
candidate-bounded verify — predict NEAR-LINEAR growth in corpus size.
This script evidences it with a measured 10× point: the sf0.1 documents
table (5,000 docs) against a deterministic 10× corpus (50,000 docs) built
as 10 letter-rotated shards of sf0.1. A per-shard `translate` through a
rotated alphabet keeps every shard's INTERNAL near-dup structure exactly
sf0.1's while making shards mutually disjoint in shingle space, so
near-dup pairs, band-bucket occupancy, and verify volume all scale by
exactly 10 — the honest setup for a scaling exponent (a corpus of 10
mutually-near-dup copies would instead inflate the pair space 100×, and
a fully-random corpus would deflate it to 0).

Runs the two driver queries unmodified (each reads <dir>/documents.parquet):
  minhash_neardup  — banding + candidate generation, the quadratic risk
  neardup_ingest   — batch-vs-corpus incremental dedup decisions

Writes BENCH_scale_r05.json: per-query wall time at 1× and 10×, the
scaling exponent log10(T10/T1) (1.0 = linear; <1 = sublinear amortized
overheads), and corpus row counts.

Usage: PYTHONPATH=/root/repo python tools/bench_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from py_mongo_sync_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/bench_scale"
ALPHA = "abcdefghijklmnopqrstuvwxyz"
# r6: extended with the round-5 additions whose linearity claims needed a
# measured point (VERDICT r5 item 7)
QUERIES = ["minhash_neardup", "neardup_ingest",
           "rare_shingle_containment", "boilerplate_removal"]
ATTEMPTS = 2


def build_corpora(spark):
    src = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    shutil.rmtree(WORK, ignore_errors=True)
    d1 = f"{WORK}/x1"
    d10 = f"{WORK}/x10"
    src.write.parquet(f"{d1}/documents.parquet")
    shards = []
    for r in range(10):
        rot = ALPHA[r:] + ALPHA[:r]
        shards.append(
            src.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.translate("text", ALPHA, rot).alias("text"),
            )
        )
    big = shards[0]
    for s in shards[1:]:
        big = big.unionByName(s)
    big.repartition(32).write.parquet(f"{d10}/documents.parquet")
    return d1, d10


def time_query(spark, qs, name, sf_dir):
    best = None
    for _ in range(ATTEMPTS):
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t = time.monotonic() - t0
        best = t if best is None else min(best, t)
    return round(best, 3)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_scale_r06.json"
    spark = get_spark("bench-scale")
    try:
        d1, d10 = build_corpora(spark)
        qs = dict(entrymod.queries())
        qs.update(entrymod.extra_queries())
        result = {"sf_base": SF_DIR, "factor": 10, "queries": {}}
        for name in QUERIES:
            t1 = time_query(spark, qs, name, d1)
            t10 = time_query(spark, qs, name, d10)
            import math

            result["queries"][name] = {
                "t_1x_sec": t1,
                "t_10x_sec": t10,
                "ratio": round(t10 / t1, 3),
                "scaling_exponent": round(math.log10(t10 / t1), 3),
            }
            print(name, result["queries"][name], flush=True)
        n1 = spark.read.parquet(f"{d1}/documents.parquet").count()
        n10 = spark.read.parquet(f"{d10}/documents.parquet").count()
        result["rows_1x"], result["rows_10x"] = n1, n10
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
    finally:
        spark.stop()
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
