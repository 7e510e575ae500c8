"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

Times individual declared queries with the noop sink against a chosen SF,
prints one JSON line per query with all attempts, and can dump
``.explain("formatted")`` plans to files. ``bench.py`` stays the frozen
measurement contract; this exists so each optimization is measured in
isolation without paying the full CDC/scaling blocks.

Usage:
  python bench_extra.py [--sf DIR] [--attempts N] [--explain-dir DIR] q1 q2 ...
  python bench_extra.py --list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("TMPDIR", "/dev/shm")
    tempfile.tempdir = None
os.environ.setdefault("SPARK_DRIVER_MEM", "12g")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    qs.update(entrymod.extra_queries())
    if args.list:
        print("\n".join(qs))
        return

    from py_mongo_sync_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    for name in args.names:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.explain_suffix}.txt"), "w") as f:
                f.write(plan)
        ts = []
        for _ in range(args.attempts):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
        print(json.dumps({"query": name, "sf": args.sf, "attempts": ts, "best": min(ts)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
