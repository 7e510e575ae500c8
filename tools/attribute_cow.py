"""Attribute the r1→r2 CoW replay delta: workload change vs code change.

BENCH_r01.json recorded cdc_replay_stream = 38.95 s (102.7k ev/s) on the
round-1 fixture (every patch a ``$set``); BENCH_r02.json recorded 43.35 s
(92.3k ev/s) on the round-2 fixture (patches ⅓ $set / ⅙ $unset / ⅓ $inc,
which the merge must express as three-valued per-column logic + residual
adds). This runs the CURRENT code on BOTH fixture mixes, same scale and
settings as bench.py's replay, isolating the workload effect.

Usage: PYTHONPATH=/root/repo python tools/attribute_cow.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuse _spark/_warmup/run_cdc_replay/constants)


def materialize(mix: str) -> str:
    from py_mongo_sync_spark.sources.generate import (
        gen_oplog_events,
        gen_transcripts_snapshot,
    )

    out = tempfile.mkdtemp(prefix=f"attr_{mix.replace(',', '_')}_")
    spark = bench._spark(bench.CPUS)
    try:
        gen_transcripts_snapshot(
            spark, bench.N_CONVS, bench.TURNS, with_tool=True, with_score=True
        ).write.mode("overwrite").parquet(os.path.join(out, "snapshot"))
        gen_oplog_events(
            spark, bench.N_CONVS, bench.TURNS, bench.N_EVENTS,
            hot_frac=0.05, patch_mix=mix,
        ).repartitionByRange(bench.N_SEGMENTS, "ts").write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "events"))
        bench._stamp_segment_mtimes(os.path.join(out, "events"))
    finally:
        spark.stop()
    return out


def main() -> None:
    res = {}
    for mix, label in [("set", "r1_mix_set_only"), ("set,unset,inc", "r2_mix_full")]:
        data = materialize(mix)
        r = bench.run_cdc_replay(bench.CPUS, data, write_mode="cow")
        res[label] = r
        print(json.dumps({label: r}), flush=True)
        import shutil

        shutil.rmtree(data, ignore_errors=True)
    print(json.dumps({"attribution": res}))


if __name__ == "__main__":
    main()
