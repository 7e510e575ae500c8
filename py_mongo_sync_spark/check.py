"""Consistency checker — the content-equality upgrade of the reference's
``check.py`` (/root/reference/check.py:72-146, which compares per-collection
counts and index sets). Per BASELINE.json: after full replay the
destination's per-turn ``text`` must equal the expected state under stable
``(conv_id, turn_idx)`` ordering. We check count, schema, key symmetric
difference (full-outer anti semantics), and per-column value equality —
all distributed (no driver-side row loops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_consistency(
    expected: DataFrame,
    actual: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> dict:
    report: dict = {"ok": True}
    report["n_expected"] = expected.count()
    report["n_actual"] = actual.count()
    if report["n_expected"] != report["n_actual"]:
        report["ok"] = False

    e = expected.alias("e")
    a = actual.alias("a")
    cond = [e[c].eqNullSafe(a[c]) for c in key_cols]
    joined = e.join(a, cond, "full_outer")

    e_key = F.col(f"e.{key_cols[0]}")
    a_key = F.col(f"a.{key_cols[0]}")
    missing = joined.where(a_key.isNull()).count()
    extra = joined.where(e_key.isNull()).count()
    diff_cols = {}
    if compare_cols:
        both = joined.where(e_key.isNotNull() & a_key.isNotNull())
        agg = both.agg(
            *[
                F.sum((~F.col(f"e.{c}").eqNullSafe(F.col(f"a.{c}"))).cast("long")).alias(c)
                for c in compare_cols
            ]
        ).first()
        for c in compare_cols:
            diff_cols[c] = int(agg[c] or 0)
    report["missing_keys"] = missing
    report["extra_keys"] = extra
    report["value_mismatches"] = diff_cols
    if missing or extra or any(diff_cols.values()):
        report["ok"] = False
    return report


def main(argv: list[str] | None = None) -> int:
    """Standalone verdict tool — the reference ships ``check.py`` printing
    per-collection results and a final SUCCESS/FAILED
    (/root/reference/check.py:138-146). Usage::

        python -m py_mongo_sync_spark.check EXPECTED ACTUAL \
            [--keys conv_id,turn_idx] [--cols role,text,ts]

    EXPECTED is a parquet path; ACTUAL is a LakeTable directory (detected by
    its ``_LATEST`` pointer) or a parquet path. Exit code 0 on SUCCESS.
    """
    import argparse
    import json
    import os

    ap = argparse.ArgumentParser(prog="py_mongo_sync_spark.check")
    ap.add_argument("expected")
    ap.add_argument("actual")
    ap.add_argument("--keys", default="conv_id,turn_idx")
    ap.add_argument("--cols", default="role,text,ts")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from py_mongo_sync_spark.plans.lake import LakeTable
    from py_mongo_sync_spark.session import get_spark

    spark = get_spark("check", cores=args.cores)

    def load(path: str) -> DataFrame:
        if os.path.exists(os.path.join(path, "_LATEST")):
            return LakeTable(spark, path).read()
        return spark.read.parquet(path)

    rep = check_consistency(
        load(args.expected), load(args.actual),
        args.keys.split(","), [c for c in args.cols.split(",") if c],
    )
    print(json.dumps(rep))
    print("SUCCESS" if rep["ok"] else "FAILED")
    return 0 if rep["ok"] else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
