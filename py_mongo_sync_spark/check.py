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
