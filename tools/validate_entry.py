"""Local stand-in for the driver's correctness check: run each
__spark_entry__ query on Spark AND its oracle SQL on DuckDB at sf0.01,
compare row count, sorted-column-name schema, and an order-insensitive
value hash. Usage:
PYTHONPATH=/root/repo python tools/validate_entry.py [sf_dir] [only_query ...]

STRICT=1 switches float normalization from %.6g to full-precision repr —
the adversarial mode that models a driver hashing exact binary doubles:
two engines that agree to 6 significant digits but land on NEIGHBORING
doubles (the round-tie class that broke boilerplate_profile in r4) FAIL
here. Queries must pass strict mode to be considered hash-hardened;
the durable fix is integer/decimal output columns, not looser hashing."""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from py_mongo_sync_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
STRICT = os.environ.get("STRICT", "") == "1"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        # Strict: NO integral-float collapse — an int64 column on one
        # engine vs a float64 on the other (e.g. DuckDB sum() → HUGEINT →
        # pandas float64, the r4 boilerplate_profile driver failure) must
        # FAIL here, because a driver hashing dtyped values sees 2 ≠ 2.0.
        if STRICT:
            return repr(v)
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        ",".join(norm_cell(r[c]) for c in cols) for r in pdf.to_dict("records")
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    spark = get_spark("validate", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = dict(entrymod.queries())
    # not driver-submitted (50-row sweep budget) but still oracle-pinned here
    if hasattr(entrymod, "extra_queries"):
        qs.update(entrymod.extra_queries())
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            if len(sdf) == 0 and name != "ngram_jaccard_neardup":
                print(f"  WARNING: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        ok_n = len(sdf) == len(odf)
        ok_s = sorted(sdf.columns) == sorted(odf.columns)
        ok_v = ok_n and ok_s and value_hash(sdf) == value_hash(odf)
        status = "OK   " if (ok_n and ok_s and ok_v) else "FAIL "
        if not (ok_n and ok_s and ok_v):
            failures.append(name)
        print(f"{status} {name}: rows {len(sdf)}/{len(odf)} schema={ok_s} values={ok_v}")
        if not ok_v and ok_n and ok_s and len(sdf) < 2000:
            scols = sorted(sdf.columns)
            a = sdf[scols].apply(lambda r: ",".join(norm_cell(x) for x in r), axis=1)
            b = odf[scols].apply(lambda r: ",".join(norm_cell(x) for x in r), axis=1)
            only_a = sorted(set(a) - set(b))[:3]
            only_b = sorted(set(b) - set(a))[:3]
            for x in only_a:
                print(f"   spark-only: {x[:160]}")
            for x in only_b:
                print(f"   duck-only : {x[:160]}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries OK; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
