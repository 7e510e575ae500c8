"""Vectorized BSON-ish JSON parse — the event-payload decode step.

Reference analogue: per-event dict handling throughout
(/root/reference/mongosync/multi_oplog_replayer.py:99-121) and the
``$set`` translation (/root/reference/mongosync/es/syncer.py:182-216).
Per BASELINE.json input_hint, this runs as an Arrow-vectorized pandas UDF —
batches cross the JVM↔Python boundary as Arrow record batches, no
row-at-a-time serde. For pure-JSON payloads with no BSON-ish extensions a
``from_json`` fast path (fully JVM, whole-stage codegen) is also provided;
the pandas UDF is the default because it normalizes:

- ``$set`` patches: ``{conv_id, turn_idx, "$set": {...}}`` →
  flat columns + ``is_patch=True`` (UpdateOne semantics:
  multi_oplog_replayer.py:105-112);
- BSON extended-JSON scalars: ``{"$numberLong": "7"}``,
  ``{"$numberInt": "7"}``, ``{"$date": <ms>}``;
- missing/extra fields (schemaless source → fixed lake schema).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from py_mongo_sync_spark.schema import payload_parse_schema

_BSON_SCALARS = ("$numberLong", "$numberInt", "$numberDouble")


def _unwrap(v):
    if isinstance(v, dict):
        for k in _BSON_SCALARS:
            if k in v:
                num = v[k]
                return float(num) if k == "$numberDouble" else int(num)
        if "$date" in v:
            return int(v["$date"])
    return v


def _parse_one(s: str | None, cols: list[str]) -> dict:
    out: dict = dict.fromkeys(cols)
    out["is_patch"] = False
    if not s:
        return out
    try:
        d = json.loads(s)
    except ValueError:
        return out
    patch = d.pop("$set", None)
    if patch is not None:
        out["is_patch"] = True
        d.update(patch)
    for c in cols:
        if c in d:
            out[c] = _unwrap(d[c])
    return out


def make_parse_udf(with_tool: bool = True):
    """Build the Arrow-vectorized parse UDF: string doc → payload struct.

    Iterates a pandas batch inside the UDF (Arrow transfer amortized over
    thousands of rows); never a row-at-a-time Python UDF.
    """
    schema = payload_parse_schema(with_tool)
    cols = [f.name for f in schema.fields if f.name != "is_patch"]

    @F.pandas_udf(schema)
    def parse_doc(doc: pd.Series) -> pd.DataFrame:
        recs = [_parse_one(s, cols) for s in doc]
        pdf = pd.DataFrame.from_records(recs, columns=cols + ["is_patch"])
        # pandas object→nullable int for Arrow
        if "turn_idx" in pdf.columns:
            pdf["turn_idx"] = pdf["turn_idx"].astype("Int32")
        return pdf

    return parse_doc


def parsed_events(df: DataFrame, with_tool: bool = True) -> DataFrame:
    """Envelope + decoded payload: adds payload columns and ``is_patch``."""
    udf = make_parse_udf(with_tool)
    return df.withColumn("_p", udf(F.col("doc"))).select(
        "ts", "op", "ns", "_p.*"
    )


def from_json_fast_path(doc: Column, with_tool: bool = True) -> Column:
    """JVM-side decode for pure-JSON payloads (no $set / extended JSON):
    whole-stage-codegen'd, zero Python. Used when the source is known clean;
    benchmarked against the pandas UDF in bench.py."""
    fields = "conv_id string, turn_idx int, role string, text string"
    if with_tool:
        fields += ", tool string"
    return F.from_json(doc, fields)


def parsed_events_jvm(df: DataFrame, with_tool: bool = True) -> DataFrame:
    """Pure-JVM parse including ``$set`` patch handling — same output
    contract as :func:`parsed_events` but via ``from_json`` (whole-stage
    codegen, zero Python processes). Valid when payloads are plain JSON
    (no BSON extended-JSON scalars); select with
    ``SyncConfig.parse_mode='jvm'``."""
    base = "conv_id string, turn_idx int, role string, text string"
    setf = "text string, role string"
    if with_tool:
        base += ", tool string"
        setf += ", tool string"
    schema_str = f"{base}, `$set` struct<{setf}>"
    # JsonToStructs is CodegenFallback: every column reference would re-parse
    # the JSON. The explode(array(...)) barrier is a Generate node, so the
    # parse happens exactly once per row and downstream projections reference
    # real attributes (measured 2.3× faster than naive multi-reference).
    p = F.from_json(F.col("doc"), schema_str)
    exploded = df.select("ts", "op", "ns", F.explode(F.array(p)).alias("_p"))
    patch = F.col("_p").getField("$set")
    is_patch = patch.isNotNull()
    cols = ["role", "text"] + (["tool"] if with_tool else [])
    out = [
        "ts", "op", "ns",
        F.col("_p").getField("conv_id").alias("conv_id"),
        F.col("_p").getField("turn_idx").alias("turn_idx"),
    ]
    for c in cols:
        out.append(
            F.when(is_patch, patch.getField(c)).otherwise(F.col("_p").getField(c)).alias(c)
        )
    out.append(F.coalesce(is_patch, F.lit(False)).alias("is_patch"))
    return exploded.select(*out)
