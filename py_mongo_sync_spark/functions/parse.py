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
    out["unset_cols"] = None
    out["inc_map"] = None
    if not s:
        return out
    try:
        d = json.loads(s)
    except ValueError:
        return out
    patch = d.pop("$set", None)
    unset = d.pop("$unset", None)
    inc = d.pop("$inc", None)
    # any other $-operator ($push/$rename/...) is ignored here and counted
    # into batch telemetry by the pipeline's probe (reference posture: the
    # ES syncer translates only $set/$unset, es/syncer.py:182-216; unknown
    # DDL is logged-and-skipped, mongo/handler.py:156-163)
    for k in [k for k in d if k.startswith("$")]:
        d.pop(k)
    if patch is not None or unset is not None or inc is not None:
        out["is_patch"] = True
        unset_cols: set = set()
        if patch:
            for k, v in patch.items():
                if v is None:
                    unset_cols.add(k)  # $set to null ≡ $unset on fixed schema
                else:
                    d[k] = v
        if unset:
            unset_cols.update(unset.keys())
        out["unset_cols"] = sorted(unset_cols)
        if inc:
            out["inc_map"] = {
                k: float(_unwrap(v))
                for k, v in inc.items()
                if isinstance(_unwrap(v), (int, float))
            }
    for c in cols:
        if c in d:
            out[c] = _unwrap(d[c])
    return out


try:  # C JSON decoder (~5× json.loads on short docs); stdlib fallback
    import orjson as _fastjson
except ImportError:  # pragma: no cover - orjson ships in this env
    _fastjson = None


def make_parse_udf(with_tool: bool = True):
    """Build the Arrow-vectorized parse UDF: string doc → payload struct.

    Iterates a pandas batch inside the UDF (Arrow transfer amortized over
    thousands of rows); never a row-at-a-time Python UDF.

    Two tiers per row (guide §4.2 — do the heavy lifting in native code):
    docs without a ``"$`` byte (no update operators, no BSON extended-JSON
    scalars — the overwhelming majority of a real oplog) decode with the C
    JSON parser straight into per-column lists, ~5× cheaper than the
    general path; any doc containing ``"$`` takes the exact
    :func:`_parse_one` path, so $set/$unset/$inc and extended-JSON
    semantics are bit-identical (a false positive — a doc whose PAYLOAD
    text contains ``"$`` — merely pays the slow path). Output assembles
    columnar (dict of lists), never via per-row dict records.
    """
    schema = payload_parse_schema(with_tool)
    meta = ("is_patch", "unset_cols", "inc_map")
    cols = [f.name for f in schema.fields if f.name not in meta]

    @F.pandas_udf(schema)
    def parse_doc(doc: pd.Series) -> pd.DataFrame:
        loads = _fastjson.loads if _fastjson is not None else json.loads
        n = len(doc)
        data: dict = {c: [None] * n for c in cols}
        patches = [False] * n
        unsets = [None] * n
        incs = [None] * n
        for i, s in enumerate(doc):
            if not s:
                continue
            if '"$' not in s:
                try:
                    d = loads(s)
                except ValueError:
                    continue
                if type(d) is dict:
                    for c in cols:
                        v = d.get(c)
                        if v is not None:
                            data[c][i] = v
                    continue
            out = _parse_one(s, cols)
            for c in cols:
                data[c][i] = out[c]
            patches[i] = out["is_patch"]
            unsets[i] = out["unset_cols"]
            incs[i] = out["inc_map"]
        data["is_patch"] = patches
        data["unset_cols"] = unsets
        data["inc_map"] = incs
        pdf = pd.DataFrame(data, columns=cols + list(meta))
        # pandas object→typed for Arrow
        if "turn_idx" in pdf.columns:
            pdf["turn_idx"] = pdf["turn_idx"].astype("Int32")
        if "score" in pdf.columns:
            pdf["score"] = pdf["score"].astype("float64")
        return pdf

    return parse_doc


def parsed_events(df: DataFrame, with_tool: bool = True) -> DataFrame:
    """Envelope + decoded payload: adds payload columns, ``is_patch``,
    ``unset_cols`` and ``inc_map``. The optional envelope ``seq`` column
    (oplog increment, the equal-ts tiebreak) passes through."""
    udf = make_parse_udf(with_tool)
    extra = ["seq"] if "seq" in df.columns else []
    return df.withColumn("_p", udf(F.col("doc"))).select(
        "ts", *extra, "op", "ns", "_p.*"
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
    """Pure-JVM parse including ``$set``/``$unset``/``$inc`` handling — same
    output contract as :func:`parsed_events` but via ``from_json``
    (whole-stage codegen, zero Python processes). Valid when payloads are
    plain JSON (no BSON extended-JSON scalars). Known delta vs the pandas
    path: ``$set`` to JSON null is indistinguishable from field-absent in a
    struct decode, so set-to-null flows as no-op here (use parse_mode=
    'pandas' for sources that emit it). Select with
    ``SyncConfig.parse_mode='jvm'``."""
    base = "conv_id string, turn_idx int, role string, text string"
    setf = "text string, role string"
    if with_tool:
        base += ", tool string"
        setf += ", tool string"
    base += ", score double"
    setf += ", score double"
    schema_str = (
        f"{base}, `$set` struct<{setf}>, "
        "`$unset` map<string,string>, `$inc` map<string,double>"
    )
    # JsonToStructs is CodegenFallback: every column reference would re-parse
    # the JSON. The explode(array(...)) barrier is a Generate node, so the
    # parse happens exactly once per row and downstream projections reference
    # real attributes (measured 2.3× faster than naive multi-reference).
    extra = ["seq"] if "seq" in df.columns else []
    p = F.from_json(F.col("doc"), schema_str)
    exploded = df.select("ts", *extra, "op", "ns", F.explode(F.array(p)).alias("_p"))
    patch = F.col("_p").getField("$set")
    unset = F.col("_p").getField("$unset")
    inc = F.col("_p").getField("$inc")
    is_patch = patch.isNotNull() | unset.isNotNull() | inc.isNotNull()
    cols = ["role", "text"] + (["tool"] if with_tool else []) + ["score"]
    out = [
        "ts", *extra, "op", "ns",
        F.col("_p").getField("conv_id").alias("conv_id"),
        F.col("_p").getField("turn_idx").alias("turn_idx"),
    ]
    for c in cols:
        out.append(
            F.when(is_patch, patch.getField(c)).otherwise(F.col("_p").getField(c)).alias(c)
        )
    out.append(F.coalesce(is_patch, F.lit(False)).alias("is_patch"))
    out.append(
        F.when(is_patch, F.coalesce(F.map_keys(unset), F.array().cast("array<string>")))
        .alias("unset_cols")
    )
    out.append(F.when(is_patch, inc).alias("inc_map"))
    return exploded.select(*out)
