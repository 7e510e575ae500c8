"""Deterministic synthetic fixtures — transcripts snapshot + oplog events.

Generation is fully distributed (``spark.range`` + column expressions, no
driver-side loops, no wall-clock, no ``rand()``): every value derives from
``xxhash64(seq, salt, seed)``, so the same (seed, sizes) always produce the
same data at any parallelism — required both for tests and for the bench's
10^7-event runs. FIXTURES.md is the contract; the event mix is
~70% i / ~20% u (half ``$set`` patches) / ~8% d / ~1% n / ~1% c
(reference op alphabet: /root/reference/mongosync/mongo/handler.py:143-165).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.schema import FIXTURE_EPOCH, OPLOG_SCHEMA

_WORDS = (
    "spark merge stream batch shuffle bucket oplog optime replay lake "
    "window salt skew commit manifest watermark turn agent tool text"
).split()


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def _word(seq_col, salt: str, seed: int):
    idx = F.pmod(_h(seq_col, F.lit(salt), F.lit(seed)), F.lit(len(_WORDS)))
    return F.element_at(F.array(*[F.lit(w) for w in _WORDS]), idx.cast("int") + 1)


def conv_id_col(n: F.Column) -> F.Column:
    return F.format_string("conv_%06d", n.cast("long"))


def gen_transcripts_snapshot(
    spark: SparkSession,
    n_convs: int,
    turns_per_conv: int,
    seed: int = 42,
    with_tool: bool = False,
    with_score: bool = False,
) -> DataFrame:
    """The source-of-record table (FIXTURES.md §1). ``(conv_id, turn_idx)``
    is the key; ``ts`` is monotone over the global sequence. ``with_tool``/
    ``with_score`` pre-evolve the open-ended columns (a snapshot taken after
    those columns already existed upstream)."""
    n = n_convs * turns_per_conv
    df = spark.range(n)  # id = global_seq
    conv_n = (F.col("id") / turns_per_conv).cast("long")
    turn = F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        F.pmod(turn, F.lit(3)) + 1,
    )
    conv = conv_id_col(conv_n)
    text = F.format_string(
        "turn %d of %s :: %s %s %s",
        turn, conv, _word(F.col("id"), "w0", seed),
        _word(F.col("id"), "w1", seed), _word(F.col("id"), "w2", seed),
    )
    out = df.select(
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        *( [F.when(role == "tool", F.lit("calculator")).alias("tool")] if with_tool else [] ),
        *( [(F.pmod(_h(F.col("id"), F.lit("sc"), F.lit(seed)), F.lit(100)) / 10.0).alias("score")] if with_score else [] ),
        F.timestamp_seconds(F.lit(FIXTURE_EPOCH) + F.col("id")).alias("ts"),
    )
    return out


def gen_oplog_events(
    spark: SparkSession,
    n_convs: int,
    turns_per_conv: int,
    n_events: int,
    seed: int = 42,
    start_optime: int | None = None,
    hot_frac: float = 0.0,
    evolve_after: int | None = None,
    ns_main: str = "chat.transcripts",
    ns_extra: list[tuple[str, int]] | None = None,
    patch_mix: str = "set,unset,inc",
) -> DataFrame:
    """Oplog-style change events ``{ts, op, ns, doc}`` (FIXTURES.md §2).

    - ``ts`` = start_optime + seq, strictly monotone (the global optime;
      reference analogue BSON Timestamp, optime_logger.py:25-28).
    - ``hot_frac`` routes that fraction of events to ``conv_000000`` (skew
      fixture; reference analogue: hash fan-out precedent,
      multi_oplog_replayer.py:69-78).
    - ``evolve_after``: docs carry a ``tool`` field only from that seq on,
      preceded by one ``c`` add_column command (schema-evolution fixture;
      reference analogue: oplog 'c' DDL, mongo/handler.py:156-163).
    - ``ns_extra``: [(ns, percent)] — share of events diverted to other
      namespaces to exercise filter/rename.
    """
    if start_optime is None:
        start_optime = n_convs * turns_per_conv + 1000
    df = spark.range(n_events).withColumnRenamed("id", "seq")
    seq = F.col("seq")
    r = F.pmod(_h(seq, F.lit("op"), F.lit(seed)), F.lit(1000))

    op = (
        F.when(r < 700, F.lit("i"))
        .when(r < 900, F.lit("u"))
        .when(r < 980, F.lit("d"))
        .when(r < 990, F.lit("n"))
        .otherwise(F.lit("c"))
    )
    is_patch = (op == "u") & (F.pmod(_h(seq, F.lit("patch"), F.lit(seed)), F.lit(2)) == 0)

    hot = F.pmod(_h(seq, F.lit("hot"), F.lit(seed)), F.lit(1000)) < int(hot_frac * 1000)
    conv_n = F.when(hot, F.lit(0)).otherwise(
        F.pmod(_h(seq, F.lit("conv"), F.lit(seed)), F.lit(n_convs))
    )
    conv = conv_id_col(conv_n)
    # inserts may address new turn slots (turns_per_conv*2) — upsert creates
    turn = F.pmod(_h(seq, F.lit("turn"), F.lit(seed)), F.lit(turns_per_conv * 2)).cast("int")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        F.pmod(turn, F.lit(3)) + 1,
    )
    text = F.format_string(
        "turn %d of %s :: e%d %s %s",
        turn, conv, seq, _word(seq, "ew0", seed), _word(seq, "ew1", seed),
    )
    has_tool = F.lit(evolve_after is not None) & (seq >= F.lit(evolve_after or 0))
    tool_val = F.when(
        has_tool & (F.pmod(_h(seq, F.lit("tool"), F.lit(seed)), F.lit(3)) == 0),
        F.lit("calculator"),
    )

    row_ts = F.timestamp_seconds(F.lit(FIXTURE_EPOCH) + F.lit(start_optime) + seq)
    full_doc_evolved = F.to_json(F.struct(
        conv.alias("conv_id"), turn.alias("turn_idx"), role.alias("role"),
        text.alias("text"), tool_val.alias("tool"),
    ))
    full_doc_plain = F.to_json(F.struct(
        conv.alias("conv_id"), turn.alias("turn_idx"), role.alias("role"),
        text.alias("text"),
    ))
    full_doc = F.when(has_tool, full_doc_evolved).otherwise(full_doc_plain)
    # patch flavors (FIXTURES.md §2): the Mongo update-operator alphabet the
    # engine expresses exactly — $set (half), $unset role (1/6), $inc score
    # (2/6, exercising numeric-column schema evolution). Reference semantics:
    # $set/$unset translation es/syncer.py:182-216; server-side update replay
    # mongo/handler.py:152.
    patch_kind = F.pmod(_h(seq, F.lit("pk"), F.lit(seed)), F.lit(6))
    set_doc = F.to_json(F.struct(
        conv.alias("conv_id"), turn.alias("turn_idx"),
        F.struct(F.format_string("patched:: %s", text).alias("text")).alias("$set"),
    ))
    unset_doc = F.format_string(
        '{"conv_id": "%s", "turn_idx": %d, "$unset": {"role": ""}}', conv, turn
    )
    inc_doc = F.format_string(
        '{"conv_id": "%s", "turn_idx": %d, "$inc": {"score": %d}}',
        conv, turn, F.pmod(_h(seq, F.lit("inc"), F.lit(seed)), F.lit(9)) - 4,
    )
    if patch_mix == "set":
        # round-1 fixture mix (every patch a $set) — kept selectable so
        # bench regressions can be attributed to workload vs code changes
        patch_doc = set_doc
    else:
        patch_doc = (
            F.when(patch_kind < 3, set_doc)
            .when(patch_kind < 4, unset_doc)
            .otherwise(inc_doc)
        )
    key_doc = F.to_json(F.struct(conv.alias("conv_id"), turn.alias("turn_idx")))
    cmd_doc = F.lit(json.dumps({"cmd": "collMod"}))

    doc = (
        F.when(op == "d", key_doc)
        .when(op == "n", F.lit("{}"))
        .when(op == "c", cmd_doc)
        .when(is_patch, patch_doc)
        .otherwise(full_doc)
    )
    # the evolution fixture announces the new column with one DDL event
    if evolve_after is not None:
        doc = F.when(
            seq == evolve_after, F.lit(json.dumps({"cmd": "add_column", "name": "tool", "type": "string"}))
        ).otherwise(doc)
        op = F.when(seq == F.lit(evolve_after), F.lit("c")).otherwise(op)

    ns = F.lit(ns_main)
    if ns_extra:
        nsr = F.pmod(_h(seq, F.lit("ns"), F.lit(seed)), F.lit(100))
        lo = 0
        for extra_ns, pct in ns_extra:
            ns = F.when((nsr >= lo) & (nsr < lo + pct), F.lit(extra_ns)).otherwise(ns)
            lo += pct

    return df.select(
        (F.lit(start_optime) + seq).alias("ts"),
        seq.alias("seq"),  # BSON Timestamp increment analogue — equal-ts tiebreak
        op.alias("op"),
        ns.alias("ns"),
        doc.alias("doc"),
    )


def write_events_jsonl(events: DataFrame, out_dir: str, n_files: int) -> None:
    """Driver-side chunked JSON-lines writer for TEST-scale streams: files
    named in optime order so the file stream source replays them like an
    oplog tail. (Bench-scale streams use write_events_parquet.)"""
    import os

    os.makedirs(out_dir, exist_ok=True)
    collected = events.orderBy("ts").select("ts").toPandas()["ts"].tolist()
    rows = events.orderBy("ts").toJSON().collect()
    per = max(1, (len(rows) + n_files - 1) // n_files)
    for i in range(0, len(rows), per):
        # name by first optime: later segments appended to the same stream
        # dir never collide (the oplog is globally monotone)
        path = os.path.join(out_dir, f"events-{collected[i]:012d}.json")
        with open(path, "w") as f:
            f.write("\n".join(rows[i : i + per]))
        # Spark's file stream source orders files by modification time; give
        # each segment a strictly increasing mtime so delivery follows the
        # oplog order, like the reference's tail cursor relies on the natural
        # order of oplog.rs (mongo/handler.py:128-130). The engine tolerates
        # disorder via tombstones + the ts guard, but in-order delivery is
        # the source contract.
        mtime = FIXTURE_EPOCH + collected[i]
        os.utime(path, (mtime, mtime))


def write_events_parquet(events: DataFrame, out_dir: str, n_files: int) -> None:
    """Distributed event-file writer for bench scale: range-partitioned by
    optime so each file is a contiguous oplog segment."""
    events.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(out_dir)


# --------------------------------------------------------------------------
# Oracle — sequential pandas replay (the independent truth for tests;
# the content-equality upgrade of /root/reference/check.py:72-146).
# --------------------------------------------------------------------------

def oracle_replay(
    snapshot_pdf: pd.DataFrame,
    events_pdf: pd.DataFrame,
    cfg: SyncConfig | None = None,
    dst_ns: str = "chat.transcripts",
) -> pd.DataFrame:
    """Apply events one by one in ts order over the snapshot, mirroring the
    reference's single-threaded apply loop
    (/root/reference/mongosync/mongo/handler.py:137-167):
    i/u-replace → upsert; u-patch → update-if-present; d → delete;
    n/c → no data effect. Returns the expected final table."""
    cfg = cfg or SyncConfig()
    state: dict = {}
    for rec in snapshot_pdf.to_dict("records"):
        state[(rec["conv_id"], rec["turn_idx"])] = dict(rec)

    # columns observed so far (schema evolution: a column exists from the
    # first event that carries a value for it — tool, score, ...)
    extra_order = ["tool", "score"]
    extras = [c for c in extra_order if c in snapshot_pdf.columns]

    def _note_extra(c: str) -> None:
        if c in extra_order and c not in extras:
            extras.append(c)

    sort_cols = ["ts"] + (["seq"] if "seq" in events_pdf.columns else [])
    for rec in events_pdf.sort_values(sort_cols).to_dict("records"):
        op, ns = rec["op"], rec["ns"]
        if not cfg.valid_oplog(op, ns):
            continue
        ns = cfg.map_ns(ns)
        if ns != dst_ns or op in ("n", "c"):
            continue
        doc = json.loads(rec["doc"]) if rec["doc"] else {}
        patch = doc.pop("$set", None)
        unset = doc.pop("$unset", None)
        inc = doc.pop("$inc", None)
        for k in [k for k in doc if k.startswith("$")]:
            doc.pop(k)  # unsupported operators: apply-without (engine parity)
        key = (doc.get("conv_id"), doc.get("turn_idx"))
        ts_val = pd.Timestamp(FIXTURE_EPOCH + rec["ts"], unit="s")
        if op == "d":
            state.pop(key, None)
        elif op in ("i", "u"):
            if patch is not None or unset is not None or inc is not None:
                if key in state:
                    row = state[key]
                    for k, v in (patch or {}).items():
                        row[k] = v  # $set None ≡ unset on fixed schema
                        if v is not None:
                            _note_extra(k)
                    for k in (unset or {}):
                        row[k] = None
                    for k, v in (inc or {}).items():
                        cur = row.get(k)
                        try:
                            cur = float(cur) if cur is not None else 0.0
                        except (TypeError, ValueError):
                            cur = 0.0
                        row[k] = cur + float(v)
                        _note_extra(k)
                    row["ts"] = ts_val
            else:
                row = {
                    "conv_id": doc.get("conv_id"),
                    "turn_idx": doc.get("turn_idx"),
                    "role": doc.get("role"),
                    "text": doc.get("text"),
                    "ts": ts_val,
                }
                for c in extra_order:
                    if doc.get(c) is not None:
                        _note_extra(c)
                for c in extras:
                    row[c] = doc.get(c)
                state[key] = row
    base_cols = ["conv_id", "turn_idx", "role", "text", *extras, "ts"]
    out = pd.DataFrame(list(state.values()), columns=None if state else base_cols)
    # exactly the evolved schema: stray keys from $set-null on a never-
    # evolved column don't create a column (engine parity), missing late-
    # evolved columns backfill NULL
    out = out.reindex(columns=base_cols)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
