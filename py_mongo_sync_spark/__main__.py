"""CLI entry point — the Spark re-expression of the reference's
``python sync.py -f conf.toml [--start-optime N]``
(/root/reference/sync.py:14-37, command_options.py:13-63):

    python -m py_mongo_sync_spark -f conf.toml
    python -m py_mongo_sync_spark -f conf.toml --start-optime 12345
    python -m py_mongo_sync_spark -f conf.toml --resume
    python -m py_mongo_sync_spark -f conf.toml --follow   # continuous tail

Without flags: full sync (snapshot load if [src] snapshot_path is set and
the destination doesn't exist, then drain the event stream availableNow).
``--start-optime`` replays from an explicit optime (reference
command_options.py:46-54); ``--resume`` reads the checkpoint table's high
watermark instead (reference --optime-logfile, command_options.py:55-59);
``--follow`` keeps tailing like the reference's infinite loop.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="py_mongo_sync_spark")
    ap.add_argument("-f", "--config", required=True, help="TOML config file")
    ap.add_argument("--start-optime", type=int, default=None,
                    help="replay change events from this optime (inclusive)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the checkpoint table's high watermark")
    ap.add_argument("--follow", action="store_true",
                    help="keep tailing (continuous microbatches) instead of "
                         "draining availableNow and exiting")
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] cores (default: all)")
    ap.add_argument("--spark-checkpoint", default=None,
                    help="Structured Streaming checkpointLocation "
                         "(default: <dst.checkpoint_path>/_spark)")
    ap.add_argument("--rebucket", type=int, default=None, metavar="N",
                    help="admin: rewrite the destination table into N hash "
                         "buckets (bucket-count evolution for grown tables) "
                         "and exit — no sync is performed")
    ap.add_argument("--vacuum-tombstones", type=int, default=None,
                    metavar="OPTIME",
                    help="admin: physically drop tombstones older than this "
                         "optime (a safe horizon past stream retention) and "
                         "exit")
    ap.add_argument("--stats", action="store_true",
                    help="print table-health JSON (bucket sizes, skew, "
                         "pending deltas, rebucket advisory) and exit")
    ap.add_argument("--expire-versions", type=int, default=None, metavar="K",
                    help="admin: delete data files unreferenced by the "
                         "newest K table versions and exit")
    ap.add_argument("--multi", action="store_true",
                    help="catalog-driven multi-table sync: one destination "
                         "table per namespace from [[sync.dbs]] (wildcard "
                         "dbs are discovered from the event stream), like "
                         "the reference syncing every collection of the "
                         "replica set (common_syncer.py:120-135)")
    return ap


def _catalog_namespaces(spark, cfg, extras) -> list[str]:
    """The destination-namespace catalog for --multi: explicit TOML colls,
    plus stream-observed namespaces for wildcard (db.*) entries — the
    Spark analogue of the reference's _collect_colls server scan
    (common_syncer.py:120-135). Discovery is ONE column-pruned distinct
    over the ns column; its result is bounded by the namespace count."""
    from py_mongo_sync_spark.functions.namespace import valid_ns_values
    from py_mongo_sync_spark.schema import OPLOG_SCHEMA

    src_ns = set(extras["namespaces"])
    if (extras["has_wildcard_dbs"] or not src_ns) and extras["events_path"]:
        reader = spark.read.schema(OPLOG_SCHEMA)
        df = (reader.parquet(extras["events_path"])
              if extras["events_format"] == "parquet"
              else reader.json(extras["events_path"]))
        observed = [r["ns"] for r in df.select("ns").distinct().collect()
                    if r["ns"]]
        src_ns |= set(valid_ns_values(cfg, observed))
    return sorted({cfg.map_ns(ns) for ns in src_ns})


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from py_mongo_sync_spark.config_file import load_config
    from py_mongo_sync_spark.session import get_spark
    from py_mongo_sync_spark.sources.oplog import read_oplog_stream
    from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

    cfg, extras = load_config(args.config)
    if args.start_optime is not None and args.resume:
        print("error: --start-optime and --resume are exclusive", file=sys.stderr)
        return 2

    spark = get_spark("py_mongo_sync_spark", cores=args.cores)
    admin = (args.rebucket is not None or args.vacuum_tombstones is not None
             or args.expire_versions is not None or args.stats)
    if admin:
        from py_mongo_sync_spark.plans.lake import LakeTable
        from py_mongo_sync_spark.schema import FIXTURE_EPOCH

        table = LakeTable(spark, cfg.dst_path)
        if not table.exists():
            print(f"error: no table at {cfg.dst_path}", file=sys.stderr)
            return 2
        if args.rebucket is not None:
            res = table.rebucket(args.rebucket)
            print(json.dumps({"stage": "REBUCKET", **res}))
        if args.vacuum_tombstones is not None:
            import datetime as _dt

            horizon = _dt.datetime.fromtimestamp(
                FIXTURE_EPOCH + args.vacuum_tombstones, _dt.timezone.utc
            )
            res = table.vacuum_tombstones(horizon)
            print(json.dumps({"stage": "VACUUM_TOMBSTONES", **res}))
        if args.stats:
            print(json.dumps({"stage": "STATS", **table.bucket_stats()}))
        if args.expire_versions is not None:
            removed = table.expire_versions(args.expire_versions)
            print(json.dumps({"stage": "EXPIRE_VERSIONS",
                              "removed_files": removed}))
        return 0
    if args.multi:
        return _run_multi(spark, cfg, extras, args)
    pipe = CdcPipeline(spark, cfg, dst_ns=extras["dst_ns"])

    # Phase A: initial sync (reference common_syncer.py:103-118) — only when
    # the destination doesn't exist yet and a snapshot source is configured
    if not pipe.table.exists():
        if extras["snapshot_path"]:
            snap = spark.read.parquet(extras["snapshot_path"])
            pipe.initial_sync(snap)
            print(json.dumps({"stage": "INITIAL_SYNC", "rows": snap.count()}))
        else:
            from py_mongo_sync_spark.schema import TRANSCRIPT_SCHEMA_V0

            pipe.initial_sync(spark.createDataFrame([], TRANSCRIPT_SCHEMA_V0))
            print(json.dumps({"stage": "INITIAL_SYNC", "rows": 0}))

    start_optime = args.start_optime
    if args.resume:
        wm = pipe.cplog.high_watermark()
        start_optime = None if wm is None else wm + 1
        print(json.dumps({"stage": "RESUME", "start_optime": start_optime}))

    if not extras["events_path"]:
        print(json.dumps({"stage": "DONE", "note": "no [src] events_path"}))
        return 0

    stream = read_oplog_stream(
        spark, extras["events_path"],
        start_optime=start_optime if start_optime is not None
        else extras.get("start_optime"),
        fmt=extras["events_format"],
    )
    spark_cp = args.spark_checkpoint or (cfg.checkpoint_path + "/_spark")
    if args.follow:
        # continuous tail: surface per-batch progress + the reference's
        # delay gauge (common_syncer.py:246-260) as one JSON line per batch
        pipe.on_batch_stats = lambda s: print(json.dumps({
            "stage": "BATCH", "batch_id": s.get("batch_id"),
            "n_events": s.get("n_events"),
            "replication_lag_sec": s.get("replication_lag_sec"),
        }), flush=True)
    q = pipe.run_stream(stream, spark_cp, available_now=not args.follow)
    if args.follow:
        q.awaitTermination()
    for s in pipe.last_stats:
        print(json.dumps({k: v for k, v in s.items() if not isinstance(v, dict)},
                         default=str))
    print(json.dumps({"stage": "OPLOG_SYNC_DONE",
                      "batches": len(pipe.last_stats),
                      "rows": pipe.table.read().count()}))
    return 0


def _run_multi(spark, cfg, extras, args) -> int:
    """Catalog-driven multi-table sync: one lake table per namespace under
    [dst] path, fed by ONE shared stream scan (MultiCdcPipeline)."""
    from py_mongo_sync_spark.schema import TRANSCRIPT_SCHEMA_V0
    from py_mongo_sync_spark.sources.oplog import read_oplog_stream
    from py_mongo_sync_spark.streaming.pipeline import MultiCdcPipeline

    ns_list = _catalog_namespaces(spark, cfg, extras)
    if not ns_list:
        print(json.dumps({"stage": "DONE", "note": "no namespaces in catalog"}))
        return 0
    print(json.dumps({"stage": "CATALOG", "namespaces": ns_list}))

    multi = MultiCdcPipeline(spark, cfg, ns_list)
    fresh = {ns: p for ns, p in multi.pipes.items() if not p.table.exists()}
    if fresh:
        multi.initial_sync({
            ns: spark.createDataFrame([], TRANSCRIPT_SCHEMA_V0) for ns in fresh
        })
        print(json.dumps({"stage": "INITIAL_SYNC", "tables": sorted(fresh)}))

    if not extras["events_path"]:
        print(json.dumps({"stage": "DONE", "note": "no [src] events_path"}))
        return 0
    start_optime = args.start_optime
    if args.resume:
        # resume from the MINIMUM per-table watermark + 1: tables already
        # past that point replay idempotently (batch-id + monotone-ts
        # guards), tables at it lose nothing — the conservative multi-table
        # generalization of the single-table --resume
        wms = [p.cplog.high_watermark() for p in multi.pipes.values()]
        wms = [w for w in wms if w is not None]
        start_optime = (min(wms) + 1) if len(wms) == len(multi.pipes) else None
        print(json.dumps({"stage": "RESUME", "start_optime": start_optime}))
    stream = read_oplog_stream(
        spark, extras["events_path"],
        start_optime=(start_optime if start_optime is not None
                      else extras.get("start_optime")),
        fmt=extras["events_format"],
    )
    spark_cp = args.spark_checkpoint or (cfg.checkpoint_path + "/_spark")
    if args.follow:
        def _mk_logger(pipe):
            # read dst_ns at call time: a replayed rename_table retargets
            # the pipe and the log line must follow it
            return lambda s: print(json.dumps({
                "stage": "BATCH", "ns": pipe.dst_ns,
                "batch_id": s.get("batch_id"),
                "n_events": s.get("n_events"),
                "replication_lag_sec": s.get("replication_lag_sec"),
            }), flush=True)
        for p in multi.pipes.values():
            p.on_batch_stats = _mk_logger(p)
    q = multi.run_stream(stream, spark_cp, available_now=not args.follow)
    if args.follow:
        q.awaitTermination()
    for ns in ns_list:
        print(json.dumps({
            "stage": "OPLOG_SYNC_DONE", "ns": ns,
            "rows": multi.pipes[ns].table.read().count(),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
