"""Namespace filter / rename as pure column expressions (no Python in the
hot path — Catalyst folds these into the scan filter).

Ports, operator by operator:

- P1/P2 ns allowlist with ``db.*`` wildcard —
  /root/reference/mongosync/data_filter.py:19-35
- P3 oplog-event validity (drop 'n' when filtering; 'c' by db) —
  /root/reference/mongosync/data_filter.py:40-51
- P4 system-namespace exclusion —
  /root/reference/mongosync/common_syncer.py:42-43
- P5 db/ns rename map (``rename_db``) —
  /root/reference/mongosync/config.py:65-73, applied in-flight at
  mongo/syncer.py:298-301
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from py_mongo_sync_spark.config import SyncConfig, parse_namespace

SYSTEM_DBS = ("admin", "local")
SYSTEM_COLL_PREFIX = "system."


def ns_db(ns: Column) -> Column:
    """db part of "<db>.<coll>" — split on the FIRST dot
    (mongo_utils.py:182-187)."""
    return F.substring_index(ns, ".", 1)


def ns_coll(ns: Column) -> Column:
    return F.substring(ns, F.length(ns_db(ns)) + 2, F.lit(2147483647))


def system_ns_filter(ns: Column) -> Column:
    """P4: drop admin/local dbs and system.* collections."""
    db = ns_db(ns)
    coll = F.substring(ns, F.length(db) + 2, F.lit(2147483647))
    return (~db.isin(*SYSTEM_DBS)) & (~coll.startswith(SYSTEM_COLL_PREFIX))


def valid_oplog_filter(cfg: SyncConfig, op: Column, ns: Column) -> Column:
    """P3: exact port of DataFilter.valid_oplog (data_filter.py:40-51).
    Pass-all when no allowlist; otherwise drop 'n', validate 'c' by db,
    everything else by full ns honoring the ``db.*`` wildcard."""
    if not cfg.filter_active:
        return F.lit(True)
    related = sorted(cfg.related_dbs)
    wildcard_dbs = sorted(
        ns_.split(".", 1)[0] for ns_ in cfg.include_colls if ns_.endswith(".*")
    )
    exact = sorted(ns_ for ns_ in cfg.include_colls if not ns_.endswith(".*"))
    db = ns_db(ns)
    ns_ok = (db.isin(*wildcard_dbs) if wildcard_dbs else F.lit(False)) | (
        ns.isin(*exact) if exact else F.lit(False)
    )
    return (
        F.when(op == "n", F.lit(False))
        .when(op == "c", db.isin(*related) if related else F.lit(False))
        .otherwise(ns_ok)
    )


def rename_ns(cfg: SyncConfig, ns: Column) -> Column:
    """P5: apply ns-level then db-level renames via a literal map — a
    broadcast-sized lookup folded into the plan (the Spark form of the
    reference's in-flight ``oplog['ns']`` rewrite, mongo/syncer.py:298-301)."""
    expr = ns
    db = ns_db(ns)
    coll = F.substring(ns, F.length(db) + 2, F.lit(2147483647))
    for src_db, dst_db in sorted(cfg.db_mapping.items()):
        expr = F.when(
            db == src_db, F.concat_ws(".", F.lit(dst_db), coll)
        ).otherwise(expr)
    for src_ns, dst_ns in sorted(cfg.ns_mapping.items()):
        expr = F.when(ns == src_ns, F.lit(dst_ns)).otherwise(expr)
    return expr


def valid_ns_values(cfg: SyncConfig, namespaces: list[str]) -> list[str]:
    """Driver-side catalog filtering (S5: _collect_colls,
    common_syncer.py:120-135): allowlist + system exclusion."""
    out = []
    for ns in namespaces:
        db, coll = parse_namespace(ns)
        if db in SYSTEM_DBS or coll.startswith(SYSTEM_COLL_PREFIX):
            continue
        if cfg.valid_coll(db, coll):
            out.append(ns)
    return sorted(out)
