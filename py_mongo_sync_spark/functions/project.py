"""Field projection — P6/P7.

Reference: ``gen_doc_with_fields`` keeps only configured dotted-path fields,
rebuilding nesting (/root/reference/mongosync/doc_utils.py:37-49, helpers
:4-34); configured via ``fieldmap`` (config_file.py:56-67). In Spark this is
plain column pruning (Catalyst pushes it into the parquet scan), with dotted
paths resolving into struct columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from py_mongo_sync_spark.config import SyncConfig


def project_fields(
    df: DataFrame, cfg: SyncConfig, always_keep: list[str] | None = None
) -> DataFrame:
    """Keep only ``cfg.include_fields`` payload columns (dotted paths allowed
    for struct columns), plus ``always_keep`` (keys/envelope). Empty
    allowlist ⇒ identity, matching the reference (fields unset ⇒ whole doc,
    es/syncer.py:80-84)."""
    if not cfg.include_fields:
        return df
    keep = list(always_keep or [])
    cols = [F.col(c) for c in keep]
    for path in sorted(cfg.include_fields):
        if path in keep:
            continue
        top = path.split(".", 1)[0]
        if top not in df.columns:
            continue
        # dotted path into a struct → re-nest under the top-level name like
        # doc_flat_to_nested (doc_utils.py:4-21); flat column → as-is.
        cols.append(F.col(path).alias(path.replace(".", "_")) if "." in path else F.col(path))
    return df.select(*cols)


def merge_doc_cols(new: DataFrame, cols: list[str], prefix_new: str, prefix_old: str):
    """Deep-merge analogue (doc_utils.py:52-60): per-column coalesce of a
    partial update over the old row — used inside MERGE UPDATE SET."""
    return [
        F.coalesce(F.col(f"{prefix_new}.{c}"), F.col(f"{prefix_old}.{c}")).alias(c)
        for c in cols
    ]
