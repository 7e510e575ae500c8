"""Greedy sequence packing — fill fixed token-budget training windows.

The step after curation in an LLM data pipeline: documents are packed
into context windows of ``budget`` tokens so training batches waste no
padding. Deterministic greedy-by-id within each group (same decision on
every run and every engine — a SQL oracle can replay it with a recursive
CTE): walk the group's docs in id order, append to the current pack while
the running token sum stays ≤ budget, else start a new pack; a single doc
larger than the budget gets a pack of its own (the caller decides whether
to truncate or split it downstream).

Scale shape: one shuffle on the group columns (language, shard, ...);
each group packs independently inside an Arrow-batched
``applyInPandas`` kernel whose Python-level loop runs once per PACK
(``np.searchsorted`` on the cumulative sum finds each boundary), not per
document — a 10⁶-doc group with 1k-token packs costs ~10⁵ searchsorted
calls on a sorted array, not 10⁶ interpreter iterations. Groups are the
parallelism unit: at 100 TB, group by (lang, hash-shard) so no single
group is corpus-sized; packing is order-dependent WITHIN a group only,
so sharding changes which docs share a pack but keeps every pack within
budget — the invariant that matters.

Reference analogue: none (data-pipeline operator beyond the reference).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _pack_bounds(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Exclusive end-indices of each pack over ``tokens`` (doc-id order).
    Greedy: each pack is the maximal prefix with sum ≤ budget; an
    oversized single doc forms a singleton pack."""
    cum = np.cumsum(tokens, dtype=np.int64)
    bounds = []
    start, base = 0, 0
    n = len(tokens)
    while start < n:
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end <= start:  # single doc exceeds the budget
            end = start + 1
        bounds.append(end)
        base = int(cum[end - 1])
        start = end
    return np.asarray(bounds, dtype=np.int64)


def pack_greedy(
    df: DataFrame,
    budget: int,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign every row a ``pack_id`` (0-based within its group). Output =
    input columns + pack_id; (group_cols, pack_id) identifies a training
    window. ``group_cols=None`` packs the whole frame as one group — only
    for small frames; at scale always group (the shuffle key)."""
    groups = group_cols or []
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("pack_id", T.LongType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        bounds = _pack_bounds(toks, budget)
        sizes = np.diff(np.concatenate(([0], bounds)))
        pdf["pack_id"] = np.repeat(np.arange(len(bounds), dtype=np.int64), sizes)
        return pdf

    if groups:
        return df.groupBy(*groups).applyInPandas(kernel, schema=out_schema)
    return (
        df.coalesce(1)
        .groupBy(F.lit(0).alias("_g"))
        .applyInPandas(
            lambda pdf: kernel(pdf.drop(columns=["_g"], errors="ignore")),
            schema=out_schema,
        )
    )


def pack_stats(packed: DataFrame, budget: int,
               group_cols: list[str] | None = None,
               tokens_col: str = "n_tokens") -> DataFrame:
    """Per-pack audit: docs, token fill, utilization — the padding-waste
    telemetry a packing job reports."""
    groups = (group_cols or []) + ["pack_id"]
    return packed.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("pack_tokens"),
        F.round(F.sum(tokens_col) / F.lit(float(budget)), 4).alias("utilization"),
    )
