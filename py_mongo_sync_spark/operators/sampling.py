"""Deterministic corpus sampling — stratified caps and rate sampling.

Training-data mixes are built by SAMPLING, not by taking everything: cap
the dominant languages/sources so the mix is balanced, or take a fixed
fraction of a source. Both operators here are deterministic functions of
the row id (md5-derived pseudo-randomness, no RNG state), so a re-run —
or a SQL oracle on another engine — selects the exact same rows; that
reproducibility is what makes a training mix auditable.

Reference analogue: none (data-pipeline operator beyond the reference).

Scale shapes:
- ``stratified_cap`` is one shuffle + per-group sort (window row_number)
  — exact k per group. Group sizes bound the sort; for groups near
  corpus scale, pre-filter with ``hash_rate_sample`` at a rate that
  overshoots k, then cap exactly (two cheap passes instead of one
  giant sort).
- ``hash_rate_sample`` is a pure filter — no shuffle at all; it pushes
  down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from py_mongo_sync_spark.functions.similarity import md5_long


#: md5_long(col, 15) yields 15 hex digits = 60 uniform bits: [0, 2^60)
_RANK_SPAN = 2 ** 60


def stratified_cap(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    overshoot: int = 0,
) -> DataFrame:
    """At most ``k`` rows per group, selected by md5(id) rank — a
    deterministic uniform draw within each stratum (id-order would bias
    toward old documents). Output = input columns.

    ``overshoot > 0`` switches on the corpus-scale path: a group larger
    than ``overshoot * k`` rows is pre-filtered to rank-hash values below
    a per-group ceiling sized for ~``overshoot * k`` expected survivors,
    BEFORE the exact window. Because the pre-filter is a PREFIX of the
    very ranking the window sorts by (rk < T keeps everything that could
    be in the top k, as long as ≥ k rows survive), the k winners are
    unchanged — and the (measure-zero at any sane overshoot) group whose
    survivor count under-fills min(k, n) falls back to its full rows, so
    the fused path is IDENTICAL to the plain cap by construction, not
    with high probability. The window then sorts O(overshoot·k) rows per
    group instead of the whole group — at a 10^9-row language stratum
    capped to 10^5, that is the difference between sorting the stratum
    and sorting 0.04% of it; the two auxiliary aggregates are map-side
    combinable group counts (one row per stratum, broadcast back)."""
    from pyspark.sql import Window

    rank = md5_long(F.col(id_col).cast("string"), 15)
    w = Window.partitionBy(*group_cols).orderBy(rank, id_col)
    capped = lambda d: (  # noqa: E731
        d.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )
    if overshoot <= 0:
        return capped(df)

    target = overshoot * k
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    ceil = F.when(F.col("_n") <= target, F.lit(_RANK_SPAN)).otherwise(
        (F.lit(float(_RANK_SPAN)) / F.col("_n") * target).cast("long")
    )
    surv = (
        df.join(F.broadcast(counts), group_cols)
        .where(rank < ceil)
        .select(*df.columns)
    )
    # groups whose survivor prefix covers min(k, n) are exact; the rest
    # (short groups can't under-fill — ceil is the full span for them)
    # fall back to their complete rows
    sc = surv.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_m"))
    full = counts.join(sc, group_cols, "left").where(
        F.coalesce("_m", F.lit(0)) >= F.least(F.lit(k), F.col("_n"))
    ).select(*group_cols)
    bounded = (
        surv.join(F.broadcast(full), group_cols, "left_semi")
        .unionByName(
            df.join(F.broadcast(full), group_cols, "left_anti")
            .select(*df.columns)
        )
    )
    return capped(bounded)


def hash_rate_sample(
    df: DataFrame, rate_pct: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``rate_pct``% of rows: md5_32(id) % 100 < rate_pct. Exact
    integer math (identical row set in any engine), stable under re-runs
    and unions (a row's fate never depends on the rest of the corpus)."""
    return df.where(
        F.pmod(md5_long(F.col(id_col).cast("string"), 8), F.lit(100))
        < F.lit(rate_pct)
    )


def percentile_floor(
    df: DataFrame, value_col: str, frac: float = 0.1, exact: bool = True
) -> DataFrame:
    """Drop rows whose ``value_col`` falls below the corpus's ``frac``
    quantile — the "cut the bottom decile" curation gate, where the
    threshold is a PROPERTY OF THE CORPUS rather than a constant (contrast
    ``hash_rate_sample``, whose per-row fate is corpus-independent).

    The threshold is ONE scalar: a single aggregate job broadcast back
    into a filter — no global sort, no window over the corpus.
    ``exact=True`` uses Spark's exact ``percentile`` (linear interpolation
    at rank frac*(n-1), bit-identical to SQL ``quantile_cont`` — the
    oracle-parity path; its aggregation state holds per-distinct-value
    counts, fine for bounded-cardinality scores). At 10^10 rows of
    continuous doubles that state is itself a memory hazard, so the scale
    path is ``exact=False`` → ``approx_percentile`` (bounded-size
    quantile sketch, mergeable, default accuracy 1/10000) — the usual
    sketch-for-exactness trade, chosen explicitly by the caller.
    """
    fn = "percentile" if exact else "approx_percentile"
    thr = df.select(F.expr(f"{fn}({value_col}, {frac}d)").alias("_thr"))
    return (
        df.join(F.broadcast(thr))
        .where(F.col(value_col) >= F.col("_thr"))
        .drop("_thr")
    )
