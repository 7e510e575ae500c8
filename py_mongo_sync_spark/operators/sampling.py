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


def stratified_cap(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``k`` rows per group, selected by md5(id) rank — a
    deterministic uniform draw within each stratum (id-order would bias
    toward old documents). Output = input columns."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        md5_long(F.col(id_col).cast("string"), 15), id_col
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


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
