"""Deterministic sampling: exact per-group caps, reproducible draws,
composability of rate sampling with caps."""

from __future__ import annotations

from py_mongo_sync_spark.operators.sampling import hash_rate_sample, stratified_cap


def _docs(spark, n=200):
    rows = [(i, "en" if i % 3 else "de") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_cap_exact_k_and_deterministic(spark):
    d = _docs(spark)
    got = stratified_cap(d, ["lang"], 10).toPandas()
    assert (got.groupby("lang").size() == 10).all()
    again = stratified_cap(d, ["lang"], 10).toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    # small strata come back whole (cap, not forced size)
    tiny = stratified_cap(_docs(spark, 6), ["lang"], 10).count()
    assert tiny == 6


def test_hash_rate_sample_stable_and_composable(spark):
    d = _docs(spark, 400)
    s50 = hash_rate_sample(d, 50)
    n = s50.count()
    assert 120 <= n <= 280               # ~50% of 400, md5-spread
    # per-row fate is independent of the rest of the corpus: the sample of
    # a subset equals the subset of the sample
    half = d.where("doc_id < 200")
    a = {r["doc_id"] for r in hash_rate_sample(half, 50).collect()}
    b = {r["doc_id"] for r in s50.where("doc_id < 200").collect()}
    assert a == b
    # rate 100 keeps everything, 0 keeps nothing
    assert hash_rate_sample(d, 100).count() == 400
    assert hash_rate_sample(d, 0).count() == 0


def test_percentile_floor_exact_and_sketch_paths(spark):
    from py_mongo_sync_spark.operators.sampling import percentile_floor

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, v double"
    )
    kept = percentile_floor(df, "v", frac=0.1, exact=True)
    vals = sorted(r["v"] for r in kept.collect())
    # threshold = quantile_cont(0.1) over 0..99 = 9.9 -> keep 10..99
    assert vals[0] == 10.0 and len(vals) == 90
    # sketch path: approx_percentile returns a MEMBER value (no
    # interpolation) — threshold 9.0, one extra boundary row kept
    kept_a = percentile_floor(df, "v", frac=0.1, exact=False)
    vals_a = sorted(r["v"] for r in kept_a.collect())
    assert vals_a[0] == 9.0 and len(vals_a) == 91


def test_stratified_cap_overshoot_is_identical_and_bounded(spark):
    """The fused overshoot-then-cap path must return EXACTLY the plain
    cap's rows (the pre-filter is a prefix of the ranking hash, with a
    full-rows fallback for under-filled groups), while feeding the window
    a bounded slice of each big group instead of the whole group."""
    from py_mongo_sync_spark.operators.sampling import (
        _RANK_SPAN, stratified_cap,
    )
    from py_mongo_sync_spark.functions.similarity import md5_long
    from pyspark.sql import functions as F

    rows = [(i, "big" if i % 10 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])

    plain = stratified_cap(df, ["grp"], 20)
    fused = stratified_cap(df, ["grp"], 20, overshoot=4)
    assert sorted((r.doc_id, r.grp) for r in fused.collect()) == \
           sorted((r.doc_id, r.grp) for r in plain.collect())

    # bound evidence: the big group's survivor prefix is ~overshoot*k of
    # 4500 rows, not the whole group (binomial around 80; 3x margin)
    counts = df.groupBy("grp").agg(F.count(F.lit(1)).alias("_n"))
    ceil = (F.lit(float(_RANK_SPAN)) / F.col("_n") * 80).cast("long")
    surv_big = (
        df.join(counts, "grp").where(F.col("grp") == "big")
        .where(md5_long(F.col("doc_id").cast("string"), 15) < ceil)
        .count()
    )
    assert surv_big < 240, surv_big
    assert surv_big >= 20

    # pathological under-fill: overshoot window smaller than k still exact
    # (fallback path), pinned with k bigger than the expected prefix
    fused2 = stratified_cap(df, ["grp"], 450, overshoot=1)
    plain2 = stratified_cap(df, ["grp"], 450)
    assert sorted((r.doc_id, r.grp) for r in fused2.collect()) == \
           sorted((r.doc_id, r.grp) for r in plain2.collect())
