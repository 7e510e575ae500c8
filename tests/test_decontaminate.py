"""Benchmark decontamination: corpus docs near-matching any benchmark doc
are flagged (with evidence) and removable; clean docs pass through."""

from __future__ import annotations

from py_mongo_sync_spark.operators.decontaminate import (
    contamination_decision,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_decision_flags_near_matches(spark):
    bench = _docs(spark, [
        (1000, "the quick brown fox jumps over the lazy dog" * 3),
        (1001, "completely different benchmark prompt about chemistry" * 3),
    ])
    corpus = _docs(spark, [
        # verbatim copy of bench 1000 → contaminated
        (1, "the quick brown fox jumps over the lazy dog" * 3),
        # near-copy (one word changed) → still contaminated at 80% Jaccard
        (2, "the quick brown fox jumps over the lazy cat"
            + "the quick brown fox jumps over the lazy dog" * 2),
        # unrelated → clean
        (3, "unrelated training document with its own content entirely" * 3),
    ])
    got = {r["doc_id"]: r for r in contamination_decision(corpus, bench).collect()}
    assert got[1]["contaminated"] and got[1]["bench_id"] == 1000
    assert got[1]["n_bench_matches"] == 1
    assert got[2]["contaminated"] and got[2]["bench_id"] == 1000
    assert not got[3]["contaminated"] and got[3]["bench_id"] is None
    assert got[3]["n_bench_matches"] == 0


def test_decontaminate_removes_only_contaminated(spark):
    bench = _docs(spark, [(1000, "held out evaluation question text here" * 4)])
    corpus = _docs(spark, [
        (1, "held out evaluation question text here" * 4),   # leak
        (2, "normal web document about gardening and soil" * 4),
        (3, "another clean document on a different topic" * 4),
    ])
    kept = {r["doc_id"] for r in decontaminate(corpus, bench).collect()}
    assert kept == {2, 3}


def test_split_leakage_direction(spark):
    """hash_split ∘ contamination_decision: only EVAL docs are judged, and
    only TRAIN near-matches count as evidence — a dup pair living entirely
    inside train is invisible to the leakage check."""
    import hashlib

    from pyspark.sql import functions as F

    from py_mongo_sync_spark.functions.text import hash_split

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100

    train_ids = [i for i in range(200) if bucket(i) < 90]
    eval_ids = [i for i in range(200) if bucket(i) >= 90]
    leak_txt = "the exact evaluation prompt that leaked into training" * 3
    train_dup = "a template repeated twice inside the train split only" * 3
    rows = []
    for j, i in enumerate(train_ids[:4]):
        rows.append((i, [leak_txt, train_dup, train_dup,
                         "clean train doc about something else entirely" * 3][j]))
    leak_eval, clean_eval = eval_ids[0], eval_ids[1]
    rows.append((leak_eval, leak_txt))
    rows.append((clean_eval, "an original held out question nothing copies" * 3))
    d = _docs(spark, rows).withColumn("split", hash_split(F.col("doc_id")))
    evald = d.where("split <> 'train'")
    train = d.where("split = 'train'")
    got = {r["doc_id"]: r for r in
           contamination_decision(evald, train).collect()}
    # exactly the eval docs are judged
    assert set(got) == {leak_eval, clean_eval}
    assert got[leak_eval]["contaminated"]
    assert got[leak_eval]["bench_id"] == train_ids[0]
    assert not got[clean_eval]["contaminated"]


def test_ngram_overlap_flags_verbatim_run_only(spark):
    from py_mongo_sync_spark.operators.decontaminate import (
        ngram_contamination_decision,
    )
    run13 = "one two three four five six seven eight nine ten eleven twelve thirteen"
    corpus = _docs(spark, [
        (1, f"prefix words here {run13} and a suffix tail"),
        (2, "twelve shared words only: " + " ".join(run13.split()[:12])),
        (3, "wholly unrelated content with no benchmark overlap at all"),
        (4, "short doc"),
    ])
    bench = _docs(spark, [
        (100, f"bench doc containing {run13} verbatim"),
        (50, f"another bench doc with {run13} too"),
    ])
    d = {r["doc_id"]: r for r in
         ngram_contamination_decision(corpus, bench).collect()}
    # doc 1 shares the full 13-word run -> dirty, evidence = min bench id 50
    assert d[1]["dirty"] and d[1]["bench_id"] == 50 and d[1]["n_hit_ngrams"] >= 1
    # 12 shared words is below the window -> clean (exactness, no fuzz)
    assert not d[2]["dirty"]
    assert not d[3]["dirty"] and d[3]["n_hit_ngrams"] == 0
    # fewer than n words -> no grams, clean, no crash
    assert not d[4]["dirty"]
