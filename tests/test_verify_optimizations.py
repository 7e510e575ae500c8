"""Round-6 optimization pins: the verify-path restructurings must be
OUTPUT-IDENTICAL to the naive forms they replaced, and the per-batch
persists must not leak across streaming batches.

1. hashed shingle sets + size-ratio prefilter (operators/neardup.py::
   verify_pairs_jaccard, operators/decontaminate.py, ingest_dedup.py):
   the xxhash64 sets change only the representation (collision odds
   ~2^-65 per pair); the size filter is provably lossless for a Jaccard
   cut (J(A,B) <= min/max). Pinned here against a brute-force string-set
   Jaccard over ALL candidate pairs.
2. the candidate generator executes ONCE per query (the exprId /
   ReuseExchange re-execution trap): pinned via the shared-lineage
   persist — checked by plan: the verify plan must contain
   InMemoryTableScan nodes.
3. streaming ingest unpersists every operator-internal cache per batch —
   the cached-RDD count must not grow batch over batch.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from py_mongo_sync_spark.operators.neardup import (
    banded_signature_rows,
    capped_candidate_pairs,
    verify_pairs_jaccard,
)


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_jaccard_pairs(texts, pairs, k=5, threshold_pct=80):
    """Reference: exact STRING shingle-set Jaccard on the given pairs."""
    def sh(t):
        if len(t) < k:
            return {t}
        return {t[i:i + k] for i in range(len(t) - k + 1)}

    out = set()
    for a, b in pairs:
        A, B = sh(texts[a]), sh(texts[b])
        inter = len(A & B)
        union = len(A | B)
        if inter * 100 >= threshold_pct * union:
            out.add((a, b))
    return out


def test_hashed_sets_and_size_prefilter_match_string_bruteforce(spark):
    # mixed corpus: exact dups, near dups, prefix-truncations (size-ratio
    # edge cases around the 0.8 cut), and unrelated docs
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    texts = [
        base,
        base,                                    # exact dup
        base + " extra tail",                    # near dup
        base[: int(len(base) * 0.82)],           # ratio just above 0.8
        base[: int(len(base) * 0.5)],            # ratio well below 0.8
        "completely different content about spark optimization and joins",
        "completely different content about spark optimization and joins!!",
    ]
    docs = _mkdocs(spark, texts)
    # force EVERY ordered pair as a candidate — the verify must reproduce
    # brute force regardless of what the generator emitted
    all_pairs = list(itertools.combinations(range(len(texts)), 2))
    pairs_df = spark.createDataFrame(all_pairs, "doc_a long, doc_b long")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in verify_pairs_jaccard(docs, pairs_df, "doc_id", "text").collect()
    }
    assert got == _brute_jaccard_pairs(texts, all_pairs)


def test_verify_plan_reuses_pinned_candidates(spark):
    """The candidate subtree must appear as a CACHED scan in the verify
    plan (InMemoryTableScan), i.e. the generator executes once — the r5
    regression was each reference re-running it."""
    texts = [f"document number {i} with shared boilerplate sentence" for i in range(20)]
    docs = _mkdocs(spark, texts)
    banded = banded_signature_rows(docs, "doc_id", "text")
    pairs, _ = capped_candidate_pairs(banded)
    out = verify_pairs_jaccard(docs, pairs, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    for h in getattr(out, "_cached_frames", []):
        h.unpersist()
    pairs.unpersist()
    banded.unpersist()


def test_streaming_ingest_cache_does_not_grow_across_batches(spark, tmp_path):
    """The per-batch pins (neardup._pin) are released after each commit:
    the JVM's cached-RDD count after batch N equals the count after batch
    1 — bounded memory on an infinite stream."""
    from py_mongo_sync_spark.streaming.ingest import NeardupIngestPipeline

    pipe = NeardupIngestPipeline(
        spark, str(tmp_path / "docs"), str(tmp_path / "bands"), n_buckets=4
    )
    seed = _mkdocs(spark, [f"seed document {i} about topic {i % 3}" for i in range(6)])
    pipe.initial_load(seed)

    def cached_rdds():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    counts = []
    for b in range(3):
        batch = spark.createDataFrame(
            [(100 + 10 * b + i, f"batch {b} doc {i} about topic {i % 3}")
             for i in range(4)],
            "doc_id long, text string",
        )
        pipe.apply_batch(batch, b)
        counts.append(cached_rdds())
    assert counts[2] <= counts[0], f"cached RDDs grew across batches: {counts}"


def test_ngram_hashed_join_matches_string_join(spark):
    """xxhash64 gram keys must reproduce the exact string-equality n-gram
    overlap decision (ngram_contamination_decision)."""
    from py_mongo_sync_spark.operators.decontaminate import (
        ngram_contamination_decision,
    )

    words = lambda s, n: " ".join(f"{s}{i}" for i in range(n))  # noqa: E731
    corpus = _mkdocs(spark, [
        words("a", 20),                       # shares no gram with bench
        words("b", 20),                       # identical to bench doc -> dirty
        words("b", 12) + " " + words("c", 8),  # 12-word shared run < n=13 -> clean
        "short doc",                          # fewer than n words -> clean
    ])
    bench = spark.createDataFrame(
        [(1000, words("b", 20))], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["dirty"], r["bench_id"], r["n_hit_ngrams"])
        for r in ngram_contamination_decision(corpus, bench).collect()
    }
    assert got[0] == (False, None, 0)
    assert got[1][0] is True and got[1][1] == 1000 and got[1][2] == 8
    assert got[2] == (False, None, 0)
    assert got[3] == (False, None, 0)


def test_boilerplate_removal_hashed_line_key_is_lossless(spark):
    """md5-long line keys in remove_boilerplate_lines must reproduce the
    string-keyed C4 rule bit-for-bit (cleaned text included)."""
    from py_mongo_sync_spark.functions.text import remove_boilerplate_lines

    boiler = "this exact boilerplate sentence appears everywhere"
    texts = [f"unique content {i} here. {boiler}. tail {i}" for i in range(5)]
    texts.append("no boilerplate at all in this one")
    df = _mkdocs(spark, texts).withColumnRenamed("text", "text")
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, min_docs=4, min_chars=20).collect()}
    for i in range(5):
        assert out[i]["text_clean"] == f"unique content {i} here. tail {i}"
        assert out[i]["n_lines"] == 3 and out[i]["n_removed"] == 1
    assert out[5]["text_clean"] == "no boilerplate at all in this one"
    assert out[5]["n_removed"] == 0
