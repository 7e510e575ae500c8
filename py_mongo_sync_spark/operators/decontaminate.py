"""Benchmark decontamination — remove test-set overlap from a training
corpus.

The dedup family's cross-corpus member: where ``neardup_clusters`` finds
near-duplicates WITHIN one corpus, decontamination finds corpus documents
that near-match any document of a (much smaller) benchmark/eval set and
flags them for removal — the standard hygiene step before training on
web-scale data (a model must not train on its own test set).

Reference analogue: none (the reference has no analytics operators); the
shape mirrors its "destination equals source" contract
(/root/reference/mongosync/mongo/syncer.py:104-123) as "corpus equals
corpus minus contaminated".

Spark-first cost profile, built from the same oracle-parity MinHash
machinery as the within-corpus path (functions/similarity.py):

- each side is shingled + signed ONCE (one md5 per shingle row, affine
  min-aggregates in one groupBy);
- candidates come from an EQUI-join of band buckets corpus×benchmark —
  never corpus×corpus, never all-pairs: cost is linear in corpus size
  plus (per band bucket) corpus-members × benchmark-members, and the
  benchmark side is small by definition (thousands of eval docs vs 10⁹
  training docs) so Spark broadcasts it;
- candidates are verified with EXACT shingle-set Jaccard
  (integer cross-multiplied threshold — bit-identical to the SQL oracle);
- the decision is one row per corpus doc: keep iff not contaminated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from py_mongo_sync_spark.functions.similarity import char_shingles
from py_mongo_sync_spark.operators.neardup import _pin, banded_signature_rows


def contamination_decision(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 8,
    k: int = 5,
    threshold_pct: int = 80,
    holder: list | None = None,
) -> DataFrame:
    """One row per corpus doc: (doc_id, contaminated, bench_id,
    n_bench_matches). ``bench_id`` is the minimum matching benchmark id
    (deterministic evidence pointer, NULL when clean); ``corpus minus
    contaminated`` = ``where not contaminated``. The returned frame carries
    its pinned intermediates on ``_cached_frames`` (see neardup._pin) for
    batch-loop callers."""
    holder = [] if holder is None else holder
    cb = banded_signature_rows(corpus, id_col, text_col, n_hashes, bands, k)
    bb = banded_signature_rows(
        benchmark, bench_id_col, bench_text_col, n_hashes, bands, k
    ).select(
        F.col("_id").alias("_bid"), "band", "bkey"
    )
    # Pinned (neardup._pin): the skinny candidate list is referenced THREE
    # times below (each side's id extraction + the verify join), and each
    # unpinned reference re-executed BOTH banding subtrees — i.e. the whole
    # corpus was signed ~3× per query (measured: the r5 driver clocked
    # decontamination at 150 s / split_decontamination at 280 s on sf1.0;
    # pinning runs the corpus×benchmark banding exactly once).
    cand = _pin(
        cb.join(bb, ["band", "bkey"])
        .select(F.col("_id").alias("_cid"), "_bid")
        .distinct(),
        holder,
    )

    def _sets(df: DataFrame, idc: str, txt: str, ida: str, seta: str) -> DataFrame:
        # shingle ONLY candidate docs: semi-join to the candidate ids
        # BEFORE the shingle explode, so verify cost is O(candidates)
        # rather than O(corpus) — the same candidate-bounded shape as
        # neardup._candidate_shingle_sets (at 10^9 training docs,
        # re-shingling the whole corpus to verify a sliver of candidate
        # rows is the dominant wasted work). Sets are xxhash64 LONGS,
        # not shingle strings — same rationale (and same negligible
        # collision class) as neardup._candidate_shingle_sets: ~3× less
        # cache/shuffle and integer instead of string intersects.
        ids = cand.select(F.col(ida)).distinct()
        return df.join(
            ids, df[idc] == ids[ida], "left_semi"
        ).select(
            F.col(idc).alias(ida),
            F.array_distinct(
                F.transform(char_shingles(txt, k), lambda s: F.xxhash64(s))
            ).alias(seta),
        )

    cs = _pin(_sets(corpus, id_col, text_col, "_cid", "_cs"), holder)
    bs = _pin(
        _sets(benchmark, bench_id_col, bench_text_col, "_bid", "_bs"), holder
    )
    # Size-ratio prefilter — LOSSLESS (J(A,B) ≤ min/max, see
    # neardup.verify_pairs_jaccard): pairs that cannot reach the Jaccard
    # threshold are dropped while the candidate list is still two longs
    # per row; the wide shingle sets are joined only for survivors. On the
    # dup-dense sf1.0 fixture this cuts the 31M-pair candidate list ~60%
    # before the array_intersect pass (the dominant wall at that scale).
    csz = cs.select("_cid", F.size("_cs").alias("_na"))
    bsz = bs.select("_bid", F.size("_bs").alias("_nb"))
    surv = (
        cand.join(csz, "_cid")
        .join(bsz, "_bid")
        .where(
            F.least("_na", "_nb") * 100
            >= F.lit(threshold_pct) * F.greatest("_na", "_nb")
        )
        .select("_cid", "_bid")
    )
    j = surv.join(cs, "_cid").join(bs, "_bid")
    inter = F.size(F.array_intersect("_cs", "_bs"))
    union = F.size("_cs") + F.size("_bs") - inter
    hits = (
        j.where(inter * 100 >= F.lit(threshold_pct) * union)
        .groupBy("_cid")
        .agg(
            F.min("_bid").alias("bench_id"),
            F.count(F.lit(1)).alias("n_bench_matches"),
        )
    )
    out = (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, F.col("doc_id") == hits["_cid"], "left")
        .select(
            "doc_id",
            F.col("bench_id").isNotNull().alias("contaminated"),
            "bench_id",
            F.coalesce("n_bench_matches", F.lit(0)).alias("n_bench_matches"),
        )
    )
    out._cached_frames = holder
    return out


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """The applied decision: corpus rows whose text does NOT near-match any
    benchmark document (all columns preserved)."""
    decision = contamination_decision(
        corpus, benchmark, id_col=id_col, text_col=text_col, **kwargs
    )
    clean = decision.where(~F.col("contaminated")).select("doc_id")
    return corpus.join(
        clean, corpus[id_col] == clean["doc_id"], "left_semi"
    )


def ngram_contamination_decision(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """EXACT word-n-gram overlap decontamination — the strict sibling of
    ``contamination_decision``: a corpus doc is dirty iff it shares ANY
    verbatim n-word run with any benchmark doc (the published "dirty
    document" definition used for held-out-set hygiene; n=13 is the
    customary window). No hashing, no probability: exact string equality
    on the n-gram, so there are no false positives at all and recall is
    exactly "verbatim overlap of >= n words".

    Spark-first cost: each side explodes to (doc, n-gram) rows ONCE; grams
    travel as xxhash64 longs, not n-word strings (a 13-word gram is
    ~80-100 bytes, its hash 8 — the distinct shuffle, the broadcast and
    the join all move an order of magnitude fewer bytes); the benchmark side collapses to DISTINCT
    gram hashes with a min-id evidence pointer and is broadcast-small by
    definition (thousands of eval docs); the decision is one equi-join
    corpus-grams x bench-grams followed by a per-doc aggregate — linear in
    corpus token count, no pair space anywhere. Returns one row per corpus
    doc: (doc_id, dirty, bench_id, n_hit_ngrams) with bench_id the minimum
    benchmark doc sharing a gram (NULL when clean).
    """
    def _grams(df: DataFrame, idc: str, txt: str, ida: str) -> DataFrame:
        ws = F.split(F.col(txt), " ")
        grams = F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - n),
                lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(
            F.col(idc).alias(ida), F.explode(grams).alias("g")
        # xxhash64, not md5: the gram key is INTERNAL (never in the
        # output), so no oracle mirroring is needed and the cheapest
        # 64-bit hash wins (the md5 hex+conv pipeline measured slower
        # than the string shuffle it saved at sf1.0)
        ).select(ida, F.xxhash64("g").alias("g"))

    bg = (
        _grams(benchmark, bench_id_col, bench_text_col, "_bid")
        .groupBy("g")
        .agg(F.min("_bid").alias("_gbid"))
    )
    hits = (
        _grams(corpus, id_col, text_col, "_cid")
        .distinct()
        .join(F.broadcast(bg), "g")
        .groupBy("_cid")
        .agg(
            F.min("_gbid").alias("bench_id"),
            F.count(F.lit(1)).alias("n_hit_ngrams"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, F.col("doc_id") == hits["_cid"], "left")
        .select(
            "doc_id",
            F.col("bench_id").isNotNull().alias("dirty"),
            "bench_id",
            F.coalesce("n_hit_ngrams", F.lit(0)).alias("n_hit_ngrams"),
        )
    )
