"""Ingest-time near-duplicate detection — dedup-on-ingest for a CDC feed.

The dedup family's INCREMENTAL member: where ``neardup_clusters`` dedups a
corpus at rest (corpus x corpus) and ``decontaminate`` screens it against a
small benchmark set, this operator screens each NEW BATCH of documents
arriving on the CDC stream against everything already ingested — the shape
a transcript-ingest pipeline actually runs, because re-clustering 10^10
stored documents per micro-batch is not an option.

Reference analogue: none (the reference has no analytics operators); the
incremental contract mirrors its oplog tail-and-apply loop
(/root/reference/mongosync/mongo/handler.py:122-135) — per-batch work is
proportional to the batch, state carries between batches.

Spark-first cost profile, reusing the oracle-parity MinHash machinery
(functions/similarity.py, operators/neardup.py):

- the "seen" state is the banded signature index — (_id, band, bkey) rows,
  NOT the documents: at scale it lives in a LakeTable hash-bucketed on
  ``xxhash64(bkey)``, so the per-batch candidate probe prunes to the
  buckets the batch actually touches (the same probe-then-prune contract
  as the CDC MERGE, plans/lake.py);
- new docs are shingled + signed ONCE (one md5 per shingle row, affine
  min-aggregates in one groupBy) — the index side is never recomputed;
- candidates come from an EQUI-join batch-bands x index-bands; a mega
  bucket on the index side degrades to one edge per new doc against the
  bucket's min-id representative (O(batch), counted telemetry — the same
  ``max_bucket`` policy as ``capped_candidate_pairs``), and within-batch
  pairs use ``capped_candidate_pairs`` itself;
- candidates are verified with EXACT shingle-set Jaccard (integer
  cross-multiply threshold, bit-identical to the SQL oracle); the seen
  side's text is fetched by an id equi-join bounded by the candidate
  count (bucket-pruned point lookups at scale, never a corpus scan);
- the decision is one row per NEW doc: duplicate-of (min matching id
  among seen docs and lower-id batch peers — the union policy: a batch
  doc that matches an already-rejected peer is still rejected, which is
  deterministic and SQL-expressible, and conservative in the right
  direction for training-data hygiene) or novel; novel docs' band rows
  are the index delta to append.

Per-batch cost is thus O(|batch| x touched-bucket occupancy), never
O(|corpus|^2) — the property that lets the operator run forever on a
100 TB feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from py_mongo_sync_spark.functions.similarity import char_shingles
from py_mongo_sync_spark.operators.neardup import (
    _pin,
    banded_signature_rows,
    capped_candidate_pairs,
    verify_pairs_jaccard,
)


def _shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int, ida: str, seta: str
) -> DataFrame:
    # xxhash64 longs, not shingle strings — same rationale (and same
    # negligible collision class) as neardup._candidate_shingle_sets
    return df.select(
        F.col(id_col).alias(ida),
        F.array_distinct(
            F.transform(char_shingles(text_col, k), lambda s: F.xxhash64(s))
        ).alias(seta),
    )


def ingest_decisions(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    seen_bands: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 8,
    k: int = 5,
    threshold_pct: int = 80,
    max_bucket: int = 64,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """One row per new doc: (doc_id, is_dup, dup_of, n_matches).

    ``seen_bands`` is the persisted signature index — (_id, band, bkey)
    rows from prior ``ingest_batch`` calls. When None (tests, oracle), it
    is recomputed from ``seen_docs``; production passes the stored index
    so the seen corpus is never re-signed. ``seen_docs`` is only consulted
    for the exact-Jaccard verify of the (bounded) candidate set.

    ``new_bands`` is the batch's OWN signature rows, when the caller has
    already computed (and ideally persisted) them — the streaming pipeline
    signs each batch exactly once and threads the frame through the bucket
    probe, the decisions, and the index delta, because those are SEPARATE
    Spark actions and ReuseExchange only dedups subtrees within one query.

    The returned frame carries the persisted intermediates on
    ``_cached_frames`` (band rows, candidate pairs, shingle sets — each
    referenced several times in the plan, see neardup._pin); batch-loop
    callers unpersist them after materializing.
    """
    # Every shared subtree below is pinned (neardup._pin): the band frames
    # feed the size probe, the candidate join and the within-batch
    # self-join, and (measured r5/r6) ReuseExchange does NOT collapse
    # references whose exprIds were rewritten by alias dedup — each one
    # re-ran the whole signing subtree.
    holder: list = []
    nb = _pin(
        new_bands
        if new_bands is not None
        else banded_signature_rows(new_docs, id_col, text_col, n_hashes, bands, k),
        holder,
    )
    sb = _pin(
        seen_bands
        if seen_bands is not None
        else banded_signature_rows(seen_docs, id_col, text_col, n_hashes, bands, k),
        holder,
    )

    # --- candidates vs the index, mega-buckets capped to the representative
    sizes = sb.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).alias("_n"), F.min("_id").alias("_rep")
    )
    cand_seen = _pin(
        nb.join(sb.select(F.col("_id").alias("_sid"), "band", "bkey"),
                ["band", "bkey"])
        .join(sizes, ["band", "bkey"])
        .where((F.col("_n") <= max_bucket) | (F.col("_sid") == F.col("_rep")))
        .select(F.col("_id").alias("nid"), F.col("_sid").alias("mid"))
        .distinct(),
        holder,
    )

    # --- candidates within the batch (doc_a < doc_b: lower id is "earlier")
    batch_pairs, _ = capped_candidate_pairs(nb, max_bucket, holder=holder)

    # --- exact-Jaccard verify, candidates only. Shingle the seen side
    # AFTER a semi-join to the matched ids so the verify cost is bounded by
    # the candidate count, not the corpus (at 100 TB these are bucket-pruned
    # point lookups; shingling 10^10 stored docs per batch is not an option)
    seen_cand_docs = seen_docs.join(
        cand_seen.select(F.col("mid").alias(id_col)).distinct(),
        id_col, "left_semi",
    )
    ns_sets = _pin(
        _shingle_sets(new_docs, id_col, text_col, k, "nid", "_ns"), holder
    )
    ms_sets = _pin(
        _shingle_sets(seen_cand_docs, id_col, text_col, k, "mid", "_ms"),
        holder,
    )
    # size-ratio prefilter — LOSSLESS for a Jaccard cut (J ≤ min/max, see
    # neardup.verify_pairs_jaccard): drop pairs that cannot pass while
    # they are still two longs per row, join the wide sets for survivors
    nsz = ns_sets.select("nid", F.size("_ns").alias("_nn"))
    msz = ms_sets.select("mid", F.size("_ms").alias("_nm"))
    surv = (
        cand_seen.join(nsz, "nid")
        .join(msz, "mid")
        .where(
            F.least("_nn", "_nm") * 100
            >= F.lit(threshold_pct) * F.greatest("_nn", "_nm")
        )
        .select("nid", "mid")
    )
    vs = surv.join(ns_sets, "nid").join(ms_sets, "mid")
    inter = F.size(F.array_intersect("_ns", "_ms"))
    union = F.size("_ns") + F.size("_ms") - inter
    seen_hits = (
        vs.where(inter * 100 >= F.lit(threshold_pct) * union)
        .select("nid", "mid")
    )
    batch_hits = verify_pairs_jaccard(
        new_docs, batch_pairs, id_col, text_col, k, threshold_pct,
        holder=holder,
    ).select(F.col("doc_b").alias("nid"), F.col("doc_a").alias("mid"))

    hits = (
        seen_hits.unionByName(batch_hits)
        .groupBy("nid")
        .agg(F.min("mid").alias("dup_of"), F.count(F.lit(1)).alias("n_matches"))
    )
    out = (
        new_docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, F.col("doc_id") == hits["nid"], "left")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        )
    )
    out._cached_frames = holder  # for batch-loop unpersist (streaming/ingest.py)
    return out


def ingest_batch(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    seen_bands: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 8,
    k: int = 5,
    threshold_pct: int = 80,
    max_bucket: int = 64,
    new_bands: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(decisions, index_delta): the per-batch ingest step.

    ``index_delta`` is the band rows of NOVEL docs only — append it to the
    signature index (and the novel docs to the kept corpus) before the
    next batch; rejected duplicates never enter the index, so the index
    grows with the DEDUPED corpus, not the raw feed.

    ``new_bands``: pre-signed (ideally persisted) batch band rows — see
    :func:`ingest_decisions`. With it, the whole batch step constructs the
    signing subtree zero times; without it, twice (decisions + delta).
    """
    decisions = ingest_decisions(
        new_docs, seen_docs, seen_bands, id_col, text_col,
        n_hashes, bands, k, threshold_pct, max_bucket, new_bands=new_bands,
    )
    nb = (
        new_bands
        if new_bands is not None
        else banded_signature_rows(new_docs, id_col, text_col, n_hashes, bands, k)
    )
    novel = decisions.where(~F.col("is_dup")).select(F.col("doc_id").alias("_id"))
    return decisions, nb.join(novel, "_id", "left_semi")
