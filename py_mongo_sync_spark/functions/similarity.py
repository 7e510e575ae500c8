"""Similarity / near-duplicate operators for training-data pipelines.

Not in the reference (it has no analytics operators) — these are the
large-scale data-curation ops a 100 TB transcript/document lake needs,
built Spark-first:

- exact dedup          → hash groupBy (see __spark_entry__.q_dedup_exact)
- word-set Jaccard     → array_intersect/union (quadratic-in-partition oracle baseline)
- MinHash + LSH        → shingle → minhash → band → bucket join (the scale
  path: candidate generation is linear + one shuffle on band buckets,
  never an all-pairs join)
- SimHash              → one explode + one groupBy with 64 bitplane sums
  (single shuffle pass, all JVM expressions)
- brute-force cosine   → zip_with/aggregate dot products (oracle baseline)
- LSH-bucketed ANN     → random-hyperplane signatures → candidate buckets

Everything below is deterministic (xxhash64-seeded, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def char_shingles(text_col: str, k: int = 5):
    """Overlapping character k-grams as an array column (JVM-side)."""
    c = F.col(text_col)
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))


def minhash_signature(text_col: str, n_hashes: int = 32, k: int = 5):
    """Array of ``n_hashes`` min-hashes over char k-gram shingles. Each hash
    family member is xxhash64(shingle, seed=i) — deterministic, no RNG."""
    sh = char_shingles(text_col, k)
    return F.array(
        *[F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i)))) for i in range(n_hashes)]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become a candidate
    pair. Cost profile at scale: one narrow pass to compute signatures, one
    explode (×bands), one shuffle on (band, band_hash) — no all-pairs join.
    Rows: (doc_a, doc_b, n_bands_matched)."""
    rows_per_band = n_hashes // bands
    sig = df.select(F.col(id_col).alias("_id"), minhash_signature(text_col, n_hashes, k).alias("_sig"))
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[F.element_at("_sig", b * rows_per_band + r + 1).cast("string")
                                  for r in range(rows_per_band)],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bhash")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bhash") == F.col("b.bhash"))
        & (F.col("a._id") < F.col("b._id")),
    )
    return (
        pairs.groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_matched"))
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: explode tokens once, one groupBy with a
    sum per bitplane (single shuffle; all whole-stage-codegen expressions).
    Bitplane b votes +1/-1 by bit b of xxhash64(token)."""
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("_t"),
    ).withColumn("_h", F.xxhash64("_t"))
    votes = [
        F.sum(
            (F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("_id").agg(*votes)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return agg.select(F.col("_id").alias(id_col), sig.alias("simhash64"))


def hamming_neardup_pairs(sig_df: DataFrame, id_col: str, sig_col: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup join: block on 4 16-bit chunks (a pair within
    hamming distance 3 of 64 bits must agree on ≥1 chunk — pigeonhole),
    then verify exact hamming via bit_count(xor). Blocked join, not all-pairs."""
    chunks = F.array(
        *[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftright(F.col(sig_col), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("cval"))
            for i in range(4)
        ]
    )
    blocked = sig_df.select(
        F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"), F.explode(chunks).alias("c")
    ).select("_id", "_sig", "c.chunk", "c.cval")
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.cval") == F.col("b.cval"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"),
        F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
    ).distinct()
    return cand.where(F.col("hamming") <= max_hamming)


# ----------------------------- vector search ------------------------------

def cosine_sim(vec_a, vec_b):
    """Dot/norms via zip_with + aggregate — double accumulation in index
    order (JVM, no UDF)."""
    dot = F.aggregate(F.zip_with(vec_a, vec_b, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(vec_a, lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(vec_b, lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame, query_vec: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query, scan once, global top-k
    (Spark's takeOrdered under orderBy+limit — no full sort materialized)."""
    dv = F.transform(vec_col, lambda x: x.cast("double"))
    cand = emb.crossJoin(F.broadcast(query_vec.select(F.col(vec_col).alias("_q"))))
    qv = F.transform("_q", lambda x: x.cast("double"))
    return (
        cand.select(F.col(id_col), cosine_sim(dv, qv).alias("cos"))
        .orderBy(F.col("cos").desc(), id_col)
        .limit(k)
    )


def lsh_hyperplane_buckets(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH signature (the IVF-style scale path for ANN):
    plane p, component i has deterministic pseudo-random weight derived from
    xxhash64(p, i) mapped to [-1, 1]. Vectors in the same bucket are the
    candidate set — search touches one bucket instead of the corpus."""
    dv = F.transform(vec_col, lambda x: x.cast("double"))
    bits = []
    for p in range(n_planes):
        # deterministic weight for (p, i): hash → [-1, 1]
        proj = F.aggregate(
            F.zip_with(
                dv,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i, p=p: (F.pmod(F.xxhash64(i, F.lit(p)), F.lit(2001)) - 1000.0) / 1000.0,
                ),
                lambda a, w: a * w,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** p))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.select(F.col(id_col), F.col(vec_col), bucket.cast("int").alias("bucket"))


def ann_bucketed_topk(
    emb: DataFrame, query_vec: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 10, n_planes: int = 8, dim: int = 64,
) -> DataFrame:
    """ANN: hash the query into its LSH bucket, rank only that bucket.
    Approximate (recall < 1) but the scan is 1/2^n_planes of the corpus."""
    buckets = lsh_hyperplane_buckets(emb, id_col, vec_col, n_planes, dim)
    qb = lsh_hyperplane_buckets(query_vec.select(F.lit(-1).alias(id_col), F.col(vec_col)),
                                id_col, vec_col, n_planes, dim)
    cand = buckets.join(F.broadcast(qb.select(F.col("bucket").alias("_qb"))),
                        F.col("bucket") == F.col("_qb"))
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)
