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

    def _seeded(i: int):
        # closure factory, NOT a default-arg lambda (pyspark would read the
        # default as a second (index) parameter and bind i to the index,
        # collapsing every family member to the same hash)
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(sh, _seeded(i))) for i in range(n_hashes)]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become a candidate
    pair. Cost profile at scale: shingles explode once, ONE xxhash64 per
    shingle row, ``n_hashes`` affine-mod min-aggregates in a single groupBy
    (the hash runs once per shingle — an array-transform form inlines and
    re-evaluates it per seed, measured 3× slower), one explode (×bands),
    one shuffle on (band, band_hash) — no all-pairs join.
    Rows: (doc_a, doc_b, n_bands_matched)."""
    rows_per_band = n_hashes // bands
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(par, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(char_shingles(text_col, k)).alias("_s"),
    ).withColumn("_h", F.xxhash64("_s").bitwiseAND(F.lit(0xFFFFFFFF)))
    aggs = []
    for i in range(n_hashes):
        a, b = minhash_affine_params(i)
        aggs.append(F.min(_affine_mod(F.col("_h"), a, b)).alias(f"m{i}"))
    sig = sh.groupBy("_id").agg(*aggs)
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
                                *[F.col(f"m{b * rows_per_band + r}").cast("string")
                                  for r in range(rows_per_band)],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", F.col("bb.bhash").alias("bkey"))
    return _banded_pairs(banded, max_bucket)


def _banded_pairs(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """Self-join band-bucket rows → (doc_a, doc_b, n_bands_matched).
    ``max_bucket`` guards mega-buckets: a near-identical boilerplate
    cluster of c docs would otherwise emit O(c²) pairs from ONE bucket
    (at web scale single buckets hold 10⁵+ docs); oversized buckets emit
    member↔bucket-min representative edges instead — O(c), connectivity
    preserved for downstream clustering (operators/neardup.py verifies and
    clusters; its capped_candidate_pairs also returns the overflow stats).
    None = uncapped (the oracle-parity shape).

    ``banded`` is persisted first: both legs of the self-join (and, when
    capped, the bucket-size aggregate) reference it, and ReuseExchange
    does not collapse self-references after alias dedup rewrites exprIds
    (neardup._pin) — unpinned, the whole shingle+minhash signing subtree
    executed once per reference (measured ~2× query wall on
    minhash_neardup at sf1.0)."""
    banded = banded.persist()
    if max_bucket is not None:
        sizes = banded.groupBy("band", "bkey").agg(
            F.count(F.lit(1)).alias("_n"), F.min("_id").alias("_rep")
        )
        tagged = banded.join(sizes, ["band", "bkey"])
        small = tagged.where(F.col("_n") <= max_bucket)
        a, b = small.alias("a"), small.alias("b")
        small_pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a._id") < F.col("b._id")),
        ).select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        big_pairs = tagged.where(
            (F.col("_n") > max_bucket) & (F.col("_id") != F.col("_rep"))
        ).select(F.col("_rep").alias("doc_a"), F.col("_id").alias("doc_b"))
        return (
            small_pairs.unionByName(big_pairs)
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_bands_matched"))
        )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a._id") < F.col("b._id")),
    )
    return (
        pairs.groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_matched"))
    )


def md5_long(col, hexchars: int = 15):
    """First ``hexchars`` hex digits of md5 as a non-negative long — the
    cross-engine deterministic hash (identical in DuckDB as
    ``('0x'||substr(md5(x),1,n))::BIGINT``; Spark's xxhash64 has no DuckDB
    twin). 15 hex chars = 60 bits, 8 = 32 bits."""
    return F.conv(F.substring(F.md5(col), 1, hexchars), 16, 10).cast("long")


#: Mersenne prime 2^31 - 1 — modulus of the universal hash family
#: ((a*h + b) mod P). Inlined verbatim into the DuckDB oracle SQL.
MINHASH_PRIME = 2_147_483_647


def minhash_affine_params(i: int) -> tuple[int, int]:
    """Seed-i universal-hash params for ((a*h + b) mod MINHASH_PRIME) over
    the 32-bit base hash: odd multiplier < 2^26 keeps products < 2^58 (no
    signed-64 overflow). The modular reduction is essential — WITHOUT it,
    min(a*h + b) = a*min(h) + b for a > 0, so every signature component is
    a monotone function of the single value min(h), all bands match or
    none, and band/row tuning is a no-op (round-2 ADVICE high finding).
    The same constants are inlined into the DuckDB oracle SQL."""
    return 999_983 * (2 * i + 1), 7_919 * i + 13


def _affine_mod(h, a: int, b: int):
    """((a*h + b) mod P) as a JVM column expression; h, a, b ≥ 0 so pmod
    and DuckDB's ``%`` agree exactly."""
    return F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_PRIME))


def minhash_signatures_md5(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, k: int = 5
) -> DataFrame:
    """Oracle-parity MinHash signatures: explode shingles once, ONE md5 per
    shingle row, then ``n_hashes`` cheap affine min-aggregates in a single
    groupBy — the md5 digest runs exactly once per shingle (a nested
    array-transform form would inline and re-evaluate it per seed: measured
    17× slower). Exact integer math in both engines; the xxhash64 variant
    above stays the production path. Returns one row per doc with columns
    ``m0..m{n-1}``."""
    # spread docs over the cluster BEFORE the explode: a single parquet file
    # otherwise serializes the whole shingle+digest stage into one task
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(par, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(char_shingles(text_col, k)).alias("_s"),
    ).withColumn("_h", md5_long(F.col("_s"), 8))
    aggs = []
    for i in range(n_hashes):
        a, b = minhash_affine_params(i)
        aggs.append(F.min(_affine_mod(F.col("_h"), a, b)).alias(f"m{i}"))
    return sh.groupBy("_id").agg(*aggs)


def minhash_signatures_from_hashes(
    dsh: DataFrame, id_col: str = "_id", hash_col: str = "h",
    n_hashes: int = 16,
) -> DataFrame:
    """Oracle-parity MinHash signatures from pre-hashed ``(doc, h)`` rows —
    the sharing form of :func:`minhash_signatures_md5` for callers that
    already hold the per-doc 32-bit shingle-hash set (e.g. the rare-shingle
    inverted index). min over each affine family member is identical on the
    multiset and on the distinct set (duplicates never change a min), so
    the signatures are bit-for-bit those of the explode path — verified
    against :func:`minhash_signatures_md5` on the full corpus. Saves one
    entire shingle-explode + md5 pass when a query needs both the banding
    and the shingle-hash index (guide §1.2 step 1: don't compute twice)."""
    aggs = []
    for i in range(n_hashes):
        a, b = minhash_affine_params(i)
        aggs.append(F.min(_affine_mod(F.col(hash_col), a, b)).alias(f"m{i}"))
    return dsh.groupBy(F.col(id_col).alias("_id")).agg(*aggs)


def minhash_candidate_pairs_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 8,
    k: int = 5,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding over the md5 signature; band key = the concatenated
    band rows themselves (no extra hash → byte-identical across engines).
    Same shuffle shape (and same ``max_bucket`` mega-bucket guard) as
    :func:`minhash_candidate_pairs`."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures_md5(df, id_col, text_col, n_hashes, k)
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"m{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bkey")
    return _banded_pairs(banded, max_bucket)


def simhash_fingerprints_md5(
    df: DataFrame, id_col: str, text_col: str, bits: int = 48
) -> DataFrame:
    """Oracle-parity SimHash: md5-based token hash (60 bits), 48-bit
    signature (stays clear of the signed-64 sign bit so the DuckDB oracle
    can rebuild it with plain integer sums). Same single-shuffle shape as
    :func:`simhash_fingerprints`."""
    par = df.sparkSession.sparkContext.defaultParallelism
    tok = df.repartition(par, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("_t"),
    ).withColumn("_h", md5_long(F.col("_t"), 15))
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
    return agg.select(F.col("_id").alias(id_col), sig.alias(f"simhash{bits}"))


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: explode tokens once, one groupBy with a
    sum per bitplane (single shuffle; all whole-stage-codegen expressions).
    Bitplane b votes +1/-1 by bit b of xxhash64(token)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    tok = df.repartition(par, id_col).select(
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


def _chunk_exprs(sig_col: str, bits: int, n_chunks: int) -> list:
    """Per-chunk value expressions for an even split of ``bits``."""
    base, rem = divmod(bits, n_chunks)
    widths = [base + (1 if i < rem else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    return [
        F.shiftright(F.col(sig_col), offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))
        for i in range(n_chunks)
    ]


def hamming_neardup_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    two_level: bool | None = None,
) -> DataFrame:
    """SimHash near-dup join with GUARANTEED recall, then exact-hamming
    verification via ``bit_count(xor)``. Blocked join, never all-pairs.

    Single-level: block on ``max_hamming + 1`` chunks — a pair within the
    radius differs in at most ``max_hamming`` chunks, so by pigeonhole it
    agrees on ≥ 1 chunk. Chunk width = ``bits // (max_hamming + 1)``; at
    radius 3 over 64 bits the blocks are 16-bit (65k values), fine enough.

    Two-level (auto when chunk width would drop below 8 bits, i.e. radius
    ≳ 7): block on CHUNK-PAIR keys over ``max_hamming + 2`` chunks — the
    pair then agrees on ≥ 2 chunks, so at least one of the C(m, 2) pair
    keys matches (pigeonhole again), and each key carries two chunks' bits:
    at radius 8 over 64 bits that's ~13-bit keys instead of 7-bit ones —
    ~64× finer blocking for ~4.5× more blocking rows. Both levels return
    IDENTICAL pairs (recall is guaranteed either way); two-level only
    shrinks the pre-verification candidate set at corpus scale.
    """
    if two_level is None:
        two_level = bits // (max_hamming + 1) < 8
    if two_level:
        n_chunks = max_hamming + 2
        if n_chunks > bits:
            raise ValueError(f"max_hamming={max_hamming} needs more chunks than {bits} bits")
        cexp = _chunk_exprs(sig_col, bits, n_chunks)
        import itertools

        keys = F.array(*[
            F.struct(
                F.lit(i * n_chunks + j).alias("chunk"),
                # both chunk values packed into one 64-bit key (each < 2^32)
                (F.shiftleft(cexp[i], 32).bitwiseOR(cexp[j])).alias("cval"),
            )
            for i, j in itertools.combinations(range(n_chunks), 2)
        ])
    else:
        n_chunks = max_hamming + 1
        if n_chunks > bits:
            raise ValueError(f"max_hamming={max_hamming} needs more chunks than {bits} bits")
        cexp = _chunk_exprs(sig_col, bits, n_chunks)
        keys = F.array(*[
            F.struct(F.lit(i).alias("chunk"), cexp[i].alias("cval"))
            for i in range(n_chunks)
        ])
    # persisted: both legs of the blocked self-join reference it, and each
    # unpinned reference re-runs the upstream SimHash signing (same
    # exprId/ReuseExchange trap as _banded_pairs above)
    blocked = sig_df.select(
        F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"), F.explode(keys).alias("c")
    ).select("_id", "_sig", "c.chunk", "c.cval").persist()
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


def hamming_candidate_count(
    sig_df: DataFrame, id_col: str, sig_col: str,
    max_hamming: int, bits: int = 64, two_level: bool | None = None,
) -> int:
    """Distinct pre-verification candidate pairs the blocking scheme emits
    — the cost metric two-level blocking exists to shrink."""
    if two_level is None:
        two_level = bits // (max_hamming + 1) < 8
    # the candidate set is the blocked join WITHOUT the hamming filter
    n_chunks = max_hamming + (2 if two_level else 1)
    cexp = _chunk_exprs(sig_col, bits, n_chunks)
    if two_level:
        import itertools

        keys = F.array(*[
            F.struct(F.lit(i * n_chunks + j).alias("chunk"),
                     (F.shiftleft(cexp[i], 32).bitwiseOR(cexp[j])).alias("cval"))
            for i, j in itertools.combinations(range(n_chunks), 2)
        ])
    else:
        keys = F.array(*[
            F.struct(F.lit(i).alias("chunk"), cexp[i].alias("cval"))
            for i in range(n_chunks)
        ])
    blocked = sig_df.select(
        F.col(id_col).alias("_id"), F.explode(keys).alias("c")
    ).select("_id", "c.chunk", "c.cval")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id"), F.col("b._id")).distinct().count()
    )


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
    n_planes: int = 8, dim: int = 64, weight_mode: str = "xxhash",
) -> DataFrame:
    """Random-hyperplane LSH signature (the IVF-style scale path for ANN):
    plane p, component i has deterministic pseudo-random weight derived from
    hash(p, i) mapped to [-1, 1]. Vectors in the same bucket are the
    candidate set — search touches one bucket instead of the corpus.
    ``weight_mode='md5'`` derives weights from md5 instead of xxhash64 so a
    DuckDB oracle can rebuild the identical buckets."""
    dv = F.transform(vec_col, lambda x: x.cast("double"))

    def _weight_fn(p: int):
        # closure factory — a `lambda i, p=p:` would be introspected as a
        # 2-arg (element, index) lambda, binding p to the INDEX column and
        # collapsing every plane to the same hyperplane (r1 latent bug)
        def w(i):
            if weight_mode == "md5":
                h = md5_long(F.concat(F.lit(f"{p},"), i.cast("string")), 8)
                return (h % 2001 - 1000.0) / 1000.0
            return (F.pmod(F.xxhash64(i, F.lit(p)), F.lit(2001)) - 1000.0) / 1000.0

        return w

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                dv,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _weight_fn(p)),
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


def _stride_centroids(emb, id_col, vec_col, k_centroids):
    """k deterministic hash-sampled corpus vectors: order by md5(id) and
    take the first k — a uniform pseudo-random spread over the corpus
    (lowest-k ids would all come from one id range) that runs as a
    distributed TakeOrdered top-k, NOT a global-window row_number (which
    funnels the whole corpus through one partition — a scale killer), and
    that a SQL oracle reproduces bit-for-bit (md5, not xxhash). The k rows
    are MATERIALIZED and rebuilt as a fresh DataFrame — a centroid set
    sharing lineage with the corpus it joins against makes the assignment
    window's column references resolve ambiguously (self-join attribute
    dedup silently bound partitionBy to the wrong leg, producing garbage
    assignments); it is broadcast anyway."""
    rows = (
        emb.orderBy(md5_long(F.col(id_col).cast("string"), 8), id_col)
        .limit(k_centroids)
        .select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
        .collect()
    )
    return emb.sparkSession.createDataFrame(
        [(r["_cid"], r["_cvec"]) for r in rows],
        "_cid long, _cvec array<double>",
    )


def train_ivf_centroids(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k_centroids: int = 16, n_iter: int = 3,
) -> DataFrame:
    """Distributed Lloyd (k-means) refinement of the hash-sampled init —
    the trained quantizer that completes the IVF story. Each round:
    broadcast the current centroids → nearest-cosine assignment over the
    corpus → per-cluster elementwise mean via posexplode + one
    groupBy(cluster, pos) — fully distributed, no driver data motion —
    then the ≤ ``k_centroids`` mean rows are collected (bounded by a
    structural constant, never corpus size) and rebuilt as a fresh frame
    so the per-round plan stays flat. Clusters that lose all members keep
    their previous centroid. Deterministic end to end: init is the md5
    stride sample, assignment ties break on centroid id."""
    cents = _stride_centroids(emb, id_col, vec_col, k_centroids)
    spark = emb.sparkSession
    for _ in range(n_iter):
        asg = ivf_assignments(emb, id_col, vec_col, k_centroids,
                              centroids=cents)
        means = (
            asg.select(
                "centroid_id",
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("_pos", "_x"),
            )
            .groupBy("centroid_id", "_pos").agg(F.avg("_x").alias("_m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm"))
            .select(
                F.col("centroid_id").alias("_cid"),
                F.transform("_pm", lambda s: s["_m"]).alias("_cvec"),
            )
        )
        got = {r["_cid"]: r["_cvec"] for r in means.collect()}
        merged = [(r["_cid"], got.get(r["_cid"], r["_cvec"]))
                  for r in cents.collect()]
        cents = spark.createDataFrame(merged, "_cid long, _cvec array<double>")
    return cents


def ivf_assignments(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k_centroids: int = 16, centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer: every vector assigned to its nearest-cosine
    centroid. Centroids are ``k_centroids`` id-ordered STRIDE-spaced corpus
    vectors — deterministic (no RNG, no iterative k-means: at 100 TB you
    run a real trained quantizer offline; the INDEX STRUCTURE — assignment
    join, inverted lists, probe path — is identical and is what this
    implements) and spread across the corpus (the lowest-k ids would all
    come from one id-range/cluster and fragment its inverted lists).
    Assignment is a broadcast join against the tiny centroid set + one
    row_number per vector; ties break on centroid id. ``centroids``
    (``(_cid long, _cvec array<double>)``, e.g. from
    :func:`train_ivf_centroids` or threaded through by :func:`ivf_topk`)
    overrides the stride sample."""
    from pyspark.sql import Window

    cents = centroids if centroids is not None else _stride_centroids(
        emb, id_col, vec_col, k_centroids)
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cv = F.transform(F.col("_cvec"), lambda x: x.cast("double"))
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("_cid"))
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("_cos", cosine_sim(dv, cv))
        .withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .select(id_col, vec_col, F.col("_cid").alias("centroid_id"))
    )


def ivf_topk(
    emb: DataFrame, query_vec: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 10, k_centroids: int = 16,
    nprobe: int = 2, centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN (the second scale path next to hyperplane LSH): rank
    the query against the centroids, scan only the ``nprobe`` nearest
    centroids' inverted lists (~nprobe/k_centroids of the corpus), exact
    cosine rerank inside. Raising nprobe trades scan for recall exactly
    like LSH multiprobe. The centroid set is computed ONCE and threaded
    into both the probe ranking and the assignment (it used to be sampled
    twice: two orderBy+collect jobs per query); pass
    ``centroids=train_ivf_centroids(...)`` for the Lloyd-trained
    quantizer."""
    from pyspark.sql import Window

    cents = centroids if centroids is not None else _stride_centroids(
        emb, id_col, vec_col, k_centroids)
    asg = ivf_assignments(emb, id_col, vec_col, k_centroids, centroids=cents)
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cv = F.transform(F.col("_cvec"), lambda x: x.cast("double"))
    w = Window.orderBy(F.col("_qcos").desc(), F.col("_cid"))
    probed = (
        query_vec.crossJoin(F.broadcast(cents))
        .withColumn("_qcos", cosine_sim(qv, cv))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .select(F.col("_cid").alias("_probe_cid"))
    )
    cand = asg.join(F.broadcast(probed),
                    asg["centroid_id"] == F.col("_probe_cid"))
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


def cosine_neardup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.4, n_planes: int = 6, dim: int = 64,
    weight_mode: str = "xxhash", max_bucket: int = 256,
    with_stats: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family (exact / MinHash / SimHash / n-gram / THIS): vectors
    sharing an LSH hyperplane bucket are candidates (1/2^n_planes of the
    pair space — never all-pairs), then exact cosine ≥ ``threshold``
    verifies. Same candidate-then-verify shape as the text near-dup path;
    recall is bucket-limited exactly like single-probe ANN (borderline
    pairs split by a hyperplane are the loss — raise recall by lowering
    ``n_planes`` or unioning plane-flip bucket variants).

    Mega-bucket guard (same as the MinHash path's): a bucket larger than
    ``max_bucket`` emits one edge per member to the bucket's min-id
    representative — O(c) instead of the O(c²) self-join that a clustered
    corpus funneling 10⁷ vectors into one of 2^n_planes buckets would
    otherwise explode into. Oversized buckets are COUNTED, not silently
    truncated: ``with_stats=True`` returns ``(pairs, stats)`` where stats
    has one row ``(bucket, n_vecs)`` per oversized bucket.
    Rows: (vec_a, vec_b, cos_sim)."""
    # pinned: `buckets` feeds the size aggregate, the tag join and the
    # representative lookup; `tagged` feeds both self-join legs and the
    # oversized filter — each unpinned reference re-runs the hyperplane
    # projections (the exprId/ReuseExchange trap, operators/neardup.py::_pin)
    buckets = lsh_hyperplane_buckets(emb, id_col, vec_col, n_planes, dim, weight_mode).persist()
    sizes = buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_rep")
    )
    tagged = buckets.join(sizes, "bucket").persist()
    a = tagged.where(F.col("_n") <= max_bucket).alias("a")
    b = tagged.where(F.col("_n") <= max_bucket).alias("b")
    small = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("_ia"), F.col(f"a.{vec_col}").alias("_va"),
        F.col(f"b.{id_col}").alias("_ib"), F.col(f"b.{vec_col}").alias("_vb"),
    )
    # representative edges: the rep is the bucket min, so rep < member holds
    # and the (vec_a < vec_b) orientation is preserved without a sort
    reps = buckets.select(
        F.col("bucket").alias("_rb"), F.col(id_col).alias("_rid"),
        F.col(vec_col).alias("_rvec"),
    )
    big = tagged.where((F.col("_n") > max_bucket) & (F.col(id_col) != F.col("_rep")))
    big_pairs = big.join(
        reps, (big["bucket"] == reps["_rb"]) & (big["_rep"] == reps["_rid"])
    ).select(
        F.col("_rep").alias("_ia"), F.col("_rvec").alias("_va"),
        F.col(id_col).alias("_ib"), F.col(vec_col).alias("_vb"),
    )
    da = F.transform(F.col("_va"), lambda x: x.cast("double"))
    db = F.transform(F.col("_vb"), lambda x: x.cast("double"))
    cos = cosine_sim(da, db)
    pairs = (
        small.unionByName(big_pairs)
        .where(cos >= threshold)
        .select(
            F.col("_ia").alias("vec_a"),
            F.col("_ib").alias("vec_b"),
            F.round(cos, 4).alias("cos_sim"),
        )
    )
    if with_stats:
        stats = sizes.where(F.col("_n") > max_bucket).select(
            "bucket", F.col("_n").alias("n_vecs")
        )
        return pairs, stats
    return pairs


def ann_bucketed_topk(
    emb: DataFrame, query_vec: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 10, n_planes: int = 8, dim: int = 64,
    weight_mode: str = "xxhash", multiprobe: int = 0,
    max_bucket: int | None = None,
) -> DataFrame:
    """ANN: hash the query into its LSH bucket, rank only the candidate
    buckets. ``multiprobe`` is the Hamming radius of NEIGHBOR buckets also
    probed (flip ≤ that many plane bits): a vector near a hyperplane lands
    on either side with ~equal probability, so single-bucket probing loses
    exactly those borderline neighbors — multi-probe at radius r recovers
    them at the cost of scanning sum_{i<=r} C(n_planes, i) buckets instead
    of one (still ≪ corpus; radius 1 with 6 planes = 7/64 of the space).
    Measured on the sf0.01 embeddings fixture (tests/test_training_ops.py):
    recall@10 vs exact brute force rises from 0.5 (r=0) to ≥0.9 (r=1).

    ``max_bucket`` bounds the rerank set per probed bucket: an oversized
    bucket keeps only its ``max_bucket`` members with smallest md5(id) —
    a deterministic, oracle-reproducible truncation. Per-query rerank cost
    is linear in candidate count (never a pair explosion), so the cap is a
    latency bound, not a correctness guard; the window sorts CANDIDATES
    (probed buckets only), never the corpus. None = uncapped."""
    import itertools

    buckets = lsh_hyperplane_buckets(emb, id_col, vec_col, n_planes, dim, weight_mode)
    qb = lsh_hyperplane_buckets(query_vec.select(F.lit(-1).alias(id_col), F.col(vec_col)),
                                id_col, vec_col, n_planes, dim, weight_mode)
    masks = [0] + [
        sum(1 << p for p in planes)
        for r in range(1, multiprobe + 1)
        for planes in itertools.combinations(range(n_planes), r)
    ]
    probed = qb.select(
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("_qb")
    )
    cand = buckets.join(F.broadcast(probed), F.col("bucket") == F.col("_qb"))
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("bucket").orderBy(
            md5_long(F.col(id_col).cast("string"), 8), id_col
        )
        cand = (
            cand.withColumn("_mr", F.row_number().over(w))
            .where(F.col("_mr") <= max_bucket).drop("_mr")
        )
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)
