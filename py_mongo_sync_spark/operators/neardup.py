"""Near-duplicate dedup as a DECISION, not just candidate pairs.

The reference's contract is "destination equals source" after replay
(/root/reference/mongosync/mongo/syncer.py:104-123); the training-data
analogue is "corpus minus duplicates" — which needs three stages past
MinHash banding:

1. capped candidate generation — LSH band buckets, but a bucket larger
   than ``max_bucket`` emits representative edges (member ↔ bucket-min,
   O(c)) instead of all pairs (O(c²)): a web corpus's boilerplate
   mega-cluster of 10⁵ near-identical docs would otherwise emit 10¹⁰
   pairs from a single bucket. Oversized buckets are COUNTED (returned
   as stats) — no silent truncation.
2. verification — candidates are scored with EXACT shingle-set Jaccard
   (array_intersect on distinct k-gram sets, integer cross-multiplied
   threshold compare so the cut is bit-identical across engines); LSH
   false positives die here.
3. clustering — verified edges are folded to connected components by
   iterative min-label propagation with adaptive pointer doubling
   (shallow graphs pay one join + one groupBy per round; chain-shaped
   ones still converge in O(log diameter)); ``keep`` marks the minimum
   doc_id of each component — the deterministic keep-one policy.

Every shuffle is keyed on (band, bucket-key) or doc id — no all-pairs
join anywhere; stage cost is linear in corpus + candidate count.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window, functions as F

from py_mongo_sync_spark.functions.similarity import (
    char_shingles,
    md5_long,
    minhash_signatures_md5,
)


#: plan-construction counter — tests pin "the ingest path signs each
#: batch ONCE" by diffing this around apply_batch (each construction here
#: is a fresh shingle+md5 subtree that Spark cannot reuse across actions)
SIGNING_CALLS = 0


def _pin(df: DataFrame, holder: list | None) -> DataFrame:
    """Persist a frame whose lineage is referenced MORE THAN ONCE inside the
    enclosing query. Spark's ReuseExchange does NOT collapse self-references
    after alias-dedup rewrites exprIds (measured r5, comment in
    ``_candidate_shingle_sets``), so every extra reference re-executes the
    whole subtree — persisting the skinny intermediate runs it once. The
    cache fills lazily inside the same (timed) action that consumes it; no
    cross-run state. ``holder`` collects the handles so batch-loop callers
    (the streaming ingest pipeline) can unpersist after materializing —
    bounded memory on an infinite stream; query-scope callers may pass None
    (session-lifetime cache, LRU-evicted)."""
    df = df.persist()
    if holder is not None:
        holder.append(df)
    return df


def banded_signature_rows(
    df: DataFrame, id_col: str, text_col: str,
    n_hashes: int = 16, bands: int = 8, k: int = 5,
) -> DataFrame:
    """(_id, band, bkey) rows — one per doc per band — from the md5
    oracle-parity signature (functions/similarity.py)."""
    global SIGNING_CALLS
    SIGNING_CALLS += 1
    rows_per_band = n_hashes // bands
    sig = minhash_signatures_md5(df, id_col, text_col, n_hashes, k)
    return sig.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(",", *[
                        F.col(f"m{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ]).alias("bkey"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bkey")


def doc_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int = 5,
    holder: list | None = None,
) -> DataFrame:
    """Pinned distinct ``(_did, h)`` rows — h = 32-bit md5 of each char
    k-gram (the rare-shingle index domain). Built ONCE and shared: the
    MinHash banding signature derives from it bit-identically
    (functions/similarity.py::minhash_signatures_from_hashes), so a query
    needing both candidate generators pays one shingle+md5 pass instead of
    two (measured ~1.8 s of rare_shingle_containment at the 10× corpus)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return _pin(
        df.repartition(par, id_col).select(
            F.col(id_col).alias("_did"),
            F.explode(F.array_distinct(char_shingles(text_col, k))).alias("_s"),
        ).select("_did", md5_long(F.col("_s"), 8).alias("h")).distinct(),
        holder,
    )


def banded_rows_from_hashes(
    dsh: DataFrame, n_hashes: int = 16, bands: int = 8
) -> DataFrame:
    """(_id, band, bkey) band rows from a pre-built :func:`doc_shingle_hashes`
    frame — same output as :func:`banded_signature_rows` (min over the
    distinct hash set ≡ min over the shingle multiset), one corpus pass
    cheaper when the hash frame already exists."""
    from py_mongo_sync_spark.functions.similarity import (
        minhash_signatures_from_hashes,
    )

    global SIGNING_CALLS
    SIGNING_CALLS += 1
    rows_per_band = n_hashes // bands
    sig = minhash_signatures_from_hashes(dsh, "_did", "h", n_hashes)
    return sig.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(",", *[
                        F.col(f"m{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ]).alias("bkey"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bkey")


def capped_candidate_pairs(
    banded: DataFrame, max_bucket: int = 64, holder: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """Candidate (doc_a < doc_b) pairs with the mega-bucket guard.

    Buckets of size ≤ ``max_bucket``: full within-bucket self-join (cost
    bounded by max_bucket² per bucket). Larger buckets: one edge per
    member to the bucket's min id — O(c), keeps the bucket connected for
    clustering; precision is restored by Jaccard verification, and the
    (rare) member that matches another member but not the representative
    is the documented recall trade for not emitting c² pairs.

    ``banded`` is pinned (see ``_pin``): the size aggregate, the tag join
    and the two legs of the self-join all reference it, and each reference
    would otherwise re-run the whole shingle+md5 signing subtree (the
    dominant cost — measured ~2× the query wall without the pin).

    Returns (pairs, bucket_stats) where bucket_stats has one row per
    OVERSIZED bucket: (band, bkey, n_docs) — count-them telemetry.
    """
    banded = _pin(banded, holder)
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
    big = tagged.where(F.col("_n") > max_bucket)
    big_pairs = big.where(F.col("_id") != F.col("_rep")).select(
        F.col("_rep").alias("doc_a"), F.col("_id").alias("doc_b")
    )
    pairs = small_pairs.unionByName(big_pairs).distinct()
    stats = (
        sizes.where(F.col("_n") > max_bucket)
        .select("band", "bkey", F.col("_n").alias("n_docs"))
    )
    return pairs, stats


def _candidate_shingle_sets(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Shingle ONLY docs that appear in some candidate pair: a semi-join
    to the pair endpoints runs BEFORE the (expensive) shingle explode, so
    verify cost is O(candidates), not O(corpus) — after banding, verified
    candidates are normally a sliver of the corpus, and at 100 TB
    re-shingling every stored document per query is the difference
    between a point lookup and a table scan. (Same shape as the ingest
    path, operators/ingest_dedup.py — measured ~15% there; the pairs
    lineage is referenced three times in one query, which ReuseExchange
    computes once.)

    Sets are xxhash64 LONGS, not shingle strings (guide §2.3 "narrower
    types"): |A∩B| / |A∪B| over hashed sets equals the string-set value
    modulo 64-bit collisions (≲ 800²/2⁶⁵ ≈ 2·10⁻¹⁴ per pair — the same
    accepted collision class as boilerplate_profile's gram hashing),
    while each cached/joined set shrinks ~3× and the per-pair
    array_intersect compares 8-byte longs instead of hashing strings.
    The hash is INTERNAL (only inter/union/size counts survive to the
    output), so no oracle mirroring is needed and the cheapest 64-bit
    hash wins over md5's hex+conv pipeline. Verified row-identical
    against the string-set DuckDB oracle at sf0.001/0.01/0.1."""
    # both endpoints in ONE pass over pairs: the union-of-two-selects form
    # references the pairs lineage twice, and (measured) ReuseExchange does
    # NOT collapse self-references whose alias-dedup rewrote the exprIds —
    # each extra reference re-executes the whole candidate pipeline
    ids = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias(id_col)
    ).distinct()
    return df.join(ids, id_col, "left_semi").select(
        F.col(id_col).alias("_sid"),
        F.array_distinct(
            F.transform(char_shingles(text_col, k), lambda s: F.xxhash64(s))
        ).alias("_set"),
    )


def verify_pairs_jaccard(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
    k: int = 5, threshold_pct: int = 80, holder: list | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidates ONLY (never all-pairs).
    Keep iff |A∩B| * 100 ≥ threshold_pct * |A∪B| — integer cross-multiply,
    so Spark and any SQL oracle cut at exactly the same pairs.

    ``pairs`` is referenced four times in this query (endpoint-id
    extraction inside the sets subtree, the verify join, and once via each
    renamed sets leg) and ``sets_df`` twice (the doc_a and doc_b joins);
    both are pinned so the candidate generator and the candidate shingle
    explode each execute exactly once (r5 regression: the unpinned form
    re-ran the generator per reference — +15-42% on the three verify-family
    queries)."""
    pairs = _pin(pairs, holder)
    sets_df = _pin(
        _candidate_shingle_sets(df, pairs, id_col, text_col, k), holder
    )
    # Size-ratio prefilter — LOSSLESS: |A∩B| ≤ min(|A|,|B|) and
    # |A∪B| ≥ max(|A|,|B|), so J(A,B) ≤ min/max; a pair with
    # min·100 < threshold·max can NEVER pass the exact cut below, and is
    # dropped before its (wide) shingle sets are ever joined. On a
    # dup-dense corpus the banded candidates include many cross-group
    # bucket collisions of very different lengths — at sf1.0 this filter
    # kills ~60% of 31M decontamination candidates for the price of two
    # joins against a per-doc INT table (the guide §8 rule: decide with
    # small rows, move the heavy arrays only for survivors).
    sizes = sets_df.select("_sid", F.size("_set").alias("_n"))
    surv = (
        pairs.join(sizes.withColumnRenamed("_sid", "doc_a")
                   .withColumnRenamed("_n", "_na"), "doc_a")
        .join(sizes.withColumnRenamed("_sid", "doc_b")
              .withColumnRenamed("_n", "_nb"), "doc_b")
        .where(
            F.least("_na", "_nb") * 100
            >= F.lit(threshold_pct) * F.greatest("_na", "_nb")
        )
        .select("doc_a", "doc_b")
    )
    j = (
        surv.join(sets_df.withColumnRenamed("_sid", "doc_a")
                  .withColumnRenamed("_set", "_sa"), "doc_a")
        .join(sets_df.withColumnRenamed("_sid", "doc_b")
              .withColumnRenamed("_set", "_sb"), "doc_b")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    return (
        j.where(inter * 100 >= F.lit(threshold_pct) * union)
        .select("doc_a", "doc_b")
    )


def verify_pairs_containment(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
    k: int = 5, threshold_pct: int = 90, holder: list | None = None,
) -> DataFrame:
    """Exact CONTAINMENT on candidates: keep iff |A∩B| * 100 ≥
    threshold_pct * min(|A|,|B|) — the quoted-reply detector. A short
    transcript fully quoted inside a long one has containment ≈ 1 but
    Jaccard ≈ |small|/|big| (arbitrarily low), so a Jaccard cut misses it
    entirely; containment normalizes by the SMALLER set.

    Recall caveat, stated honestly: MinHash band candidates estimate
    JACCARD — a small-in-big pair with low Jaccard also has a low
    probability of sharing a band, so this verify is exact on whatever
    candidates reach it but the banded generator under-recalls extreme
    size ratios. At web scale the containment-complete generator is a
    rare-shingle inverted index or a containment sketch; within moderate
    size ratios (quoted replies, partial copies — the transcript case)
    the existing bands carry the pair and this cut classifies it
    correctly where Jaccard would not. The containment-complete candidate
    generator is :func:`rare_shingle_candidate_pairs` below — union its
    output with the banded pairs before this verify.

    ``pairs``/``sets_df`` pinning: same rationale as
    :func:`verify_pairs_jaccard`.
    """
    pairs = _pin(pairs, holder)
    sets_df = _pin(
        _candidate_shingle_sets(df, pairs, id_col, text_col, k), holder
    )
    j = (
        pairs.join(sets_df.withColumnRenamed("_sid", "doc_a")
                   .withColumnRenamed("_set", "_sa"), "doc_a")
        .join(sets_df.withColumnRenamed("_sid", "doc_b")
              .withColumnRenamed("_set", "_sb"), "doc_b")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    smaller = F.least(F.size("_sa"), F.size("_sb"))
    return (
        j.where(inter * 100 >= F.lit(threshold_pct) * smaller)
        .select("doc_a", "doc_b")
    )


def rare_shingle_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 5, n_rare: int = 4, max_df: int = 64,
    with_stats: bool = False, holder: list | None = None,
    doc_hashes: DataFrame | None = None,
):
    """Containment-COMPLETE candidate pairs via a rare-shingle inverted
    index — the recall complement to MinHash banding for extreme size
    ratios. A 30-word doc quoted inside a 3,000-word doc has Jaccard
    ≈ 1%, so it almost never shares a band; but every one of the small
    doc's shingles — including its rarest — also occurs in the quoting
    doc, so joining each doc's ``n_rare`` lowest-document-frequency
    shingles against the full posting lists of those shingles ALWAYS
    surfaces the pair (as long as at least one rare shingle stays under
    the ``max_df`` frequency cap). Union the output with the banded
    candidates and feed :func:`verify_pairs_containment`.

    Cost at scale: one distinct (doc, shingle-hash) projection (linear in
    corpus characters), one groupBy on the 32-bit hash for document
    frequency, one per-doc top-``n_rare`` window (shuffle keyed on doc
    id), and a candidate join whose posting lists are bounded by
    ``max_df`` — so pairs ≤ n_rare × max_df per doc, never quadratic.
    Shingles above ``max_df`` are dropped with COUNTED overflow (same
    no-silent-truncation policy as :func:`capped_candidate_pairs`);
    they are boilerplate by definition and useless as discriminators.

    Hashes are md5-derived 32-bit longs (functions/similarity.py::
    md5_long) so a SQL oracle reproduces candidates bit-for-bit.

    Returns pairs (doc_a < doc_b) — or (pairs, overflow_stats) when
    ``with_stats``: one row per dropped shingle hash (h, df).
    """
    # distinct (doc, h): h = 32-bit md5 of the char k-gram. Pinned: both
    # the doc-frequency aggregate and the df-cap join consume it, and the
    # unpinned form re-runs the shingle explode + md5 per reference (the
    # exprId/ReuseExchange trap, see _pin). ``doc_hashes`` lets a caller
    # that also needs the banding share ONE pinned frame for both
    # generators (see doc_shingle_hashes).
    dsh = (
        doc_hashes
        if doc_hashes is not None
        else doc_shingle_hashes(df, id_col, text_col, k, holder)
    )
    dfreq = dsh.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    # pinned: the per-doc rare-shingle window AND the posting-list side both
    # scan it
    kept = _pin(dsh.join(dfreq.where(F.col("_df") <= max_df), "h"), holder)
    # per-doc n_rare rarest shingles; (df, h) is a total order on a doc's
    # distinct hashes, so the pick is deterministic on any engine
    rare = (
        kept.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_did").orderBy("_df", "h")
            ),
        )
        .where(F.col("_rn") <= n_rare)
        .select(F.col("_did").alias("_rid"), "h")
    )
    postings = kept.select(F.col("_did").alias("_pid"), "h")
    pairs = (
        rare.join(postings, "h")
        .where(F.col("_rid") != F.col("_pid"))
        .select(
            F.least("_rid", "_pid").alias("doc_a"),
            F.greatest("_rid", "_pid").alias("doc_b"),
        )
        .distinct()
    )
    if with_stats:
        stats = dfreq.where(F.col("_df") > max_df).select("h", F.col("_df").alias("df"))
        return pairs, stats
    return pairs


def connected_components_min_label(
    edges: DataFrame, max_rounds: int = 15, double_from: int = 2,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """See :func:`_components_loop` for the distributed algorithm. Small
    edge sets (≤ ``driver_threshold``, counted first) short-circuit to a
    driver-side union-find over ONE bounded collect — the same
    small-side/large-side split as broadcast-vs-shuffle joins: after
    near-dup verification most corpora's edge sets are tiny relative to
    the corpus, and the iterative loop's per-round job latency would
    dominate. Results are identical; 0 disables the short-circuit."""
    # pin the edge set: its lineage (candidate-gen + Jaccard verify) is
    # expensive and BOTH the size probe and the chosen tier consume it —
    # unpinned, the probe and the collect would each recompute it
    persisted = edges.persist()
    try:
        return _components_dispatch(persisted, max_rounds, double_from,
                                    driver_threshold)
    finally:
        persisted.unpersist()


def _components_dispatch(
    edges: DataFrame, max_rounds: int, double_from: int, driver_threshold: int
) -> DataFrame:
    n_edges = edges.count()
    if n_edges <= driver_threshold and driver_threshold > 0:
        pairs = edges.select("doc_a", "doc_b").collect()
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in pairs:
            ra, rb = find(r["doc_a"]), find(r["doc_b"])
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        from pyspark.sql import types as T

        dt = edges.schema["doc_a"].dataType
        schema = T.StructType(
            [T.StructField("node", dt), T.StructField("cluster_id", dt)]
        )
        rows = [(n, find(n)) for n in parent]
        return edges.sparkSession.createDataFrame(rows, schema)
    return _components_loop(edges, max_rounds, double_from)


def _components_loop(
    edges: DataFrame, max_rounds: int = 15, double_from: int = 2
) -> DataFrame:
    """Min-label propagation with ADAPTIVE pointer doubling over undirected
    edges → (node, cluster_id) with cluster_id = min id of the component.
    Each round does (a) a neighbor-min hop (join + groupBy) and, from round
    ``double_from`` on, (b) a label-of-label shortcut (self-join) that
    halves the remaining propagation distance. Near-dup graphs are almost
    always shallow — the first rounds converge without (b), paying one
    join+groupBy each (measured 13.7 s vs 25.8 s for always-doubling on the
    sf0.1 documents table) — while a pathological chain still finishes in
    O(log diameter) rounds once doubling engages. The convergence probe is
    an aggregate count, not a data collect. Raises if not converged in
    ``max_rounds``."""
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    sym = sym.persist()
    # Each round's result is eagerly localCheckpoint-ed: the pointer-doubling
    # self-join references the previous labels twice (and the hop twice more),
    # so a bare persist() — which caches DATA but keeps the LOGICAL PLAN —
    # grows the plan tree ~4x per round; by round ~7 plan stringification
    # alone OOMs an 8 GiB driver regardless of data size. localCheckpoint
    # materializes to executor-local storage AND truncates lineage, so every
    # round starts from a flat leaf. (At cluster scale with executor loss,
    # swap for reliable .checkpoint() against the checkpoint dir — same call
    # shape; local mode has no executor churn.)
    labels = labels.localCheckpoint(eager=True)
    # labels only ever DECREASE, so sum(label) is a strictly-monotone
    # fixpoint detector: convergence ⇔ the sum stops falling — one cheap
    # aggregate per round instead of a join against the previous labels
    prev_sum = None
    try:
        for rnd in range(max_rounds):
            # (a) neighbor-min hop
            neigh = (
                sym.join(labels, sym["dst"] == labels["node"])
                .groupBy("src").agg(F.min("label").alias("_nl"))
            )
            hop = (
                labels.join(neigh, labels["node"] == neigh["src"], "left")
                .select(
                    "node",
                    F.least(F.col("label"), F.coalesce("_nl", F.col("label")))
                    .alias("label"),
                )
            )
            # (b) pointer doubling: label ← label's own label (only once
            # plain hops have had their chance — shallow graphs never pay)
            if rnd >= double_from:
                x, y = hop.alias("x"), hop.alias("y")
                hop = (
                    x.join(y, F.col("x.label") == F.col("y.node"), "left")
                    .select(
                        F.col("x.node").alias("node"),
                        F.least(
                            F.col("x.label"),
                            F.coalesce(F.col("y.label"), F.col("x.label")),
                        ).alias("label"),
                    )
                )
            new = hop.localCheckpoint(eager=True)
            cur_sum = new.agg(F.sum("label")).first()[0]
            labels.unpersist()
            labels = new
            if prev_sum is not None and cur_sum == prev_sum:
                return labels.select("node", F.col("label").alias("cluster_id"))
            prev_sum = cur_sum
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds"
        )
    finally:
        sym.unpersist()


def neardup_clusters(
    df: DataFrame, id_col: str, text_col: str,
    n_hashes: int = 16, bands: int = 8, k: int = 5,
    max_bucket: int = 64, threshold_pct: int = 80,
    warn_oversized: bool = True,
) -> DataFrame:
    """The full decision: every doc → (doc_id, cluster_id, keep).
    Docs in no verified pair are their own singleton cluster (keep=true);
    within a component the minimum doc_id is kept. ``corpus minus
    duplicates`` = ``where keep``."""
    banded = banded_signature_rows(df, id_col, text_col, n_hashes, bands, k)
    pairs, oversized = capped_candidate_pairs(banded, max_bucket)
    if warn_oversized:
        n_over = oversized.count()
        if n_over:
            warnings.warn(
                f"neardup_clusters: {n_over} band buckets exceeded "
                f"max_bucket={max_bucket} and used representative edges "
                "(O(c) instead of O(c^2); recall within those buckets is "
                "representative-mediated)",
                stacklevel=2,
            )
    verified = verify_pairs_jaccard(df, pairs, id_col, text_col, k, threshold_pct)
    comp = connected_components_min_label(verified)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )
