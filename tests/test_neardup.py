"""Near-dup decision stage: capped candidates → Jaccard verify →
connected components → keep-one. Brute-force oracles in pandas."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from py_mongo_sync_spark.operators.neardup import (
    banded_signature_rows,
    capped_candidate_pairs,
    connected_components_min_label,
    neardup_clusters,
    verify_pairs_jaccard,
)

BASE_A = "the quick brown fox jumps over the lazy dog near the river bank today"
BASE_B = "spark shuffles partition data across executors during wide transformations"

DOCS = [
    (0, BASE_A),
    (1, BASE_A + " extra"),
    (2, BASE_A.replace("dog", "cat")),
    (3, BASE_A.replace("today", "tonight")),
    (4, BASE_B),
    (5, BASE_B.replace("data", "rows")),
    (6, "completely unrelated text about cooking pasta with garlic and olive oil"),
    (7, "another lone document mentioning databases and indexes and nothing else"),
]


def _shingle_set(text: str, k: int = 5) -> set[str]:
    n = max(len(text) - (k - 1), 1)
    return {text[i:i + k] for i in range(n)}


def _brute_clusters(docs, threshold_pct=80, k=5):
    sets = {i: _shingle_set(t, k) for i, t in docs}
    parent = {i: i for i, _ in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * 100 >= threshold_pct * union:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i, _ in docs}


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_clusters_match_bruteforce(spark, docs):
    expect = _brute_clusters(DOCS)
    got = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in neardup_clusters(docs, "doc_id", "text").collect()}
    assert {i: c for i, (c, _) in got.items()} == expect
    # keep == is-cluster-min, exactly one keeper per cluster
    for i, (c, keep) in got.items():
        assert keep == (i == c)
    keepers = {c for _, (c, _) in got.items()}
    assert all(got[c][1] for c in keepers)


def test_bucket_cap_drops_nothing_at_fixture_scale(spark, docs):
    """max_bucket=1 forces EVERY multi-doc bucket onto representative
    edges; the decision must still match brute force (representatives are
    cluster minima here, and verification passes within families)."""
    expect = _brute_clusters(DOCS)
    got = {r["doc_id"]: r["cluster_id"]
           for r in neardup_clusters(
               docs, "doc_id", "text", max_bucket=1, warn_oversized=False
           ).collect()}
    assert got == expect


def test_capped_pairs_emit_linear_edges_for_big_buckets(spark):
    """A 30-doc identical-text cluster: uncapped emits C(30,2)=435 pairs,
    capped at 8 emits the 29 representative edges — O(c), not O(c²)."""
    rows = [(i, "identical boilerplate text repeated everywhere") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    banded = banded_signature_rows(df, "doc_id", "text")
    pairs, stats = capped_candidate_pairs(banded, max_bucket=8)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(0, i) for i in range(1, 30)}
    st = stats.collect()
    assert len(st) == 8 and all(r["n_docs"] == 30 for r in st)  # telemetry

    # and with the cap above the bucket size: the full pair set
    pairs2, stats2 = capped_candidate_pairs(banded, max_bucket=64)
    assert pairs2.count() == 435 and stats2.count() == 0


def test_verification_kills_lsh_false_positive(spark):
    """A pair that collides in a band but fails exact Jaccard must not
    survive verification."""
    df = spark.createDataFrame(
        [(0, "abcde" * 4), (1, "vwxyz" * 4)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    assert verify_pairs_jaccard(df, pairs, "doc_id", "text").count() == 0


def test_components_handle_chains_and_isolated(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # driver short-circuit (small side) and distributed loop must agree
    got = {r["node"]: r["cluster_id"]
           for r in connected_components_min_label(edges).collect()}
    assert got == want
    got_loop = {r["node"]: r["cluster_id"]
                for r in connected_components_min_label(
                    edges, driver_threshold=0).collect()}
    assert got_loop == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def random_edge_sets(draw):
    n_nodes = draw(st.integers(min_value=2, max_value=24))
    n_edges = draw(st.integers(min_value=0, max_value=30))
    edges = [
        tuple(sorted(draw(st.tuples(
            st.integers(0, n_nodes - 1), st.integers(0, n_nodes - 1)))))
        for _ in range(n_edges)
    ]
    return [(a, b) for a, b in edges if a != b]


@settings(
    max_examples=4, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(random_edge_sets())
def test_components_match_union_find_on_random_graphs(spark, edges):
    """Property: min-label propagation equals union-find on ANY edge set —
    including duplicate edges, chains, cycles, and dense blobs."""
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    # property holds for BOTH tiers: driver union-find and the
    # distributed pointer-doubling loop
    got = {r["node"]: r["cluster_id"]
           for r in connected_components_min_label(df, max_rounds=10).collect()}
    assert got == expect
    got_loop = {r["node"]: r["cluster_id"]
                for r in connected_components_min_label(
                    df, max_rounds=10, driver_threshold=0).collect()}
    assert got_loop == expect


def test_long_chain_many_rounds_does_not_blow_up_plan(spark):
    """Regression for the round-3 driver OOM: the pointer-doubling loop used
    bare persist(), which caches data but keeps the logical plan — the plan
    tree grew ~4x per round and plan stringification alone exhausted an
    8 GiB driver heap by round ~7, on ANY data size. With per-round eager
    localCheckpoint the plan is truncated each round, so a 2000-node chain
    (needs ~13 rounds WITH doubling engaged; plain hops would need 2000)
    must converge on the distributed tier without driver distress."""
    n = 2000
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    got = connected_components_min_label(
        edges, max_rounds=20, driver_threshold=0
    )
    agg = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("k"),
        F.max("cluster_id").alias("mx"),
    ).first()
    assert agg["n"] == n and agg["k"] == 1 and agg["mx"] == 0


def test_containment_catches_quoted_small_doc_jaccard_misses(spark):
    from py_mongo_sync_spark.operators.neardup import (
        verify_pairs_containment,
        verify_pairs_jaccard,
    )

    small = "please restart the ingestion job and confirm the watermark advanced"
    filler = " now for something completely different padding words " * 20
    docs = spark.createDataFrame(
        [(1, small), (2, f"earlier context {filler} quoted reply: {small}")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    # doc 1's shingles are (almost) all inside doc 2 -> containment ~1,
    # but Jaccard ~ |small|/|big| is far below any dedup threshold
    cont = verify_pairs_containment(docs, pairs, "doc_id", "text",
                                    threshold_pct=90).collect()
    jac = verify_pairs_jaccard(docs, pairs, "doc_id", "text",
                               threshold_pct=80).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in cont] == [(1, 2)]
    assert jac == []


def test_rare_shingle_candidates_find_small_doc_quoted_in_huge_doc(spark):
    """The containment recall hole, closed: a ~30-word doc quoted verbatim
    inside a ~3,000-word doc has Jaccard ≈ 1%, so MinHash banding (which
    estimates Jaccard) misses the pair — but the rare-shingle inverted
    index MUST surface it, and the containment verify must confirm it."""
    from py_mongo_sync_spark.operators.neardup import (
        rare_shingle_candidate_pairs,
        verify_pairs_containment,
    )

    small = ("a peculiar quarantined zebra vexed jumbled sphinxes while "
             "quirky fjords buzzed gnomically beyond wizardly xylophones "
             "jackdaws quiz vows exempt frozen glyphs mixed up plus seven "
             "more oddly unique tokens")
    assert 25 <= len(small.split()) <= 35
    filler = " ".join(
        f"filler{i} common words about ordinary things number {i} and text"
        for i in range(300)
    )
    big = filler + " " + small + " " + filler.replace("filler", "other")
    assert len(big.split()) >= 3000
    others = [
        (i, f"unrelated doc {i} " + " ".join(f"tok{i}_{j}" for j in range(40)))
        for j in range(1) for i in range(10, 20)
    ]
    docs = spark.createDataFrame([(1, small), (2, big)] + others,
                                 ["doc_id", "text"])

    banded = banded_signature_rows(docs, "doc_id", "text")
    band_pairs, _ = capped_candidate_pairs(banded)
    # the premise: bands alone do NOT carry the extreme-ratio pair
    assert (1, 2) not in {(r.doc_a, r.doc_b) for r in band_pairs.collect()}

    rare = rare_shingle_candidate_pairs(docs, "doc_id", "text")
    assert (1, 2) in {(r.doc_a, r.doc_b) for r in rare.collect()}

    pairs = band_pairs.unionByName(rare).distinct()
    hits = verify_pairs_containment(docs, pairs, "doc_id", "text",
                                    k=5, threshold_pct=90)
    assert (1, 2) in {(r.doc_a, r.doc_b) for r in hits.collect()}


def test_rare_shingle_overflow_is_counted_not_silent(spark):
    """Shingles above max_df are dropped as candidates but COUNTED."""
    from py_mongo_sync_spark.operators.neardup import rare_shingle_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "identical everywhere " * 3) for i in range(12)]
        + [(100, "a lone different document about nothing shared at all")],
        ["doc_id", "text"],
    )
    pairs, stats = rare_shingle_candidate_pairs(
        docs, "doc_id", "text", max_df=8, with_stats=True
    )
    assert pairs.count() == 0          # every shared shingle is over-cap
    assert stats.count() > 0           # ...and each drop is visible
    assert stats.agg(F.min("df")).first()[0] > 8
