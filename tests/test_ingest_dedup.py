"""Dedup-on-ingest (operators/ingest_dedup.py): per-batch decisions against
a persisted signature index, index delta append, and parity between the
index-reuse path and recompute-from-scratch."""

import pytest
from pyspark.sql import Row, functions as F

from py_mongo_sync_spark.operators.ingest_dedup import (
    ingest_batch,
    ingest_decisions,
)
from py_mongo_sync_spark.operators.neardup import banded_signature_rows

BASE = "the quick brown fox jumps over the lazy dog again and again today "
OTHER = "completely unrelated content about spark shuffles and parquet files "


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


@pytest.fixture(scope="module")
def corpus(spark):
    seen = _docs(spark, [
        (1, BASE * 4),
        (2, OTHER * 4),
        (3, "a third seen document with its own distinct words entirely " * 4),
    ])
    # 10: near-copy of seen doc 1; 11: novel; 12/13: near-identical batch
    # peers (12 < 13, so 13 is the rejected one under the union policy)
    new = _docs(spark, [
        (10, BASE * 4 + "tiny tail"),
        (11, "fresh novel text that matches nothing already ingested here " * 4),
        (12, OTHER * 4 + "suffix one"),
        (13, OTHER * 4 + "suffix two"),
    ])
    return seen, new


def test_decisions_flag_seen_and_batch_dups(corpus):
    seen, new = corpus
    d = {r["doc_id"]: r for r in ingest_decisions(new, seen).collect()}
    assert set(d) == {10, 11, 12, 13}
    assert d[10]["is_dup"] and d[10]["dup_of"] == 1
    assert not d[11]["is_dup"] and d[11]["dup_of"] is None
    # 12 matches seen doc 2; 13 matches both doc 2 and its peer 12 —
    # dup_of is the minimum matching id
    assert d[12]["is_dup"] and d[12]["dup_of"] == 2
    assert d[13]["is_dup"] and d[13]["dup_of"] == 2 and d[13]["n_matches"] == 2


def test_index_delta_is_novel_docs_only(corpus):
    seen, new = corpus
    decisions, delta = ingest_batch(new, seen)
    assert set(r["_id"] for r in delta.select("_id").distinct().collect()) == {11}
    # 8 bands per doc
    assert delta.count() == 8


def test_second_batch_dedups_against_first_batch_novel(spark, corpus):
    seen, new = corpus
    _, delta = ingest_batch(new, seen)
    seen_bands = banded_signature_rows(seen, "doc_id", "text").unionByName(delta)
    seen_docs2 = seen.unionByName(new.where("doc_id = 11"))
    new2 = _docs(spark, [
        (20, "fresh novel text that matches nothing already ingested here " * 4
             + "plus"),
        (21, "never seen words describing watermarks and stateful sessions " * 4),
    ])
    d = {r["doc_id"]: r for r in
         ingest_decisions(new2, seen_docs2, seen_bands=seen_bands).collect()}
    assert d[20]["is_dup"] and d[20]["dup_of"] == 11
    assert not d[21]["is_dup"]


def test_index_reuse_path_equals_recompute(corpus):
    seen, new = corpus
    precomputed = banded_signature_rows(seen, "doc_id", "text")
    a = ingest_decisions(new, seen).orderBy("doc_id").collect()
    b = (ingest_decisions(new, seen, seen_bands=precomputed)
         .orderBy("doc_id").collect())
    assert a == b


def test_mega_bucket_caps_to_representative(spark):
    # 80 identical seen docs collapse every band bucket past max_bucket=64:
    # the new doc must still be flagged (via the min-id representative) and
    # candidate fan-out stays O(1) per band, not O(bucket)
    seen = _docs(spark, [(i, BASE * 4) for i in range(80)])
    new = _docs(spark, [(100, BASE * 4 + "x")])
    d = ingest_decisions(new, seen).collect()
    assert d[0]["is_dup"] and d[0]["dup_of"] == 0
    # only the representative was compared: one match, not 80
    assert d[0]["n_matches"] == 1
