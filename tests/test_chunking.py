"""Overlapping-window chunking: full coverage, correct overlap, short-doc
identity, parameter validation."""

from __future__ import annotations

import pytest

from py_mongo_sync_spark.operators.chunking import chunk_documents


def test_chunks_cover_document_with_overlap(spark):
    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_words=10, overlap_words=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # step 7: starts at word 0, 7, 14, 21 → 4 chunks
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"].split() == words[0:10]
    assert rows[1]["chunk_text"].split() == words[7:17]      # 3-word overlap
    assert rows[3]["chunk_text"].split() == words[21:25]     # short tail
    # every word appears in at least one chunk, in order
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split())
    assert seen == set(words)
    assert all(r["n_words"] == len(r["chunk_text"].split()) for r in rows)


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "just three words")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_words=10, overlap_words=3).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "just three words"


def test_overlap_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_words=10, overlap_words=10)
