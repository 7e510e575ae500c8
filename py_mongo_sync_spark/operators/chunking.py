"""Document chunking — split long documents into overlapping windows.

The split-side sibling of sequence packing (operators/packing.py): packing
merges SHORT docs up to a token budget; chunking cuts LONG docs down to
window-sized pieces with an overlap so no span of text loses its context
at a cut point — the standard preprocessing for context-window-bounded
training and retrieval corpora.

Whole-JVM implementation: split once into a word array, then one
``posexplode`` over computed window slices — no UDF, no shuffle (chunking
is embarrassingly per-row; downstream grouping decides partitioning). All
index math is integer, so a SQL oracle reproduces the exact chunk set.

Reference analogue: none (data-pipeline operator beyond the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap_words: int = 8,
) -> DataFrame:
    """One row per (doc, window): (id, chunk_idx, chunk_text, n_words).
    Windows start every ``chunk_words - overlap_words`` words; the last
    window may be shorter (never empty); a doc shorter than one window
    yields exactly one chunk of itself. ``overlap_words`` must be smaller
    than ``chunk_words``."""
    if not 0 <= overlap_words < chunk_words:
        raise ValueError("need 0 <= overlap_words < chunk_words")
    step = chunk_words - overlap_words
    words = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(words)
    # ceil((n - overlap) / step) in pure integer math, floor at 1
    n_chunks = F.greatest(
        (n - F.lit(overlap_words) + F.lit(step - 1)) / F.lit(step), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * step + 1, F.lit(chunk_words))
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).withColumn("n_words", F.size(F.split(F.col("chunk_text"), " ")))
