"""Streaming dedup-on-ingest (streaming/ingest.py): persisted corpus +
signature index across batches, idempotent replay, and the foreachBatch
drive with a fresh-checkpoint epoch probe."""

import json
import os

import pytest
from pyspark.sql import Row, types as T

from py_mongo_sync_spark.streaming.ingest import NeardupIngestPipeline

BASE = "the quick brown fox jumps over the lazy dog again and again today "
NOVEL1 = "fresh novel text that matches nothing already ingested here now "
NOVEL2 = "never seen words describing watermarks and stateful sessions ok "


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _pipe(spark, tmp, name):
    return NeardupIngestPipeline(
        spark, f"{tmp}/{name}_docs", f"{tmp}/{name}_bands", n_buckets=4
    )


def test_batches_accumulate_and_dedup_against_prior_batches(spark, tmp_path):
    p = _pipe(spark, tmp_path, "acc")
    p.initial_load(_docs(spark, [(1, BASE * 4)]))

    s1 = p.apply_batch(_docs(spark, [
        (10, BASE * 4 + "tail"),   # dup of seen doc 1
        (11, NOVEL1 * 4),          # novel -> enters corpus + index
    ]), batch_id=0)
    assert (s1["n_new"], s1["n_dup"], s1["n_novel"]) == (2, 1, 1)

    s2 = p.apply_batch(_docs(spark, [
        (20, NOVEL1 * 4 + "plus"),  # dup of batch-0 novel doc 11
        (21, NOVEL2 * 4),           # novel
    ]), batch_id=1)
    assert (s2["n_dup"], s2["n_novel"]) == (1, 1)

    kept = sorted(r["doc_id"] for r in p.docs_table.read().collect())
    assert kept == [1, 11, 21]
    # index rows track the kept corpus, 8 bands per doc
    assert p.bands_table.read().count() == 3 * 8


def test_replayed_batch_skips_without_self_matching(spark, tmp_path):
    p = _pipe(spark, tmp_path, "replay")
    p.initial_load(_docs(spark, [(1, BASE * 4)]))
    batch = _docs(spark, [(10, NOVEL1 * 4)])
    p.apply_batch(batch, batch_id=0)
    v_docs = p.docs_table.latest_version()
    v_bands = p.bands_table.latest_version()

    # redelivery: doc 10 is now IN the index — without the committed-batch
    # short-circuit it would match itself and be flagged a duplicate
    s = p.apply_batch(batch, batch_id=0)
    assert s["skipped"]
    assert p.docs_table.latest_version() == v_docs
    assert p.bands_table.latest_version() == v_bands
    assert p.docs_table.read().count() == 2


def test_stream_drive_with_fresh_checkpoint_epoch(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()

    def seg(name, rows, mtime):
        f = src / name
        f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        os.utime(f, (mtime, mtime))

    seg("b0.json", [{"doc_id": 10, "text": NOVEL1 * 4}], 1_000_000)
    seg("b1.json", [{"doc_id": 20, "text": NOVEL1 * 4 + "plus"},
                    {"doc_id": 21, "text": NOVEL2 * 4}], 1_000_001)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).json(str(src)))

    p = _pipe(spark, tmp_path, "stream")
    p.initial_load(_docs(spark, [(1, BASE * 4)]))
    p.run_stream(stream(), str(tmp_path / "cp1"))
    applied = [s for s in p.stats if not s.get("skipped")]
    assert len(applied) == 2
    assert sum(s["n_dup"] for s in applied) == 1  # doc 20 vs doc 10
    assert sorted(r["doc_id"] for r in p.docs_table.read().collect()) == [1, 10, 21]

    # fresh checkpoint: Spark batch ids restart at 0 — the epoch guard must
    # treat them as a NEW sequence and apply, not skip as replays
    seg("b2.json", [{"doc_id": 30, "text": NOVEL2 * 4 + "more"}], 1_000_002)
    p2 = _pipe(spark, tmp_path, "stream")
    p2.run_stream(stream(), str(tmp_path / "cp2"))
    applied2 = [s for s in p2.stats if not s.get("skipped")]
    # every batch must be APPLIED (decided) under the new id sequence, not
    # silently skipped as a below-window replay — the epoch guard probe
    assert len(applied2) == 3
    # replayed docs 10/21 now match themselves in the index (flagged dup,
    # corpus unchanged — convergent); new doc 30 near-dups corpus doc 21
    docs = {r["doc_id"] for r in p2.docs_table.read().collect()}
    assert docs == {1, 10, 21}


def test_crash_between_docs_and_bands_merge_converges(spark, tmp_path):
    """The docstring's crash-consistency claim, pinned: driver dies after
    the docs MERGE but before the bands MERGE — the replayed batch must
    recompute identical decisions (index unchanged), skip the docs MERGE
    idempotently, apply the bands MERGE, and leave both tables exactly as
    an uninterrupted run would."""
    p = _pipe(spark, tmp_path, "crash")
    p.initial_load(_docs(spark, [(1, BASE * 4)]))
    batch = _docs(spark, [(10, NOVEL1 * 4), (11, BASE * 4 + "tail")])

    real_merge = p.bands_table.merge
    calls = {"n": 0}

    def dying_merge(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("injected crash before bands merge")

    p.bands_table.merge = dying_merge
    with pytest.raises(RuntimeError, match="injected crash"):
        p.apply_batch(batch, batch_id=0)
    p.bands_table.merge = real_merge

    # docs committed, bands not — the partial state the replay must repair
    assert p.docs_table.is_committed(0)
    assert not p.bands_table.is_committed(0)

    s = p.apply_batch(batch, batch_id=0)
    assert not s.get("skipped")
    # doc 10 novel, doc 11 dup of seen doc 1 — same as an uninterrupted run
    assert (s["n_new"], s["n_dup"], s["n_novel"]) == (2, 1, 1)
    assert sorted(r["doc_id"] for r in p.docs_table.read().collect()) == [1, 10]
    assert p.bands_table.read().count() == 2 * 8
    assert p.bands_table.is_committed(0)


def test_index_probe_prunes_to_touched_buckets(spark, tmp_path):
    """The bands index is bucketed on bkey: a 1-doc batch (8 band keys)
    must touch at most 8 of 64 index buckets, and the pruned probe must
    reach the same decision as a full index scan."""
    from py_mongo_sync_spark.operators.ingest_dedup import ingest_decisions

    p = NeardupIngestPipeline(
        spark, f"{tmp_path}/pr_docs", f"{tmp_path}/pr_bands", n_buckets=64
    )
    seen = _docs(spark, [(i, f"{NOVEL2} variant {i} " * 4) for i in range(6)]
                 + [(9, BASE * 4)])
    p.initial_load(seen)
    batch = _docs(spark, [(100, BASE * 4 + "tail")])

    from py_mongo_sync_spark.operators.neardup import banded_signature_rows

    touched = p._touched_index_buckets(
        banded_signature_rows(batch, "doc_id", "text",
                              p.params["n_hashes"], p.params["bands"],
                              p.params["k"])
    )
    assert 0 < len(touched) <= 8
    s = p.apply_batch(batch, batch_id=0)
    assert (s["n_dup"], s["n_novel"]) == (1, 0)

    # pruned decision == full-scan decision
    full = ingest_decisions(
        batch, seen, seen_bands=p.bands_table.read().select("_id", "band", "bkey")
    ).collect()
    assert [(r["doc_id"], r["is_dup"], r["dup_of"]) for r in full] == [(100, True, 9)]


def test_batch_signed_exactly_once_per_apply(spark, tmp_path):
    """r4 shipped THREE signing subtrees per batch (bucket probe, decisions,
    index delta) — separate Spark actions, so ReuseExchange couldn't dedup
    them. apply_batch now signs once into a persisted frame and threads it
    through; pin it with the plan-construction counter."""
    from py_mongo_sync_spark.operators import neardup

    p = _pipe(spark, tmp_path, "sign_once")
    p.initial_load(_docs(spark, [(1, BASE * 4)]))

    before = neardup.SIGNING_CALLS
    s = p.apply_batch(_docs(spark, [
        (10, BASE * 4 + "tail"),
        (11, NOVEL1 * 4),
    ]), batch_id=0)
    assert neardup.SIGNING_CALLS - before == 1
    assert (s["n_new"], s["n_dup"], s["n_novel"]) == (2, 1, 1)

    # replayed (already-committed) batch short-circuits: zero signings
    before = neardup.SIGNING_CALLS
    assert p.apply_batch(_docs(spark, [(10, "x")]), batch_id=0)["skipped"]
    assert neardup.SIGNING_CALLS - before == 0
