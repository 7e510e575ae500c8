"""Greedy sequence packing: budget invariant, determinism, oversized docs,
and exact agreement with a per-doc reference fold."""

from __future__ import annotations

import random

import numpy as np

from py_mongo_sync_spark.operators.packing import (
    _pack_bounds,
    pack_greedy,
    pack_stats,
)


def _reference_fold(tokens, budget):
    """Per-doc greedy loop — the semantics _pack_bounds must match."""
    out, acc, pid = [], None, 0
    for t in tokens:
        if acc is None:
            acc = t
        elif acc + t <= budget:
            acc += t
        else:
            pid += 1
            acc = t
        out.append(pid)
    return out


def test_pack_bounds_matches_reference_fold_fuzz():
    rng = random.Random(5)
    for _ in range(200):
        n = rng.randint(1, 80)
        budget = rng.randint(5, 60)
        toks = [rng.randint(1, int(budget * 1.5)) for _ in range(n)]
        bounds = _pack_bounds(np.array(toks, dtype=np.int64), budget)
        got = np.repeat(
            np.arange(len(bounds)), np.diff(np.concatenate(([0], bounds)))
        ).tolist()
        assert got == _reference_fold(toks, budget), (budget, toks)


def test_pack_greedy_grouped(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr", 100 + (i * 37) % 300)
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    packed = pack_greedy(df, budget=512, group_cols=["lang"])
    pdf = packed.toPandas().sort_values(["lang", "doc_id"])
    # every pack's fill <= budget unless it is a singleton oversized doc
    for (_lang, _pid), g in pdf.groupby(["lang", "pack_id"]):
        total = int(g["n_tokens"].sum())
        assert total <= 512 or len(g) == 1
    # doc order within a group implies monotone pack ids
    for _lang, g in pdf.groupby("lang"):
        assert (g.sort_values("doc_id")["pack_id"].diff().fillna(0) >= 0).all()
    # deterministic
    again = pack_greedy(df, budget=512, group_cols=["lang"]).toPandas()
    assert again.sort_values("doc_id")["pack_id"].tolist() == \
        pdf.sort_values("doc_id")["pack_id"].tolist()


def test_oversized_doc_gets_singleton_pack(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 9000), (3, 100)], "doc_id long, n_tokens int"
    )
    pdf = pack_greedy(df, budget=512).toPandas().set_index("doc_id")
    assert pdf.loc[2, "pack_id"] not in (
        pdf.loc[1, "pack_id"], pdf.loc[3, "pack_id"]
    )
    stats = pack_stats(pack_greedy(df, budget=512), budget=512).toPandas()
    over = stats[stats["pack_tokens"] > 512]
    assert len(over) == 1 and int(over.iloc[0]["n_docs"]) == 1
