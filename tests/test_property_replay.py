"""Property-based test: ANY sequence of insert/replace/patch/delete events,
split into ANY batch boundaries, must replay through the engine to exactly
the state the sequential oracle computes. This is the strongest form of the
reference's consistency check (check.py:72-146) — content equality under
arbitrary interleavings."""

from __future__ import annotations

import json

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_mongo_sync_spark.check import check_consistency
from py_mongo_sync_spark.config import SyncConfig
from py_mongo_sync_spark.schema import KEY_COLS
from py_mongo_sync_spark.sources.generate import oracle_replay
from py_mongo_sync_spark.streaming.pipeline import CdcPipeline

KEYS = [("c0", 0), ("c0", 1), ("c1", 0)]  # tiny key space → lots of collisions


@st.composite
def event_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    events = []
    for ts in range(1000, 1000 + n):
        conv, turn = draw(st.sampled_from(KEYS))
        kind = draw(st.sampled_from(["i", "replace", "patch", "d", "n"]))
        if kind == "d":
            doc = {"conv_id": conv, "turn_idx": turn}
            op = "d"
        elif kind == "n":
            doc, op = {}, "n"
        elif kind == "patch":
            doc = {"conv_id": conv, "turn_idx": turn,
                   "$set": {"text": f"patched-{ts}"}}
            op = "u"
        else:
            doc = {"conv_id": conv, "turn_idx": turn,
                   "role": draw(st.sampled_from(["user", "assistant"])),
                   "text": f"text-{ts}"}
            op = "i" if kind == "i" else "u"
        events.append((ts, op, "chat.transcripts", json.dumps(doc)))
    # random batch boundaries (sorted cut points)
    cuts = draw(st.lists(st.integers(min_value=1, max_value=max(1, n - 1)),
                         max_size=3, unique=True))
    return events, sorted(cuts)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(event_sequences())
def test_any_sequence_any_batching_matches_oracle(spark, tmp_path_factory, seq):
    events, cuts = seq
    tmp = tmp_path_factory.mktemp("prop")
    cfg = SyncConfig(dst_path=str(tmp / "lake"), checkpoint_path=str(tmp / "cp"), n_buckets=2)
    snap_pdf = pd.DataFrame(
        [{"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "seed",
          "ts": pd.Timestamp(1_700_000_000, unit="s")}]
    )
    snap = spark.createDataFrame(snap_pdf)
    pipe = CdcPipeline(spark, cfg)
    pipe.initial_sync(snap)

    ev_df = spark.createDataFrame(events, "ts long, op string, ns string, doc string")
    bounds = [0] + cuts + [len(events)]
    for bid, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        if hi > lo:
            batch = [e for e in events if lo + 1000 <= e[0] < hi + 1000]
            pipe.apply_batch(
                spark.createDataFrame(batch, "ts long, op string, ns string, doc string"),
                bid,
            )

    expected = oracle_replay(snap_pdf, ev_df.toPandas())
    expected = expected.where(pd.notnull(expected), None)
    exp_df = spark.createDataFrame(
        expected, schema="conv_id string, turn_idx long, role string, text string, ts timestamp"
    )
    rep = check_consistency(
        exp_df, pipe.table.read(), KEY_COLS, ["role", "text", "ts"],
    )
    assert rep["ok"], (rep, events, cuts)
