"""Stateful streaming sessionization (applyInPandasWithState) must agree
with a batch pandas oracle across microbatch boundaries."""

from __future__ import annotations

import json
import os

from py_mongo_sync_spark.streaming.sessionize import sessionize_stream


def _batch_oracle(events: list[tuple[int, int]], gap: int):
    """[(user, ts)] → {user: [(start, end, n)]} sequential sessionization."""
    by_user: dict[int, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    out: dict[int, list[tuple[int, int, int]]] = {}
    for u, tss in by_user.items():
        sessions = []
        cur = None
        for t in sorted(tss):
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] <= gap:
                cur[1] = t
                cur[2] += 1
            else:
                sessions.append(tuple(cur))
                cur = [t, t, 1]
        sessions.append(tuple(cur))
        out[u] = sessions
    return out


def test_stream_sessionize_matches_batch_oracle(spark, tmp_path):
    gap = 10
    # 3 users; sessions deliberately SPAN the microbatch boundary (u1's
    # second session starts in file 1 and continues in file 2)
    batch1 = [(1, 100), (1, 105), (2, 100), (1, 200), (3, 50)]
    batch2 = [(1, 205), (1, 300), (2, 103), (2, 400), (3, 51)]
    ev_dir = tmp_path / "ev"
    os.makedirs(ev_dir)
    for i, batch in enumerate([batch1, batch2]):
        p = ev_dir / f"b{i}.json"
        with open(p, "w") as f:
            for u, t in batch:
                f.write(json.dumps({"user_id": u, "ts": t}) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = spark.readStream.schema("user_id long, ts long").option(
        "maxFilesPerTrigger", "1"
    ).json(str(ev_dir))
    q = (
        sessionize_stream(stream, gap=gap)
        .writeStream.format("memory").queryName("sess")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM sess").collect()
    closed = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
              for r in rows if r["closed"]}
    # last open-session snapshot per user = the one from the final batch
    open_last: dict[int, tuple] = {}
    for r in rows:
        if not r["closed"]:
            prev = open_last.get(r["user_id"])
            if prev is None or r["session_end"] >= prev[1]:
                open_last[r["user_id"]] = (
                    r["session_start"], r["session_end"], r["n_events"])

    oracle = _batch_oracle(batch1 + batch2, gap)
    want_closed = {
        (u, s, e, n) for u, sess in oracle.items() for (s, e, n) in sess[:-1]
    }
    want_open = {u: sess[-1] for u, sess in oracle.items()}
    assert closed == want_closed
    assert open_last == want_open
    # the boundary-spanning session really was stitched across batches
    assert want_open[1] == (300, 300, 1) and (1, 200, 205, 2) in closed
