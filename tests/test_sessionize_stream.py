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


def test_idle_timeout_closes_session_and_drops_state(spark, tmp_path):
    """Bounded state: a user idle past the processing-time timeout has the
    open session emitted as closed and the state removed; an event after
    expiry starts a FRESH session (no stale state)."""
    import os
    import time as _time

    ev_dir = tmp_path / "ev"
    os.makedirs(ev_dir)

    def drop(name, rows, mtime):
        p = ev_dir / name
        with open(p, "w") as f:
            for u, t in rows:
                f.write(json.dumps({"user_id": u, "ts": t}) + "\n")
        os.utime(p, (mtime, mtime))

    drop("b0.json", [(1, 100), (1, 105)], 1_700_000_000)

    stream = spark.readStream.schema("user_id long, ts long").option(
        "maxFilesPerTrigger", "1"
    ).json(str(ev_dir))
    q = (
        sessionize_stream(stream, gap=10, idle_timeout_ms=1)
        .writeStream.format("memory").queryName("sess_ttl")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return spark.sql("SELECT * FROM sess_ttl").collect()

        t0 = _time.monotonic()
        while _time.monotonic() - t0 < 60:
            # expiry fires on a later microbatch: the session from b0 must
            # eventually be emitted CLOSED by the timeout path
            closed = [r for r in rows()
                      if r["closed"] and r["session_start"] == 100]
            if closed:
                break
            _time.sleep(1)
        assert closed and closed[0]["n_events"] == 2

        # post-expiry event: fresh session (state was removed, so the new
        # session does NOT merge with the long-expired one despite ts gap
        # semantics never firing inside event time)
        drop("b1.json", [(1, 107)], 1_700_000_001)
        t0 = _time.monotonic()
        fresh = None
        while _time.monotonic() - t0 < 60:
            fresh = [r for r in rows()
                     if not r["closed"] and r["session_start"] == 107]
            if fresh:
                break
            _time.sleep(1)
        assert fresh and fresh[0]["n_events"] == 1
    finally:
        q.stop()
        q.awaitTermination()


class _FakeState:
    """Duck-typed GroupState: the kernel only touches these members."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _loop_reference(ts_sorted, cur, gap):
    """The pre-vectorization per-event fold — kept as the test oracle."""
    out = []
    for t in ts_sorted:
        t = int(t)
        if cur is None:
            cur = (t, t, 1)
        elif t - cur[1] <= gap:
            cur = (cur[0], max(cur[1], t), cur[2] + 1)
        else:
            out.append((cur[0], cur[1], cur[2], True))
            cur = (t, t, 1)
    out.append((cur[0], cur[1], cur[2], False))
    return out, cur


def test_vectorized_kernel_matches_per_event_fold():
    """The numpy gap-segmentation fold must be row-for-row identical to the
    per-event loop it replaced, across seeded-state shapes: no state, state
    the first event extends, state the first event breaks (zero-new-event
    close), duplicate timestamps, and single-event batches."""
    import random

    import pandas as pd

    from py_mongo_sync_spark.streaming.sessionize import _session_kernel

    rng = random.Random(42)
    kernel = _session_kernel(gap=10, idle_timeout_ms=None)
    cases = [
        (None, [5]),
        (None, [5, 5, 5]),
        ((0, 0, 3), [1]),        # extends
        ((0, 0, 3), [100]),      # breaks: seeded closes with 0 new events
        ((0, 50, 2), [40, 55, 70, 300, 301]),  # seeded end > first ts
    ]
    for _ in range(40):
        n = rng.randint(1, 60)
        tss = sorted(rng.randint(0, 200) for _ in range(n))
        seed = None if rng.random() < 0.4 else (
            (lambda s: (s, s + rng.randint(0, 30), rng.randint(1, 5)))(rng.randint(0, 150))
        )
        cases.append((seed, tss))
    for seed, tss in cases:
        st = _FakeState()
        if seed is not None:
            st.update(seed)
        got = list(kernel((7,), iter([pd.DataFrame({"ts": tss})]), st))
        rows = [tuple(r) for r in got[0][
            ["session_start", "session_end", "n_events", "closed"]
        ].itertuples(index=False)] if got else []
        want, want_state = _loop_reference(sorted(tss), seed, 10)
        assert rows == want, (seed, tss)
        assert st.get == want_state[:3] if want_state else st.get is None
