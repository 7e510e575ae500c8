"""Micro-bench: vectorized sessionize kernel vs the per-event Python fold
it replaced, on a HOT-USER batch (one key, many events) — the shape where
interpreter-speed folding inside the Arrow kernel hurt. Driver-side only
(no Spark): the kernel is a plain function over pandas frames.

Usage: python tools/bench_sessionize_kernel.py [n_events]
Prints one JSON line with both wall times and the speedup.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")
from py_mongo_sync_spark.streaming.sessionize import _session_kernel  # noqa: E402


class _FakeState:
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

    def setTimeoutDuration(self, ms):
        pass


def _loop_kernel(gap):
    """The pre-r4 per-event fold, verbatim shape."""
    def fn(key, pdfs, state):
        (user_id,) = key
        ts = pd.concat([p["ts"] for p in pdfs]).sort_values().to_numpy()
        cur = state.get if state.exists else None
        out = []
        for t in ts:
            t = int(t)
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                out.append((user_id, cur[0], cur[1], cur[2], True))
                cur = (t, t, 1)
        state.update(cur)
        out.append((user_id, cur[0], cur[1], cur[2], False))
        yield pd.DataFrame(out, columns=[
            "user_id", "session_start", "session_end", "n_events", "closed"])
    return fn


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rng = np.random.default_rng(7)
    # ~1/50 inter-event gaps exceed the session gap → plenty of sessions
    deltas = rng.integers(1, 30, size=n)
    deltas[rng.random(n) < 0.02] = 5_000
    ts = np.cumsum(deltas)
    batch = pd.DataFrame({"ts": ts})
    gap = 1800

    def run(kernel):
        st = _FakeState()
        t0 = time.perf_counter()
        frames = list(kernel((1,), iter([batch.copy()]), st))
        return time.perf_counter() - t0, pd.concat(frames), st.get

    t_loop, out_loop, st_loop = run(_loop_kernel(gap))
    t_vec, out_vec, st_vec = run(_session_kernel(gap, None))
    same = (
        out_loop.reset_index(drop=True).astype("int64", errors="ignore")
        .equals(out_vec.reset_index(drop=True).astype("int64", errors="ignore"))
        and st_loop == st_vec
    )
    print(json.dumps({
        "metric": "sessionize_kernel_hot_user",
        "n_events": n,
        "n_sessions": int(len(out_vec)),
        "per_event_loop_sec": round(t_loop, 4),
        "vectorized_sec": round(t_vec, 4),
        "speedup": round(t_loop / t_vec, 1),
        "outputs_identical": bool(same),
    }))


if __name__ == "__main__":
    main()
