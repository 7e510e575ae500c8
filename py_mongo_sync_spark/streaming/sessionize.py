"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The engine's CDC apply path deliberately lives in ``foreachBatch`` (it
needs its own MERGE transaction per microbatch); this module is the
complementary Spark-native stateful shape — per-key state carried by the
engine's state store across microbatches, Arrow-batched pandas kernels,
no per-row Python — for operators whose state is cheap per key and whose
output is append/update rows rather than a table MERGE. Sessionization
over the events table is the canonical example (the batch equivalent is
the driver query ``sessionize_events``: a lag/window expression).

State per user: the open session (start, end, n_events). A new event
extends the open session when within ``gap`` seconds of its end, else
closes it (emitted with ``closed=true``) and opens a new one. Each batch
also emits the open session's snapshot (``closed=false``) so downstream
sees live progress; the final snapshot per user equals the batch
sessionization's last session.

Delivery contract matches the CDC source: microbatches arrive in ts
order (file stream with stamped mtimes / Kafka per-partition order);
within a batch events are sorted by ts inside the kernel.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.LongType()),
    T.StructField("session_end", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("closed", T.BooleanType()),
])

_STATE = T.StructType([
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _session_kernel(gap: int, idle_timeout_ms: int | None):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle user: close the open session, drop the state — without
            # this, per-user state accumulates for every user EVER seen
            cur = state.get if state.exists else None
            state.remove()
            if cur is not None:
                yield pd.DataFrame(
                    [(user_id, cur[0], cur[1], cur[2], True)],
                    columns=["user_id", "session_start", "session_end",
                             "n_events", "closed"],
                )
            return
        ts = (
            pd.concat([p["ts"] for p in pdfs])
            .sort_values().to_numpy(dtype="int64")
        )
        if len(ts) == 0:
            return
        cur = state.get if state.exists else None  # (start, end, n)
        if cur is None:
            start0, end0, n0 = int(ts[0]), int(ts[0]), 0
        else:
            start0, end0, n0 = int(cur[0]), int(cur[1]), int(cur[2])
        m = len(ts)
        # Vectorized gap segmentation — the batch is folded with numpy array
        # ops, never a per-event Python loop (a hot user with 10^5 events in
        # one batch would otherwise pay interpreter speed inside the Arrow
        # kernel). Sorted ts means the running session end before event i is
        # max(seeded end, ts[i-1]); a session boundary sits wherever the
        # event exceeds that by > gap.
        prev_end = np.empty(m, dtype=np.int64)
        prev_end[0] = end0
        if m > 1:
            np.maximum(ts[:-1], end0, out=prev_end[1:])
        starts_idx = np.flatnonzero(ts - prev_end > gap)
        # segment 0 continues the seeded session (possibly with zero new
        # events, when the batch's first event already breaks the gap)
        b0 = int(starts_idx[0]) if len(starts_idx) else m
        if b0 > 0:
            sess0 = (start0, max(end0, int(ts[b0 - 1])), n0 + b0)
        else:
            sess0 = (start0, end0, n0)
        seg_b = np.concatenate((starts_idx[1:], [m])).astype(np.int64) \
            if len(starts_idx) else np.empty(0, dtype=np.int64)
        seg_start = np.concatenate(([sess0[0]], ts[starts_idx]))
        seg_end = np.concatenate(([sess0[1]],
                                  ts[seg_b - 1] if len(seg_b) else []))
        seg_n = np.concatenate(([sess0[2]], seg_b - starts_idx))
        k = len(seg_start)
        state.update((int(seg_start[-1]), int(seg_end[-1]), int(seg_n[-1])))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        closed = np.ones(k, dtype=bool)
        closed[-1] = False  # the open session's live snapshot
        yield pd.DataFrame({
            "user_id": np.full(k, user_id, dtype=np.int64),
            "session_start": seg_start.astype(np.int64),
            "session_end": seg_end.astype(np.int64),
            "n_events": seg_n.astype(np.int64),
            "closed": closed,
        })

    return fn


def sessionize_stream(
    events: DataFrame, gap: int = 1800, idle_timeout_ms: int | None = None
) -> DataFrame:
    """events(user_id long, ts long) stream → session rows. Shuffles once
    on user_id into the state store's partitioning; the kernel is
    Arrow-batched (one pandas frame per user per batch, never per-row).

    ``idle_timeout_ms`` bounds state for unbounded user populations: a
    user idle that long (processing time) has their open session emitted
    as closed and their state removed — state size tracks ACTIVE users,
    not all users ever seen. None keeps state forever (test/replay
    mode)."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_timeout_ms is not None else GroupStateTimeout.NoTimeout)
    return events.groupBy("user_id").applyInPandasWithState(
        _session_kernel(gap, idle_timeout_ms),
        outputStructType=SESSION_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )
