"""Streaming progress telemetry — A3.

Reference analogue: the queue-fed progress threads printing per-ns applied
counts and percent-complete (/root/reference/mongosync/progress_logger.py:31-143)
and the 2-second log cadence (common_syncer.py:53). Spark already computes
per-batch rates; this listener persists each microbatch's progress as a
JSON line next to the checkpoint log so operators (and tests) can audit
rates without scraping driver logs. Driver-side file appends only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._append({"event": "started", "id": str(event.id), "runId": str(event.runId)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._append(
            {
                "event": "progress",
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._append({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # pragma: no cover - idle only in long runs
        pass

    def _append(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
