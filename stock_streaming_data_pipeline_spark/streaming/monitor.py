"""Streaming observability: per-batch progress metrics via the
StreamingQueryListener API.

The reference has no monitoring at all (failures surface as silent
Cassandra gaps); production streaming needs input rate, processing
rate, batch duration, state size and watermark lag per micro-batch.
``ProgressCollector`` captures each QueryProgressEvent into a bounded
in-memory ring (driver-side, metrics only — never data) and exposes it
as a DataFrame for dashboards/alerts; ``watermark_lag_seconds`` is the
staleness signal an on-call actually pages on.
"""

from __future__ import annotations

import collections
import datetime as dt
import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_name string, batch_id long, num_input_rows long, "
    "input_rows_per_sec double, process_rows_per_sec double, "
    "batch_duration_ms long, state_rows long, watermark string"
)


class ProgressCollector(StreamingQueryListener):
    """Bounded ring of per-batch progress snapshots (driver memory is
    O(capacity), independent of stream length)."""

    def __init__(self, capacity: int = 1000) -> None:
        self._events = collections.deque(maxlen=capacity)
        self._lock = threading.Lock()

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        dur = p.get("durationMs", {}) or {}
        state = p.get("stateOperators") or []
        with self._lock:
            self._events.append(
                {
                    "query_name": p.get("name") or p.get("id", ""),
                    "batch_id": int(p.get("batchId", -1)),
                    "num_input_rows": int(p.get("numInputRows", 0)),
                    "input_rows_per_sec": float(
                        p.get("inputRowsPerSecond") or 0.0
                    ),
                    "process_rows_per_sec": float(
                        p.get("processedRowsPerSecond") or 0.0
                    ),
                    "batch_duration_ms": int(dur.get("triggerExecution", 0)),
                    "state_rows": int(
                        sum(s.get("numRowsTotal", 0) for s in state)
                    ),
                    "watermark": str(
                        (p.get("eventTime") or {}).get("watermark", "")
                    ),
                }
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- read side ----------------------------------------------------------
    def snapshot(self, spark: SparkSession) -> DataFrame:
        with self._lock:
            rows = list(self._events)
        return spark.createDataFrame(rows, PROGRESS_SCHEMA)

    def watermark_lag_seconds(self, now: dt.datetime | None = None) -> float | None:
        """Wall-clock staleness of the newest watermark across captured
        batches; None when no watermarked progress was seen."""
        with self._lock:
            marks = [e["watermark"] for e in self._events if e["watermark"]]
        if not marks:
            return None
        latest = max(
            dt.datetime.fromisoformat(m.replace("Z", "+00:00")) for m in marks
        )
        now = now or dt.datetime.now(dt.timezone.utc)
        return (now - latest).total_seconds()
