"""Streaming progress → status-table normalization.

The reference runs a daemon that samples shared counters every ``--update``
seconds and appends metric snapshots to the status table (storcrawl.py:
491-528): ``file stat rate`` / ``file walk rate`` / ``insert rate`` plus
queue depths.  Structured Streaming already measures the same quantities
per micro-batch; this listener maps ``StreamingQueryProgress`` onto the
reference's normalized status schema (SURVEY.md §1.3):

    status(time TIMESTAMP-epoch-seconds BIGINT, status STRING,
           value DOUBLE, units STRING)

so the report plane's status queries (full/events/averages/brief) run
unchanged over a live streaming job's telemetry.
"""

from __future__ import annotations

import threading
from typing import TYPE_CHECKING

from pyspark.sql.streaming import StreamingQueryListener

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

STATUS_SCHEMA = "time_s BIGINT, status STRING, value DOUBLE, units STRING"


class StatusMetricsListener(StreamingQueryListener):
    """Collects per-batch progress as normalized status rows.

    Rows accumulate in memory (driver-side, O(batches)); ``to_df`` snapshots
    them as a DataFrame for appending to a status sink.  Thread-safe: Spark
    invokes listeners from its own event thread.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.rows: list[tuple[int, str, float | None, str]] = []

    # -- StreamingQueryListener interface ----------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.rows.append((0, "stream begin", None, "event"))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        # timestamp is ISO-8601 UTC, e.g. '2026-08-13T05:00:00.123Z'
        import datetime as _dt

        t = int(
            _dt.datetime.fromisoformat(p.timestamp.replace("Z", "+00:00")).timestamp()
        )
        with self._lock:
            self.rows.append((t, "insert rate", float(p.processedRowsPerSecond or 0.0), "inserts/sec"))
            self.rows.append((t, "file walk rate", float(p.inputRowsPerSecond or 0.0), "entries/sec"))
            self.rows.append((t, "rows in batch", float(p.numInputRows), "files"))

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.rows.append((0, "stream end", None, "event"))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    # -- status-table export ------------------------------------------------
    def to_df(self, spark: "SparkSession") -> "DataFrame":
        with self._lock:
            snapshot = list(self.rows)
        return spark.createDataFrame(snapshot, STATUS_SCHEMA)
