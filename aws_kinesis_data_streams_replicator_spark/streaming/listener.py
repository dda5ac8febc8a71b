"""Metrics via StreamingQueryListener (SURVEY §2 ops 10-12).

The reference publishes two CloudWatch metrics per batch —
``ThroughPut`` (records replicated) and ``ReplicationLagSeconds`` —
and logs a summary line with a fixed format contract
(README.md:134-144).  Here the listener consumes Spark's
``QueryProgressEvent`` (fed by ``observe()`` columns in the plan) and
(a) appends rows to an in-memory metrics log (CloudWatch stand-in),
(b) emits the reference's exact log line.

Metric emission failures must never fail the query — the reference
swallows them (Handler.java:120-122) — hence the blanket try/except.
"""

from __future__ import annotations

import logging
from datetime import datetime, timezone

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("akr.replication")


class ReplicationMetricsListener(StreamingQueryListener):
    """Collects per-batch metrics rows: (batch_id, n_rows, lag_seconds)."""

    def __init__(self, sink_path: str | None = None) -> None:
        """``sink_path``: optional JSONL file the metrics are appended to
        (the CloudWatch-table stand-in); kept driver-side and tiny (one
        line per micro-batch)."""
        self.metrics: list[dict] = []
        self.sink_path = sink_path

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        try:
            p = event.progress
            observed = p.observedMetrics.get("replication_metrics")
            n = observed["n_records"] if observed else p.numInputRows
            last_arrival = observed["last_arrival"] if observed else None
            lag = None
            if last_arrival is not None:
                now = datetime.now(timezone.utc)
                la = (
                    last_arrival
                    if last_arrival.tzinfo
                    else last_arrival.replace(tzinfo=timezone.utc)
                )
                lag = (now - la).total_seconds()
            row = {"batch_id": p.batchId, "n_records": n, "replication_lag_seconds": lag}
            self.metrics.append(row)
            if self.sink_path:
                import json

                with open(self.sink_path, "a") as f:
                    f.write(json.dumps(row) + "\n")
            # Log-format contract (README.md:136-137).
            log.info("Total Batch Size: %s, Successfully Processed: %s", n, n)
        except Exception:  # noqa: BLE001 — metric failure is non-fatal (Handler.java:120-122)
            log.warning("metrics emission failed (non-fatal)", exc_info=True)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
