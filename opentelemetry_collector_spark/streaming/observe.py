"""Streaming pipeline-health counters — obsreport in continuous mode
(SURVEY §2.6; obsreport/obsreport_receiver.go:165-313 counts records at the
receiver boundary per batch; the batch processor's flush metrics live in
processor/batchprocessor/metrics.go:37-101).

Structured Streaming already emits per-micro-batch progress (rows, duration,
watermark) through the StreamingQueryListener; this module adapts that into
the same counter vocabulary the batch path exposes via ``observe()``
(operators/observe.py) — accepted records per batch, cumulative totals, and
batch-size distribution — so both execution modes report through one
surface.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

# rolling window for the batch-size distribution; cumulative totals are
# exact forever, only the per-batch detail is bounded (a continuous query
# triggering every few seconds would otherwise grow one dict per batch for
# the lifetime of the process)
RECENT_BATCHES = 1024


@dataclass
class StreamCounters:
    """Accumulated per-query counters (thread-safe enough for the listener
    thread + one reader: int updates and deque appends are atomic under the
    GIL; readers snapshot)."""

    total_rows: int = 0
    n_batches: int = 0
    recent: deque = field(default_factory=lambda: deque(maxlen=RECENT_BATCHES))

    @property
    def receiver_accepted_log_records(self) -> int:
        return self.total_rows

    @property
    def batch_send_sizes(self) -> list[int]:
        """batch_send_size histogram analog (batchprocessor/metrics.go) —
        the most recent RECENT_BATCHES batches. Check ``window_complete``
        before equating sum(batch_send_sizes) with the cumulative total."""
        return [b["num_input_rows"] for b in self.recent]

    @property
    def window_complete(self) -> bool:
        """True while the rolling window still holds EVERY batch (i.e.
        sum(batch_send_sizes) == receiver_accepted_log_records)."""
        return self.n_batches <= RECENT_BATCHES

    def batch_count(self) -> int:
        return self.n_batches


class ObsListener(StreamingQueryListener):
    """Collects progress for queries by name; attach once per session."""

    def __init__(self) -> None:
        self.by_query: dict[str, StreamCounters] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        c = self.by_query.setdefault(str(name), StreamCounters())
        c.total_rows += p.numInputRows
        c.n_batches += 1
        c.recent.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach_obs_listener(spark: SparkSession) -> ObsListener:
    listener = ObsListener()
    spark.streams.addListener(listener)
    return listener


def detach_obs_listener(spark: SparkSession, listener: ObsListener) -> None:
    spark.streams.removeListener(listener)
