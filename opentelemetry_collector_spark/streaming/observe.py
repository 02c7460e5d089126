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

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class StreamCounters:
    """Accumulated per-query counters (thread-safe enough for the listener
    thread + one reader: appends are atomic, readers snapshot)."""

    batches: list[dict] = field(default_factory=list)

    @property
    def receiver_accepted_log_records(self) -> int:
        return sum(b["num_input_rows"] for b in self.batches)

    @property
    def batch_send_sizes(self) -> list[int]:
        """batch_send_size histogram analog (batchprocessor/metrics.go)."""
        return [b["num_input_rows"] for b in self.batches]

    def batch_count(self) -> int:
        return len(self.batches)


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
        c.batches.append(
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
