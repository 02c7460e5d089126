"""Retry sender — exporterhelper queued-retry analog (SURVEY §2.5).

The reference wraps every exporter in a retry sender with exponential backoff
(initial 5s, x1.5, 30s cap, give up after max_elapsed 5m —
exporter/exporterhelper/queued_retry.go:267-277,353-449) and classifies errors
permanent vs retryable (consumer/consumererror/permanent.go): permanent errors
drop immediately (queued_retry.go:399-407), retryable ones back off and retry.

In Spark, *task-level* infra failures are already retried by the scheduler
(spark.task.maxFailures); this module covers the *job-level* boundary — a
whole sink write failing (sink table unavailable, transient FS error) — which
is driver code in both systems.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

T = TypeVar("T")


class PermanentError(Exception):
    """Non-retryable failure (consumererror.NewPermanent analog): data is
    malformed or the request can never succeed — do not retry, dead-letter."""


@dataclass
class RetryConfig:
    """Defaults mirror exporter/exporterhelper/queued_retry.go:267-277.

    max_elapsed_s = 0 means NO time limit (retry until success), matching
    the reference's max_elapsed_time semantics."""

    initial_interval_s: float = 5.0
    multiplier: float = 1.5
    max_interval_s: float = 30.0
    max_elapsed_s: float = 300.0

    def validate(self) -> None:
        if self.initial_interval_s <= 0 or self.multiplier < 1:
            raise ValueError("initial_interval_s > 0 and multiplier >= 1 required")
        if self.max_interval_s < self.initial_interval_s:
            raise ValueError("max_interval_s must be >= initial_interval_s")
        if self.max_elapsed_s < 0:
            raise ValueError("max_elapsed_s must be >= 0 (0 = no limit)")


def with_retry(
    fn: Callable[[], T],
    config: RetryConfig | None = None,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> T:
    """Run ``fn`` with exponential backoff. PermanentError propagates
    immediately (queued_retry.go:399-407); other exceptions retry until
    max_elapsed_s (queued_retry.go:363-397), then the last error propagates
    (the caller re-enqueues / leaves the checkpoint uncommitted, matching the
    persistent-queue re-enqueue path at queued_retry.go:173-196).
    """
    cfg = config or RetryConfig()
    cfg.validate()
    start = clock()
    interval = cfg.initial_interval_s
    while True:
        try:
            return fn()
        except PermanentError:
            raise
        except Exception:
            if cfg.max_elapsed_s and clock() - start + interval > cfg.max_elapsed_s:
                raise
            sleep(interval)
            interval = min(interval * cfg.multiplier, cfg.max_interval_s)
