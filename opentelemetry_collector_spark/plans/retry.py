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


class ThrottleRetry(Exception):
    """Retryable failure carrying a server-requested delay — the
    exporterhelper throttle error (queued_retry.go:330-349 NewThrottleRetry).
    The retry loop honors it as a FLOOR on the backoff delay:
    ``sleep = max(backoff_delay, delay_s)`` (queued_retry.go:420-424
    ``backoffDelay = max(backoffDelay, throttleErr.delay)``); the backoff
    schedule itself still advances, and give-up stays on the elapsed clock.
    ``delay_s = 0`` means "throttled, but use the default backoff policy"
    (otlphttpexporter/otlp.go:165-167)."""

    def __init__(self, message: str, delay_s: float = 0.0):
        super().__init__(message)
        self.delay_s = float(delay_s)


# HTTP codes the OTLP spec calls retryable
# (otlphttpexporter/otlp.go:186-200 isRetryableStatusCode).
RETRYABLE_HTTP_CODES = frozenset({429, 502, 503, 504})
# Of those, only the two "server is overwhelmed" codes may carry Retry-After
# (otlphttpexporter/otlp.go:172 isThrottleError).
THROTTLE_HTTP_CODES = frozenset({429, 503})


def classify_http_error(
    status_code: int,
    message: str,
    retry_after: str | None = None,
) -> Exception:
    """Map an HTTP export response to the reference's error taxonomy
    (otlphttpexporter/otlp.go:148-183): retryable codes become
    ``ThrottleRetry`` — with the server's ``Retry-After`` seconds when the
    code is a throttle code and the header parses as an integer, else
    delay 0 (default backoff) — and everything else is ``PermanentError``.
    """
    if status_code in RETRYABLE_HTTP_CODES:
        delay = 0.0
        if status_code in THROTTLE_HTTP_CODES and retry_after:
            try:
                delay = float(int(retry_after))
            except ValueError:
                delay = 0.0
        return ThrottleRetry(
            f"HTTP {status_code}: {message}", delay_s=delay
        )
    return PermanentError(f"HTTP {status_code}: {message}")


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

    ``ThrottleRetry`` forces the server-requested delay as a floor on the
    backoff delay (queued_retry.go:420-424): the sleep is
    ``max(backoff_interval, delay_s)`` but the schedule and the give-up
    check keep using the backoff interval — after a long throttle sleep the
    elapsed clock naturally trips the max_elapsed gate on the next failure,
    exactly like backoff.NextBackOff returning Stop in the reference.
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
        except Exception as err:
            if cfg.max_elapsed_s and clock() - start + interval > cfg.max_elapsed_s:
                raise
            delay = interval
            if isinstance(err, ThrottleRetry):
                delay = max(delay, err.delay_s)
            sleep(delay)
            interval = min(interval * cfg.multiplier, cfg.max_interval_s)


class AttemptTimeout(Exception):
    """One attempt exceeded its deadline — RETRYABLE by design: the
    reference's timeout sender makes the push fail with a context-deadline
    error that the retry sender then backs off on
    (exporterhelper/common.go:194-209; the chain is
    queue -> retry -> timeout -> push, common.go:159-186)."""


def with_timeout(
    fn: Callable[[], T],
    timeout_s: float,
    spark=None,
    group_id: str | None = None,
) -> T:
    """Timeout sender analog: run ``fn`` under a per-attempt deadline
    (exporterhelper/common.go:194-209; TimeoutSettings default 5s there —
    a batch sink write warrants minutes, so no default is imposed here).

    ``timeout_s <= 0`` disables the deadline (the reference's
    ``Timeout > 0`` guard). On expiry every job carrying the attempt's job
    TAG is cancelled (when ``spark`` is given) so a hung action's tasks
    actually stop — Python has no context cancellation, and without the
    cancel a "timed out" write would keep burning executors behind the
    retry. Raises AttemptTimeout (retryable); compose under with_retry for
    the full chain:

        with_retry(lambda: with_timeout(write_attempt, 300, spark))

    The deadline is PER ATTEMPT, like the reference (each send() call gets
    a fresh context.WithTimeout); with_retry's max_elapsed_s bounds the
    whole chain. The tag is added inside the worker thread because Spark
    job tags are thread-local (tags, not setJobGroup: a group id would
    OVERWRITE any group the caller had set, while tags stack).
    """
    if timeout_s <= 0:
        return fn()
    import concurrent.futures
    import uuid

    tag = group_id or f"timeout-sender-{uuid.uuid4().hex[:8]}"

    def attempt() -> T:
        if spark is not None:
            spark.sparkContext.addJobTag(tag)
            spark.sparkContext.setInterruptOnCancel(True)
        try:
            return fn()
        finally:
            if spark is not None:
                spark.sparkContext.removeJobTag(tag)

    ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(attempt)
        try:
            return fut.result(timeout=timeout_s)
        except concurrent.futures.TimeoutError:
            if spark is not None:
                spark.sparkContext.cancelJobsWithTag(tag)
            raise AttemptTimeout(
                f"attempt exceeded {timeout_s}s deadline"
            ) from None
    finally:
        ex.shutdown(wait=False)
