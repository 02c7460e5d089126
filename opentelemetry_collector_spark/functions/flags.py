"""LogRecordFlags / SpanFlags / DataPointFlags bit operations (SURVEY §2.7).

The reference models flags as a uint32 wrapping the W3C trace-flags byte:
``plog.LogRecordFlags`` with ``IsSampled``/``WithIsSampled``
(pdata/plog/log_record_flags.go) and
``pmetric.DataPointFlags`` with ``NoRecordedValue``
(pdata/pmetric/generated_numberdatapoint.go Flags accessors). Here each is
a pure bitwise Column expression — JVM-side, codegen-fused, no shuffle.

Masks are < 2^31 so int-column two's-complement AND/OR matches the
reference's uint32 semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# W3C trace-flags sampled bit (log_record_flags.go isSampledMask)
FLAG_SAMPLED = 0x01
# DataPointFlags: value was not recorded (pmetric number_data_point flags)
FLAG_NO_RECORDED_VALUE = 0x01
# low byte carries the W3C trace flags (LogRecordFlags uint32 layout)
TRACE_FLAGS_MASK = 0xFF


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def with_flag(col: Column | str, mask: int) -> Column:
    """flags | mask — WithIsSampled(true) generalized to any mask."""
    return _as_col(col).bitwiseOR(F.lit(mask))


def without_flag(col: Column | str, mask: int) -> Column:
    """flags & ~mask — WithIsSampled(false) generalized to any mask."""
    return _as_col(col).bitwiseAND(F.lit(~mask))


def has_flag(col: Column | str, mask: int) -> Column:
    """(flags & mask) != 0 — IsSampled generalized to any mask."""
    return _as_col(col).bitwiseAND(F.lit(mask)) != F.lit(0)


def trace_flags(col: Column | str) -> Column:
    """Extract the W3C trace-flags byte from the uint32 flags word."""
    return _as_col(col).bitwiseAND(F.lit(TRACE_FLAGS_MASK))
