"""Route stage — the fanout/router analog (SURVEY §2.4).

The reference's fanout consumer sends each batch to N downstream pipelines
(service/internal/fanoutconsumer/logs.go:35-85); the router surface selects a
pipeline subset (fanoutconsumer/logs.go:87-132). Re-expressed single-pass:
every row gets a ``sink_id`` (role/tool_family) or lands in ``dead_letter``
with an ``error_reason`` — the count-conservation invariant (every input row
appears in exactly one sink or dead-letter) mirrors
TestBatchProcessorSpansDelivered (processor/batchprocessor/batch_processor_test.go:39-79).

Dead-letter classification is the permanent-vs-retryable error split
(consumer/consumererror/permanent.go): malformed data is permanent -> dead
letter; infra failures are retryable -> task retry (plans/retry.py).

Scale note: routing is a narrow projection (one CASE per row) — the physical
fan-out to per-sink tables is a single write with partitionBy(sink columns),
NOT N filtered scans, so the input is read once (copy-minimization parity
with fanoutconsumer/logs.go:40-58).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERR_EMPTY_TEXT = "empty_text"
ERR_UNKNOWN_SEVERITY = "unknown_severity"


def _error_reason() -> Column:
    return (
        F.when(F.col("text").isNull() | (F.col("text") == ""), F.lit(ERR_EMPTY_TEXT))
        .when(
            F.col("severity_text").isNotNull() & F.col("severity_number").isNull(),
            F.lit(ERR_UNKNOWN_SEVERITY),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def route(enriched: DataFrame) -> DataFrame:
    """Add (error_reason, sink_id); sink_id NULL iff dead-lettered.

    sink_id reads error_reason through the ATTRIBUTE, not a second copy of
    the Column tree: the reason CASE chains through severity_number's
    25-branch mapping down to the parse regexes, and a duplicated tree
    re-evaluates that whole chain per row (operators/parse.py plan-shape
    note — Catalyst won't inline a non-cheap expression referenced twice,
    but it can't dedupe two copies it was handed)."""
    routed = enriched.withColumn("error_reason", _error_reason())
    return routed.withColumn(
        "sink_id",
        # NULL-propagating concat (matches the oracle's `||`): concat_ws
        # would silently SKIP a null role/tool_family and emit a partial
        # sink id on the Spark side only
        F.when(
            F.col("error_reason").isNull(),
            F.concat(F.col("role"), F.lit("/"), F.col("tool_family")),
        ),
    )


def routed_ok(routed: DataFrame) -> DataFrame:
    return routed.filter(F.col("error_reason").isNull())


def dead_letter(routed: DataFrame) -> DataFrame:
    """The dead-letter sink (permanent errors; consumererror.NewPermanent)."""
    return routed.filter(F.col("error_reason").isNotNull())


def write_sinks(
    routed: DataFrame,
    base_path: str,
    max_records_per_file: int = 8192,
    extra_partition_cols: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Single-pass fan-out write: one scan, partitioned by sink key.

    max_records_per_file=8192 mirrors the batch processor's send_batch_size
    default (processor/batchprocessor/factory.go:31) — the batch-split
    semantics (splitlogs.go:22-84) become a file-size cap.

    extra_partition_cols are prepended to the layout (the checkpoint runner
    passes ["part_bucket"] so waves can dynamic-overwrite their own buckets).

    compression selects the parquet codec (gzip/snappy/zstd/lz4/none) — the
    configcompression transport-tuning analog
    (config/configcompression/compressionType.go:22-41) applied to the
    storage boundary.
    """
    writer = (
        routed.withColumn("sink", F.coalesce("sink_id", F.lit("dead_letter")))
        .write.option("maxRecordsPerFile", max_records_per_file)
    )
    if compression:
        writer = writer.option("compression", compression)
    (
        writer.partitionBy(*(extra_partition_cols or []), "sink")
        .mode("overwrite")
        .parquet(base_path)
    )
