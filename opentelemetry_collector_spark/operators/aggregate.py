"""Aggregate stage — batch-processor + obsreport counters analog (SURVEY §2.6).

The reference's only aggregates are pipeline health counters: per-exporter
sent/failed record counts (obsmetrics/obs_exporter.go:36-76) and the batch
processor's flush-size distribution (processor/batchprocessor/metrics.go:37-101).
Re-expressed as groupBy over ts time buckets (the north rule's
"batch-processor-style per-sink count aggregates").

Bucketing uses epoch arithmetic (floor(epoch/300)*300) rather than
window()/time_bucket so the Spark and DuckDB results are bit-identical.

Scale note: groupBy(bucket, role, tool_family) is a partial-aggregate-friendly
shuffle (map-side combine collapses each task to |buckets x sinks| rows before
exchange) — cardinality is tiny regardless of input size, so this agg costs
one scan + a trivially small shuffle even at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.severity import ERROR_THRESHOLD

BUCKET_SECONDS = 300  # 5-minute tumbling buckets (FIXTURES.md §3 sink_counts)


def time_bucket(ts: Column, seconds: int = BUCKET_SECONDS) -> Column:
    """Tumbling-window bucket start as epoch seconds (bigint)."""
    return (F.floor(F.unix_timestamp(ts) / seconds) * seconds).cast("long")


def sink_counts(routed_ok_df: DataFrame, bucket_seconds: int = BUCKET_SECONDS) -> DataFrame:
    """Per-sink, per-bucket counts: the exporter/sent_log_records analog
    (obsreport/obsreport_exporter.go:141-161) + error-severity split.
    """
    return (
        routed_ok_df.groupBy(
            time_bucket(F.col("ts"), bucket_seconds).alias("bucket_start_epoch"),
            F.col("role").alias("sink_role"),
            F.col("tool_family").alias("sink_tool"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(F.col("severity_number") >= ERROR_THRESHOLD, 1)
            ).alias("n_error_severity"),
        )
    )


def severity_histogram(parsed: DataFrame) -> DataFrame:
    """Counts per severity level — batch_send_size-style distribution
    (processor/batchprocessor/metrics.go:37-101 analog over severities).
    """
    return (
        parsed.groupBy("severity_number", "severity_text")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
