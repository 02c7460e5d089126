"""JSON-lines wire format — the OTLP/HTTP JSON receiver/exporter analog
(SURVEY §2.1; receiver/otlpreceiver/encoder.go:30-133, pdata/plog/json.go).

The collector accepts OTLP/JSON over HTTP and can emit it; the Spark
equivalent is a JSON-lines table: one LogRecord envelope per line, written
and read with the codec in operators/observe.py (integer epoch-micros
timestamps — lossless where string formats truncate). This is the ingest
path for transcript data arriving as JSON exports rather than
parquet/Iceberg.

Scale notes: text-file writes shard per partition (no shuffle);
``compression`` applies Spark's text codecs (gzip/..., the
configcompression analog, config/configcompression/compressionType.go:22-41).
Reads are line-splittable for uncompressed and bzip2 inputs; gzip files are
one split each — many medium files beat few huge ones for parallel ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_collector_spark.operators.observe import (
    from_otlp_json,
    to_otlp_json,
)


def write_otlp_jsonl(
    parsed: DataFrame, path: str, compression: str | None = None
) -> None:
    """Export parsed turns as JSON lines (logging/OTLP-HTTP exporter analog)."""
    writer = to_otlp_json(parsed).select("otlp_json").write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def read_otlp_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a JSON-lines export back into typed LogRecord columns
    (OTLP/HTTP JSON receiver analog): schema-explicit from_json — malformed
    lines yield null columns rather than failing the scan (partial-success
    receiver semantics; filter on conv_id IS NULL for the dead-letter split).
    """
    return from_otlp_json(
        spark.read.text(path).withColumnRenamed("value", "otlp_json")
    )
