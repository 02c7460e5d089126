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


def ingest_otlp_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Ingest with the per-request partial-success surface: returns
    ``(decoded, responses)`` where responses carries one row per ingest
    request — in the file model, one input FILE is one export request —
    with (accepted, rejected, first_error), mirroring the receiver's
    ExportResponse partial-success fields (plogotlp/response.go
    ExportPartialSuccess: rejected_log_records + error_message;
    otlpreceiver/otlp.go returns it per Export call).

    A line is rejected when it fails JSON decode or carries no conv_id
    identity (the codec-boundary dead-letter predicate). first_error is
    the lexicographically-smallest offending line (deterministic).

    Scale: responses is one partial-aggregable groupBy on the file name —
    map-side combine collapses each scan partition to one row per file.
    """
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.observe import (
        LOG_RECORD_JSON_SCHEMA,
    )

    raw = spark.read.text(path).select(
        F.input_file_name().alias("request_file"),
        F.col("value").alias("otlp_json"),
    )
    decoded = from_otlp_json(raw.select("otlp_json"))
    rej = F.from_json("otlp_json", LOG_RECORD_JSON_SCHEMA)["conv_id"].isNull()
    responses = raw.groupBy("request_file").agg(
        F.sum(F.when(~rej, 1).otherwise(0)).cast("int").alias("accepted"),
        F.sum(F.when(rej, 1).otherwise(0)).cast("int").alias("rejected"),
        F.min(F.when(rej, F.col("otlp_json"))).alias("first_error"),
    )
    return decoded, responses
