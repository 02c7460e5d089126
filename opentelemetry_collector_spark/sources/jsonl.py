"""JSON-lines wire format — the OTLP/HTTP JSON receiver/exporter analog
(SURVEY §2.1; receiver/otlpreceiver/encoder.go:30-133, pdata/plog/json.go).

The collector accepts OTLP/JSON over HTTP and can emit it; the Spark
equivalent is a JSON-lines table: one LogRecord envelope per line, written
and read with the codec in operators/observe.py (integer epoch-micros
timestamps — lossless where string formats truncate). This is the ingest
path for transcript data arriving as JSON exports rather than
parquet/Iceberg.

Scale notes: text-file writes shard per partition (no shuffle);
``compression`` accepts the reference's full negotiated codec set
(config/configcompression/compressionType.go:22-41: gzip, zlib, deflate,
snappy, zstd, lz4, none) via WIRE_CODECS below. gzip/zlib/deflate/snappy/
lz4 map onto Hadoop text codecs (zlib IS deflate — both names produce the
RFC 1950 zlib stream Hadoop calls "deflate"); zstd uses the Hadoop codec
when the classpath provides it and otherwise falls back to a pyarrow
zstd-frame wire (one ``.jsonl.zst`` file per partition, Arrow-batched
decode on read). Reads are line-splittable for uncompressed and bzip2
inputs; gzip/zstd files are one split each — many medium files beat few
huge ones for parallel ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_collector_spark.operators.observe import (
    from_otlp_json,
    to_otlp_json,
)

# Reference codec name -> Spark/Hadoop text codec name. Keys mirror
# configcompression/compressionType.go:22-41 (the wire codecs the
# collector negotiates on OTLP/HTTP); "zlib" and "deflate" are one codec
# there too (both emit the zlib-wrapped stream, compressionType.go:34-38).
WIRE_CODECS: dict[str, str | None] = {
    "none": None,
    "": None,
    "gzip": "gzip",
    "zlib": "deflate",
    "deflate": "deflate",
    "snappy": "snappy",
    "lz4": "lz4",
    "zstd": "zstd",
}


def _resolve_codec(compression: str | None) -> str | None:
    if compression is None:
        return None
    try:
        return WIRE_CODECS[compression]
    except KeyError:
        raise ValueError(
            f"unsupported wire compression {compression!r}; "
            f"supported: {sorted(k for k in WIRE_CODECS if k)}"
        ) from None


def _write_zstd_pyarrow(lines: DataFrame, path: str) -> None:
    """zstd-frame JSONL wire without the Hadoop codec: one
    ``part-NNNNN.jsonl.zst`` per partition, written executor-side through
    pyarrow's CompressedOutputStream (zstd frames, the same stream format
    the collector's zstd transport emits). Per-partition imperative write
    is the one legitimate RDD use here; files land atomically via
    tmp+rename. Requires a shared filesystem mount on multi-node clusters
    (same assumption as any POSIX-path sink); deployments with the Hadoop
    zstd codec on the classpath never reach this path.
    """
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def write_part(idx, it):
        import pyarrow as pa

        out = os.path.join(path, f"part-{idx:05d}.jsonl.zst")
        tmp = f"{out}.tmp-{os.getpid()}"
        wrote = False
        with pa.output_stream(tmp, compression="zstd") as f:
            for row in it:
                f.write((row[0] + "\n").encode("utf-8"))
                wrote = True
        if wrote:
            os.replace(tmp, out)
        else:
            os.remove(tmp)  # skip empty partitions (Spark writers do too)
        return iter(())

    lines.rdd.mapPartitionsWithIndex(write_part).count()


def _read_zstd_pyarrow(spark: SparkSession, path: str) -> DataFrame:
    """Read the pyarrow zstd wire back: binaryFile scan (one task per
    ``.zst`` frame file) -> Arrow-batched streaming decompress -> one row
    per JSON line. Parallelism is per-file, matching the codec's
    non-splittable frames."""
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile")
        .load(f"{path}/*.jsonl.zst")
        .select("content")
    )

    def decomp(batches):
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            out: list[str] = []
            for content in pdf["content"]:
                raw = pa.input_stream(
                    pa.py_buffer(bytes(content)), compression="zstd"
                ).read()
                out.extend(raw.decode("utf-8").splitlines())
            yield pd.DataFrame({"otlp_json": out})

    lines = files.mapInPandas(decomp, "otlp_json string")
    return lines.select(F.col("otlp_json"))


def _hadoop_codec_available(spark: SparkSession, codec: str) -> bool:
    """True iff Hadoop's CompressionCodecFactory can resolve ``codec`` AND
    the codec's native/loadable backend is usable (mirrors the native-
    protobuf gate pattern, operators/protobuf.py)."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        clazz = {
            "zstd": "org.apache.hadoop.io.compress.ZStandardCodec",
        }.get(codec)
        if clazz is None:
            return True
        jvm.java.lang.Class.forName(clazz)
        # class present is not enough: ZStandardCodec needs libhadoop
        return bool(
            jvm.org.apache.hadoop.io.compress.ZStandardCodec.isNativeCodeLoaded()
        )
    except Exception:
        return False


def write_otlp_jsonl(
    parsed: DataFrame, path: str, compression: str | None = None
) -> None:
    """Export parsed turns as JSON lines (logging/OTLP-HTTP exporter
    analog). ``compression`` takes any reference wire codec name
    (WIRE_CODECS); zstd transparently uses the pyarrow frame wire when the
    Hadoop codec is off the classpath."""
    codec = _resolve_codec(compression)
    lines = to_otlp_json(parsed).select("otlp_json")
    if codec == "zstd" and not _hadoop_codec_available(
        lines.sparkSession, "zstd"
    ):
        _write_zstd_pyarrow(lines, path)
        return
    writer = lines.write.mode("overwrite")
    if codec:
        writer = writer.option("compression", codec)
    writer.text(path)


def read_otlp_jsonl(
    spark: SparkSession, path: str, compression: str | None = None
) -> DataFrame:
    """Ingest a JSON-lines export back into typed LogRecord columns
    (OTLP/HTTP JSON receiver analog): schema-explicit from_json — malformed
    lines yield null columns rather than failing the scan (partial-success
    receiver semantics; filter on conv_id IS NULL for the dead-letter split).

    ``compression`` is only needed for the pyarrow zstd wire (``"zstd"``
    when the Hadoop codec is absent, or leave None — ``.jsonl.zst`` files
    are auto-detected); every Hadoop codec self-identifies by extension.
    """
    import glob

    if compression == "zstd" or (
        compression is None and glob.glob(f"{path}/*.jsonl.zst")
    ):
        if not _hadoop_codec_available(spark, "zstd"):
            return from_otlp_json(_read_zstd_pyarrow(spark, path))
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
