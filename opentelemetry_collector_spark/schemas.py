"""Fixed schemas — the pdata-equivalent type constants (SURVEY §1.6).

The reference's LogRecord (pdata/plog/generated_logrecord.go:34-159) is
denormalized here into one flat row per turn; the resource/scope hierarchy
collapses into conv-level columns. pcommon.Map's ordered-kv semantics
(pdata/pcommon/map.go:109-127) are preserved as a sorted-key canonical JSON
string column (attributes_json) so equality checks are exact.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The input table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: LogRecord analog produced by the parse stage.
PARSED_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)
    + [
        T.StructField("severity_text", T.StringType(), True),
        T.StructField("severity_number", T.IntegerType(), True),
        T.StructField("parsed_tool", T.StringType(), True),
        T.StructField("trace_id", T.StringType(), True),  # 32-hex or null
        T.StructField("span_id", T.StringType(), True),  # 16-hex or null
        T.StructField("dur_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), True),  # OK | ERROR | null
        T.StructField("attributes_json", T.StringType(), True),
        T.StructField("body", T.StringType(), True),  # original text
    ]
)

#: Checkpoint row (persistent-queue analog,
#: exporter/exporterhelper/internal/persistent_storage.go:51-83).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("status", T.StringType(), False),  # done | inflight
        T.StructField("lineage", T.StringType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: Per-stage observed counters (obsreport analog,
#: internal/obsreportconfig/obsmetrics/obs_{receiver,processor,exporter}.go).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),  # accepted|refused|sent|...
        T.StructField("value", T.LongType(), False),
    ]
)
