"""Pipeline-health counters — the obsreport analog (SURVEY §2.6).

The reference counts records at every stage boundary:
``receiver/accepted_log_records`` / ``refused_log_records``
(obsreport/obsreport_receiver.go:165-313),
``processor/accepted|refused|dropped`` (obsreport_processor.go:236-292),
``exporter/sent_log_records`` / ``send_failed_log_records``
(obsreport_exporter.go:141-161).

Spark's ``Observation`` API attaches these as metrics on the SAME pass that
computes the result — zero extra scans, collected on action completion.
Metric names mirror the obsmetrics key names
(internal/obsreportconfig/obsmetrics/obs_receiver.go:41-52 etc.).

OTLP JSON codec analog (SURVEY §1.5, pdata/plog/json.go:29-42): LogRecord
rows serialize to / parse from a canonical JSON envelope with to_json /
from_json — the round-trip is lossless (tested) and the wire schema is the
denormalized OTLP LogRecord shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# OTLP wire timestamps are integers since epoch (uint64 ns,
# pdata/pcommon/timestamp.go:26-37); Spark timestamps are µs, so the
# envelope carries time_unix_micros — integer codec is lossless where
# string formats truncate (to_json defaults to millis).
LOG_RECORD_JSON_SCHEMA = (
    "struct<conv_id:string, turn_idx:int, role:string, time_unix_micros:long, "
    "severity_number:int, severity_text:string, trace_id:string, "
    "span_id:string, attributes_json:string, body:string>"
)


def observed_pipeline(routed: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach obsreport-style counters to a routed DataFrame. The returned
    Observation yields, after the next action on the returned frame:
    receiver_accepted_log_records, exporter_sent_log_records,
    processor_dropped_log_records (dead-letter), and active_sinks (the live
    fan-out width, a queue-gauge analog).
    """
    obs = Observation("otelcol_pipeline")
    observed = routed.observe(
        obs,
        F.count(F.lit(1)).alias("receiver_accepted_log_records"),
        F.count(F.when(F.col("error_reason").isNull(), 1)).alias(
            "exporter_sent_log_records"
        ),
        F.count(F.when(F.col("error_reason").isNotNull(), 1)).alias(
            "processor_dropped_log_records"
        ),
        # queue-gauge analog: live sink fan-out width (DISTINCT aggregates
        # are disallowed in observed metrics; HLL is exact at this
        # cardinality)
        F.approx_count_distinct("sink_id").alias("active_sinks"),
    )
    return observed, obs


def to_otlp_json(parsed: DataFrame) -> DataFrame:
    """Serialize parsed turns to the OTLP/JSON-style record envelope
    (plog.JSONMarshaler analog) — one JSON string per LogRecord."""
    return parsed.select(
        "conv_id",
        "turn_idx",
        F.to_json(
            F.struct(
                F.col("conv_id"),
                F.col("turn_idx"),
                F.col("role"),
                # ts may be TIMESTAMP_NTZ (parquet); session tz is UTC so the
                # cast is lossless
                F.unix_micros(F.col("ts").cast("timestamp")).alias(
                    "time_unix_micros"
                ),
                F.col("severity_number"),
                F.col("severity_text"),
                F.col("trace_id"),
                F.col("span_id"),
                F.col("attributes_json"),
                F.col("body"),
            )
        ).alias("otlp_json"),
    )


def from_otlp_json(serialized: DataFrame) -> DataFrame:
    """Parse the JSON envelope back to columns (plog.JSONUnmarshaler
    analog); inverse of to_otlp_json."""
    return serialized.select(
        F.from_json("otlp_json", LOG_RECORD_JSON_SCHEMA).alias("r")
    ).select(
        "r.conv_id", "r.turn_idx", "r.role",
        F.timestamp_micros("r.time_unix_micros").cast("timestamp_ntz").alias("ts"),
        "r.severity_number", "r.severity_text", "r.trace_id", "r.span_id",
        "r.attributes_json", "r.body",
    )


# --- nested OTLP/JSON document (the wire hierarchy, plog/json.go:29-42) -----

_DOC_SCHEMA = (
    "struct<resource:struct<conv_id:string>, scope:struct<name:string>, "
    "logRecords:array<struct<turn_idx:int, role:string, "
    "time_unix_micros:long, severity_number:int, severity_text:string, "
    "trace_id:string, span_id:string, attributes_json:string, body:string>>>"
)

SCOPE_NAME = "otelcol-spark/transcripts"


def to_otlp_document_json(parsed: DataFrame) -> DataFrame:
    """Full OTLP/JSON hierarchy: one document per conversation =
    Resource{conv_id} -> Scope -> LogRecord[] in turn order — the actual
    resourceLogs/scopeLogs/logRecords nesting of the wire format
    (pdata/plog/logs.go:24,60-62), not the flat per-record envelope.

    Scale note: groupBy(conv_id) + sort_array is one bucket-aligned shuffle;
    record order inside the array is made explicit by sorting on turn_idx
    (slice order is implicit in the reference)."""
    rec = F.struct(
        F.col("turn_idx"),
        F.col("role"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("time_unix_micros"),
        F.col("severity_number"),
        F.col("severity_text"),
        F.col("trace_id"),
        F.col("span_id"),
        F.col("attributes_json"),
        F.col("body"),
    )
    return (
        parsed.groupBy("conv_id")
        .agg(F.sort_array(F.collect_list(rec)).alias("logRecords"))
        .select(
            "conv_id",
            F.to_json(
                F.struct(
                    F.struct(F.col("conv_id")).alias("resource"),
                    F.struct(F.lit(SCOPE_NAME).alias("name")).alias("scope"),
                    F.col("logRecords"),
                )
            ).alias("otlp_document_json"),
        )
    )


def from_otlp_document_json(serialized: DataFrame) -> DataFrame:
    """Explode the nested document back to one row per LogRecord (the
    receiver-side unmarshal, otlpreceiver encoder.go:30-133)."""
    doc = serialized.select(
        F.from_json("otlp_document_json", _DOC_SCHEMA).alias("d")
    )
    rec = doc.select(
        F.col("d.resource.conv_id").alias("conv_id"),
        F.explode("d.logRecords").alias("r"),
    )
    return rec.select(
        "conv_id", "r.turn_idx", "r.role",
        F.timestamp_micros(F.col("r.time_unix_micros"))
        .cast("timestamp_ntz").alias("ts"),
        "r.severity_number", "r.severity_text", "r.trace_id", "r.span_id",
        "r.attributes_json", "r.body",
    )


# --- trace-signal codec (ptrace.JSONMarshaler analog, pdata/ptrace/json.go) --

SPAN_JSON_SCHEMA = (
    "struct<trace_id:string, span_id:string, trace_state:string, "
    "parent_span_id:string, name:string, kind:int, flags:int, "
    "start_unix_micros:long, end_unix_micros:long, "
    "status_code:int, conv_id:string, turn_idx:int, attributes_json:string, "
    "events:array<struct<name:string, time_unix_micros:long, "
    "attributes_json:string>>, "
    "links:array<struct<trace_id:string, span_id:string, "
    "attributes_json:string>>>"
)

# SpanKind enum (pdata/ptrace/span_kind.go): tool calls are CLIENT spans
SPAN_KIND_CLIENT = 3
# StatusCode enum (pdata/ptrace/status_code.go): Unset=0, Ok=1, Error=2
_STATUS_CODE = (
    "CASE WHEN status = 'ERROR' THEN 2 WHEN status = 'OK' THEN 1 ELSE 0 END"
)


def build_spans(parsed: DataFrame) -> DataFrame:
    """Materialize full Span rows from parsed tool-call turns — every
    generated_span.go:58-149 surface:

    * identity + timing + kind + status as before;
    * TraceState (pdata/pcommon/trace_state.go): opaque W3C key=value
      passthrough — synthesized deterministically as ``otelcol=<trace_id
      prefix>`` since transcripts carry no upstream vendor state;
    * flags: W3C sampled bit set on every materialized span
      (pdata/ptrace generated SetFlags; mask semantics in
      functions/flags.py);
    * Events (generated_span.go:97-105): call_started at span start,
      call_ended at end, plus an ``error`` event carrying the status when
      the call failed — the retry/rate-limit sub-event analog;
    * Links (generated_span.go:107-115): one link to the previous span in
      the same conversation (lag window over the conv_id bucket key — the
      only shuffle, aligned with the table layout).
    """
    from pyspark.sql.window import Window

    start = F.unix_micros(F.col("ts").cast("timestamp"))
    end = start + F.col("dur_ms") * 1000
    w_all = Window.partitionBy("conv_id").orderBy("turn_idx")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # A tool-call span's outcome lives on the FOLLOWING tool-result turn
    # (the assistant's "calling tool=" line has no status) — effective span
    # status = own status, else the next turn's when that turn is the tool
    # result. Both windows share the conv_id/turn_idx sort: one shuffle.
    with_result = parsed.withColumn(
        "next_status", F.lead("status").over(w_all)
    ).withColumn("next_role", F.lead("role").over(w_all))
    spans = (
        with_result.filter(F.col("trace_id").isNotNull())
        .withColumn(
            "status",
            F.coalesce(
                F.col("status"),
                F.when(F.col("next_role") == "tool", F.col("next_status")),
            ),
        )
        .withColumn("start_unix_micros", start)
        .withColumn("end_unix_micros", end)
        .withColumn("prev_trace_id", F.lag("trace_id").over(w))
        .withColumn("prev_span_id", F.lag("span_id").over(w))
    )
    event = lambda name, ts_col: F.struct(  # noqa: E731
        F.lit(name).alias("name"),
        F.col(ts_col).alias("time_unix_micros"),
        F.lit("{}").alias("attributes_json"),
    )
    error_event = F.struct(
        F.lit("error").alias("name"),
        F.col("end_unix_micros").alias("time_unix_micros"),
        F.lit('{"status": "ERROR"}').alias("attributes_json"),
    )
    events = F.when(
        F.col("status") == "ERROR",
        F.array(
            event("call_started", "start_unix_micros"),
            event("call_ended", "end_unix_micros"),
            error_event,
        ),
    ).otherwise(
        F.array(
            event("call_started", "start_unix_micros"),
            event("call_ended", "end_unix_micros"),
        )
    )
    links = F.when(
        F.col("prev_trace_id").isNotNull(),
        F.array(
            F.struct(
                F.col("prev_trace_id").alias("trace_id"),
                F.col("prev_span_id").alias("span_id"),
                F.lit('{"link.type": "prev_span"}').alias("attributes_json"),
            )
        ),
    ).otherwise(
        F.expr(
            "CAST(array() AS array<struct<trace_id:string, span_id:string,"
            " attributes_json:string>>)"
        )
    )
    from opentelemetry_collector_spark.functions.flags import FLAG_SAMPLED

    return spans.select(
        F.col("trace_id"),
        F.col("span_id"),
        F.concat(F.lit("otelcol="), F.substring("trace_id", 1, 8)).alias(
            "trace_state"
        ),
        F.lit("").alias("parent_span_id"),  # root span per turn
        F.col("parsed_tool").alias("name"),
        F.lit(SPAN_KIND_CLIENT).alias("kind"),
        F.lit(FLAG_SAMPLED).alias("flags"),
        "start_unix_micros",
        "end_unix_micros",
        F.expr(_STATUS_CODE).alias("status_code"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("attributes_json"),
        events.alias("events"),
        links.alias("links"),
    )


def to_otlp_span_json(parsed: DataFrame) -> DataFrame:
    """Serialize parsed tool-call spans to the OTLP/JSON Span envelope
    (generated_span.go:58-149: identity, trace_state, name, kind, flags,
    start/end, status, events, links). Start = the turn timestamp; end =
    start + dur_ms."""
    spans = build_spans(parsed)
    return spans.select(
        "conv_id",
        "turn_idx",
        F.to_json(
            F.struct(*[F.col(f) for f in spans.columns])
        ).alias("otlp_span_json"),
    )


def from_otlp_span_json(serialized: DataFrame) -> DataFrame:
    """Inverse of to_otlp_span_json (ptrace.JSONUnmarshaler analog);
    reconstructs span fields incl. dur_ms from start/end."""
    return serialized.select(
        F.from_json("otlp_span_json", SPAN_JSON_SCHEMA).alias("s")
    ).select(
        "s.conv_id", "s.turn_idx",
        "s.trace_id", "s.span_id", "s.trace_state", "s.parent_span_id",
        F.col("s.name").alias("parsed_tool"),
        "s.kind", "s.flags",
        F.timestamp_micros(F.col("s.start_unix_micros"))
        .cast("timestamp_ntz").alias("ts"),
        ((F.col("s.end_unix_micros") - F.col("s.start_unix_micros")) / 1000)
        .cast("long").alias("dur_ms"),
        "s.status_code", "s.attributes_json", "s.events", "s.links",
    )


# --- metrics-signal codec (pmetric.JSONMarshaler analog, pdata/pmetric) -----

METRIC_JSON_SCHEMA = (
    "struct<name:string, type:string, time_unix_micros:long, "
    "value:double, attributes_json:string>"
)


def to_otlp_metric_json(
    points: DataFrame,
    metric_name: str,
    value_col: str,
    ts_col: str = "ts",
    attr_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Serialize a data-point frame to NumberDataPoint JSON envelopes
    (pdata/pmetric/generated_numberdatapoint.go): one Sum/Gauge point per
    row, with the listed attr columns folded into sorted-key attributes."""
    from opentelemetry_collector_spark.functions.values import attributes_json

    # shared canonical serializer: sorted keys, null-omission, canonical
    # JSON numbers bare, strings quoted — identical to every other
    # attributes_json producer in the engine
    attrs = attributes_json({c: F.col(c) for c in attr_cols})
    return points.select(
        F.to_json(
            F.struct(
                F.lit(metric_name).alias("name"),
                F.lit("sum").alias("type"),
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias(
                    "time_unix_micros"
                ),
                F.col(value_col).cast("double").alias("value"),
                attrs.alias("attributes_json"),
            )
        ).alias("otlp_metric_json")
    )


def from_otlp_metric_json(serialized: DataFrame) -> DataFrame:
    return serialized.select(
        F.from_json("otlp_metric_json", METRIC_JSON_SCHEMA).alias("m")
    ).select(
        "m.name", "m.type",
        F.timestamp_micros(F.col("m.time_unix_micros"))
        .cast("timestamp_ntz").alias("ts"),
        "m.value", "m.attributes_json",
    )
