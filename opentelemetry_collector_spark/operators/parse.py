"""Parse stage — the receiver/processorhelper analog (SURVEY §2.3, §7.3).

Extracts the LogRecord fields (pdata/plog/generated_logrecord.go:34-159) from
the free-text ``text`` column: severity token + 25-level number
(pdata/plog/severity_number.go:21-50), tool-call span fields (trace_id,
span_id, dur_ms — pdata/ptrace/generated_span.go:58-131), status, and a
sorted-key canonical attributes JSON (pcommon.Map analog,
pdata/pcommon/map.go:109-127).

Everything is native ``regexp_extract`` — JVM-side, whole-stage codegen, no
per-row Python (input_hint: "vectorized ... no per-row Python"). Duplicate
markers resolve first-match-wins, mirroring Map upsert semantics
(pdata/pcommon/map.go:121-127). An Arrow ``mapInPandas`` grok variant for
patterns regex-in-SQL can't express lives in operators/grok.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.values import attributes_json
from opentelemetry_collector_spark.severity import severity_case_sql

# Regex patterns — RE2-compatible so the DuckDB oracle runs the same ones.
SEV_PATTERN = r"^\[([A-Z]+[0-9]?)\] "
TOOL_PATTERN = r"tool=([a-z_]+)"
TRACE_PATTERN = r"trace_id=([0-9a-f]{32})"
SPAN_PATTERN = r"span_id=([0-9a-f]{16})"
DUR_PATTERN = r"dur_ms=([0-9]+)"
STATUS_PATTERN = r"status=(OK|ERROR)"


def _extract(col: Column, pattern: str) -> Column:
    # regexp_extract returns '' on no match in both Spark and DuckDB;
    # normalize to NULL so absence is typed, not sentinel.
    return F.nullif(F.regexp_extract(col, pattern, 1), F.lit(""))


def parse_turns(transcripts: DataFrame) -> DataFrame:
    """transcripts -> parsed turns (PARSED_SCHEMA). Narrow op: no shuffle."""
    sev_text = _extract(F.col("text"), SEV_PATTERN)
    parsed_tool = _extract(F.col("text"), TOOL_PATTERN)
    dur_ms = _extract(F.col("text"), DUR_PATTERN).cast("long")
    status = _extract(F.col("text"), STATUS_PATTERN)
    return (
        transcripts.withColumn("severity_text", sev_text)
        .withColumn(
            "severity_number",
            F.expr(severity_case_sql("severity_text")).cast("int"),
        )
        .withColumn("parsed_tool", parsed_tool)
        .withColumn("trace_id", _extract(F.col("text"), TRACE_PATTERN))
        .withColumn("span_id", _extract(F.col("text"), SPAN_PATTERN))
        .withColumn("dur_ms", dur_ms)
        .withColumn("status", status)
        .withColumn(
            "attributes_json",
            attributes_json(
                {
                    "dur_ms": dur_ms,
                    "status": status,
                    "tool": parsed_tool,
                }
            ),
        )
        .withColumn("body", F.col("text"))
    )


def parse_oracle_sql(from_clause: str = "transcripts") -> str:
    """DuckDB SQL computing the identical parsed relation (oracle side)."""
    return f"""
SELECT
    conv_id, turn_idx, role, text, tool, ts,
    severity_text,
    cast(({severity_case_sql('severity_text')}) AS int) AS severity_number,
    parsed_tool,
    trace_id,
    span_id,
    dur_ms,
    status,
    '{{' || concat_ws(', ',
        CASE WHEN dur_ms IS NOT NULL THEN '"dur_ms": ' || cast(dur_ms AS string) END,
        CASE WHEN status IS NOT NULL THEN '"status": "' || status || '"' END,
        CASE WHEN parsed_tool IS NOT NULL THEN '"tool": "' || parsed_tool || '"' END
    ) || '}}' AS attributes_json,
    text AS body
FROM (
    SELECT *,
        nullif(regexp_extract(text, '{SEV_PATTERN}', 1), '') AS severity_text,
        nullif(regexp_extract(text, '{TOOL_PATTERN}', 1), '') AS parsed_tool,
        cast(nullif(regexp_extract(text, '{DUR_PATTERN}', 1), '') AS bigint) AS dur_ms,
        nullif(regexp_extract(text, '{STATUS_PATTERN}', 1), '') AS status,
        nullif(regexp_extract(text, '{TRACE_PATTERN}', 1), '') AS trace_id,
        nullif(regexp_extract(text, '{SPAN_PATTERN}', 1), '') AS span_id
    FROM {from_clause}
) ex
"""
