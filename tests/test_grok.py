"""Grok library stage vs the native regexp parse: the two parse paths must
agree wherever both claim a row (same first-match-wins invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.grok import grok_parse
from opentelemetry_collector_spark.operators.parse import parse_turns
from opentelemetry_collector_spark.sources.transcripts import events_to_transcripts
from tests.conftest import SF_SMOKE


def test_grok_agrees_with_native_parse(spark):
    t = events_to_transcripts(spark, SF_SMOKE)
    native = parse_turns(t).select(
        "conv_id", "turn_idx", "severity_text", "parsed_tool",
        "trace_id", "span_id", "dur_ms", "status",
    )
    grok = grok_parse(t)
    joined = grok.alias("g").join(
        native.alias("n"), ["conv_id", "turn_idx"]
    )

    # every grok-claimed row must carry identical extracted fields
    claimed = joined.filter(F.col("g.pattern").isNotNull())
    assert claimed.count() > 0
    mismatch = claimed.filter(
        ~(
            F.col("g.severity_text").eqNullSafe(F.col("n.severity_text"))
            & F.col("g.trace_id").eqNullSafe(F.col("n.trace_id"))
            & F.col("g.span_id").eqNullSafe(F.col("n.span_id"))
            & F.col("g.dur_ms").eqNullSafe(F.col("n.dur_ms"))
        )
    )
    assert mismatch.count() == 0

    # tool field: grok's tool_call/tool_result patterns anchor tool= after
    # the severity token, which equals the native first-match extraction
    tool_rows = claimed.filter(F.col("g.pattern").isin("tool_call", "tool_result"))
    assert tool_rows.filter(
        ~F.col("g.tool").eqNullSafe(F.col("n.parsed_tool"))
    ).count() == 0

    # rows grok leaves unclaimed have no severity marker natively either
    unclaimed = joined.filter(F.col("g.pattern").isNull())
    assert unclaimed.filter(F.col("n.severity_text").isNotNull()).count() == 0


def test_grok_pattern_priority(spark):
    """tool-call turns must be claimed by the tool_call pattern, not the
    weaker bare_severity fallback (library order = first-match-wins)."""
    t = events_to_transcripts(spark, SF_SMOKE)
    g = grok_parse(t).join(
        t.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    )
    calls = g.filter(F.col("text").contains("calling tool="))
    assert calls.count() > 0
    assert calls.filter(F.col("pattern") != "tool_call").count() == 0
