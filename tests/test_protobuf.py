"""OTLP protobuf wire codec (functions/protowire.py, operators/protobuf.py).

Golden vectors are hand-assembled from the protobuf wire spec + the OTLP
field numbers (pdata/plog/generated_logrecord.go) — they test conformance
independently of the encoder under test.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_spark.functions.protowire import (
    decode_any_value,
    decode_log_record,
    decode_logs_request,
    decode_varint,
    encode_any_value,
    encode_log_record,
    encode_logs_request,
    encode_varint,
    iter_fields,
)
from opentelemetry_collector_spark.operators.protobuf import (
    canonical_attrs_json,
    from_otlp_protobuf,
    from_otlp_request_protobuf,
    native_protobuf_available,
    to_otlp_protobuf,
    to_otlp_request_protobuf,
)

from tests.conftest import SF_SMOKE


# --- wire primitives ---------------------------------------------------------


def test_varint_golden():
    assert encode_varint(0) == b"\x00"
    assert encode_varint(1) == b"\x01"
    assert encode_varint(127) == b"\x7f"
    assert encode_varint(128) == b"\x80\x01"
    assert encode_varint(300) == b"\xac\x02"  # the canonical spec example
    assert encode_varint((1 << 64) - 1) == b"\xff" * 9 + b"\x01"


@settings(max_examples=200)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_varint_roundtrip(n):
    v, pos = decode_varint(encode_varint(n), 0)
    assert v == n and pos == len(encode_varint(n))


def test_varint_truncated_raises():
    with pytest.raises(ValueError):
        decode_varint(b"\x80", 0)


@settings(max_examples=100)
@given(
    st.recursive(
        st.one_of(
            st.booleans(),
            st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
            st.floats(allow_nan=False),
            st.text(max_size=40),
            st.binary(max_size=40),
        ),
        lambda leaf: st.one_of(
            st.lists(leaf, max_size=4),
            st.dictionaries(st.text(max_size=8), leaf, max_size=4),
        ),
        max_leaves=8,
    )
)
def test_any_value_roundtrip(v):
    assert decode_any_value(encode_any_value(v)) == v


def test_negative_int_is_ten_byte_varint():
    enc = encode_any_value(-1)
    # field 3 varint tag + 10-byte two's-complement varint
    assert enc == b"\x18" + b"\xff" * 9 + b"\x01"
    assert decode_any_value(enc) == -1


# --- LogRecord golden vector --------------------------------------------------


def _golden_record():
    return {
        "time_unix_nano": 1_000_000_000,
        "severity_number": 9,
        "severity_text": "INFO",
        "body": "hi",
        "attributes": {"dur_ms": 113, "tool": "browser"},
        "trace_id": bytes.fromhex("00112233445566778899aabbccddeeff"),
        "span_id": bytes.fromhex("0011223344556677"),
    }


_GOLDEN_BYTES = (
    b"\x09\x00\xca\x9a\x3b\x00\x00\x00\x00"  # 1: time fixed64 1e9
    b"\x10\x09"  # 2: severity_number 9
    b"\x1a\x04INFO"  # 3: severity_text
    b"\x2a\x04\x0a\x02hi"  # 5: body AnyValue{string "hi"}
    b"\x32\x0c\x0a\x06dur_ms\x12\x02\x18\x71"  # 6: KV dur_ms=113 (int)
    b"\x32\x11\x0a\x04tool\x12\x09\x0a\x07browser"  # 6: KV tool="browser"
    b"\x4a\x10" + bytes.fromhex("00112233445566778899aabbccddeeff")  # 9
    + b"\x52\x08" + bytes.fromhex("0011223344556677")  # 10
)


def test_log_record_golden_encode():
    assert encode_log_record(_golden_record()) == _GOLDEN_BYTES


def test_log_record_golden_decode():
    rec = decode_log_record(_GOLDEN_BYTES)
    g = _golden_record()
    for k, v in g.items():
        assert rec[k] == v, k
    assert rec["flags"] == 0 and rec["dropped_attributes_count"] == 0


def test_proto3_defaults_omitted():
    # zero/empty fields encode to nothing and decode back to defaults
    assert encode_log_record({"attributes": {}}) == b""
    rec = decode_log_record(b"")
    assert rec["time_unix_nano"] == 0 and rec["trace_id"] == b""


def test_malformed_bytes_raise():
    with pytest.raises(ValueError):
        list(iter_fields(b"\x32\xff\x01short"))  # length overruns buffer
    with pytest.raises(ValueError):
        list(iter_fields(b"\x04"))  # wire type 4 unsupported


def test_logs_request_roundtrip_python():
    recs = [_golden_record(), {"severity_number": 5, "attributes": {}}]
    blob = encode_logs_request({"conv_id": "c-1"}, "scope-x", recs)
    decoded = decode_logs_request(blob)
    assert len(decoded) == 1
    res_attrs, scope, out = decoded[0]
    assert res_attrs == {"conv_id": "c-1"} and scope == "scope-x"
    assert len(out) == 2
    assert out[0]["attributes"] == _golden_record()["attributes"]
    assert out[1]["severity_number"] == 5


# --- canonical attrs serializer parity ---------------------------------------


def test_canonical_attrs_json_matches_column_semantics():
    # vectors mirror functions.values.attributes_json output shapes
    assert canonical_attrs_json({}) == "{}"
    assert (
        canonical_attrs_json({"tool": "browser", "dur_ms": 113})
        == '{"dur_ms": 113, "tool": "browser"}'
    )
    # string that parses as a canonical JSON number stays bare (cast-to-
    # string semantics of the Column path)
    assert canonical_attrs_json({"x": "42"}) == '{"x": 42}'
    # leading-zero strings are NOT canonical numbers -> quoted
    assert canonical_attrs_json({"x": "0123"}) == '{"x": "0123"}'
    # JSON escaping identical to the Column path's five escapes
    assert (
        canonical_attrs_json({"q": 'he said "hi"\n'})
        == '{"q": "he said \\"hi\\"\\n"}'
    )
    # doubles render in ES6 form; integral doubles drop the .0 and so
    # serialize bare
    assert canonical_attrs_json({"d": 1.5}) == '{"d": 1.5}'
    assert canonical_attrs_json({"d": 3.0}) == '{"d": 3}'
    # nulls omitted (Map.Get absent-key semantics)
    assert canonical_attrs_json({"a": None, "b": 1}) == '{"b": 1}'


# --- Spark round-trips --------------------------------------------------------


@pytest.fixture(scope="module")
def parsed(spark):
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
    )

    return parse_turns(events_to_transcripts(spark, SF_SMOKE)).select(
        "conv_id", "turn_idx", "role", "tool", "ts", "severity_text",
        "severity_number", "parsed_tool", "trace_id", "span_id", "dur_ms",
        "status", "attributes_json", "body",
    )


def _assert_same_rows(a, b):
    import pandas as pd

    pa = a.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa[sorted(pa.columns)], pb[sorted(pb.columns)],
                                  check_dtype=False)


def test_flat_protobuf_roundtrip_spark(spark, parsed):
    wire = to_otlp_protobuf(parsed)
    assert dict(wire.dtypes)["otlp_protobuf"] == "binary"
    _assert_same_rows(from_otlp_protobuf(wire), parsed)


def test_document_protobuf_roundtrip_spark(spark, parsed):
    wire = to_otlp_request_protobuf(parsed)
    assert wire.columns == ["conv_id", "otlp_request"]
    # one request per conversation
    assert wire.count() == parsed.select("conv_id").distinct().count()
    _assert_same_rows(from_otlp_request_protobuf(wire), parsed)


def test_native_protobuf_gate(spark):
    # gate probes the classpath without raising either way
    assert native_protobuf_available(spark) in (True, False)


# --- Span wire codec (trace.proto) -------------------------------------------


def _golden_span():
    return {
        "trace_id": bytes.fromhex("00112233445566778899aabbccddeeff"),
        "span_id": bytes.fromhex("0011223344556677"),
        "trace_state": "otelcol=00112233",
        "parent_span_id": b"",
        "name": "browser",
        "kind": 3,  # CLIENT
        "start_time_unix_nano": 1_000_000_000,
        "end_time_unix_nano": 2_000_000_000,
        "attributes": {"conv_id": "c-1", "turn_idx": 4},
        "events": [
            {"time_unix_nano": 1_000_000_000, "name": "call_started",
             "attributes": {}},
            {"time_unix_nano": 2_000_000_000, "name": "call_ended",
             "attributes": {}},
        ],
        "links": [
            {"trace_id": b"\x01" * 16, "span_id": b"\x02" * 8,
             "trace_state": "", "attributes": {"link.type": "prev_span"}},
        ],
        "status_code": 2,
        "status_message": "boom",
    }


def test_span_roundtrip():
    from opentelemetry_collector_spark.functions.protowire import (
        decode_span,
        encode_span,
    )

    sp = _golden_span()
    assert decode_span(encode_span(sp)) == sp


def test_span_golden_prefix():
    # identity fields occupy the exact reference field numbers/wire types
    # (trace.pb.go: 1 trace_id LEN, 2 span_id LEN, 3 trace_state LEN)
    from opentelemetry_collector_spark.functions.protowire import encode_span

    enc = encode_span(_golden_span())
    assert enc.startswith(
        b"\x0a\x10" + bytes.fromhex("00112233445566778899aabbccddeeff")
        + b"\x12\x08" + bytes.fromhex("0011223344556677")
        + b"\x1a\x10otelcol=00112233"
    )
    # Status submessage: field 15 LEN -> {2: "boom", 3: code 2}
    assert enc.endswith(b"\x7a\x08\x12\x04boom\x18\x02")


def test_span_proto3_defaults():
    from opentelemetry_collector_spark.functions.protowire import (
        decode_span,
        encode_span,
    )

    assert encode_span({"attributes": {}}) == b""
    sp = decode_span(b"")
    assert sp["kind"] == 0 and sp["events"] == [] and sp["status_code"] == 0


def test_trace_request_roundtrip():
    from opentelemetry_collector_spark.functions.protowire import (
        decode_trace_request,
        encode_trace_request,
    )

    spans = [_golden_span(), {"name": "n2", "kind": 1, "attributes": {}}]
    blob = encode_trace_request({"conv_id": "c-1"}, "scope-t", spans)
    [(res, scope, out)] = decode_trace_request(blob)
    assert res == {"conv_id": "c-1"} and scope == "scope-t"
    assert out[0]["links"][0]["attributes"] == {"link.type": "prev_span"}
    assert out[1]["name"] == "n2"


# --- Metric wire codec (metrics.proto) ---------------------------------------


def _gauge_metric():
    return {
        "name": "queue_size", "description": "", "unit": "1",
        "type": "gauge", "aggregation_temporality": 0, "is_monotonic": False,
        "data_points": [
            {"attributes": {"tool": "browser"}, "start_time_unix_nano": 0,
             "time_unix_nano": 5_000, "as_double": None, "as_int": 7,
             "exemplars": [], "flags": 0},
        ],
    }


def test_metric_gauge_roundtrip():
    from opentelemetry_collector_spark.functions.protowire import (
        decode_metric,
        encode_metric,
    )

    m = _gauge_metric()
    assert decode_metric(encode_metric(m)) == m


def test_metric_sum_temporality_monotonic():
    from opentelemetry_collector_spark.functions.protowire import (
        AGG_TEMPORALITY_CUMULATIVE,
        decode_metric,
        encode_metric,
    )

    m = {
        "name": "turns_total", "description": "d", "unit": "1", "type": "sum",
        "aggregation_temporality": AGG_TEMPORALITY_CUMULATIVE,
        "is_monotonic": True,
        "data_points": [
            {"attributes": {}, "start_time_unix_nano": 1, "time_unix_nano": 2,
             "as_double": 4.5, "as_int": None, "exemplars": [], "flags": 0},
        ],
    }
    assert decode_metric(encode_metric(m)) == m


def test_metric_histogram_roundtrip_with_exemplar():
    from opentelemetry_collector_spark.functions.protowire import (
        AGG_TEMPORALITY_DELTA,
        decode_metric,
        encode_metric,
    )

    m = {
        "name": "dur_ms", "description": "", "unit": "ms",
        "type": "histogram",
        "aggregation_temporality": AGG_TEMPORALITY_DELTA,
        "is_monotonic": False,
        "data_points": [
            {
                "attributes": {"tool": "code"},
                "start_time_unix_nano": 1, "time_unix_nano": 2,
                "count": 6, "sum": 120.5,
                "bucket_counts": [1, 2, 3], "explicit_bounds": [10.0, 100.0],
                "exemplars": [
                    {"filtered_attributes": {}, "time_unix_nano": 2,
                     "as_double": 99.0, "as_int": None,
                     "span_id": b"\x02" * 8, "trace_id": b"\x01" * 16},
                ],
                "flags": 0, "min": 1.0, "max": 99.0,
            },
        ],
    }
    assert decode_metric(encode_metric(m)) == m


def test_metric_exp_histogram_negative_scale_offset():
    from opentelemetry_collector_spark.functions.protowire import (
        decode_metric,
        encode_metric,
    )

    m = {
        "name": "eh", "description": "", "unit": "",
        "type": "exponential_histogram",
        "aggregation_temporality": 2, "is_monotonic": False,
        "data_points": [
            {
                "attributes": {}, "start_time_unix_nano": 0,
                "time_unix_nano": 9, "count": 10, "sum": 55.0,
                "scale": -1,  # zigzag32 path
                "zero_count": 2,
                "positive": {"offset": -3, "bucket_counts": [1, 0, 7]},
                "negative": {"offset": 0, "bucket_counts": []},
                "exemplars": [], "flags": 0, "min": None, "max": None,
            },
        ],
    }
    assert decode_metric(encode_metric(m)) == m


def test_metric_summary_roundtrip():
    from opentelemetry_collector_spark.functions.protowire import (
        decode_metric,
        encode_metric,
    )

    m = {
        "name": "dur_q", "description": "", "unit": "ms", "type": "summary",
        "aggregation_temporality": 0, "is_monotonic": False,
        "data_points": [
            {"attributes": {"tool": "sql"}, "start_time_unix_nano": 0,
             "time_unix_nano": 3, "count": 5, "sum": 50.0,
             "quantile_values": [
                 {"quantile": 0.5, "value": 9.0},
                 {"quantile": 0.99, "value": 48.0},
             ],
             "flags": 0},
        ],
    }
    assert decode_metric(encode_metric(m)) == m


def test_metrics_request_roundtrip():
    from opentelemetry_collector_spark.functions.protowire import (
        decode_metrics_request,
        encode_metrics_request,
    )

    blob = encode_metrics_request({"service": "otelcol"}, "scope-m",
                                  [_gauge_metric()])
    [(res, scope, ms)] = decode_metrics_request(blob)
    assert res == {"service": "otelcol"} and scope == "scope-m"
    assert ms == [_gauge_metric()]


def test_packed_vs_unpacked_decoding():
    # decoders accept unpacked repeated scalars too (proto3 parsers must)
    from opentelemetry_collector_spark.functions.protowire import (
        decode_histogram_point,
    )

    # field 6 (bucket_counts) as three separate fixed64 fields
    import struct as _s

    unpacked = b"".join(
        b"\x31" + _s.pack("<Q", v) for v in (1, 2, 3)
    )
    dp = decode_histogram_point(unpacked)
    assert dp["bucket_counts"] == [1, 2, 3]


def test_zigzag_golden():
    from opentelemetry_collector_spark.functions.protowire import (
        _unzigzag,
        _zigzag32,
    )

    # canonical spec vectors
    for raw, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294),
                     (-2147483648, 4294967295)]:
        assert _zigzag32(raw) == enc
        assert _unzigzag(enc) == raw


# --- Spark trace/metric signal round-trips -----------------------------------


def test_trace_protobuf_roundtrip_spark(spark, parsed):
    from opentelemetry_collector_spark.operators.observe import build_spans
    from opentelemetry_collector_spark.operators.protobuf import (
        from_otlp_trace_protobuf,
        to_otlp_trace_protobuf,
    )

    spans = build_spans(parsed)
    wire = to_otlp_trace_protobuf(parsed)
    assert dict(wire.dtypes)["otlp_trace_request"] == "binary"
    # one request per conversation that has spans
    assert wire.count() == spans.select("conv_id").distinct().count()
    decoded = from_otlp_trace_protobuf(wire)

    import pandas as pd

    key = ["conv_id", "turn_idx"]
    pa = spans.toPandas().sort_values(key).reset_index(drop=True)
    pb = decoded.toPandas().sort_values(key).reset_index(drop=True)
    pa, pb = pa[sorted(pa.columns)], pb[sorted(pb.columns)]
    # events/links are arrays of Rows on the Spark side vs dicts after the
    # wire pass — compare canonical tuples
    norm = lambda cell: [tuple(dict(e).items()) for e in cell]  # noqa: E731
    for c in ("events", "links"):
        pa[c] = pa[c].map(norm)
        pb[c] = pb[c].map(norm)
    pd.testing.assert_frame_equal(pa, pb, check_dtype=False)


def test_metric_protobuf_roundtrip_spark(spark, parsed):
    from opentelemetry_collector_spark.operators.metrics import (
        histogram_explicit,
    )
    from opentelemetry_collector_spark.operators.protobuf import (
        from_otlp_metric_protobuf,
        to_otlp_metric_protobuf,
    )

    hist = histogram_explicit(parsed)
    wire = to_otlp_metric_protobuf(parsed)
    assert dict(wire.dtypes)["otlp_metric"] == "binary"
    decoded = from_otlp_metric_protobuf(wire)

    import pandas as pd

    key = ["bucket_start_epoch", "tool"]
    pa = hist.toPandas().sort_values(key).reset_index(drop=True)
    pb = decoded.toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        pa[sorted(pa.columns)], pb[sorted(pb.columns)], check_dtype=False
    )
