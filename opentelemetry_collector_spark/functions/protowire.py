"""Hand-rolled OTLP protobuf wire codec — the pdata ProtoMarshaler analog.

The reference's primary wire format is protobuf (pdata/plog/pb.go:24-40,
negotiated at receiver/otlpreceiver/encoder.go:30-36). This sandbox has no
``protobuf`` package, no ``spark-protobuf`` jar and no ``protoc``, so the
wire format is implemented directly from the two public specs it is built
from:

* the protobuf wire encoding (varint base-128, little-endian fixed64/32,
  length-delimited submessages; tag = field_number << 3 | wire_type);
* the OTLP field layout of ``opentelemetry/proto/logs/v1/logs.proto`` and
  ``opentelemetry/proto/common/v1/common.proto`` (field numbers below match
  the reference's generated pdata structs, e.g.
  pdata/plog/generated_logrecord.go and pdata/pcommon/generated_value.go).

Everything here is pure Python over ``bytes`` — no Spark imports — so the
codec unit-tests run without a session and the Spark glue
(operators/protobuf.py) stays a thin Arrow-batched wrapper. Deployments
that ship the spark-protobuf jar can swap in the native
``from_protobuf``/``to_protobuf`` fast path (same bytes — this codec is the
conformance oracle for that swap); the gate is documented in
operators/protobuf.py alongside the Iceberg gate pattern of
sources/catalog.py.

proto3 presence semantics are preserved: zero/default-valued scalar fields
are omitted on encode and materialize as defaults on decode, exactly like
the reference's generated marshalers.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

# wire types (protobuf encoding spec)
_VARINT = 0
_FIXED64 = 1
_LEN = 2
_FIXED32 = 5

_U64 = (1 << 64) - 1
_I64_MAX = (1 << 63) - 1


# --- primitive writers ------------------------------------------------------


def encode_varint(n: int) -> bytes:
    """Base-128 varint for n in [0, 2^64)."""
    if not 0 <= n <= _U64:
        raise ValueError(f"varint out of range: {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return encode_varint((field << 3) | wire)


def _int64_field(field: int, v: int) -> bytes:
    # proto int64: negative values encode as 10-byte two's-complement varint
    return _tag(field, _VARINT) + encode_varint(v & _U64)


def _fixed64_field(field: int, v: int) -> bytes:
    return _tag(field, _FIXED64) + struct.pack("<Q", v & _U64)


def _fixed32_field(field: int, v: int) -> bytes:
    return _tag(field, _FIXED32) + struct.pack("<I", v & 0xFFFFFFFF)


def _double_field(field: int, v: float) -> bytes:
    return _tag(field, _FIXED64) + struct.pack("<d", v)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _LEN) + encode_varint(len(payload)) + payload


def _str_field(field: int, s: str) -> bytes:
    return _len_field(field, s.encode("utf-8"))


# --- primitive reader -------------------------------------------------------


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, next_pos); raises ValueError on truncation/overlong."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift > 63:
            raise ValueError("varint exceeds 64 bits")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & _U64, pos
        shift += 7


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) over one message's bytes.

    Values: int for VARINT/FIXED64/FIXED32 (unsigned), bytes for LEN.
    Unknown wire types raise — the reference's unmarshal does the same
    (proto cannot skip what it cannot size).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = decode_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 0:
            raise ValueError("field number 0 is reserved")
        if wire == _VARINT:
            v, pos = decode_varint(buf, pos)
        elif wire == _FIXED64:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wire == _FIXED32:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wire == _LEN:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            v = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u > _I64_MAX else u


# --- AnyValue / KeyValue (common.proto) --------------------------------------
# AnyValue oneof fields (pdata/pcommon/generated_value.go):
#   1 string_value, 2 bool_value, 3 int_value, 4 double_value,
#   5 array_value (ArrayValue{1: repeated AnyValue}),
#   6 kvlist_value (KeyValueList{1: repeated KeyValue}), 7 bytes_value
# KeyValue: 1 key (string), 2 value (AnyValue)


def encode_any_value(v: Any) -> bytes:
    if isinstance(v, bool):  # before int — bool is an int subclass
        # oneof presence: False still encodes (explicit 0 varint)
        return _int64_field(2, 1 if v else 0)
    if isinstance(v, int):
        return _int64_field(3, v)
    if isinstance(v, float):
        return _double_field(4, v)
    if isinstance(v, str):
        return _str_field(1, v)
    if isinstance(v, (bytes, bytearray)):
        return _len_field(7, bytes(v))
    if isinstance(v, list):
        inner = b"".join(_len_field(1, encode_any_value(x)) for x in v)
        return _len_field(5, inner)
    if isinstance(v, dict):
        inner = b"".join(
            _len_field(1, encode_key_value(k, x)) for k, x in v.items()
        )
        return _len_field(6, inner)
    raise TypeError(f"unsupported AnyValue type: {type(v).__name__}")


def decode_any_value(buf: bytes) -> Any:
    val: Any = None  # empty AnyValue == unset oneof
    for field, _wire, v in iter_fields(buf):
        if field == 1:
            val = v.decode("utf-8")
        elif field == 2:
            val = bool(v)
        elif field == 3:
            val = _to_i64(v)
        elif field == 4:
            val = struct.unpack("<d", struct.pack("<Q", v))[0]
        elif field == 5:
            val = [
                decode_any_value(item)
                for f2, _w2, item in iter_fields(v)
                if f2 == 1
            ]
        elif field == 6:
            val = dict(
                decode_key_value(item)
                for f2, _w2, item in iter_fields(v)
                if f2 == 1
            )
        elif field == 7:
            val = bytes(v)
    return val


def encode_key_value(key: str, value: Any) -> bytes:
    return _str_field(1, key) + _len_field(2, encode_any_value(value))


def decode_key_value(buf: bytes) -> tuple[str, Any]:
    key = ""
    value: Any = None
    for field, _wire, v in iter_fields(buf):
        if field == 1:
            key = v.decode("utf-8")
        elif field == 2:
            value = decode_any_value(v)
    return key, value


def _attrs_block(field: int, attrs: dict[str, Any]) -> bytes:
    return b"".join(
        _len_field(field, encode_key_value(k, v))
        for k, v in attrs.items()
        if v is not None
    )


# --- LogRecord (logs.proto) ---------------------------------------------------
# Field numbers (pdata/plog/generated_logrecord.go):
#   1 time_unix_nano (fixed64)      2 severity_number (varint enum)
#   3 severity_text (string)        5 body (AnyValue)
#   6 attributes (repeated KeyValue) 7 dropped_attributes_count (uint32)
#   8 flags (fixed32)               9 trace_id (bytes[16])
#  10 span_id (bytes[8])           11 observed_time_unix_nano (fixed64)


def encode_log_record(rec: dict[str, Any]) -> bytes:
    """rec keys (all optional, proto3 defaults omitted): time_unix_nano,
    severity_number, severity_text, body, attributes (ordered dict),
    dropped_attributes_count, flags, trace_id (bytes), span_id (bytes),
    observed_time_unix_nano."""
    out = bytearray()
    if rec.get("time_unix_nano"):
        out += _fixed64_field(1, rec["time_unix_nano"])
    if rec.get("severity_number"):
        out += _int64_field(2, rec["severity_number"])
    if rec.get("severity_text"):
        out += _str_field(3, rec["severity_text"])
    if rec.get("body") is not None:
        out += _len_field(5, encode_any_value(rec["body"]))
    out += _attrs_block(6, rec.get("attributes") or {})
    if rec.get("dropped_attributes_count"):
        out += _int64_field(7, rec["dropped_attributes_count"])
    if rec.get("flags"):
        out += _fixed32_field(8, rec["flags"])
    if rec.get("trace_id"):
        out += _len_field(9, rec["trace_id"])
    if rec.get("span_id"):
        out += _len_field(10, rec["span_id"])
    if rec.get("observed_time_unix_nano"):
        out += _fixed64_field(11, rec["observed_time_unix_nano"])
    return bytes(out)


def decode_log_record(buf: bytes) -> dict[str, Any]:
    rec: dict[str, Any] = {
        "time_unix_nano": 0,
        "severity_number": 0,
        "severity_text": "",
        "body": None,
        "attributes": {},
        "dropped_attributes_count": 0,
        "flags": 0,
        "trace_id": b"",
        "span_id": b"",
        "observed_time_unix_nano": 0,
    }
    for field, _wire, v in iter_fields(buf):
        if field == 1:
            rec["time_unix_nano"] = v
        elif field == 2:
            rec["severity_number"] = _to_i64(v)
        elif field == 3:
            rec["severity_text"] = v.decode("utf-8")
        elif field == 5:
            rec["body"] = decode_any_value(v)
        elif field == 6:
            k, val = decode_key_value(v)
            rec["attributes"][k] = val
        elif field == 7:
            rec["dropped_attributes_count"] = v
        elif field == 8:
            rec["flags"] = v
        elif field == 9:
            rec["trace_id"] = bytes(v)
        elif field == 10:
            rec["span_id"] = bytes(v)
        elif field == 11:
            rec["observed_time_unix_nano"] = v
    return rec


# --- ExportLogsServiceRequest hierarchy (logs_service.proto / logs.proto) ----
# ExportLogsServiceRequest: 1 repeated ResourceLogs
# ResourceLogs:  1 Resource, 2 repeated ScopeLogs, 3 schema_url
# Resource:      1 repeated KeyValue, 2 dropped_attributes_count
# ScopeLogs:     1 InstrumentationScope, 2 repeated LogRecord, 3 schema_url
# InstrumentationScope: 1 name, 2 version, 3 repeated KeyValue


def encode_logs_request(
    resource_attrs: dict[str, Any],
    scope_name: str,
    records: list[dict[str, Any]],
) -> bytes:
    resource = _attrs_block(1, resource_attrs)
    scope = _str_field(1, scope_name) if scope_name else b""
    scope_logs = _len_field(1, scope) + b"".join(
        _len_field(2, encode_log_record(r)) for r in records
    )
    resource_logs = _len_field(1, resource) + _len_field(2, scope_logs)
    return _len_field(1, resource_logs)


def decode_logs_request(
    buf: bytes,
) -> list[tuple[dict[str, Any], str, list[dict[str, Any]]]]:
    """Returns [(resource_attrs, scope_name, [log_record, ...]), ...] — one
    tuple per (ResourceLogs, ScopeLogs) pair, the receiver-side flatten
    (otlpreceiver encoder.go:30-133)."""
    out: list[tuple[dict[str, Any], str, list[dict[str, Any]]]] = []
    for f1, _w1, rl in iter_fields(buf):
        if f1 != 1:
            continue
        resource_attrs: dict[str, Any] = {}
        for f2, _w2, v2 in iter_fields(rl):
            if f2 == 1:  # Resource
                for f3, _w3, v3 in iter_fields(v2):
                    if f3 == 1:
                        k, val = decode_key_value(v3)
                        resource_attrs[k] = val
        for f2, _w2, v2 in iter_fields(rl):
            if f2 != 2:  # ScopeLogs
                continue
            scope_name = ""
            records: list[dict[str, Any]] = []
            for f3, _w3, v3 in iter_fields(v2):
                if f3 == 1:  # InstrumentationScope
                    for f4, _w4, v4 in iter_fields(v3):
                        if f4 == 1:
                            scope_name = v4.decode("utf-8")
                elif f3 == 2:
                    records.append(decode_log_record(v3))
            out.append((resource_attrs, scope_name, records))
    return out
