"""OTLP/JSON wire codec — the spec-exact JSON encoding of the logs signal
(pdata/plog/internal/plogjson/json.go; public OTLP/JSON spec = proto3 JSON
mapping with OTLP special cases). The reference negotiates protobuf OR JSON
on the OTLP/HTTP endpoint (receiver/otlpreceiver/encoder.go:30-36); this
module is the JSON twin of functions/protowire.py, sharing the SAME record
dict shape, so `decode_json(encode_json(r)) == decode_pb(encode_pb(r))` is
a testable conformance property.

Encoding rules implemented (proto3 JSON + OTLP deviations):
- field names lowerCamelCase; proto3 default values (0, "", empty) omitted;
- 64-bit ints (timeUnixNano) ride as decimal STRINGS;
- trace_id/span_id are HEX strings (the OTLP special case — plain proto3
  JSON would base64 them);
- bytes values are base64; AnyValue uses the typed object encoding
  ({"stringValue": ...}, {"intValue": "42"}, ...);
- attributes are a KeyValue LIST [{"key": k, "value": {...}}] (map order
  is meaningful in pdata, so it is not a JSON object).

Pure Python — used inside Arrow-batched mapInPandas by the operators in
operators/protobuf.py, same scale shape as the protobuf codec.
"""

from __future__ import annotations

import json
from typing import Any


def any_value_to_otlp_json(v: Any) -> dict[str, Any]:
    """One AnyValue (natural Python form) -> OTLP/JSON typed object."""
    if v is None:
        return {}  # unset oneof == empty object
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}  # int64 rides as a decimal string
    if isinstance(v, float):
        # proto3 JSON maps non-finite doubles to the STRINGS "NaN" /
        # "Infinity" / "-Infinity" — bare NaN/Infinity tokens are invalid
        # JSON and the reference's jsoniter marshaler never emits them.
        if v != v:  # NaN
            return {"doubleValue": "NaN"}
        if v == float("inf"):
            return {"doubleValue": "Infinity"}
        if v == float("-inf"):
            return {"doubleValue": "-Infinity"}
        return {"doubleValue": v}
    if isinstance(v, str):
        return {"stringValue": v}
    if isinstance(v, (bytes, bytearray)):
        import base64

        return {"bytesValue": base64.b64encode(bytes(v)).decode("ascii")}
    if isinstance(v, list):
        return {"arrayValue": {"values": [any_value_to_otlp_json(x) for x in v]}}
    if isinstance(v, dict):
        return {
            "kvlistValue": {
                "values": [
                    {"key": k, "value": any_value_to_otlp_json(x)}
                    for k, x in v.items()
                ]
            }
        }
    raise TypeError(f"unsupported AnyValue type: {type(v).__name__}")


def any_value_from_otlp_json(d: dict[str, Any]) -> Any:
    """OTLP/JSON typed object -> natural Python AnyValue (inverse of the
    above: decode(encode(v)) == v for all 7 types)."""
    if not d:
        return None
    if "boolValue" in d:
        return bool(d["boolValue"])
    if "intValue" in d:
        return int(d["intValue"])
    if "doubleValue" in d:
        return float(d["doubleValue"])
    if "stringValue" in d:
        return d["stringValue"]
    if "bytesValue" in d:
        import base64

        return base64.b64decode(d["bytesValue"])
    if "arrayValue" in d:
        return [
            any_value_from_otlp_json(x)
            for x in d["arrayValue"].get("values", [])
        ]
    if "kvlistValue" in d:
        return {
            kv["key"]: any_value_from_otlp_json(kv["value"])
            for kv in d["kvlistValue"].get("values", [])
        }
    raise ValueError(f"unrecognized OTLP/JSON AnyValue: {sorted(d)}")


def _attrs_to_json(attrs: dict[str, Any]) -> list[dict[str, Any]]:
    return [
        {"key": k, "value": any_value_to_otlp_json(v)} for k, v in attrs.items()
    ]


def _attrs_from_json(lst: list[dict[str, Any]]) -> dict[str, Any]:
    return {
        kv["key"]: any_value_from_otlp_json(kv.get("value", {})) for kv in lst
    }


def log_record_to_otlp_json(rec: dict[str, Any]) -> dict[str, Any]:
    """protowire LogRecord dict -> OTLP/JSON object (defaults omitted)."""
    out: dict[str, Any] = {}
    if rec.get("time_unix_nano"):
        out["timeUnixNano"] = str(rec["time_unix_nano"])
    if rec.get("observed_time_unix_nano"):
        out["observedTimeUnixNano"] = str(rec["observed_time_unix_nano"])
    if rec.get("severity_number"):
        out["severityNumber"] = rec["severity_number"]
    if rec.get("severity_text"):
        out["severityText"] = rec["severity_text"]
    # None == unset AnyValue message; an EMPTY string body is still a SET
    # body (message presence), mirroring protowire's `is not None` rule
    if rec.get("body") is not None:
        out["body"] = any_value_to_otlp_json(rec["body"])
    if rec.get("attributes"):
        out["attributes"] = _attrs_to_json(rec["attributes"])
    if rec.get("dropped_attributes_count"):
        out["droppedAttributesCount"] = rec["dropped_attributes_count"]
    if rec.get("flags"):
        out["flags"] = rec["flags"]
    if rec.get("trace_id"):
        out["traceId"] = bytes(rec["trace_id"]).hex()
    if rec.get("span_id"):
        out["spanId"] = bytes(rec["span_id"]).hex()
    return out


def log_record_from_otlp_json(d: dict[str, Any]) -> dict[str, Any]:
    """OTLP/JSON object -> protowire LogRecord dict (defaults restored, so
    the result is exactly what decode_log_record yields for the same
    record on the protobuf wire)."""
    body = d.get("body")
    return {
        "time_unix_nano": int(d.get("timeUnixNano", "0")),
        "observed_time_unix_nano": int(d.get("observedTimeUnixNano", "0")),
        "severity_number": int(d.get("severityNumber", 0)),
        "severity_text": d.get("severityText", ""),
        "body": None if body is None else any_value_from_otlp_json(body),
        "attributes": _attrs_from_json(d.get("attributes", [])),
        "dropped_attributes_count": int(d.get("droppedAttributesCount", 0)),
        "flags": int(d.get("flags", 0)),
        "trace_id": bytes.fromhex(d["traceId"]) if d.get("traceId") else b"",
        "span_id": bytes.fromhex(d["spanId"]) if d.get("spanId") else b"",
    }


def logs_request_to_otlp_json(
    resource_attrs: dict[str, Any],
    scope_name: str,
    records: list[dict[str, Any]],
) -> str:
    """One ExportLogsServiceRequest as canonical OTLP/JSON text (compact
    separators, proto field order — deterministic bytes for a given
    request, so encode(decode(s)) == s for requests this module wrote)."""
    scope: dict[str, Any] = {}
    if scope_name:
        scope["name"] = scope_name
    doc = {
        "resourceLogs": [
            {
                "resource": {"attributes": _attrs_to_json(resource_attrs)},
                "scopeLogs": [
                    {
                        "scope": scope,
                        "logRecords": [
                            log_record_to_otlp_json(r) for r in records
                        ],
                    }
                ],
            }
        ]
    }
    # allow_nan=False enforces the invariant above: non-finite doubles were
    # already mapped to their spec string encodings, so a bare NaN/Infinity
    # token here would be a codec bug, not valid output.
    return json.dumps(doc, separators=(",", ":"), allow_nan=False)


def logs_request_from_otlp_json(
    s: str,
) -> list[tuple[dict[str, Any], str, list[dict[str, Any]]]]:
    """OTLP/JSON text -> [(resource_attrs, scope_name, [record, ...])] —
    the same flatten shape as protowire.decode_logs_request. Strict:
    malformed JSON raises (receiver rejects the request)."""
    doc = json.loads(s)
    out: list[tuple[dict[str, Any], str, list[dict[str, Any]]]] = []
    for rl in doc.get("resourceLogs", []):
        res_attrs = _attrs_from_json(
            rl.get("resource", {}).get("attributes", [])
        )
        for sl in rl.get("scopeLogs", []):
            scope_name = sl.get("scope", {}).get("name", "")
            records = [
                log_record_from_otlp_json(r) for r in sl.get("logRecords", [])
            ]
            out.append((res_attrs, scope_name, records))
    return out
