"""Config resolution, obsreport counters, OTLP JSON round-trip, batch split,
salting invariance — the control-plane / reliability parity tests
(SURVEY §2.6, §2.9; otelcol/collector_test.go:41-227 config variants,
processor/batchprocessor split tests)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.enrich import enrich
from opentelemetry_collector_spark.operators.observe import (
    from_otlp_json,
    observed_pipeline,
    to_otlp_json,
)
from opentelemetry_collector_spark.operators.parse import parse_turns
from opentelemetry_collector_spark.operators.route import route, write_sinks
from opentelemetry_collector_spark.plans.config import (
    ServiceConfig,
    deep_merge,
    expand_vars,
    load_uri,
)
from opentelemetry_collector_spark.plans.pipeline import Pipeline, PipelineConfig
from opentelemetry_collector_spark.sources.transcripts import events_to_transcripts
from tests.conftest import SF_SMOKE

VALID_CFG = {
    "receivers": {"transcripts": {"path": "${env:SRC_PATH}"}},
    "processors": {"parse": {}, "enrich": {}},
    "exporters": {"sinks": {"path": "/tmp/out"}},
    "service": {
        "pipelines": {
            "logs": {
                "receivers": ["transcripts"],
                "processors": ["parse", "enrich"],
                "exporters": ["sinks"],
            }
        }
    },
}


# --- confmap analog ---------------------------------------------------------


def test_config_valid_and_env_expansion():
    cfg = ServiceConfig.from_sources(VALID_CFG, env={"SRC_PATH": "/data/x"})
    assert cfg.receivers["transcripts"]["path"] == "/data/x"


def test_config_unset_env_resolves_empty():
    cfg = ServiceConfig.from_sources(VALID_CFG, env={})
    assert cfg.receivers["transcripts"]["path"] == ""


def test_config_merge_order():
    over = {"exporters": {"sinks": {"path": "/tmp/other"}}}
    merged = deep_merge(VALID_CFG, over)
    cfg = ServiceConfig.from_sources(merged, env={})
    assert cfg.exporters["sinks"]["path"] == "/tmp/other"


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda c: c["service"]["pipelines"].clear(), "at least one pipeline"),
        (lambda c: c["service"]["pipelines"]["logs"].update(receivers=[]),
         "at least one receiver"),
        (lambda c: c["service"]["pipelines"]["logs"].update(exporters=[]),
         "at least one exporter"),
        (lambda c: c["service"]["pipelines"]["logs"].update(
            processors=["parse", "parse"]), "more than once"),
        (lambda c: c["service"]["pipelines"]["logs"].update(
            receivers=["nope"]), "unknown receiver"),
    ],
)
def test_config_invalid_variants(mutate, msg):
    import copy

    bad = copy.deepcopy(VALID_CFG)
    mutate(bad)
    with pytest.raises(ValueError, match=msg):
        ServiceConfig.from_sources(bad, env={})


def test_config_yaml_file_roundtrip(tmp_path):
    import yaml

    p = tmp_path / "collector.yaml"
    p.write_text(yaml.safe_dump(VALID_CFG))
    cfg = ServiceConfig.from_sources(str(p), env={"SRC_PATH": "/y"})
    assert cfg.pipelines["logs"]["processors"] == ["parse", "enrich"]


def test_expand_vars_nested():
    v = expand_vars({"a": ["${X}", {"b": "pre-${env:X}-post"}]}, env={"X": "v"})
    assert v == {"a": ["v", {"b": "pre-v-post"}]}


# --- provider URIs (confmap/provider/*) -------------------------------------


def test_config_file_scheme_uri(tmp_path):
    import yaml

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(VALID_CFG))
    cfg = ServiceConfig.from_sources(f"file:{p}", env={"SRC_PATH": "/y"})
    assert cfg.receivers["transcripts"]["path"] == "/y"


def test_config_env_provider_uri(monkeypatch):
    import yaml

    body = yaml.safe_dump(VALID_CFG)
    # explicit env mapping: provider URIs and ${} expansion resolve against
    # the SAME environment (one resolve call never sees two environments)
    cfg = ServiceConfig.from_sources(
        "env:OTEL_CFG_BODY", env={"OTEL_CFG_BODY": body, "SRC_PATH": "/z"}
    )
    assert cfg.receivers["transcripts"]["path"] == "/z"
    # no env given -> the process environment serves both roles
    monkeypatch.setenv("OTEL_CFG_BODY", body)
    monkeypatch.setenv("SRC_PATH", "/proc")
    cfg2 = ServiceConfig.from_sources("env:OTEL_CFG_BODY")
    assert cfg2.receivers["transcripts"]["path"] == "/proc"


def test_config_env_provider_unset_raises():
    with pytest.raises(ValueError, match="is not set"):
        load_uri("env:OTEL_CFG_BODY_DOES_NOT_EXIST")


def test_config_yaml_provider_uri():
    # yamlprovider: the URI body IS the YAML — used for CLI --set overrides
    over = load_uri('yaml:{exporters: {sinks: {path: /tmp/override}}}')
    cfg = ServiceConfig.from_sources(VALID_CFG, over, env={})
    assert cfg.exporters["sinks"]["path"] == "/tmp/override"


def test_config_http_provider_loopback(tmp_path):
    """httpprovider round-trip against a real loopback server (no external
    network); https differs only in the TLS handshake urllib owns."""
    import http.server
    import threading
    import yaml

    (tmp_path / "c.yaml").write_text(yaml.safe_dump(VALID_CFG))
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        cfg = ServiceConfig.from_sources(
            f"http://127.0.0.1:{port}/c.yaml", env={"SRC_PATH": "/h"}
        )
        assert cfg.receivers["transcripts"]["path"] == "/h"
        with pytest.raises(Exception):
            load_uri(f"http://127.0.0.1:{port}/missing.yaml")
    finally:
        srv.shutdown()
        srv.server_close()


def test_config_unknown_scheme_raises():
    with pytest.raises(ValueError, match="unsupported config provider"):
        load_uri("ftp:whatever")


# --- obsreport counters -----------------------------------------------------


def test_observed_counts_match_groupby(spark):
    routed = route(enrich(parse_turns(
        events_to_transcripts(spark, SF_SMOKE)), spark))
    observed, obs = observed_pipeline(routed)
    total = observed.count()  # the action that materializes the observation
    m = obs.get
    assert m["receiver_accepted_log_records"] == total
    assert (
        m["exporter_sent_log_records"] + m["processor_dropped_log_records"]
        == total
    )
    dead = routed.filter(F.col("error_reason").isNotNull()).count()
    assert m["processor_dropped_log_records"] == dead
    assert m["active_sinks"] == routed.select("sink_id").na.drop().distinct().count()


# --- OTLP JSON codec --------------------------------------------------------


def test_otlp_json_roundtrip(spark):
    parsed = parse_turns(events_to_transcripts(spark, SF_SMOKE))
    cols = ["conv_id", "turn_idx", "role", "ts", "severity_number",
            "severity_text", "trace_id", "span_id", "attributes_json", "body"]
    back = from_otlp_json(to_otlp_json(parsed)).select(*cols)
    orig = parsed.select(*cols)
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


# --- batch split (maxRecordsPerFile) ---------------------------------------


def test_sink_write_respects_max_records_per_file(spark, tmp_path):
    routed = route(enrich(parse_turns(
        events_to_transcripts(spark, SF_SMOKE)), spark))
    base = str(tmp_path / "sinks")
    write_sinks(routed.coalesce(1), base, max_records_per_file=100)
    for f in glob.glob(f"{base}/*/*.parquet"):
        n = spark.read.parquet(f).count()
        assert n <= 100, f"{f} has {n} rows (split cap violated)"
    # count conservation across the fan-out write
    assert spark.read.parquet(base).count() == routed.count()


# --- salting invariance -----------------------------------------------------


def test_salted_pipeline_same_results(spark):
    t = events_to_transcripts(spark, SF_SMOKE)
    plain = Pipeline(spark, PipelineConfig(source_path="x")).run(t)
    salted = Pipeline(
        spark, PipelineConfig(source_path="x", salt_buckets=7)
    ).run(t)
    for key in ("ok", "dead_letter"):
        a = plain[key].select("conv_id", "turn_idx", "sink_id")
        b = salted[key].select("conv_id", "turn_idx", "sink_id")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    sc_a = {tuple(r) for r in plain["sink_counts"].collect()}
    sc_b = {tuple(r) for r in salted["sink_counts"].collect()}
    assert sc_a == sc_b


def test_expand_vars_dollar_escape():
    """$$ escapes a literal $ (confmap expand.go parity): $${X} is never
    expanded."""
    assert expand_vars("a $${X} b", env={"X": "v"}) == "a ${X} b"
    assert expand_vars("$$", env={}) == "$"
    assert expand_vars("cost: $$5 for ${X}", env={"X": "v"}) == "cost: $5 for v"


# --- JSON-lines wire format (OTLP/HTTP JSON analog) -------------------------


@pytest.mark.parametrize(
    "compression",
    [None, "none", "gzip", "zlib", "deflate", "snappy", "lz4", "zstd"],
)
def test_jsonl_file_roundtrip(spark, tmp_path, compression):
    """Parsed turns -> JSON-lines files -> typed columns: the full wire
    round-trip must be lossless, including µs timestamps, under every
    reference wire codec (configcompression/compressionType.go:22-41 —
    zlib and deflate are one stream format there too; zstd exercises the
    pyarrow frame wire on this sandbox's Hadoop-codec-less classpath)."""
    import glob

    from opentelemetry_collector_spark.sources.jsonl import (
        read_otlp_jsonl,
        write_otlp_jsonl,
    )

    parsed = parse_turns(events_to_transcripts(spark, SF_SMOKE))
    path = str(tmp_path / "export")
    write_otlp_jsonl(parsed, path, compression=compression)

    if compression not in (None, "none"):
        ext = {"gzip": ".gz", "zlib": ".deflate", "deflate": ".deflate",
               "snappy": ".snappy", "lz4": ".lz4", "zstd": ".zst"}
        files = glob.glob(f"{path}/part-*")
        assert files and all(f.endswith(ext[compression]) for f in files), (
            f"expected {ext[compression]} files, got {files[:3]}"
        )

    back = read_otlp_jsonl(spark, path)
    cols = ["conv_id", "turn_idx", "role", "ts", "severity_number",
            "severity_text", "trace_id", "span_id", "attributes_json", "body"]
    orig = parsed.select(*cols)
    got = back.select(*cols)
    assert got.exceptAll(orig).count() == 0
    assert orig.exceptAll(got).count() == 0


def test_jsonl_unknown_codec_rejected(spark, tmp_path):
    """An unregistered codec name fails fast at config time (the reference
    validates compression type the same way, compressionType.go IsCompressed
    switch), not halfway through a write."""
    from opentelemetry_collector_spark.sources.jsonl import write_otlp_jsonl

    parsed = parse_turns(events_to_transcripts(spark, SF_SMOKE))
    with pytest.raises(ValueError, match="unsupported wire compression"):
        write_otlp_jsonl(parsed, str(tmp_path / "x"), compression="brotli")


def test_jsonl_malformed_lines_dead_letter(spark, tmp_path):
    """Garbage lines become null-column rows (partial success), not scan
    failures."""
    from opentelemetry_collector_spark.sources.jsonl import read_otlp_jsonl

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.txt").write_text(
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", '
        '"time_unix_micros": 1700000000000000, "severity_number": 0, '
        '"body": "ok"}\n'
        "NOT JSON AT ALL\n"
    )
    df = read_otlp_jsonl(spark, str(p))
    assert df.count() == 2
    assert df.filter("conv_id IS NULL").count() == 1  # the dead-letter row
    assert df.filter("conv_id = 'c1'").count() == 1


def test_sink_write_compression_codec(spark, tmp_path):
    """configcompression analog: the sink write honors the parquet codec
    (zstd files on disk, content identical)."""
    from opentelemetry_collector_spark.operators.enrich import enrich
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.route import route, write_sinks
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
    )
    from tests.conftest import SF_SMOKE

    routed = route(enrich(parse_turns(
        events_to_transcripts(spark, SF_SMOKE)), spark))
    out = str(tmp_path / "zstd_sinks")
    write_sinks(routed, out, compression="zstd")
    files = list((tmp_path / "zstd_sinks").rglob("*.parquet"))
    assert files and all(".zstd." in f.name for f in files)
    assert spark.read.parquet(out).count() == routed.count()


def test_registry_order_is_a_permutation_of_the_registry():
    """REGISTRY_ORDER drives which operators land inside the driver's
    bounded correctness-artifact window — it must list every registered
    query exactly once, and every oracle key must have a query."""
    from opentelemetry_collector_spark import queries as q

    merged = {**q.PIPELINE_QUERIES, **q.DOCS_QUERIES}
    assert sorted(q.REGISTRY_ORDER) == sorted(merged)
    assert len(q.REGISTRY_ORDER) == len(set(q.REGISTRY_ORDER))
    assert list(q.ordered_queries()) == q.REGISTRY_ORDER
    oracles = {**q.PIPELINE_ORACLES, **q.DOCS_ORACLES}
    assert set(oracles) <= set(merged)
    # ordered_oracles preserves the same prefix order
    assert list(q.ordered_oracles()) == [
        n for n in q.REGISTRY_ORDER if n in oracles
    ]


def test_stale_or_new_operators_lead_the_registry():
    """Rotation discipline (VERDICT r03 task 2): every operator absent
    from the LATEST recorded artifact sits inside the first 50 registry
    entries, so the next driver run re-records it and the union of any two
    consecutive rounds covers the full registry."""
    import json
    import re
    from pathlib import Path

    from opentelemetry_collector_spark import queries as q

    root = Path(__file__).resolve().parents[1]
    latest = max(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    recorded = json.loads(latest.read_text())
    stale = [n for n in q.REGISTRY_ORDER if n not in recorded]
    window = q.REGISTRY_ORDER[:50]
    missing = [n for n in stale if n not in window]
    assert not missing, (
        f"operators absent from {latest.name} outside the window: {missing}"
    )
