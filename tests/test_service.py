"""Config-driven service execution: a YAML-shaped config builds and runs the
full pipeline graph (collector.Run analog, otelcol/collector.go:154-255),
including multi-exporter fan-out and type/name component instances."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.config import ServiceConfig
from opentelemetry_collector_spark.plans.service import run_service
from tests.conftest import SF_SMOKE


def _cfg(tmp_path) -> ServiceConfig:
    return ServiceConfig.from_sources(
        {
            "receivers": {"transcripts": {"path": SF_SMOKE}},
            "processors": {"parse": {}, "enrich": {}, "route": {}},
            "exporters": {
                "sinks": {"path": str(tmp_path / "sinks"),
                          "max_records_per_file": 500},
                "sink_counts": {"path": str(tmp_path / "counts")},
                "otlp_jsonl/backup": {"path": str(tmp_path / "export"),
                                      "compression": "gzip"},
            },
            "service": {
                "pipelines": {
                    "logs": {
                        "receivers": ["transcripts"],
                        "processors": ["parse", "enrich", "route"],
                        "exporters": ["sinks", "sink_counts",
                                      "otlp_jsonl/backup"],
                    }
                }
            },
        },
        env={},
    )


def test_run_service_end_to_end(spark, tmp_path):
    results = run_service(spark, _cfg(tmp_path))
    routed = results["logs"]
    n = routed.count()

    # every exporter consumed the same fan-out (count conservation per sink)
    sinks = spark.read.parquet(str(tmp_path / "sinks"))
    assert sinks.count() == n
    counts = spark.read.parquet(str(tmp_path / "counts"))
    ok = routed.filter(F.col("error_reason").isNull()).count()
    assert counts.agg(F.sum("n_rows")).collect()[0][0] == ok
    export = spark.read.text(str(tmp_path / "export"))
    assert export.count() == n


def test_run_service_unknown_component_type(spark, tmp_path):
    cfg = _cfg(tmp_path)
    cfg.exporters["kafka"] = {"path": "x"}
    cfg.pipelines["logs"]["exporters"] = ["kafka"]
    with pytest.raises(ValueError, match="no factory for exporter"):
        run_service(spark, cfg)


def test_run_service_custom_factory(spark, tmp_path):
    captured = {}

    def capture(spark_, df, cfg):
        captured["n"] = df.count()

    cfg = _cfg(tmp_path)
    cfg.exporters["capture"] = {}
    cfg.pipelines["logs"]["exporters"] = ["capture"]
    results = run_service(spark, cfg, extra_exporters={"capture": capture})
    assert captured["n"] == results["logs"].count()
