"""Driver contract for the spark-graft builder (PySpark target).

Flagship: the OTel-collector-equivalent parse -> enrich -> route -> aggregate
pipeline over a deterministic transcripts table (derived from ``events`` with
exact Spark<->DuckDB expression parity so every stage is oracle-checkable).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from opentelemetry_collector_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-sink, per-time-bucket
    record counts from the full parse->enrich->route->aggregate pipeline."""
    return _q.q_sink_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_q.PIPELINE_QUERIES)
    out.update(_q.DOCS_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_q.PIPELINE_ORACLES)
    out.update(_q.DOCS_ORACLES)
    return out
