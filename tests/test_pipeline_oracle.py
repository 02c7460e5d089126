"""Every pipeline query vs its DuckDB oracle at sf0.01 — the same comparison
the driver's correctness gate performs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.queries import PIPELINE_ORACLES, PIPELINE_QUERIES
from tests.conftest import SF_CORRECT, assert_df_equal


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    # every registered query is oracle-gated; the approx-quantile path is
    # deliberately unregistered and tolerance-checked in
    # tests/test_metrics_traces.py instead (VERDICT r04 task 3)
    assert name in PIPELINE_ORACLES, f"{name} missing an oracle"
    sdf = PIPELINE_QUERIES[name](spark, SF_CORRECT)
    con = duck(SF_CORRECT)
    ddf = con.sql(PIPELINE_ORACLES[name])
    assert_df_equal(sdf, ddf)


def test_count_conservation(spark):
    """Input row count == routed_ok + dead_letter (batch_processor_test.go:39-79
    count-conservation analog)."""
    from opentelemetry_collector_spark.queries import _routed, q_transcripts_source

    total = q_transcripts_source(spark, SF_CORRECT).count()
    routed = _routed(spark, SF_CORRECT)
    ok = routed.filter("error_reason IS NULL").count()
    dead = routed.filter("error_reason IS NOT NULL").count()
    assert total == ok + dead
    assert dead > 0, "fixture must exercise the dead-letter path"


def test_sink_counts_sum_to_ok_rows(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.queries import _routed, q_sink_counts

    counts = q_sink_counts(spark, SF_CORRECT)
    n = counts.agg(F.sum("n_rows")).collect()[0][0]
    ok = _routed(spark, SF_CORRECT).filter("error_reason IS NULL").count()
    assert n == ok


def test_log_dedup_conserves_and_collapses(spark):
    """Template dedup must conserve records (sum of group counts == input
    rows) and actually collapse something on the fixture (bodies that
    differ only in numeric payloads share a template)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.queries import PIPELINE_QUERIES, _parsed

    groups = PIPELINE_QUERIES["log_dedup"](spark, SF_CORRECT)
    total = groups.agg(F.sum("n_records")).collect()[0][0]
    assert total == _parsed(spark, SF_CORRECT).count()
    assert groups.filter(F.col("n_records") > 1).count() > 0
