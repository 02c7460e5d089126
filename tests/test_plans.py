"""Physical-plan regression guards: the plan properties PLANS.md claims are
asserted here so a future change can't silently trade them away (the
.explain review, mechanized)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.queries import (
    DOCS_QUERIES,
    PIPELINE_QUERIES,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_enrich_uses_broadcast_hash_join_only(spark):
    plan = _plan(PIPELINE_QUERIES["enrich"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "lookup join must not shuffle the big side"
    assert "BroadcastNestedLoopJoin" not in plan


def _shuffles(plan: str) -> int:
    """Shuffle exchanges only (BroadcastExchange is not a data shuffle)."""
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def test_narrow_ops_add_no_shuffle(spark):
    """parse/route/transform are projections: exactly one shuffle total —
    the transcripts-derivation window (test-fixture artifact), none from
    the operator itself."""
    for name in ["parse_turns", "route", "transform_pipeline"]:
        plan = _plan(PIPELINE_QUERIES[name](spark, SF_SMOKE))
        assert _shuffles(plan) <= 1, f"{name} added a shuffle"


def test_aggregates_do_partial_aggregation(spark):
    """Every groupBy must map-side combine before its exchange."""
    for name in ["sink_counts", "span_stats", "metrics_histogram",
                 "span_red_metrics"]:
        plan = _plan(PIPELINE_QUERIES[name](spark, SF_SMOKE))
        # partial + final HashAggregate pairs straddling the exchange
        assert plan.count("HashAggregate") >= 2, f"{name} lacks partial agg"


def test_docs_scans_prune_columns(spark):
    """doc_tokens projects 2 columns: the parquet scan must not read the
    rest of the documents table (column pruning reaches the source)."""
    plan = _plan(DOCS_QUERIES["doc_tokens"](spark, SF_SMOKE))
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan, "expected a parquet scan"
    line = scan[0]
    assert "text" in line
    assert "source" not in line.split("ReadSchema")[-1], (
        "unprojected column read from the documents scan"
    )


def test_ann_brute_force_broadcasts_query_side_only(spark):
    """The deliberate BroadcastNestedLoopJoin broadcasts the tiny QUERY
    side; the corpus side must stream (no cartesian of two big sides)."""
    plan = _plan(DOCS_QUERIES["ann_cosine_topk"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_joins_are_equality_joins(spark):
    """Candidate generation must hash-join on band/bucket keys — a nested
    loop here would be quadratic in the corpus."""
    for name in ["dedup_minhash_pairs", "dedup_simhash_pairs",
                 "dedup_ngram_pairs"]:
        plan = _plan(DOCS_QUERIES[name](spark, SF_SMOKE))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
