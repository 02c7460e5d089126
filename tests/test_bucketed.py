"""Mechanical proof of the PLANS.md layout claim: on the production
bucket(conv_id) + turn-ordered table, every conv_id-keyed operator runs
EXCHANGE-FREE (the one pipeline shuffle exists only because test fixtures
derive transcripts from flat events). Verified with Spark's native
bucketBy as the metastore-less stand-in for the Iceberg layout
(sources/catalog.py header)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opentelemetry_collector_spark.operators.parse import parse_turns
from opentelemetry_collector_spark.operators.traces import (
    span_edges,
    tail_sampling,
    trace_rollup,
)
from opentelemetry_collector_spark.sources.catalog import write_bucketed_table
from opentelemetry_collector_spark.sources.transcripts import (
    events_to_transcripts,
)
from tests.conftest import SF_SMOKE


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """Transcripts written in the production layout + the same files read
    back WITHOUT bucket metadata (the control)."""
    path = str(tmp_path_factory.mktemp("bucketed") / "transcripts_bucketed")
    spark.sql("DROP TABLE IF EXISTS transcripts_bucketed")
    write_bucketed_table(
        events_to_transcripts(spark, SF_SMOKE),
        "transcripts_bucketed",
        n_buckets=8,
        path=path,
    )
    yield spark.table("transcripts_bucketed"), spark.read.parquet(path)
    spark.sql("DROP TABLE IF EXISTS transcripts_bucketed")


CONV_KEYED_OPS = [
    ("trace_rollup", lambda d: trace_rollup(parse_turns(d))),
    ("tail_sampling", lambda d: tail_sampling(parse_turns(d))),
    ("span_edges", lambda d: span_edges(parse_turns(d))),
    (
        "ordering_window",
        lambda d: d.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy("turn_idx")
            ),
        ),
    ),
]


@pytest.mark.parametrize("name,op", CONV_KEYED_OPS, ids=[n for n, _ in CONV_KEYED_OPS])
def test_bucketed_layout_removes_the_conv_shuffle(name, op, bucketed):
    table, plain = bucketed
    n_bucketed = _shuffles(op(table))
    n_plain = _shuffles(op(plain))
    # span_edges keeps its tiny (src,dst) aggregate exchange; everything
    # conv_id-keyed must vanish.
    allowed = 1 if name == "span_edges" else 0
    assert n_bucketed <= allowed, f"{name}: bucketed plan still shuffles"
    assert n_plain > n_bucketed, f"{name}: control should shuffle more"


def test_bucketed_results_equal_plain(spark, bucketed):
    """Same rows either way — the layout changes the plan, not the answer."""
    table, plain = bucketed
    a = trace_rollup(parse_turns(table)).orderBy("conv_id").collect()
    b = trace_rollup(parse_turns(plain)).orderBy("conv_id").collect()
    assert a == b and len(a) > 0


def test_bucketed_scan_skips_the_global_sort(bucketed):
    """sortBy(turn_idx) per bucket means the ordering window needs only a
    partition-local sort (Sort ... global=false), never a range exchange."""
    table, _ = bucketed
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    plan = (
        table.withColumn("rn", F.row_number().over(w))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Sort [conv_id" in plan and ", false, 0" in plan  # local sort


def test_co_bucketed_join_needs_no_exchange(spark, tmp_path_factory):
    """The classic 100 TB join shape: two tables bucketed on conv_id with
    the same bucket count join as a SortMergeJoin with ZERO exchanges —
    only partition-local sorts (broadcast disabled to force the join to
    prove co-location, not dodge it)."""
    base = str(tmp_path_factory.mktemp("cojoin"))
    spark.sql("DROP TABLE IF EXISTS cj_transcripts")
    spark.sql("DROP TABLE IF EXISTS cj_rollup")
    write_bucketed_table(
        events_to_transcripts(spark, SF_SMOKE),
        "cj_transcripts",
        n_buckets=8,
        path=f"{base}/t",
    )
    trace_rollup(parse_turns(spark.table("cj_transcripts"))).write.bucketBy(
        8, "conv_id"
    ).mode("overwrite").option("path", f"{base}/r").saveAsTable("cj_rollup")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("cj_transcripts").join(
            spark.table("cj_rollup"), "conv_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_shuffles == 0, plan[:500]
        # and the join is actually correct
        n = j.count()
        assert n == spark.table("cj_transcripts").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS cj_transcripts")
        spark.sql("DROP TABLE IF EXISTS cj_rollup")
