"""Hot-key skew handling (SURVEY §4 'ours to design'): a conversation holding
half the rows must neither change results nor concentrate on one partition
when salting is enabled."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.pipeline import Pipeline, PipelineConfig
from opentelemetry_collector_spark.sources.transcripts import events_to_transcripts
from tests.conftest import SF_SMOKE


def _skewed_transcripts(spark):
    """sf0.001 transcripts + one conversation amplified to ~half of all
    rows (turn_idx renumbered to stay unique per conv)."""
    t = events_to_transcripts(spark, SF_SMOKE)
    hot_conv = t.groupBy("conv_id").count().orderBy(F.desc("count")).first().conv_id
    hot = (
        t.filter(F.col("conv_id") == hot_conv)
        .crossJoin(F.broadcast(spark.range(40).select(F.col("id").alias("rep"))))
        .withColumn(
            "turn_idx",
            (F.col("turn_idx") * 40 + F.col("rep")).cast("int"),
        )
        .drop("rep")
    )
    return t.unionByName(hot), hot_conv


def test_salting_spreads_hot_conversation(spark):
    skewed, hot_conv = _skewed_transcripts(spark)
    n_total = skewed.count()
    n_hot = skewed.filter(F.col("conv_id") == hot_conv).count()
    assert n_hot / n_total > 0.4  # genuinely skewed fixture

    # salts >> partitions: 8 salts into 8 partitions leaves 2-3 stacked on
    # one reducer (measured 0.52 max share); 64 salts flatten it
    pipe = Pipeline(spark, PipelineConfig(source_path="x", salt_buckets=64))
    salted = pipe.routed(skewed)
    dist = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    max_share = max(r["count"] for r in dist) / n_total
    # unsalted, the hot conv's ~40%+ would sit in one partition; salted it
    # must spread well below that
    assert max_share < 0.25, f"max partition share {max_share:.2f}"


def test_salting_preserves_results_on_skewed_input(spark):
    skewed, _ = _skewed_transcripts(spark)
    plain = Pipeline(spark, PipelineConfig(source_path="x")).run(skewed)
    salted = Pipeline(spark, PipelineConfig(source_path="x", salt_buckets=8)).run(
        skewed
    )
    a = {tuple(r) for r in plain["sink_counts"].collect()}
    b = {tuple(r) for r in salted["sink_counts"].collect()}
    assert a == b
    assert plain["dead_letter"].count() == salted["dead_letter"].count()
