"""Streaming pipeline tests: availableNow micro-batch run over a materialized
transcripts dir must produce the same routed rows and sink counts as the
batch plan (scraper/pull-path analog, scrapercontroller.go:179-227; the
count-conservation assertions mirror batch_processor_test.go:39-79)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import sink_counts
from opentelemetry_collector_spark.operators.enrich import enrich
from opentelemetry_collector_spark.operators.parse import parse_turns
from opentelemetry_collector_spark.operators.route import route, routed_ok
from opentelemetry_collector_spark.sources.transcripts import events_to_transcripts
from opentelemetry_collector_spark.streaming.pipeline import (
    routed_stream,
    start_sink_writer,
    start_windowed_counts,
    stream_transcripts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def transcripts_dir(spark, tmp_path_factory):
    """Materialized transcripts table (8 files so multiple micro-batches
    exercise the WAL when maxFilesPerTrigger=2)."""
    path = str(tmp_path_factory.mktemp("stream") / "transcripts")
    events_to_transcripts(spark, SF_SMOKE).repartition(8).write.parquet(path)
    return path


def test_stream_routes_match_batch(spark, transcripts_dir, tmp_path):
    src = stream_transcripts(spark, transcripts_dir, max_files_per_trigger=2)
    routed = routed_stream(src, spark)
    q = start_sink_writer(
        routed, str(tmp_path / "sinks"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "sinks"))
    batch = route(enrich(parse_turns(
        spark.read.parquet(transcripts_dir)), spark))
    assert out.count() == batch.count()
    # routed-row equality on the key + sink assignment
    got = {
        (r.conv_id, r.turn_idx, r.sink)
        for r in out.select("conv_id", "turn_idx", "sink").collect()
    }
    want = {
        (r.conv_id, r.turn_idx, r.sink)
        for r in batch.select(
            "conv_id", "turn_idx",
            F.coalesce("sink_id", F.lit("dead_letter")).alias("sink"),
        ).collect()
    }
    assert got == want
    # multiple epochs actually ran (WAL exercised)
    assert out.select("epoch_id").distinct().count() > 1


def test_stream_windowed_counts_match_batch(spark, transcripts_dir, tmp_path):
    src = stream_transcripts(spark, transcripts_dir)
    routed = routed_stream(src, spark)
    q = start_windowed_counts(
        routed, str(tmp_path / "ckpt2"), query_name="t_counts"
    )
    q.awaitTermination(120)

    got = {
        (r.bucket_start_epoch, r.sink_role, r.sink_tool): r.n_rows
        for r in spark.sql("SELECT * FROM t_counts").collect()
    }
    batch = route(enrich(parse_turns(
        spark.read.parquet(transcripts_dir)), spark))
    want = {
        (r.bucket_start_epoch, r.sink_role, r.sink_tool): r.n_rows
        for r in sink_counts(routed_ok(batch)).collect()
    }
    # availableNow + watermark: every closed window must match the batch
    # bucket exactly; no spurious windows
    assert got == want


def test_stream_red_metrics_match_batch(spark, transcripts_dir, tmp_path):
    """Streaming RED metrics (windowed spanmetrics) equal the batch
    span_red_metrics aggregate on a finite input."""
    from opentelemetry_collector_spark.operators.metrics import span_red_metrics
    from opentelemetry_collector_spark.streaming.pipeline import (
        start_windowed_red_metrics,
    )

    src = stream_transcripts(spark, transcripts_dir)
    q = start_windowed_red_metrics(
        parse_turns(src), str(tmp_path / "ckpt3"), query_name="t_red"
    )
    q.awaitTermination(120)

    got = {
        (r.bucket_start_epoch, r.tool): (r.n_calls, r.n_errors, r.total_dur_ms)
        for r in spark.sql("SELECT * FROM t_red").collect()
    }
    batch = span_red_metrics(
        parse_turns(spark.read.parquet(transcripts_dir))
    )
    want = {
        (r.bucket_start_epoch, r.tool): (r.n_calls, r.n_errors, r.total_dur_ms)
        for r in batch.collect()
    }
    assert got == want


def test_stream_resume_from_checkpoint(spark, transcripts_dir, tmp_path):
    """Second availableNow start on the same checkpoint must be a no-op
    (file-source WAL remembers consumed files — persistent-queue recovery,
    persistent_storage.go:282-348)."""
    sinks, ckpt = str(tmp_path / "sinks"), str(tmp_path / "ckpt")
    src = stream_transcripts(spark, transcripts_dir, max_files_per_trigger=4)
    q = start_sink_writer(routed_stream(src, spark), sinks, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(sinks).count()

    q2 = start_sink_writer(
        routed_stream(stream_transcripts(spark, transcripts_dir), spark),
        sinks, ckpt,
    )
    q2.awaitTermination(120)
    n2 = spark.read.parquet(sinks).count()
    assert n1 == n2  # no duplicates: nothing re-consumed


def test_stream_obs_counters_match_input(spark, transcripts_dir, tmp_path):
    """StreamingQueryListener counters: accepted records across all
    micro-batches equal the input row count, and the batch-size
    distribution reflects multiple batches (obsreport-in-streaming parity).
    """
    import time

    from opentelemetry_collector_spark.streaming.observe import (
        attach_obs_listener,
        detach_obs_listener,
    )

    listener = attach_obs_listener(spark)
    try:
        src = stream_transcripts(spark, transcripts_dir, max_files_per_trigger=2)
        q = start_windowed_counts(
            routed_stream(src, spark),
            str(tmp_path / "obs_ckpt"),
            query_name="t_obs_counts",
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously after termination
        deadline = time.monotonic() + 30
        want = spark.read.parquet(transcripts_dir).count()
        while time.monotonic() < deadline:
            c = listener.by_query.get("t_obs_counts")
            if c and c.receiver_accepted_log_records >= want:
                break
            time.sleep(0.5)
        c = listener.by_query.get("t_obs_counts")
        assert c is not None, "no progress captured for the named query"
        assert c.receiver_accepted_log_records == want
        assert c.batch_count() > 1  # maxFilesPerTrigger=2 over 8 files
        assert sum(c.batch_send_sizes) == want
    finally:
        detach_obs_listener(spark, listener)


def test_stream_sampler_matches_batch(spark, transcripts_dir, tmp_path):
    """Head sampling is a stateless, shuffle-free filter, so the same
    probabilistic_sampler call must work unchanged on a streaming parsed
    frame and keep exactly the batch-selected span set (trace-consistent
    hash decision, probabilisticsampler pattern)."""
    from opentelemetry_collector_spark.operators.traces import (
        probabilistic_sampler,
    )

    src = stream_transcripts(spark, transcripts_dir, max_files_per_trigger=2)
    sampled = probabilistic_sampler(parse_turns(src))
    out_dir = str(tmp_path / "sampled")
    q = (
        sampled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.conv_id, r.turn_idx, r.trace_id)
        for r in spark.read.parquet(out_dir)
        .select("conv_id", "turn_idx", "trace_id").collect()
    }
    batch = probabilistic_sampler(
        parse_turns(spark.read.parquet(transcripts_dir)))
    want = {
        (r.conv_id, r.turn_idx, r.trace_id)
        for r in batch.select("conv_id", "turn_idx", "trace_id").collect()
    }
    assert got == want and len(got) > 0
    # sampling actually filtered (keep rate permyriad of 2500 -> ~25%)
    total = parse_turns(spark.read.parquet(transcripts_dir)).filter(
        F.col("trace_id").isNotNull()).count()
    assert 0 < len(got) < total


def test_stream_log_dedup_matches_batch(spark, transcripts_dir, tmp_path):
    """Streaming template-dedup groups must equal the batch log_dedup
    groups on (bucket, role, template, count, sample); n_convs is approx
    in streaming (documented divergence), so it is compared with HLL
    tolerance only."""
    from opentelemetry_collector_spark.operators.aggregate import log_dedup
    from opentelemetry_collector_spark.streaming.pipeline import (
        start_windowed_log_dedup,
    )

    src = stream_transcripts(spark, transcripts_dir, max_files_per_trigger=4)
    q = start_windowed_log_dedup(
        parse_turns(src), str(tmp_path / "ckpt"), query_name="t_log_dedup"
    )
    q.awaitTermination(120)

    got = {
        (r.bucket_start_epoch, r.role, r.template_hash, r.n_records,
         r.sample_body): r.n_convs_approx
        for r in spark.sql("SELECT * FROM t_log_dedup").collect()
    }
    batch = {
        (r.bucket_start_epoch, r.role, r.template_hash, r.n_records,
         r.sample_body): r.n_convs
        for r in log_dedup(
            parse_turns(spark.read.parquet(transcripts_dir))).collect()
    }
    assert set(got) == set(batch)
    for k, approx in got.items():
        exact = batch[k]
        assert abs(approx - exact) <= max(1, int(0.1 * exact))
