"""Cross-batch stateful sessionization: streaming applyInPandasWithState
must reproduce the batch window sessionizer even when a conversation's
turns arrive split across micro-batches (state survives triggers)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from opentelemetry_collector_spark.queries import q_sessionize
from opentelemetry_collector_spark.sources.transcripts import events_to_transcripts
from opentelemetry_collector_spark.streaming.stateful import sessionize_stateful
from tests.conftest import SF_SMOKE


def test_stateful_sessionize_matches_batch_across_batches(spark, tmp_path):
    t = events_to_transcripts(spark, SF_SMOKE).select("conv_id", "turn_idx", "ts")
    src = str(tmp_path / "stream_src")

    # split EVERY conversation across two files: first half of its turns in
    # file 1, rest in file 2; distinct mtimes force the file source to read
    # them in order (arrival-ordered contract)
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id")
    marked = t.withColumn(
        "half",
        (F.col("turn_idx") < F.max("turn_idx").over(w) / 2).cast("int"),
    )
    marked.filter("half = 1").drop("half").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    time.sleep(1.1)
    marked.filter("half = 0").drop("half").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stateful(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.conv_id, r.turn_idx): r.session_idx
        for r in spark.sql("SELECT * FROM sess_state").collect()
    }
    want = {
        (r.conv_id, r.turn_idx): r.session_idx
        for r in q_sessionize(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_stateful_span_edges_match_batch_across_batches(spark, tmp_path):
    """The streaming edge extractor must emit exactly the batch lag-window
    edges even when every conversation's spans are split across two
    micro-batches — the previous-tool state survives the trigger."""
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.traces import span_edges
    from opentelemetry_collector_spark.streaming.stateful import (
        span_edges_stateful,
    )

    t = events_to_transcripts(spark, SF_SMOKE)
    src = str(tmp_path / "edge_src")
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id")
    marked = t.withColumn(
        "half",
        (F.col("turn_idx") < F.max("turn_idx").over(w) / 2).cast("int"),
    )
    marked.filter("half = 1").drop("half").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    time.sleep(1.1)
    marked.filter("half = 0").drop("half").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        span_edges_stateful(parse_turns(stream))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("edge_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    raw = spark.sql("SELECT * FROM edge_state")
    got = {
        (r.src_tool, r.dst_tool): (r.n_calls, r.n_errors, r.total_dur_ms,
                                   r.max_dur_ms)
        for r in raw.groupBy("src_tool", "dst_tool").agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.count(F.when(F.col("status") == "ERROR", 1)).alias("n_errors"),
            F.sum("dur_ms").cast("long").alias("total_dur_ms"),
            F.max("dur_ms").alias("max_dur_ms"),
        ).collect()
    }
    want = {
        (r.src_tool, r.dst_tool): (r.n_calls, r.n_errors, r.total_dur_ms,
                                   r.max_dur_ms)
        for r in span_edges(
            parse_turns(spark.read.parquet(src))).collect()
    }
    assert got == want and len(got) > 0


def test_stateful_span_edges_drop_late_arrivals(spark, tmp_path):
    """ADVICE r02: a turn arriving AFTER a later turn was processed in a
    prior micro-batch (turn_idx <= stored last_turn_idx) must be dropped,
    not appended — appending would emit (src, dst) edges the batch
    lag-window twin never produces. Files arrive in REVERSE half order:
    second half first, then the (now-late) first half."""
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.traces import span_edges
    from opentelemetry_collector_spark.streaming.stateful import (
        span_edges_stateful,
    )

    t = events_to_transcripts(spark, SF_SMOKE)
    src = str(tmp_path / "late_src")
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id")
    marked = t.withColumn(
        "late",
        (F.col("turn_idx") < F.max("turn_idx").over(w) / 2).cast("int"),
    )
    # second half arrives FIRST
    marked.filter("late = 0").drop("late").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    time.sleep(1.1)
    marked.filter("late = 1").drop("late").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        span_edges_stateful(parse_turns(stream))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("edge_late")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    raw = spark.sql("SELECT * FROM edge_late")
    # no late row survived: every emitted turn_idx is in the on-time half
    late_keys = {
        (r.conv_id, r.turn_idx)
        for r in marked.filter("late = 1")
        .select("conv_id", "turn_idx").collect()
    }
    emitted_keys = {
        (r.conv_id, r.turn_idx) for r in raw.collect()
    }
    assert emitted_keys and not (emitted_keys & late_keys)
    # and the aggregate equals the batch twin over the on-time subset
    got = {
        (r.src_tool, r.dst_tool): (r.n_calls, r.total_dur_ms)
        for r in raw.groupBy("src_tool", "dst_tool").agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum("dur_ms").cast("long").alias("total_dur_ms"),
        ).collect()
    }
    ontime = parse_turns(spark.read.parquet(src)).withColumn(
        "half_max", F.max("turn_idx").over(Window.partitionBy("conv_id"))
    ).filter(F.col("turn_idx") >= F.col("half_max") / 2).drop("half_max")
    want = {
        (r.src_tool, r.dst_tool): (r.n_calls, r.total_dur_ms)
        for r in span_edges(ontime).collect()
    }
    assert got == want
