"""spark-submit entrypoint — the collector binary analog (otelcol/collector.go:154-255).

Usage (cluster):
    spark-submit --py-files otelcol_spark.zip \\
        -m opentelemetry_collector_spark ...        # or path to this file
Usage (local):
    python -m opentelemetry_collector_spark \\
        --source /root/testdata/sf0.001 --output /tmp/otelcol_out \\
        [--mode batch|stream] [--n-buckets 16] [--resume]

Lifecycle mirrors the reference: resolve+validate config -> build the DAG
(one Catalyst plan) -> run -> report counters (service/service.go:83-233);
checkpointed waves make any crash resumable (--resume skips committed
buckets, persistent-queue semantics).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="opentelemetry_collector_spark")
    p.add_argument("--config", default=None,
                   help="collector-style YAML service config (provider URI "
                        "or path; repeatable, later files override earlier)",
                   action="append")
    p.add_argument("--source", required=False,
                   help="sf dir containing events.parquet, or a transcripts table path")
    p.add_argument("--output", required=False, help="sink base path")
    p.add_argument("--mode", choices=["batch", "stream"], default="batch")
    p.add_argument("--source-kind", choices=["events", "transcripts"],
                   default="events")
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--buckets-per-wave", type=int, default=4)
    p.add_argument("--bucket-seconds", type=int, default=300)
    p.add_argument("--max-records-per-file", type=int, default=8192)
    p.add_argument("--attempt-timeout", type=float, default=0.0,
                   help="per-attempt deadline (s) on each wave's sink write;"
                        " 0 disables (timeout sender analog)")
    p.add_argument("--salt-buckets", type=int, default=0,
                   help="static hot-conv_id salting factor (0 = off)")
    p.add_argument("--adaptive-salting", action="store_true",
                   help="two-pass histogram-driven skew salting")
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip buckets already committed in the output ledger")
    p.add_argument("--master", default=None,
                   help="override master (default: from spark-submit / local[*])")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    if args.config is None and (args.source is None or args.output is None):
        build_arg_parser().error(
            "--source and --output are required unless --config is given"
        )

    from pyspark.sql import SparkSession

    from opentelemetry_collector_spark.operators.aggregate import sink_counts
    from opentelemetry_collector_spark.operators.route import routed_ok
    from opentelemetry_collector_spark.plans.checkpoint import (
        CheckpointConfig,
        CheckpointedRunner,
    )
    from opentelemetry_collector_spark.plans.pipeline import (
        Pipeline,
        PipelineConfig,
    )
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
        read_transcripts,
    )

    builder = SparkSession.builder.appName("otelcol-spark")
    if args.master:
        builder = builder.master(args.master)
    builder = builder.config("spark.sql.adaptive.enabled", "true").config(
        "spark.sql.session.timeZone", "UTC"
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    if args.config:
        # collector.Run parity: resolve config (confmap provider URIs,
        # ${} expansion, right-biased merge across files), build the
        # pipeline graph, run every pipeline (service/service.go:83-233)
        import json as _json
        import os as _os

        from opentelemetry_collector_spark.plans.config import ServiceConfig
        from opentelemetry_collector_spark.plans.service import run_service

        svc_cfg = ServiceConfig.from_sources(
            *args.config, env=dict(_os.environ)
        )
        t0 = time.perf_counter()
        # persist_results: the report counts below reuse the exporters'
        # execution instead of re-running every pipeline plan
        results = run_service(spark, svc_cfg, persist_results=True)
        report = {
            "mode": "config",
            "pipelines": {name: df.count() for name, df in results.items()},
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        print(_json.dumps(report))
        spark.stop()
        return 0

    cfg = PipelineConfig(
        source_path=args.source,
        sink_base_path=args.output,
        bucket_seconds=args.bucket_seconds,
        max_records_per_file=args.max_records_per_file,
        salt_buckets=args.salt_buckets,
        adaptive_salting=args.adaptive_salting,
    )
    pipeline = Pipeline(spark, cfg)

    if args.source_kind == "events":
        transcripts = events_to_transcripts(spark, args.source)
    else:
        transcripts = read_transcripts(spark, args.source)

    t0 = time.perf_counter()
    if args.mode == "stream":
        from opentelemetry_collector_spark.streaming.pipeline import (
            routed_stream,
            start_sink_writer,
        )

        stream = routed_stream(
            spark.readStream.schema(
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp"
            ).parquet(args.source),
            spark,
        )
        q = start_sink_writer(
            stream, f"{args.output}/sinks", f"{args.output}/_stream_checkpoint"
        )
        q.awaitTermination()
        report = {"mode": "stream", "wall_s": round(time.perf_counter() - t0, 2)}
    else:
        routed = pipeline.routed(transcripts)
        # the validated PipelineConfig is the single source for sink knobs
        runner = CheckpointedRunner(
            spark,
            CheckpointConfig(
                base_path=cfg.sink_base_path or args.output,
                n_buckets=args.n_buckets,
                buckets_per_wave=args.buckets_per_wave,
                max_records_per_file=cfg.max_records_per_file,
                attempt_timeout_s=args.attempt_timeout,
            ),
        )
        if not args.resume:
            # fresh run: a prior ledger would mask new work — require clean dir
            if runner.committed_buckets():
                print(
                    "output ledger exists; pass --resume to continue it",
                    file=sys.stderr,
                )
                return 2
        totals = runner.run(routed, run_id=args.run_id)
        counts = sink_counts(routed_ok(routed), cfg.bucket_seconds)
        counts.coalesce(1).write.mode("overwrite").parquet(
            f"{args.output}/_metrics/sink_counts"
        )
        report = {
            "mode": "batch",
            "wall_s": round(time.perf_counter() - t0, 2),
            **{k: v for k, v in totals.items() if k != "run_id"},
            "run_id": totals["run_id"],
        }

    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
