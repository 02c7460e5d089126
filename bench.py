#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Additionally evidences the north rule's two-cluster-size scaling criterion
(BASELINE.json: ">=0.8 throughput scaling efficiency from N to 4N executors")
by running the identical end-to-end parse->enrich->route->aggregate job at
local[N] and local[4N] cores on the same input and reporting turns/sec at both
plus efficiency = (thr_4N / thr_N) / 4. Disable with SPARK_GRAFT_NO_SCALING=1.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline queries timed on the primary session (subset of __spark_entry__
# queries() — full pipeline + the heaviest training-data ops).
HEADLINE = [
    "sink_counts",
    "route",
    "count_conservation",
    "tool_spans",
    "dedup_minhash_pairs",
    "ann_cosine_topk",
    "doc_quality",
]


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"otelcol-spark-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _consume(df) -> int:
    """Force full evaluation of every row (not just count pushdown)."""
    return df.foreach(lambda r: None) or -1


def time_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


SCALING_AMP = int(os.environ.get("SPARK_GRAFT_SCALING_AMP", "16"))


def pipeline_throughput(cores: int, sf_dir: str, max_cores: int) -> tuple[float, int]:
    """End-to-end parse->enrich->route->aggregate turns/sec at `cores`.

    The sf0.1 input is a few MB — a single job over it is scheduling-bound,
    which can't evidence scaling. So the IDENTICAL deterministic amplified
    input (each transcript replicated SCALING_AMP times under replica-suffixed
    conv_ids — same DataFrame expression at both core counts) is pushed
    through the full parse->enrich->route->aggregate plan, partitioned wide
    enough (2*max_cores) that both parallelism levels have work per core.
    """
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.aggregate import sink_counts
    from opentelemetry_collector_spark.operators.enrich import enrich
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.route import route, routed_ok
    from opentelemetry_collector_spark.sources.transcripts import events_to_transcripts

    spark = make_spark(cores)
    try:
        base = events_to_transcripts(spark, sf_dir)
        amplified = (
            base.crossJoin(
                spark.range(SCALING_AMP).select(F.col("id").alias("replica"))
            )
            .withColumn(
                "conv_id", F.concat_ws("-", "conv_id", F.col("replica").cast("string"))
            )
            .drop("replica")
            .repartition(2 * max_cores)
        )
        amplified = amplified.persist()
        n_turns = amplified.count()  # materialize input before timing

        def run_once():
            routed = route(enrich(parse_turns(amplified), spark))
            routed.write.format("noop").mode("overwrite").save()
            sink_counts(routed_ok(routed)).write.format("noop").mode("overwrite").save()

        run_once()  # warm-up (JVM/codegen)
        t0 = time.perf_counter()
        run_once()
        dt = time.perf_counter() - t0
        return n_turns / dt, n_turns
    finally:
        spark.stop()


def main() -> None:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sf = float(Path(SF_DIR).name.replace("sf", "") or 0.1)

    spark = make_spark(CPUS)
    per_query: dict[str, float] = {}
    try:
        for name in HEADLINE:
            if name not in qs:
                continue
            # warm-up once, then time
            time_query(qs[name], spark, SF_DIR)
            per_query[name] = round(time_query(qs[name], spark, SF_DIR), 3)
    finally:
        spark.stop()

    out = {
        "metric": "headline query wall time (sum)",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "cpus": CPUS,
    }

    if not os.environ.get("SPARK_GRAFT_NO_SCALING"):
        n_small = max(1, CPUS // 4)
        thr_small, n_turns = pipeline_throughput(n_small, SF_DIR, CPUS)
        thr_big, _ = pipeline_throughput(CPUS, SF_DIR, CPUS)
        out["scaling"] = {
            "turns": n_turns,
            f"turns_per_sec_local[{n_small}]": round(thr_small, 1),
            f"turns_per_sec_local[{CPUS}]": round(thr_big, 1),
            "efficiency_N_to_4N": round((thr_big / thr_small) / (CPUS / n_small), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
