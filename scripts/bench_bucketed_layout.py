#!/usr/bin/env python
"""Layout benchmark: the same conv-keyed queries over the SAME rows stored
(a) as plain parquet and (b) in the production layout (native
``bucketBy(16, conv_id).sortBy(turn_idx)`` — the metastore-less stand-in
for the Iceberg ``bucket(16, conv_id)`` + write-ordered table,
sources/catalog.py). tests/test_bucketed.py proves the plans lose their
conv-keyed exchange; this script quantifies the wall-clock effect at the
bench scale (SCALING_AMP x sf0.1 transcripts, same table bench.py scales
on).

Prints one JSON line:
  {"amp": A, "rows": N, "queries": {name: {"plain_s": x, "bucketed_s": y,
   "speedup": x/y}}}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMP = int(os.environ.get("SPARK_GRAFT_SCALING_AMP", "32"))
N_BUCKETS = 32


def main() -> None:
    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.window import Window

    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.traces import (
        tail_sampling,
        trace_rollup,
    )
    from opentelemetry_collector_spark.operators.metrics import (
        sum_cumulative_to_delta,
    )
    from opentelemetry_collector_spark.sources.catalog import (
        write_bucketed_table,
    )
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("otelcol-spark-layout-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", "/tmp/layout_bench_wh")
        .getOrCreate()
    )
    plain_path = "/tmp/layout_bench_plain"
    base = events_to_transcripts(spark, SF_DIR)
    amplified = (
        base.repartition(64)
        .crossJoin(
            F.broadcast(spark.range(AMP).select(F.col("id").alias("replica")))
        )
        .withColumn(
            "conv_id",
            F.concat_ws("-", "conv_id", F.col("replica").cast("string")),
        )
        .drop("replica")
    )
    amplified.write.mode("overwrite").parquet(plain_path)
    spark.sql("DROP TABLE IF EXISTS layout_bench_bucketed")
    write_bucketed_table(
        spark.read.parquet(plain_path),
        "layout_bench_bucketed",
        n_buckets=N_BUCKETS,
        path="/tmp/layout_bench_bucketed",
    )
    rows = spark.read.parquet(plain_path).count()

    order_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    queries = {
        "trace_rollup": lambda d: trace_rollup(parse_turns(d)),
        "tail_sampling": lambda d: tail_sampling(parse_turns(d)),
        "sum_cumulative_to_delta": lambda d: sum_cumulative_to_delta(
            parse_turns(d)
        ),
        "ordering_window": lambda d: d.withColumn(
            "rn", F.row_number().over(order_w)
        ),
    }

    def timed(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out: dict[str, dict[str, float]] = {}
    for name, q in queries.items():
        plain = spark.read.parquet(plain_path)
        table = spark.table("layout_bench_bucketed")
        timed(q(plain))  # warm both paths (JIT, page cache)
        timed(q(table))
        p = timed(q(plain))
        b = timed(q(table))
        out[name] = {
            "plain_s": round(p, 3),
            "bucketed_s": round(b, 3),
            "speedup": round(p / b, 2),
        }
    print(json.dumps({"amp": AMP, "rows": rows, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
