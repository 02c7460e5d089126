#!/usr/bin/env python
"""spark-submit payload for the two-cluster-size scaling evidence
(north rule: ">=0.8 throughput scaling efficiency from N to 4N executors",
run "via spark-submit --py-files on a multi-executor cluster").

Runs the identical end-to-end parse->enrich->route->aggregate job over a
pre-materialized transcripts table on WHATEVER master spark-submit supplies
(the wrapper script submits this twice: local-cluster[N,1,...] and
local-cluster[4N,1,...] — separate executor JVMs, one core each, so the
executor count is the only variable). Prints one JSON line:
  {"master": ..., "cores": N, "turns": T, "turns_per_sec": R}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

# plain-python invocation (bench.py subprocess mode): the engine package
# lives in the repo root, one level above scripts/. Under spark-submit the
# --py-files zip provides it instead; the extra path entry is harmless.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> int:
    table_path = argv[0]
    reps = int(argv[1]) if len(argv) > 1 else 2
    # optional master for plain-python invocation (bench.py subprocess mode);
    # under spark-submit the master comes from the submit command instead
    master = argv[2] if len(argv) > 2 else None

    from pyspark.sql import SparkSession

    from opentelemetry_collector_spark.operators.aggregate import sink_counts
    from opentelemetry_collector_spark.operators.enrich import enrich
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.route import route, routed_ok

    builder = SparkSession.builder
    if master:
        builder = (
            builder.master(master)
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "8g")
        )
        # total cores from the master string: local[N] -> N;
        # local-cluster[execs,cores,mem] -> execs*cores; local[*] -> leave
        # the shuffle-partition default alone
        shuffle = None
        try:
            inner = master[master.index("[") + 1 : master.rindex("]")]
            if master.startswith("local-cluster["):
                execs, per_exec = (int(x) for x in inner.split(",")[:2])
                shuffle = execs * per_exec
            elif inner.isdigit():
                shuffle = int(inner)
        except ValueError:
            shuffle = None  # malformed master: leave the default, like local[*]
        if shuffle:
            builder = builder.config("spark.sql.shuffle.partitions", str(shuffle))
    spark = builder.getOrCreate()
    # on local-cluster masters executors register asynchronously; measuring
    # before they all arrive understates the level's core count
    expected_cores = int(argv[3]) if len(argv) > 3 else None
    if expected_cores:
        deadline = time.monotonic() + 60
        while (
            spark.sparkContext.defaultParallelism < expected_cores
            and time.monotonic() < deadline
        ):
            time.sleep(0.5)
    cores = spark.sparkContext.defaultParallelism
    t = spark.read.parquet(table_path)
    n_turns = t.count()

    def run_once() -> None:
        routed = route(enrich(parse_turns(t), spark))
        routed.write.format("noop").mode("overwrite").save()
        sink_counts(routed_ok(routed)).write.format("noop").mode(
            "overwrite"
        ).save()

    run_once()  # warm-up (executor JVMs, codegen)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        best = max(best, n_turns / (time.perf_counter() - t0))

    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "cores": cores,
                "turns": n_turns,
                "turns_per_sec": round(best, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
