"""Sink compaction — small-file management for the fan-out sinks.

Per-sink partitioned writes at high fan-out produce many small files
(every task x every sink partition it touches); at 10^12 rows the sink
tables degrade scans unless compacted. Iceberg deployments run
``rewrite_data_files``; this is the parquet-dir equivalent with the same
contract: rows and partition values are preserved exactly, file count per
partition drops to ceil(rows / max_records_per_file).

Compaction is idempotent and crash-safe the same way the checkpoint runner
is: rewrite to a staging dir, then atomic directory swap — a crash
mid-rewrite leaves the original intact.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_sinks(
    spark: SparkSession,
    base_path: str,
    partition_col: str = "sink",
    max_records_per_file: int = 8192,
) -> dict:
    """Rewrite a partitioned sink dir with bin-packed files.

    Returns {files_before, files_after, rows} for observability."""
    df = spark.read.parquet(base_path)
    rows = df.count()
    files_before = len(df.inputFiles())

    staging = base_path.rstrip("/") + ".compacting"
    # one output slice per partition value, bin-packed by the record cap:
    # repartition on the partition column collapses each sink's files, and
    # maxRecordsPerFile re-splits only where a sink exceeds the cap
    (
        df.repartition(F.col(partition_col))
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .mode("overwrite")
        .parquet(staging)
    )

    compacted = spark.read.parquet(staging)
    assert compacted.count() == rows, "compaction must conserve rows"

    backup = base_path.rstrip("/") + ".pre-compact"
    os.rename(base_path, backup)
    os.rename(staging, base_path)
    shutil.rmtree(backup)

    after = spark.read.parquet(base_path)
    return {
        "rows": rows,
        "files_before": files_before,
        "files_after": len(after.inputFiles()),
    }
