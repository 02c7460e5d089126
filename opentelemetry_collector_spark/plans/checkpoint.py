"""Resumable per-partition checkpoints — the persistent-queue analog
(SURVEY §2.5; exporter/exporterhelper/internal/persistent_storage.go:51-396).

The reference's persistent queue survives crashes by persisting read/write
indices plus the currently-dispatched item list, deleting an item only after
``OnProcessingFinished`` (persistent_storage.go:268-273) — in-flight items are
re-enqueued on restart (persistent_storage.go:93-122,282-348). Re-expressed
for a deterministic batch DAG:

* The unit of work is a **conv_id hash bucket** (``pmod(xxhash64(conv_id), n)``)
  — deterministic in the DATA, not in input splits, so re-runs see identical
  bucket membership regardless of file layout or parallelism. This matches the
  target Iceberg layout ``bucket(n, conv_id)``: on a real table the bucket
  filter prunes to 1/n of the files (partition pruning), so a wave never
  rescans the whole input.
* Buckets are processed in **waves**; each wave's sink output is written with
  dynamic partition overwrite (idempotent — a re-run of a half-written wave
  replaces it), and ONLY THEN is a checkpoint row committed per bucket
  (write-then-commit = delete-after-OnProcessingFinished ordering).
* Resume = anti-join committed buckets: a new run processes only buckets with
  no committed checkpoint row. Crash between write and commit re-runs the
  wave; the overwrite makes that exactly-once in the output.

Each checkpoint row carries lineage + metrics (run_id, bucket, input
fingerprint, per-sink row counts, wall_ms) — the obsreport sent/failed
counters (obsreport/obsreport_exporter.go:141-161) and queue-depth gauges
(queued_retry.go:209-223) live in this table.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opentelemetry_collector_spark.plans.retry import (
    RetryConfig,
    with_retry,
    with_timeout,
)

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("n_buckets", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("input_fingerprint", T.LongType(), True),
        T.StructField("n_input", T.LongType(), False),
        T.StructField("n_routed_ok", T.LongType(), False),
        T.StructField("n_dead_letter", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)


def bucket_col(n_buckets: int):
    """Deterministic work-unit id: pmod(xxhash64(conv_id), n_buckets).

    xxhash64 is a fixed-seed deterministic Spark builtin — bucket membership
    is a pure function of the data (persistent queue item keys are likewise
    monotone-deterministic, persistent_storage.go:93-122).

    NOTE: these work buckets are NOT Iceberg storage buckets (Iceberg's
    bucket transform is murmur3). On an Iceberg table, pass
    ``F.expr(f"system.bucket({n}, conv_id)")`` as ``bucket_expr`` to
    CheckpointedRunner.run so wave filters align with (and prune on) the
    table's own partitioning.
    """
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


@dataclass
class CheckpointConfig:
    base_path: str  # root: sinks under {base}/sinks, ledger under {base}/_checkpoints
    n_buckets: int = 16
    buckets_per_wave: int = 4
    max_records_per_file: int = 8192  # batchprocessor/factory.go:31
    # per-ATTEMPT deadline on each wave's sink write; 0 disables (the
    # reference's Timeout > 0 guard). On expiry the attempt's tagged jobs
    # are cancelled and the retry sender backs off — the full
    # queue -> retry -> timeout -> push chain (exporterhelper/common.go:159-209)
    attempt_timeout_s: float = 0.0

    def validate(self) -> None:
        if self.n_buckets <= 0 or self.buckets_per_wave <= 0:
            raise ValueError("n_buckets and buckets_per_wave must be positive")
        if not self.base_path:
            raise ValueError("base_path required")
        if self.attempt_timeout_s < 0:
            raise ValueError("attempt_timeout_s must be >= 0 (0 = no deadline)")

    @property
    def sinks_path(self) -> str:
        return f"{self.base_path}/sinks"

    @property
    def ledger_path(self) -> str:
        return f"{self.base_path}/_checkpoints"


class CheckpointedRunner:
    """Drives routed output to per-sink tables in resumable waves."""

    def __init__(self, spark: SparkSession, config: CheckpointConfig,
                 retry: RetryConfig | None = None):
        config.validate()
        self.spark = spark
        self.config = config
        self.retry = retry or RetryConfig()

    # --- ledger -----------------------------------------------------------

    def committed_buckets(self) -> set[int]:
        """Committed bucket ids from the ledger.

        Raises if the ledger was written with a DIFFERENT n_buckets —
        resuming under a changed bucketing would silently mix two
        incompatible partitionings. Only a genuinely-missing ledger path
        means "fresh run"; any other read failure propagates (a transient
        FS error must not erase resume state)."""
        try:
            ledger = self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(
                self.config.ledger_path
            )
            rows = (
                ledger.filter(F.col("status") == "committed")
                .select("bucket", "n_buckets").distinct().collect()
            )
        except Exception as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return set()
            raise
        seen_nb = {r.n_buckets for r in rows}
        if seen_nb and seen_nb != {self.config.n_buckets}:
            raise ValueError(
                f"ledger was written with n_buckets={sorted(seen_nb)}, "
                f"config has n_buckets={self.config.n_buckets}; resuming "
                "under a different bucketing would corrupt the output"
            )
        return {r.bucket for r in rows}

    def _commit(self, records: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    r["run_id"], self.config.n_buckets, r["bucket"],
                    r["input_fingerprint"], r["n_input"],
                    r["n_routed_ok"], r["n_dead_letter"], r["wall_ms"], "committed",
                )
                for r in records
            ],
            schema=CHECKPOINT_SCHEMA[:-1],
        ).withColumn("committed_at", F.current_timestamp())
        df.coalesce(1).write.mode("append").parquet(self.config.ledger_path)

    # --- run --------------------------------------------------------------

    def run(
        self,
        routed: DataFrame,
        run_id: str | None = None,
        fail_after_waves: int | None = None,
        bucket_expr=None,
    ) -> dict:
        """Write ``routed`` (route() output) to per-sink tables, resumably.

        ``fail_after_waves`` injects a crash after K committed waves (test
        hook mirroring persistent_storage_test.go's restart-recovery tests).
        Returns run metrics: buckets processed/skipped, row counts.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        cfg = self.config
        done = self.committed_buckets()
        todo = [b for b in range(cfg.n_buckets) if b not in done]
        waves = [
            todo[i : i + cfg.buckets_per_wave]
            for i in range(0, len(todo), cfg.buckets_per_wave)
        ]

        from opentelemetry_collector_spark.operators.route import write_sinks

        # dynamic overwrite: a re-run of a crashed wave replaces only its own
        # bucket partitions (idempotence = exactly-once output). Session
        # config is restored afterwards — other writers in this session may
        # rely on static overwrite truncating stale partitions.
        prev_mode = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        # bucket_expr overrides the work-bucket derivation (e.g. Iceberg's
        # system.bucket so wave filters prune the storage partitions)
        bucketed = routed.withColumn(
            "part_bucket",
            (bucket_expr if bucket_expr is not None
             else bucket_col(cfg.n_buckets)).cast("int"),
        )
        totals = {"run_id": run_id, "skipped_buckets": sorted(done),
                  "processed_buckets": [], "n_routed_ok": 0, "n_dead_letter": 0}

        try:
            for w_idx, wave in enumerate(waves):
                t0 = time.perf_counter()
                # persist the wave: the sink write and the lineage stats must
                # consume ONE materialization (a re-scan could see an input
                # that changed between the two actions, making the committed
                # fingerprint describe data that was never written), and it
                # halves the upstream scans per wave
                wave_df = bucketed.filter(
                    F.col("part_bucket").isin(wave)
                ).persist()

                with_retry(
                    lambda df=wave_df: with_timeout(
                        lambda: write_sinks(
                            df, cfg.sinks_path, cfg.max_records_per_file,
                            extra_partition_cols=["part_bucket"],
                        ),
                        cfg.attempt_timeout_s,
                        spark=self.spark,
                    ),
                    self.retry,
                )

                stats = (
                    wave_df.groupBy("part_bucket")
                    .agg(
                        # order-independent 64-bit lineage fingerprint;
                        # bit_xor cannot overflow at any row count (a sum of
                        # hashes overflows int64 around 1.8e10 rows, which
                        # ANSI mode turns into a post-write failure)
                        F.expr("bit_xor(xxhash64(conv_id, turn_idx))").alias("fp"),
                        F.count(F.lit(1)).alias("n_input"),
                        F.count(F.when(F.col("error_reason").isNull(), 1)).alias("n_ok"),
                        F.count(F.when(F.col("error_reason").isNotNull(), 1)).alias("n_dl"),
                    )
                    .collect()
                )
                wave_df.unpersist()
                by_bucket = {r.part_bucket: r for r in stats}
                wall_ms = int((time.perf_counter() - t0) * 1000)
                # attribute wave wall time to buckets by row share (buckets
                # run concurrently in one job; an even split overstates the
                # small buckets' throughput)
                wave_rows = max(sum(r.n_input for r in stats), 1)
                self._commit(
                    [
                        {
                            "run_id": run_id,
                            "bucket": b,
                            "input_fingerprint": int(by_bucket[b].fp) if b in by_bucket else None,
                            "n_input": by_bucket[b].n_input if b in by_bucket else 0,
                            "n_routed_ok": by_bucket[b].n_ok if b in by_bucket else 0,
                            "n_dead_letter": by_bucket[b].n_dl if b in by_bucket else 0,
                            "wall_ms": max(
                                1,
                                wall_ms * (by_bucket[b].n_input if b in by_bucket else 0)
                                // wave_rows,
                            ),
                        }
                        for b in wave
                    ]
                )
                totals["processed_buckets"].extend(wave)
                totals["n_routed_ok"] += sum(r.n_ok for r in stats)
                totals["n_dead_letter"] += sum(r.n_dl for r in stats)

                if fail_after_waves is not None and w_idx + 1 >= fail_after_waves:
                    raise RuntimeError(
                        f"injected crash after wave {w_idx + 1} (test hook)"
                    )
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )

        return totals

    def metrics(self) -> DataFrame:
        """The checkpoint ledger as a DataFrame (queue-depth / sent-counter
        gauges analog, queued_retry.go:209-223), with per-bucket throughput
        (the north-rule "checkpoints carrying lineage AND throughput")."""
        ledger = self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(
            self.config.ledger_path
        )
        return ledger.withColumn(
            "rows_per_sec",
            F.round(
                F.col("n_input") / (F.greatest(F.col("wall_ms"), F.lit(1)) / 1000.0),
                1,
            ),
        )

    def compact_ledger(self, max_records_per_file: int = 1_000_000) -> dict:
        """Merge the per-wave ledger appends (one coalesce(1) file per
        _commit) into a handful of files; committed_buckets()/metrics()
        read through unchanged. Crash-safe and re-runnable (rewrite-then-
        swap, operators/compact.py). Run between runs, never concurrently
        with one — the swap renames the live dir."""
        from opentelemetry_collector_spark.operators.compact import (
            compact_flat_dir,
        )

        return compact_flat_dir(
            self.spark,
            self.config.ledger_path,
            schema=CHECKPOINT_SCHEMA,
            max_records_per_file=max_records_per_file,
        )
