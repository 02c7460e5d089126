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

from opentelemetry_collector_spark.plans.retry import RetryConfig, with_retry

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
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
    """
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


@dataclass
class CheckpointConfig:
    base_path: str  # root: sinks under {base}/sinks, ledger under {base}/_checkpoints
    n_buckets: int = 16
    buckets_per_wave: int = 4
    max_records_per_file: int = 8192  # batchprocessor/factory.go:31

    def validate(self) -> None:
        if self.n_buckets <= 0 or self.buckets_per_wave <= 0:
            raise ValueError("n_buckets and buckets_per_wave must be positive")
        if not self.base_path:
            raise ValueError("base_path required")

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
        try:
            ledger = self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(
                self.config.ledger_path
            )
        except Exception:  # no ledger yet -> fresh run
            return set()
        rows = ledger.filter(F.col("status") == "committed").select("bucket").distinct()
        return {r.bucket for r in rows.collect()}

    def _commit(self, records: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    r["run_id"], r["bucket"], r["input_fingerprint"], r["n_input"],
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

        # dynamic overwrite: a re-run of a crashed wave replaces only its own
        # bucket partitions (idempotence = exactly-once output).
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        bucketed = routed.withColumn("part_bucket", bucket_col(cfg.n_buckets))
        totals = {"run_id": run_id, "skipped_buckets": sorted(done),
                  "processed_buckets": [], "n_routed_ok": 0, "n_dead_letter": 0}

        for w_idx, wave in enumerate(waves):
            t0 = time.perf_counter()
            wave_df = bucketed.filter(F.col("part_bucket").isin(wave))

            # Single pass: write sinks, then derive per-bucket lineage counts
            # from the written output (write-then-commit ordering).
            def _write(df=wave_df):
                (
                    df.withColumn("sink", F.coalesce("sink_id", F.lit("dead_letter")))
                    .write.option("maxRecordsPerFile", cfg.max_records_per_file)
                    .partitionBy("part_bucket", "sink")
                    .mode("overwrite")
                    .parquet(cfg.sinks_path)
                )

            with_retry(_write, self.retry)

            stats = (
                wave_df.groupBy("part_bucket")
                .agg(
                    # order-independent lineage fingerprint; pmod keeps the
                    # sum far from int64 overflow even at 10^12 rows/bucket
                    F.sum(
                        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(1_000_000_007))
                    ).alias("fp"),
                    F.count(F.lit(1)).alias("n_input"),
                    F.count(F.when(F.col("error_reason").isNull(), 1)).alias("n_ok"),
                    F.count(F.when(F.col("error_reason").isNotNull(), 1)).alias("n_dl"),
                )
                .collect()
            )
            by_bucket = {r.part_bucket: r for r in stats}
            wall_ms = int((time.perf_counter() - t0) * 1000)
            self._commit(
                [
                    {
                        "run_id": run_id,
                        "bucket": b,
                        "input_fingerprint": int(by_bucket[b].fp) if b in by_bucket else None,
                        "n_input": by_bucket[b].n_input if b in by_bucket else 0,
                        "n_routed_ok": by_bucket[b].n_ok if b in by_bucket else 0,
                        "n_dead_letter": by_bucket[b].n_dl if b in by_bucket else 0,
                        "wall_ms": wall_ms // max(len(wave), 1),
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
