"""Pipeline driver — the service/graph analog (SURVEY §2.4, §3.2).

The reference builds a validated DAG from config (service/internal/graph/
graph.go:66-181) and starts components reverse-topologically. Here the DAG is
ordinary function composition producing ONE Catalyst plan; "build" is
composing transforms, "start" is an action. Config validation mirrors
service/config.go:42-98 (>=1 source, >=1 sink, no duplicate stage names).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import sink_counts
from opentelemetry_collector_spark.operators.enrich import enrich
from opentelemetry_collector_spark.operators.parse import parse_turns
from opentelemetry_collector_spark.operators.route import (
    dead_letter,
    route,
    routed_ok,
)


@dataclass
class PipelineConfig:
    """Validated pipeline config (service/config.go:42-98 analog)."""

    source_path: str
    sink_base_path: str | None = None
    bucket_seconds: int = 300
    max_records_per_file: int = 8192  # batchprocessor/factory.go:31
    salt_buckets: int = 0  # >0 enables static hot-conv_id salting (SURVEY §4)
    adaptive_salting: bool = False  # two-pass histogram-driven salting
    processors: list[str] = field(
        default_factory=lambda: ["parse", "enrich", "route"]
    )

    def validate(self) -> None:
        if not self.source_path:
            raise ValueError("pipeline must have at least one receiver (source_path)")
        if self.bucket_seconds <= 0:
            raise ValueError("bucket_seconds must be positive")
        if self.max_records_per_file <= 0:
            # batch processor config validation: send_batch_max_size >= 1
            # (processor/batchprocessor/config.go:25-52)
            raise ValueError("max_records_per_file must be positive")
        if self.adaptive_salting and self.salt_buckets > 0:
            raise ValueError(
                "choose static salt_buckets OR adaptive_salting, not both"
            )
        if len(set(self.processors)) != len(self.processors):
            raise ValueError("duplicate processor in pipeline")  # config.go:78-84
        unknown = set(self.processors) - {"parse", "enrich", "route"}
        if unknown:
            raise ValueError(f"unknown processors: {sorted(unknown)}")


class Pipeline:
    """parse -> enrich -> route -> aggregate as one declarative plan."""

    def __init__(self, spark: SparkSession, config: PipelineConfig):
        config.validate()
        self.spark = spark
        self.config = config

    # --- stage composition (graph.buildComponents analog, one Catalyst plan)

    def routed(self, transcripts: DataFrame) -> DataFrame:
        df = transcripts
        if self.config.adaptive_salting:
            # Two-pass histogram-driven salting (operators/skew.py): only
            # keys observed above the share threshold get split, and each
            # gets exactly the factor its volume requires — the SURVEY §7
            # "computed from observed key histograms" requirement.
            from opentelemetry_collector_spark.operators.skew import (
                SALT_COL,
                skew_aware_repartition,
            )

            df = skew_aware_repartition(
                df,
                "conv_id",
                "turn_idx",
                self.spark.sparkContext.defaultParallelism,
            ).drop(SALT_COL)
        elif self.config.salt_buckets > 0:
            # Hot-conversation skew handling (SURVEY §4 "ours to design"):
            # salt the implicit partitioning so one hot conv_id spreads over
            # salt_buckets reducers. AQE skew-join covers the join side; this
            # covers pathological scan-side clustering.
            # salt_buckets must be SEVERAL TIMES the partition count: k salts
            # hash into p partitions with birthday collisions, so k ~ p leaves
            # 2-3 salts stacked on one reducer; k >= 4p flattens it.
            df = df.repartition(
                self.spark.sparkContext.defaultParallelism,
                F.col("conv_id"),
                (F.crc32(F.col("turn_idx").cast("string")) % self.config.salt_buckets),
            )
        return route(enrich(parse_turns(df), self.spark))

    def run(self, transcripts: DataFrame) -> dict[str, DataFrame]:
        routed = self.routed(transcripts)
        return {
            "routed": routed,
            "ok": routed_ok(routed),
            "dead_letter": dead_letter(routed),
            "sink_counts": sink_counts(
                routed_ok(routed), self.config.bucket_seconds
            ),
        }
