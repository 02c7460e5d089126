from opentelemetry_collector_spark.plans.pipeline import (  # noqa: F401
    Pipeline,
    PipelineConfig,
)
