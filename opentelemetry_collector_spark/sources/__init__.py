from opentelemetry_collector_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_FROM_EVENTS_SQL,
    events_to_transcripts,
    read_transcripts,
)
