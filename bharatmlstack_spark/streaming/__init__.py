from bharatmlstack_spark.streaming.ingest import (
    feature_upsert_sink,
    kafka_event_source,
    kafka_feature_source,
    stateful_top_events,
    stream_event_retention,
    windowed_event_counts,
)

__all__ = [
    "feature_upsert_sink",
    "kafka_event_source",
    "kafka_feature_source",
    "stateful_top_events",
    "stream_event_retention",
    "windowed_event_counts",
]
