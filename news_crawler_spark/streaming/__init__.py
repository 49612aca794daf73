from news_crawler_spark.streaming.events import (
    correlate_events,
    sessionize_batch,
    streaming_event_counts,
    windowed_event_aggs,
)

__all__ = ["correlate_events", "sessionize_batch",
           "streaming_event_counts", "windowed_event_aggs"]
