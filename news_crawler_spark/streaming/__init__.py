from news_crawler_spark.streaming.events import (
    sessionize_batch,
    streaming_event_counts,
    windowed_event_aggs,
)

__all__ = ["sessionize_batch", "streaming_event_counts", "windowed_event_aggs"]
