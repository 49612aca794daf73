from news_crawler_spark.tables.snapshot import SnapshotTable

__all__ = ["SnapshotTable"]
