from news_crawler_spark.crawl.engine import CrawlEngine
from news_crawler_spark.crawl.fetch import SyntheticFetcher

__all__ = ["CrawlEngine", "SyntheticFetcher"]
