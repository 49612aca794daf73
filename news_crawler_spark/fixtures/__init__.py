from news_crawler_spark.fixtures.sitegen import SiteConfig, host_rows, seed_rows, synth_page
from news_crawler_spark.fixtures.oracle import CrawlOracle

__all__ = ["SiteConfig", "host_rows", "seed_rows", "synth_page", "CrawlOracle"]
