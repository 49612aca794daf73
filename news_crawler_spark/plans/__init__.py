from news_crawler_spark.plans.digest import news_digest

__all__ = ["news_digest"]
