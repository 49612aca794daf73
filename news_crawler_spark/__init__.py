"""news_crawler_spark — a PySpark-native crawl-frontier + analytics engine.

Brand-new implementation (NOT a port) of the query semantics of the
reference crawler (OverDlive/news_crawler, analyzed in SURVEY.md):

* a URL frontier + fetch scheduler designed for 10^10-URL scale
  (``news_crawler_spark.crawl``),
* the reference's relational operator inventory re-expressed as
  idiomatic DataFrame/SQL ops (``news_crawler_spark.operators``,
  ``news_crawler_spark.functions``),
* atomic, resumable state tables over parquet with Iceberg-like
  snapshot semantics (``news_crawler_spark.tables``),
* large-scale training-data pipeline ops: dedup (exact/MinHash-LSH/
  SimHash/Jaccard), ANN similarity search, text quality analysis,
  multimodal column plumbing (``news_crawler_spark.operators``).

Everything on the data plane is DataFrame/SQL + vectorized
pandas/Arrow UDFs — no per-row Python.
"""

__version__ = "0.1.0"
