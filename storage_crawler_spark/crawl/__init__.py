from storage_crawler_spark.crawl.pipeline import CrawlResult, crawl  # noqa: F401
