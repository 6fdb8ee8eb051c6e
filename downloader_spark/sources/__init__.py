"""Custom PySpark data sources."""

from downloader_spark.sources.http_fetch import HttpFetchDataSource, register

__all__ = ["HttpFetchDataSource", "register"]
