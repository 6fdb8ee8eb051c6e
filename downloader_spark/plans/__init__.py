"""Query plans: the SURVEY.md §2 query-key registry."""

from downloader_spark.plans.registry import QuerySpec, query, registry

__all__ = ["QuerySpec", "query", "registry"]
