"""Registry mapping SURVEY.md §2 query keys to implementations.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``
plus, when the operator is SQL-expressible, an ANSI-SQL oracle string
that DuckDB runs on the same parquet tables.  The driver compares the
two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are summed exactly in DECIMAL then emitted as
  ``round(CAST(... AS DOUBLE), 2)`` on both sides (see
  downloader_spark.functions.numeric) — float addition order is the
  #1 cross-engine hash trap;
- window/top-k queries always use a total (tie-broken) ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => driver records rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` under a SURVEY.md §2 query key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing the modules that define them)."""
    # Side-effect imports: each module registers its queries at import time.
    import downloader_spark.plans.catalog  # noqa: F401

    return dict(_REGISTRY)
