"""Custom Python DataSource: distributed URL fetching as a scan.

The reference's A1 (HTTP source scan, common.go:61-132) as a genuine
Spark source (the SURVEY §4.4 stretch goal): register once, then

    spark.read.format("httpfetch").option("urls", "\\n".join(urls)).load()

yields one row per URL — fetched ON EXECUTORS, one input partition
per URL, so a 10,000-file backlog fans out across the whole cluster
and the scheduler handles stragglers/retries
(``spark.task.maxFailures``) instead of a driver loop.

Columns: url, status, size, md5, content (binary).  Payloads stay in
the executors' rows — compose with ``binaryFile``-style downstream
stages (hash dedup, partitioned writes) without driver round-trips.
Failures surface as status != 200 rows (status -1 = transport error)
rather than task aborts, so one dead URL cannot kill a 10k-file scan
— the errWithPermanence spirit (common.go:134-137) expressed as
data.

Uses the Spark 4 Python DataSource API (pyspark.sql.datasource) —
pure-Python, Arrow-returned, no JVM extension needed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "url string, status int, size long, md5 string, content binary"


class _UrlPartition(InputPartition):
    def __init__(self, url: str) -> None:
        self.url = url


class HttpFetchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        urls = options.get("urls", "")
        self.urls = [u for u in urls.splitlines() if u.strip()]
        self.timeout_s = float(options.get("timeout_s", "1800"))

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per URL: maximal fan-out; Spark packs them
        # onto tasks and reschedules stragglers
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        import urllib.error
        import urllib.request

        url = partition.url
        try:
            with urllib.request.urlopen(url, timeout=self.timeout_s) as resp:  # noqa: S310
                data = resp.read()
                status = getattr(resp, "status", 200) or 200
        except urllib.error.HTTPError as e:
            # non-2xx raises in urllib: surface the REAL status code so
            # downstream retry policy can distinguish 404 (permanent)
            # from 503 (transient); -1 stays transport-error-only
            yield (url, int(e.code), 0, "", None)
            return
        except Exception:  # noqa: BLE001 - failure is data, not an abort
            yield (url, -1, 0, "", None)
            return
        yield (url, int(status), len(data), hashlib.md5(data).hexdigest(), data)


class HttpFetchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "httpfetch"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> HttpFetchReader:
        return HttpFetchReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(HttpFetchDataSource)
