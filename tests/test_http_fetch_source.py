"""Custom httpfetch DataSource tests (file:// fixtures — no network)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from downloader_spark.sources import register


@pytest.fixture(scope="module")
def fixture_urls(tmp_path_factory):
    d = tmp_path_factory.mktemp("payloads")
    files = {f"obj{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    for name, data in files.items():
        (d / name).write_bytes(data)
    return files, [f"file://{d}/{n}" for n in files]


def test_fetch_source_scans_urls_as_rows(spark, fixture_urls):
    files, urls = fixture_urls
    register(spark)
    df = (
        spark.read.format("httpfetch")
        .option("urls", "\n".join(urls + ["file:///nonexistent/404.bin"]))
        .load()
    )
    rows = {r.url.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert len(rows) == 6
    for name, data in files.items():
        r = rows[name]
        assert r.status == 200
        assert r.size == len(data)
        assert bytes(r.content) == data
        assert r.md5 == hashlib.md5(data).hexdigest()
    # a dead URL is a data row, not a task failure
    assert rows["404.bin"].status == -1
    assert rows["404.bin"].content is None


def test_fetch_source_composes_with_dedup(spark, fixture_urls, tmp_path):
    files, urls = fixture_urls
    register(spark)
    # duplicate every URL: content dedup must halve the set
    df = (
        spark.read.format("httpfetch")
        .option("urls", "\n".join(urls * 2))
        .load()
        .filter(F.col("status") == 200)
    )
    kept = df.groupBy("md5").agg(F.min("url").alias("url"), F.first("size").alias("size"))
    assert kept.count() == len(files)
