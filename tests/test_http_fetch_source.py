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


def test_fetch_source_surfaces_real_http_status(spark):
    """Non-2xx responses raise HTTPError inside urllib; the reader must
    surface the REAL code (404 vs 503 drives retry permanence), keeping
    -1 for transport-level failures only."""
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/ok":
                body = b"hello"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/gone":
                self.send_error(404)
            else:
                self.send_error(503)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        urls = [f"http://127.0.0.1:{port}/{p}" for p in ("ok", "gone", "busy")]
        register(spark)
        df = spark.read.format("httpfetch").option("urls", "\n".join(urls)).load()
        rows = {r.url.rsplit("/", 1)[-1]: r for r in df.collect()}
        assert rows["ok"].status == 200
        assert bytes(rows["ok"].content) == b"hello"
        assert rows["gone"].status == 404
        assert rows["gone"].content is None
        assert rows["busy"].status == 503
    finally:
        srv.shutdown()
