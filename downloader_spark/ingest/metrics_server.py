"""HTTP /metrics endpoint serving the Prometheus text exposition.

The reference binds its metrics to a socket at startup
(`prometheusx.MustServeMetrics()`, /root/reference/downloader.go:52;
served on :9090 per Dockerfile:26-28).  This is the runtime
counterpart: a stdlib ThreadingHTTPServer on a daemon thread whose
GET /metrics renders a caller-supplied ``text_fn`` — the Downloader
passes its ``prometheus_text`` bound method, so every scrape sees the
counters as of that instant (Prometheus pull model: render at scrape
time, never a cached snapshot).

Driver-side only — the scrape handler reads plain Python counters; no
Spark job runs on the scrape path, so a slow scrape can never block or
be blocked by executor work.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

# The content type Prometheus clients expect for text format 0.0.4.
CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"


class MetricsServer:
    """Serve ``text_fn()`` at GET /metrics on ``port``.

    ``port=0`` binds an ephemeral port (tests); read the actual one
    from ``.port`` after construction.  The serving thread is a
    daemon, so a forgotten server never blocks interpreter exit, but
    callers should still ``close()`` (or use ``with``) to release the
    socket deterministically.
    """

    def __init__(
        self, text_fn: Callable[[], str], port: int = 9090, host: str = "127.0.0.1"
    ) -> None:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
                if self.path.split("?", 1)[0] not in ("/metrics", "/metrics/"):
                    self.send_error(404, "only /metrics is served")
                    return
                try:
                    body = server.text_fn().encode("utf-8")
                except Exception as exc:  # render failure -> 500, not a hang
                    self.send_error(500, f"metrics render failed: {exc}")
                    return
                self.send_response(200)
                self.send_header("Content-Type", CONTENT_TYPE)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # silence per-scrape stderr
                pass

        self.text_fn = text_fn
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host = host
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="metrics-server", daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/metrics"

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def __enter__(self) -> "MetricsServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
