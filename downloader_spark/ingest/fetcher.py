"""Fetchers: the HTTP boundary (reference A1, common.go:61-92).

CI/test runs never touch the network (the reference takes the same
stance: httptest fixture servers, download/common_test.go:171-178).
``FakeFetcher`` serves from a dict with injectable failures;
``UrlFetcher`` is the real driver-side implementation (stdlib urllib,
Basic Auth per common.go:75-77, non-200 → retryable error per
common.go:87-92).

At cluster scale a large work list would fan out instead:
``spark.createDataFrame(work).repartition(n).mapInPandas(fetch_batch)``
— each executor fetching and writing its partition.  The reference's
work lists are a handful of files per cycle, so the driver-side path
is the honest default.
"""

from __future__ import annotations

from typing import Protocol


class Fetcher(Protocol):
    def fetch(self, url: str, auth: tuple[str, str] | None = None) -> bytes: ...


class FetchError(Exception):
    """Retryable fetch failure (non-200 or transport error)."""


class FakeFetcher:
    """Test fake: dict of url → bytes, or url → Exception to inject a
    failure; ``fail_first`` injects N transient failures per URL to
    exercise the retry ladder."""

    def __init__(
        self, responses: dict[str, bytes], fail_first: dict[str, int] | None = None
    ) -> None:
        self.responses = responses
        self.fail_first = dict(fail_first or {})
        self.calls: list[str] = []

    def fetch(self, url: str, auth: tuple[str, str] | None = None) -> bytes:
        self.calls.append(url)
        if self.fail_first.get(url, 0) > 0:
            self.fail_first[url] -= 1
            raise FetchError(f"injected transient failure: {url}")
        if url not in self.responses:
            raise FetchError(f"404: {url}")
        body = self.responses[url]
        if isinstance(body, Exception):
            raise body
        return body


class UrlFetcher:
    """Driver-side HTTP GET with optional Basic Auth and timeout
    (30-min cap parity, common.go:23).  Untested in CI by design — no
    network in the container."""

    def __init__(self, timeout_s: float = 1800.0) -> None:
        self.timeout_s = timeout_s

    def fetch(self, url: str, auth: tuple[str, str] | None = None) -> bytes:
        import base64
        import urllib.request

        req = urllib.request.Request(url)
        if auth:
            tok = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
            req.add_header("Authorization", f"Basic {tok}")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:  # noqa: S310
            if resp.status != 200:
                raise FetchError(f"URL:{url} gave response code {resp.status}")
            return resp.read()
