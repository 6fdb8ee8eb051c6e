"""A16 event notification + A15 Prometheus text exposition.

The reference REQUIRES the "downloader-new-files" pub/sub topic at
startup (/root/reference/README.md:71-74) but never publishes to it;
notify.py supplies that wiring.  The hook must fire exactly once per
newly PUBLISHED object — never for duplicates, failures, or re-runs.

The exposition format mirrors metrics/metrics.go:13-53 and its lint
gate (metrics_test.go:10-16): HELP+TYPE per family, _total counter
names, snake_case, escaped label values.
"""

from __future__ import annotations

import hashlib

from downloader_spark.ingest import (
    CollectingNotifier,
    Downloader,
    InMemoryStore,
    NewFileEvent,
    SourceSpec,
    render_prometheus_text,
    routeviews_source,
)
from downloader_spark.ingest.fetcher import FakeFetcher
from tests.test_ingest import LOG_FIXTURE, LOG_URL, _url


def _rv_spec(directory_scope: bool = False) -> SourceSpec:
    spec = routeviews_source(
        "routeviews-ipv4",
        LOG_URL,
        "RouteViewIPv4/",
        "RouteViewIPv4/current/routeview.pfx2as.gz",
    )
    if directory_scope:
        # whole-name scope (the reference's routeviews.go:19) never
        # cross-names dedup; directory scope makes same-content items
        # under different names true duplicates
        import dataclasses

        spec = dataclasses.replace(spec, dedup_regexp=r"(.*/).*")
    return spec


def _mk(spark, tmp_path, responses, notifier):
    return Downloader(
        spark,
        InMemoryStore(),
        FakeFetcher(responses),
        str(tmp_path / "state"),
        retry_min_s=1,
        retry_max_s=2,
        sleep=lambda s: None,
        notifier=notifier,
    )


def test_notification_fires_exactly_for_published_files(spark, tmp_path):
    """Cycle with 3 work items, one a content duplicate: exactly two
    events, in publish order, carrying the inventory's identity."""
    responses = {
        LOG_URL: LOG_FIXTURE.encode(),
        _url("2023/11/routeviews-rv2-20231114-1200.pfx2as.gz"): b"payload-1100",
        _url("2023/11/routeviews-rv2-20231115-1200.pfx2as.gz"): b"payload-1100",
        _url("2023/11/routeviews-rv2-20231116-1200.pfx2as.gz"): b"payload-1102",
    }
    notes = CollectingNotifier()
    dl = _mk(spark, tmp_path, responses, notes)
    spec = _rv_spec(directory_scope=True)
    assert dl.run_cycle([spec])

    assert [e.name for e in notes.events] == [
        "RouteViewIPv4/2023/11/routeviews-rv2-20231114-1200.pfx2as.gz",
        "RouteViewIPv4/2023/11/routeviews-rv2-20231116-1200.pfx2as.gz",
    ]
    e0 = notes.events[0]
    assert e0 == NewFileEvent(
        e0.name,
        hashlib.md5(b"payload-1100").hexdigest(),
        "routeviews-ipv4",
        len(b"payload-1100"),
    )

    # an identical second cycle publishes nothing -> no new events
    assert dl.run_cycle([spec])
    assert len(notes.events) == 2


def test_notification_skips_failed_fetches(spark, tmp_path):
    responses = {
        LOG_URL: LOG_FIXTURE.encode(),
        _url("2023/11/routeviews-rv2-20231114-1200.pfx2as.gz"): b"payload-1100",
        # 1101 missing -> fetch fails; 1102 present
        _url("2023/11/routeviews-rv2-20231116-1200.pfx2as.gz"): b"payload-1102",
    }
    notes = CollectingNotifier()
    dl = _mk(spark, tmp_path, responses, notes)
    assert not dl.run_cycle([_rv_spec()])
    assert [e.md5 for e in notes.events] == [
        hashlib.md5(b"payload-1100").hexdigest(),
        hashlib.md5(b"payload-1102").hexdigest(),
    ]


def test_batch_ingest_notifies_survivors_only(spark, tmp_path):
    from downloader_spark.ingest.batch import batch_ingest
    from downloader_spark.ingest.inventory import InventoryTable
    from downloader_spark.ingest.store import LocalFSStore

    src = tmp_path / "remote" / "2023" / "11"
    src.mkdir(parents=True)
    payloads = [b"pay-0", b"pay-1", b"pay-1", b"pay-3"]  # one dup
    for i, p in enumerate(payloads):
        (src / f"f-{i}.gz").write_bytes(p)
    items = [(i, f"file://{src}/f-{i}.gz") for i in range(len(payloads))]
    spec = SourceSpec(
        name="rv-batch",
        kind="incremental",
        path_prefix="RV/",
        url_regexp=r".*?(\d{4}/\d{2}/)(.*)",
        dedup_regexp=r"(.*/).*",  # directory scope => cross-name dedup
    )
    root = str(tmp_path / "store")
    notes = CollectingNotifier()
    summary = batch_ingest(
        spark,
        spec,
        items,
        LocalFSStore(root),
        lambda root=root: LocalFSStore(root),
        InventoryTable(str(tmp_path / "state" / "inventory")),
        notifier=notes,
    )
    assert summary["published"] == 3
    assert sorted(e.md5 for e in notes.events) == sorted(
        hashlib.md5(p).hexdigest() for p in {b"pay-0", b"pay-1", b"pay-3"}
    )
    assert all(e.dataset == "rv-batch" for e in notes.events)


def test_prometheus_text_exposition_golden():
    text = render_prometheus_text(
        failed_downloads={"maxmind-geolite2-city": 3.0},
        error_count={'Copy to "Current" Error': 1.0},
        routeviews_url_errors={},
        last_success_time=1700000000.5,
    )
    assert text == (
        "# HELP downloader_download_failed_total Increments every time a "
        "download maxes out our number of retries.\n"
        "# TYPE downloader_download_failed_total counter\n"
        'downloader_download_failed_total{download_type="maxmind-geolite2-city"} 3\n'
        "# HELP downloader_error_total The current number of unresolved "
        "errors encountered while attempting to download the latest maxmind "
        "and routeviews data.\n"
        "# TYPE downloader_error_total counter\n"
        'downloader_error_total{source="Copy to \\"Current\\" Error"} 1\n'
        "# HELP downloader_last_success_time_seconds The time that ALL the "
        "downloads last completed successfully.\n"
        "# TYPE downloader_last_success_time_seconds gauge\n"
        "downloader_last_success_time_seconds 1700000000.5\n"
    )


def test_prometheus_text_lint_rules():
    """The reference gates its metrics through promtest.LintMetrics
    (metrics_test.go:10-16); assert the same rules on our exposition:
    every sample preceded by HELP+TYPE for its family, counters end in
    _total, names are snake_case, HELP text is non-empty, label names
    are snake_case, gauges measuring time carry a _seconds unit
    suffix (promlint's unit check for base units)."""
    import re

    text = render_prometheus_text(
        failed_downloads={"a": 1},
        error_count={"b": 2},
        routeviews_url_errors={"c": 3},
        last_success_time=123.0,
    )
    seen_meta: dict[str, set[str]] = {}
    for line in text.strip().splitlines():
        if line.startswith("# HELP "):
            parts = line.split(maxsplit=3)
            assert len(parts) == 4 and parts[3].strip(), line  # non-empty help
            seen_meta.setdefault(parts[2], set()).add("help")
        elif line.startswith("# TYPE "):
            name, mtype = line.split()[2:4]
            assert mtype in ("counter", "gauge", "histogram", "summary"), line
            seen_meta.setdefault(name, set()).add("type")
            if mtype == "counter":
                assert name.endswith("_total"), name
            if mtype == "gauge" and "time" in name:
                assert name.endswith("_seconds"), name  # unit suffix
        else:
            name = re.match(r"([a-zA-Z_:][a-zA-Z0-9_:]*)", line).group(1)
            assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name
            assert seen_meta.get(name) == {"help", "type"}, name
            lbl = re.match(r"[^{]*\{(.*)\}", line)
            if lbl:
                for pair in re.findall(r'([a-zA-Z_][a-zA-Z0-9_]*)="', lbl.group(1)):
                    assert re.fullmatch(r"[a-z][a-z0-9_]*", pair), pair


def test_downloader_prometheus_text_and_url_error_counter(spark, tmp_path):
    """End-to-end: a cycle whose creation-log fetch dies increments the
    routeviews-URL counter (metrics.go:45-52) and surfaces in both the
    metrics DataFrame and the text exposition."""
    dl = _mk(spark, tmp_path, {}, None)  # no responses: log fetch 404s
    assert not dl.run_cycle([_rv_spec()])
    assert dl.routeviews_url_errors["routeviews-ipv4"] == 1
    rows = {
        (r.metric, r.label): r.value for r in dl.metrics_df().collect()
    }
    assert rows[
        ("downloader_downloader_routeviews_url_error_total", "routeviews-ipv4")
    ] == 1.0
    text = dl.prometheus_text()
    assert (
        'downloader_downloader_routeviews_url_error_total{source="routeviews-ipv4"} 1'
        in text
    )


def test_metrics_endpoint_serves_live_exposition(spark, tmp_path):
    """The reference binds /metrics at startup
    (prometheusx.MustServeMetrics(), downloader.go:52; :9090 per
    Dockerfile:26-28).  serve_metrics() is the runtime counterpart:
    GET /metrics against a real socket must golden-match
    prometheus_text() AFTER a fake-store cycle, re-render per scrape
    (pull model), and 404 any other path."""
    import urllib.error
    import urllib.request

    responses = {
        LOG_URL: LOG_FIXTURE.encode(),
        _url("2023/11/routeviews-rv2-20231114-1200.pfx2as.gz"): b"payload-1100",
        _url("2023/11/routeviews-rv2-20231115-1200.pfx2as.gz"): b"payload-1101",
        _url("2023/11/routeviews-rv2-20231116-1200.pfx2as.gz"): b"payload-1102",
    }
    dl = _mk(spark, tmp_path, responses, None)
    assert dl.run_cycle([_rv_spec()])

    with dl.serve_metrics(port=0) as srv:  # ephemeral port for the test
        with urllib.request.urlopen(srv.url, timeout=10) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == (
                "text/plain; version=0.0.4; charset=utf-8"
            )
            body = resp.read().decode("utf-8")
        assert body == dl.prometheus_text()
        assert "downloader_last_success_time_seconds" in body

        # scrape-time rendering: a counter bumped AFTER bind shows up
        dl.error_count["Client Setup"] += 1
        with urllib.request.urlopen(srv.url, timeout=10) as resp:
            assert 'downloader_error_total{source="Client Setup"} 1' in (
                resp.read().decode("utf-8")
            )

        try:
            urllib.request.urlopen(srv.url.replace("/metrics", "/other"), timeout=10)
            raise AssertionError("non-/metrics path must 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

    # after close() the socket is released: a new server can rebind it
    srv2 = dl.serve_metrics(port=srv.port)
    srv2.close()
