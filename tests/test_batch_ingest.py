"""Executor-parallel batch ingest tests: file:// fixtures (no
network), a filesystem store shared between driver and Python
workers, duplicate suppression across AND within the batch, failure
handling, and the safe-watermark rule.
"""

from __future__ import annotations

import pytest

from downloader_spark.ingest.batch import STAGING_PREFIX, batch_ingest
from downloader_spark.ingest.config import SourceSpec
from downloader_spark.ingest.inventory import InventoryTable
from downloader_spark.ingest.store import LocalFSStore


@pytest.fixture()
def ctx(tmp_path):
    src = tmp_path / "remote" / "2023" / "11"
    src.mkdir(parents=True)
    files = {
        "f-1100.gz": b"payload-1100",
        "f-1101.gz": b"payload-1101",
        "f-1102.gz": b"payload-1101",  # duplicate content of 1101
        "f-1103.gz": b"payload-1103",
    }
    for name, data in files.items():
        (src / name).write_bytes(data)
    items = [
        (1100 + i, f"file://{src}/f-{1100 + i}.gz") for i in range(len(files))
    ]
    root = str(tmp_path / "store")
    spec = SourceSpec(
        name="rv-batch",
        kind="incremental",
        path_prefix="RV/",
        current_name="RV/current/routeview.gz",
        url_regexp=r".*?(\d{4}/\d{2}/)(.*)",
        dedup_regexp=r"(.*/).*",  # directory scope
    )
    inv = InventoryTable(str(tmp_path / "state" / "inventory"))
    return {
        "spec": spec,
        "items": items,
        "root": root,
        "inv": inv,
        "src": src,
    }


def _store_factory(root):
    def make():
        return LocalFSStore(root)

    return make


def test_batch_ingest_publishes_dedups_and_cleans_staging(spark, ctx):
    store = LocalFSStore(ctx["root"])
    summary = batch_ingest(
        spark,
        ctx["spec"],
        ctx["items"],
        store,
        _store_factory(ctx["root"]),
        ctx["inv"],
    )
    assert summary == {
        "published": 3,  # 1102 is a within-batch duplicate of 1101
        "duplicates": 1,
        "failed": 0,
        "watermark": 1103,
    }
    assert store.exists("RV/2023/11/f-1100.gz")
    # current = newest published content
    assert store.get(ctx["spec"].current_name) == b"payload-1103"
    # no staging leftovers
    assert [n for n in store.list() if n.startswith(STAGING_PREFIX)] == []
    assert ctx["inv"].load(spark).count() == 3

    # a second identical batch is fully absorbed by the inventory anti-join
    summary2 = batch_ingest(
        spark,
        ctx["spec"],
        ctx["items"],
        store,
        _store_factory(ctx["root"]),
        ctx["inv"],
    )
    assert summary2["published"] == 0
    assert summary2["duplicates"] == 4
    assert ctx["inv"].load(spark).count() == 3


def test_batch_ingest_watermark_stops_at_first_failure(spark, ctx):
    (ctx["src"] / "f-1101.gz").unlink()  # 1101 will 404
    store = LocalFSStore(ctx["root"])
    summary = batch_ingest(
        spark,
        ctx["spec"],
        ctx["items"],
        store,
        _store_factory(ctx["root"]),
        ctx["inv"],
    )
    assert summary["failed"] == 1
    # 1100 ok; 1101 failed -> watermark frozen at 1100 even though
    # 1102/1103 downloaded fine (they'll be deduped on refetch)
    assert summary["watermark"] == 1100
    assert summary["published"] == 3  # 1100, 1102, 1103 all new content


def test_commit_failure_leaves_no_partial_catalog(spark, ctx):
    """If promotion fails mid-commit the inventory is never appended:
    the catalog stays consistent (at-least-once + idempotent publish —
    a rerun refetches and the content dedup absorbs everything that
    did land)."""
    import os

    store = LocalFSStore(ctx["root"])
    # sabotage one final path: a directory where the object must go
    os.makedirs(os.path.join(ctx["root"], "RV/2023/11/f-1101.gz"))
    with pytest.raises(OSError):
        batch_ingest(
            spark,
            ctx["spec"],
            ctx["items"],
            store,
            _store_factory(ctx["root"]),
            ctx["inv"],
        )
    # nothing cataloged -> the next (repaired) run re-ingests cleanly
    assert ctx["inv"].load(spark).count() == 0
