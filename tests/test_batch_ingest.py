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


class _SpyStore(LocalFSStore):
    """Driver-side store wrapper counting copy/delete calls: the commit
    must not serialize per-object work through the driver instance."""

    def __init__(self, root):
        super().__init__(root)
        self.copies = []
        self.deletes = []

    def copy(self, src, dst):
        self.copies.append((src, dst))
        super().copy(src, dst)

    def delete(self, name):
        self.deletes.append(name)
        super().delete(name)


def test_large_backlog_commits_executor_side(spark, tmp_path):
    """1,000-file backlog: every object published and staging swept, with
    ZERO per-object copy/delete on the driver store (only the single
    current-pointer copy) — the promote/cleanup runs in executors."""
    src = tmp_path / "remote" / "2023" / "11"
    src.mkdir(parents=True)
    n = 1000
    for i in range(n):
        (src / f"f-{i:04d}.gz").write_bytes(b"payload-%d" % i)
    items = [(i, f"file://{src}/f-{i:04d}.gz") for i in range(n)]
    spec = SourceSpec(
        name="rv-big",
        kind="incremental",
        path_prefix="RV/",
        current_name="RV/current/routeview.gz",
        url_regexp=r".*?(\d{4}/\d{2}/)(.*)",
        dedup_regexp=r"(.*)",
    )
    inv = InventoryTable(str(tmp_path / "state" / "inventory"))
    root = str(tmp_path / "store")
    store = _SpyStore(root)
    summary = batch_ingest(
        spark, spec, items, store, _store_factory(root), inv
    )
    assert summary["published"] == n
    assert summary["failed"] == 0
    assert summary["watermark"] == n - 1
    assert len(store.copies) == 1  # current pointer only
    assert store.copies[0][1] == spec.current_name
    assert store.deletes == []
    final = LocalFSStore(root)
    assert len([x for x in final.list() if x.startswith(STAGING_PREFIX)]) == 0
    assert len([x for x in final.list("RV/2023/11/")]) == n
    assert inv.load(spark).count() == n


def test_same_name_different_content_newest_wins(spark, tmp_path):
    """Two work items mapping to the SAME object name with DIFFERENT
    content (fixed-filename snapshot refreshed mid-batch): staged under
    distinct keys, promoted newest-last, so the published bytes are the
    highest-seqnum item's and match an inventory row's md5."""
    import hashlib

    src = tmp_path / "remote"
    src.mkdir(parents=True)
    (src / "a.gz").write_bytes(b"version-one")
    (src / "b.gz").write_bytes(b"version-two-later")
    items = [(1, f"file://{src}/a.gz"), (2, f"file://{src}/b.gz")]
    spec = SourceSpec(
        name="mm-batch",
        kind="snapshot",
        path_prefix="MM/2023/11/01/",
        fixed_filename="GeoLite2-City.tar.gz",
        dedup_regexp=r"(.*/).*",
    )
    inv = InventoryTable(str(tmp_path / "state" / "inventory"))
    root = str(tmp_path / "store")
    store = LocalFSStore(root)
    summary = batch_ingest(
        spark, spec, items, store, _store_factory(root), inv
    )
    # both contents are new => both cataloged (the sequential reference
    # would have published both in turn, newest overwriting)
    assert summary["published"] == 2
    name = "MM/2023/11/01/GeoLite2-City.tar.gz"
    got = store.get(name)
    assert got == b"version-two-later"
    inv_rows = {r.md5 for r in inv.load(spark).collect()}
    assert hashlib.md5(got).hexdigest() in inv_rows
    # no staging leftovers from either item
    assert [x for x in store.list() if x.startswith(STAGING_PREFIX)] == []


def test_localfs_store_rejects_escapes_and_sibling_prefix(tmp_path):
    root = str(tmp_path / "store")
    sibling = str(tmp_path / "store-other")
    import os

    os.makedirs(sibling, exist_ok=True)
    store = LocalFSStore(root)
    store.put("ok/a.bin", b"x")
    with pytest.raises(ValueError):
        store.put("../outside.bin", b"x")
    with pytest.raises(ValueError):
        store.get("../../etc/passwd")
    # the classic prefix-match hole: "<root>-other" shares the string
    # prefix of root but is NOT inside it
    with pytest.raises(ValueError):
        store.put("../store-other/evil.bin", b"x")
    assert os.listdir(sibling) == []


def test_cleanup_sweeps_legacy_staging_objects(spark, ctx):
    """Objects staged under the pre-seqnum '_staging/{name}' format by
    an interrupted older run must still be swept by the next batch."""
    store = LocalFSStore(ctx["root"])
    legacy = STAGING_PREFIX + "RV/2023/11/f-1100.gz"
    store.put(legacy, b"orphan-bytes")
    batch_ingest(
        spark,
        ctx["spec"],
        ctx["items"],
        store,
        _store_factory(ctx["root"]),
        ctx["inv"],
    )
    assert not store.exists(legacy)
    assert [n for n in store.list() if n.startswith(STAGING_PREFIX)] == []
