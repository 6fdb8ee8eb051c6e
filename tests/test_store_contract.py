"""One contract suite, every Store implementation (file/api.go:25-35
parity): the same behavioral assertions run against InMemoryStore,
LocalFSStore, and FsspecStore, so a new backend can't silently bend
the semantics the ingest pipeline relies on (overwrite-in-place,
prefix listing, copy independence, no partial objects).

FsspecStore runs over ``DictFS`` — a dict-backed shim implementing
exactly the fsspec AbstractFileSystem subset the adapter uses
(pipe_file/cat_file/copy/rm_file/exists/find/makedirs) — so the
adapter's translation layer is fully exercised without the optional
fsspec dependency installed.
"""

from __future__ import annotations

import pytest

from downloader_spark.ingest.store import (
    FsspecStore,
    InMemoryStore,
    LocalFSStore,
)


class DictFS:
    """fsspec-AbstractFileSystem stand-in over a flat path->bytes dict
    (the shape of fsspec's MemoryFileSystem)."""

    def __init__(self) -> None:
        self.files: dict[str, bytes] = {}

    def pipe_file(self, path: str, data: bytes) -> None:
        self.files[path] = bytes(data)

    def cat_file(self, path: str) -> bytes:
        return self.files[path]

    def copy(self, src: str, dst: str) -> None:
        self.files[dst] = self.files[src]

    def rm_file(self, path: str) -> None:
        del self.files[path]

    def exists(self, path: str) -> bool:
        return path in self.files

    def find(self, root: str) -> list[str]:
        pre = root.rstrip("/") + "/"
        return sorted(p for p in self.files if p.startswith(pre))

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        pass  # flat object namespace


@pytest.fixture(params=["memory", "localfs", "fsspec"])
def store(request, tmp_path):
    if request.param == "memory":
        return InMemoryStore()
    if request.param == "localfs":
        return LocalFSStore(str(tmp_path / "root"))
    return FsspecStore(DictFS(), "bucket/prefix")


def test_put_get_roundtrip(store):
    store.put("a/b.dat", b"\x00payload\xff")
    assert store.get("a/b.dat") == b"\x00payload\xff"


def test_put_overwrites_in_place(store):
    store.put("x", b"v1")
    store.put("x", b"v2-longer")
    assert store.get("x") == b"v2-longer"
    assert store.list() == ["x"]


def test_exists_and_delete(store):
    assert not store.exists("gone")
    store.put("gone", b"here")
    assert store.exists("gone")
    store.delete("gone")
    assert not store.exists("gone")


def test_copy_is_independent_of_source(store):
    """The A8 'Current' repair copies then may delete the source —
    the copy must survive (reference CopyTo, file/api.go:69-87)."""
    store.put("v1/data", b"snapshot")
    store.copy("v1/data", "current/data")
    store.delete("v1/data")
    assert store.get("current/data") == b"snapshot"
    assert not store.exists("v1/data")


def test_list_is_prefix_scoped_and_sorted(store):
    store.put("maxmind/2024/a", b"1")
    store.put("maxmind/2024/b", b"2")
    store.put("routeviews/c", b"3")
    assert store.list("maxmind/") == ["maxmind/2024/a", "maxmind/2024/b"]
    assert store.list() == [
        "maxmind/2024/a",
        "maxmind/2024/b",
        "routeviews/c",
    ]


def test_list_fragment_prefix_matches_within_directory(store):
    """A prefix that is NOT directory-aligned ('maxmind/2023-01'
    matching dated names inside maxmind/) must still filter
    correctly — the scoped-find fast path falls back to client-side
    fragment filtering inside the deepest aligned directory."""
    store.put("maxmind/2023-01-15/geo.tar.gz", b"1")
    store.put("maxmind/2023-02-01/geo.tar.gz", b"2")
    store.put("routeviews/2023-01-20/rib.bz2", b"3")
    assert store.list("maxmind/2023-01") == [
        "maxmind/2023-01-15/geo.tar.gz"
    ]
    # bare fragment with no separator scans from the root
    assert store.list("max") == [
        "maxmind/2023-01-15/geo.tar.gz",
        "maxmind/2023-02-01/geo.tar.gz",
    ]


def test_list_missing_prefix_is_empty(store):
    store.put("maxmind/a", b"1")
    assert store.list("nosuch/dir/") == []


def test_list_filters_tmp_names(store):
    """All backends present the LocalFSStore contract: .tmp names
    (in-flight write-then-rename temporaries) never appear in
    listings, even on a bucket shared with a path-backed store."""
    store.put("maxmind/a", b"1")
    store.put("maxmind/a.tmp", b"partial")
    assert store.list("maxmind/") == ["maxmind/a"]
    assert store.list() == ["maxmind/a"]


def test_nested_names_roundtrip(store):
    name = "deep/ly/nested/object.tar.gz"
    store.put(name, b"deep")
    assert store.list("deep/") == [name]
    assert store.get(name) == b"deep"


def test_escape_guard():
    """Path-shaped stores must reject names escaping the root."""
    for s in (
        LocalFSStore("/tmp/store-escape-test"),
        FsspecStore(DictFS(), "bucket/prefix"),
    ):
        with pytest.raises(ValueError):
            s.put("../outside", b"x")


def test_fsspec_list_scope_never_escapes_root():
    """A listing prefix containing '..' raises the same ValueError as
    the write path (_p) — ``put`` never creates such names, and a
    silent fallback would pay the O(archive) root-wide ``find`` the
    scoping exists to avoid.  Sanitized-away segments ('' / '.') stay
    accepted; every backend probe stays inside the store root.  Guard
    via a find-recording shim."""

    class RecordingFS(DictFS):
        def __init__(self):
            super().__init__()
            self.finds: list[str] = []

        def find(self, root: str) -> list[str]:
            self.finds.append(root)
            return super().find(root)

    fs = RecordingFS()
    fs.files["other/secret"] = b"x"  # sibling OUTSIDE the store root
    s = FsspecStore(fs, "bucket/prefix")
    s.put("maxmind/a", b"1")
    with pytest.raises(ValueError):
        s.list("../other/")
    with pytest.raises(ValueError):
        s.list(".././maxmind/a")
    assert s.list("maxmind/") == ["maxmind/a"]  # normal path unaffected
    # droppable segments ('' / '.') don't raise; the literal
    # startswith match simply finds nothing for the unnormalized name
    assert s.list(".///maxmind/a") == []
    for scope in fs.finds:
        assert scope.startswith("bucket/prefix"), scope


def test_fsspec_names_are_root_relative():
    fs = DictFS()
    s = FsspecStore(fs, "bucket/prefix")
    s.put("a/b", b"x")
    # the underlying filesystem sees absolute bucket paths...
    assert set(fs.files) == {"bucket/prefix/a/b"}
    # ...while the Store surface stays root-relative
    assert s.list() == ["a/b"]


def test_fsspec_end_to_end_batch_ingest(spark, tmp_path):
    """The full transactional batch ingest (executor-parallel fetch ->
    hash -> dedup -> publish -> current repair) runs unchanged over
    the fsspec adapter — the Store protocol is the only coupling
    (SURVEY §7's 'GCS plumbing not ported' gap, file/api.go:44-87,
    is closed by this adapter + suite)."""
    from downloader_spark.ingest.batch import batch_ingest
    from downloader_spark.ingest.config import SourceSpec
    from downloader_spark.ingest.inventory import InventoryTable
    from downloader_spark.ingest.store import LocalFileFS

    src = tmp_path / "remote" / "2023" / "11"
    src.mkdir(parents=True)
    files = {
        "f-1100.gz": b"payload-1100",
        "f-1101.gz": b"payload-1101",
        "f-1102.gz": b"payload-1101",  # duplicate content of 1101
    }
    for name, data in files.items():
        (src / name).write_bytes(data)
    items = [(1100 + i, f"file://{src}/f-{1100 + i}.gz") for i in range(3)]
    spec = SourceSpec(
        name="rv-fsspec",
        kind="incremental",
        path_prefix="RV/",
        current_name="RV/current/routeview.gz",
        url_regexp=r".*?(\d{4}/\d{2}/)(.*)",
        dedup_regexp=r"(.*/).*",
    )
    inv = InventoryTable(str(tmp_path / "state" / "inventory"))
    root = str(tmp_path / "bucket" / "archive")

    def store_factory(root=root):
        return FsspecStore(LocalFileFS(), root)

    store = store_factory()
    summary = batch_ingest(spark, spec, items, store, store_factory, inv)
    assert summary["published"] == 2 and summary["duplicates"] == 1
    assert summary["watermark"] == 1102
    assert store.get("RV/2023/11/f-1100.gz") == b"payload-1100"
    assert store.get(spec.current_name) == b"payload-1101"
