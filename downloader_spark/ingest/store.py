"""Object-store abstraction + implementations.

Mirrors the reference's ``Store``/``Object`` interfaces
(/root/reference/file/api.go:25-35) with one deliberate change: there
is NO ``names_to_md5`` full-listing call — the reference lists the
whole bucket per dedup check (file/api.go:53, twice per file), which
is O(archive) and fatal at 100 TB.  Dedup state lives in the
persisted inventory table instead (inventory.py); the store is just
bytes-in/bytes-out.

``InMemoryStore`` is the test fake, with failure injection via magic
name substrings — the reference's fake uses the same device
(download/common_test.go:23-81: ``copyFail``, ``deleteFail``).
"""

from __future__ import annotations

import hashlib
import os
from typing import Protocol


class Store(Protocol):
    def put(self, name: str, data: bytes) -> None: ...
    def get(self, name: str) -> bytes: ...
    def copy(self, src: str, dst: str) -> None: ...
    def delete(self, name: str) -> None: ...
    def exists(self, name: str) -> bool: ...
    def list(self, prefix: str = "") -> list[str]: ...


def md5_hex(data: bytes) -> str:
    """Content identity, as the reference computes per object
    (file/api.go:61 reads server MD5; we compute at ingest)."""
    return hashlib.md5(data).hexdigest()


class InMemoryStore:
    """Dict-backed fake with reference-style failure injection:
    any operation on a name containing '<op>Fail' raises."""

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}

    def _inject(self, op: str, *names: str) -> None:
        for n in names:
            if f"{op}Fail" in n:
                raise OSError(f"injected {op} failure for {n}")

    def put(self, name: str, data: bytes) -> None:
        self._inject("put", name)
        self._objects[name] = data

    def get(self, name: str) -> bytes:
        self._inject("get", name)
        return self._objects[name]

    def copy(self, src: str, dst: str) -> None:
        self._inject("copy", src, dst)
        self._objects[dst] = self._objects[src]

    def delete(self, name: str) -> None:
        self._inject("delete", name)
        del self._objects[name]

    def exists(self, name: str) -> bool:
        return name in self._objects

    def list(self, prefix: str = "") -> list[str]:
        # same contract as the path-backed stores: in-flight .tmp
        # temporaries never appear in listings
        return sorted(
            n
            for n in self._objects
            if n.startswith(prefix) and not n.endswith(".tmp")
        )


class LocalFSStore:
    """Filesystem-backed store (object name = relative path)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, name: str) -> str:
        p = os.path.join(self.root, name)
        # commonpath, not startswith: a bare prefix check would admit a
        # sibling directory like "<root>-other"
        root = os.path.realpath(self.root)
        if os.path.commonpath([root, os.path.realpath(p)]) != root:
            raise ValueError(f"name escapes store root: {name!r}")
        return p

    def put(self, name: str, data: bytes) -> None:
        p = self._p(name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        # write-then-rename: readers never observe partial objects
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def get(self, name: str) -> bytes:
        with open(self._p(name), "rb") as f:
            return f.read()

    def copy(self, src: str, dst: str) -> None:
        self.put(dst, self.get(src))

    def delete(self, name: str) -> None:
        os.remove(self._p(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(self._p(name))

    def list(self, prefix: str = "") -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(self.root):
            for fn in files:
                rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                if rel.startswith(prefix) and not rel.endswith(".tmp"):
                    out.append(rel)
        return sorted(out)


class FsspecStore:
    """Cloud-object-store adapter over any fsspec filesystem — the
    repo-side counterpart of the reference's GCS ``Store``
    (file/api.go:44-87: writer streaming, server-side ``CopyTo``,
    bucket-scoped naming), expressed against the PUBLIC fsspec
    AbstractFileSystem surface so one class covers gs://, s3://,
    file:// and memory:// without provider code here.

    Semantics preserved from the protocol:
    - ``put`` is a single whole-object write (``pipe_file``): object
      stores make per-object writes atomic, so readers never observe
      partial objects (the LocalFSStore write-then-rename contract).
    - ``copy`` delegates to ``fs.copy`` — server-side where the
      backend supports it (GCS rewrite, S3 CopyObject), matching the
      reference's ``CopyTo`` which never round-trips bytes through
      the client.
    - ``list`` is prefix-scoped via ``fs.find`` and returns names
      RELATIVE to the root, so callers are bucket-layout agnostic.

    The constructor takes any object satisfying the used subset
    (pipe_file/cat_file/copy/rm_file/exists/find/makedirs) — tests
    run a dict-backed shim; production passes a real fsspec
    filesystem via ``from_url`` (lazy import keeps fsspec an
    optional dependency)."""

    _SEP = "/"

    def __init__(self, fs, root: str) -> None:
        self.fs = fs
        self.root = root.rstrip(self._SEP)

    @classmethod
    def from_url(cls, url: str) -> "FsspecStore":
        """Build from a URL like ``gs://bucket/prefix`` or
        ``file:///tmp/archive`` (requires fsspec to be installed)."""
        try:
            import fsspec
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "FsspecStore.from_url requires the optional fsspec "
                "dependency; install fsspec (plus the protocol's "
                "driver, e.g. gcsfs/s3fs) or construct FsspecStore "
                "with an explicit filesystem object"
            ) from exc
        fs, path = fsspec.core.url_to_fs(url)
        return cls(fs, path)

    def _p(self, name: str) -> str:
        parts = [s for s in name.split(self._SEP) if s not in ("", ".")]
        if ".." in parts:
            raise ValueError(f"name escapes store root: {name!r}")
        return self._SEP.join([self.root, *parts])

    def put(self, name: str, data: bytes) -> None:
        p = self._p(name)
        parent = p.rsplit(self._SEP, 1)[0]
        # no-op on flat object stores; required for directory-backed
        # filesystems (file://) to accept nested names
        self.fs.makedirs(parent, exist_ok=True)
        self.fs.pipe_file(p, data)

    def get(self, name: str) -> bytes:
        return self.fs.cat_file(self._p(name))

    def copy(self, src: str, dst: str) -> None:
        d = self._p(dst)
        parent = d.rsplit(self._SEP, 1)[0]
        self.fs.makedirs(parent, exist_ok=True)
        self.fs.copy(self._p(src), d)

    def delete(self, name: str) -> None:
        self.fs.rm_file(self._p(name))

    def exists(self, name: str) -> bool:
        return bool(self.fs.exists(self._p(name)))

    def list(self, prefix: str = "") -> list[str]:
        # Scope the listing server-side: fs.find on the deepest
        # directory-aligned ancestor of the prefix, so a 100 TB
        # archive is never enumerated to answer a dated-path query
        # (the same O(archive) trap the module header records
        # removing from names_to_md5).  Object stores treat find's
        # argument as a key prefix up to the last "/"; a residual
        # non-directory fragment ("maxmind/2023-01" matching
        # "2023-01-15/...") is filtered client-side below, which is
        # correct for any backend because find(dir) is always a
        # superset of the fragment's matches within that dir.
        # The find scope must stay inside the store root: sanitize the
        # directory part with the same rules _p applies to names
        # (drop "" and "." segments, reject ".." with the same
        # ValueError as the write path — put never creates such names,
        # and silently widening to a root-wide find would pay the very
        # O(archive) scan this scoping exists to avoid).
        scope = self.root
        if prefix:
            dir_part = prefix.rsplit(self._SEP, 1)[0] if self._SEP in prefix else ""
            parts = [s for s in dir_part.split(self._SEP) if s not in ("", ".")]
            if ".." in parts:
                raise ValueError(f"name escapes store root: {prefix!r}")
            if parts:
                scope = self._SEP.join([self.root, *parts])
        try:
            found = self.fs.find(scope)
        except FileNotFoundError:
            return []
        base = self.root + self._SEP
        rel = [p[len(base):] if p.startswith(base) else p for p in found]
        # .tmp filtering matches LocalFSStore.list: FsspecStore never
        # creates .tmp names (put is a single atomic object write),
        # but a bucket shared with a path-backed store must present
        # the same contract.
        return sorted(
            n
            for n in rel
            if n.startswith(prefix) and not n.endswith(".tmp")
        )


class LocalFileFS:
    """Minimal local-filesystem implementation of the fsspec subset
    ``FsspecStore`` uses (pipe_file/cat_file/copy/rm_file/exists/
    find/makedirs) — the zero-dependency ``file://`` backend, and the
    reference shape any fsspec AbstractFileSystem already satisfies.
    Stateless, so executor-side ``store_factory()`` closures pickle
    cleanly and see the same objects as the driver."""

    def pipe_file(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:
            f.write(data)

    def cat_file(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def copy(self, src: str, dst: str) -> None:
        self.pipe_file(dst, self.cat_file(src))

    def rm_file(self, path: str) -> None:
        os.remove(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def find(self, root: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(root):
            out.extend(os.path.join(dirpath, f) for f in files)
        return sorted(out)

    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        os.makedirs(path, exist_ok=True)
