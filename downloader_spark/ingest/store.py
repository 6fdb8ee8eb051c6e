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
        return sorted(n for n in self._objects if n.startswith(prefix))


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
