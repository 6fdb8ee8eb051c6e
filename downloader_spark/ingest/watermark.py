"""Checkpointed per-source watermark state.

The reference keeps its RouteViews high-water-mark in process memory
(/root/reference/downloader.go:61-62) — a restart refetches the whole
log tail and leans on dedup to absorb it (SURVEY §4.3.3).  Here the
watermark is durable: a JSON file written atomically
(write-temp-then-rename), read back at startup — the batch analog of
a Structured Streaming checkpoint.

Commit ordering parity: the caller advances the watermark only after
the item's publish has fully succeeded, and only while no error has
occurred this cycle (routeviews.go:60-62).
"""

from __future__ import annotations

import json
import os


class WatermarkStore:
    def __init__(self, path: str) -> None:
        self.path = path

    def _read(self) -> dict[str, int]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, source: str, default: int = 0) -> int:
        return self._read().get(source, default)

    def set(self, source: str, value: int) -> None:
        state = self._read()
        state[source] = value
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)
