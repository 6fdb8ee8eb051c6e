"""Minimal table-format snapshot log: a Delta-style JSON action log
over parquet part files.

The shape follows the PUBLIC Delta Lake transaction-log protocol
(delta.io PROTOCOL.md): one JSON-lines file per commit version, each
line one action object — ``{"add": {"path": ..., "size": ...}}``,
``{"remove": {"path": ...}}``, or ``{"commitInfo": {...}}`` — and a
snapshot at version V is the fold of all adds minus removes across
versions 0..V.  That fold is METADATA work: the log is KBs while the
table is TBs, so snapshot resolution runs driver-side (exactly as
Delta/Iceberg clients do) and only the resolved file list fans out to
executors for scanning.

This module is pure log mechanics (parse / fold / time travel);
the registry key ``table_snapshot_read`` (operators/round15_ext.py)
scans the resolved snapshots with the engine's own from-scratch
parquet writer + page reader.  (Reference lineage: the reference's
latest-pointer upsert at /root/reference/file/api.go:81-87 is a
1-version, 1-file special case of exactly this visible-set fold.)
"""

from __future__ import annotations

import json


def parse_log(version_files: dict[int, str]) -> dict[int, list[dict]]:
    """Parse {version: json-lines text} into {version: [action, ...]}.
    Versions must be contiguous from 0 (a gap means a missing commit
    file — fail loudly, never silently skip history)."""
    if not version_files:
        raise ValueError("empty table log")
    versions = sorted(version_files)
    if versions != list(range(len(versions))):
        raise ValueError(f"non-contiguous log versions {versions}")
    out: dict[int, list[dict]] = {}
    for v in versions:
        actions = []
        for line in version_files[v].splitlines():
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            if not any(k in obj for k in ("add", "remove", "commitInfo")):
                raise ValueError(
                    f"version {v}: unknown action {sorted(obj)}"
                )
            actions.append(obj)
        out[v] = actions
    return out


def visible_files(
    log: dict[int, list[dict]], version: int
) -> dict[str, dict]:
    """Fold the action log through commits 0..version: returns
    {path: add-info} for every file visible in that snapshot.
    Removing an unknown path or re-adding a live path is a corrupt
    log and raises (the invariant real table formats enforce)."""
    if version not in log:
        raise ValueError(f"no such version {version}")
    live: dict[str, dict] = {}
    for v in range(version + 1):
        for action in log[v]:
            if "add" in action:
                path = action["add"]["path"]
                if path in live:
                    raise ValueError(f"v{v}: double add of {path}")
                live[path] = action["add"]
            elif "remove" in action:
                path = action["remove"]["path"]
                if path not in live:
                    raise ValueError(f"v{v}: remove of unknown {path}")
                del live[path]
    return live


def snapshot_history(log: dict[int, list[dict]]) -> dict[int, list[str]]:
    """Every snapshot's sorted visible file list, one fold pass."""
    return {v: sorted(visible_files(log, v)) for v in sorted(log)}
