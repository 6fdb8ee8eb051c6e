"""Minimal table-format snapshot log: a Delta-style JSON action log
over parquet part files.

The shape follows the PUBLIC Delta Lake transaction-log protocol
(delta.io PROTOCOL.md): one JSON-lines file per commit version, each
line one action object covering the protocol's commit vocabulary —
``protocol`` (reader/writer feature gate; every real table's commit 0
leads with it), ``metaData`` (table schema/format; required in commit
0, latest wins), ``txn`` (idempotent-writer application transaction),
``add`` / ``remove`` (file-level data change), ``cdc`` (change-data
files; ignored for the visible set) and ``commitInfo`` (provenance,
no state effect).  A snapshot at version V is the fold of all adds
minus removes across versions 0..V.  That fold is METADATA work: the
log is KBs while the table is TBs, so snapshot resolution runs
driver-side (exactly as Delta/Iceberg clients do) and only the
resolved file list fans out to executors for scanning.

Long logs checkpoint: ``_last_checkpoint`` names a version whose
folded state lives in a PARQUET file (one row per surviving action,
struct columns ``add`` / ``remove`` / ``metaData`` / ``protocol`` /
``txn``), and a reader folds checkpoint + the JSON tail instead of
replaying every commit.  Here the checkpoint parquet is written by
the engine's OWN from-scratch writer (media.encode_parquet struct
columns) and read back by its OWN struct reassembly
(media.read_parquet_struct_column) — the round-16 struct layer doing
real work.

This module is pure log mechanics (parse / fold / time travel /
checkpoint); the registry keys ``table_snapshot_read`` and
``table_checkpoint_read`` (operators/round15_ext.py, round16_ext.py)
scan the resolved snapshots with the engine's own parquet layers.
(Reference lineage: the reference's latest-pointer upsert at
/root/reference/file/api.go:81-87 is a 1-version, 1-file special
case of exactly this visible-set fold.)
"""

from __future__ import annotations

import json

#: the full commit vocabulary of delta.io PROTOCOL.md ("Actions")
_ACTIONS = (
    "add",
    "remove",
    "commitInfo",
    "protocol",
    "metaData",
    "txn",
    "cdc",
)

#: what this reader implements: plain data files, no deletion
#: vectors / column mapping / v2 checkpoints (minReaderVersion > 1
#: gates those per PROTOCOL.md — honoring the gate means refusing)
_MAX_READER_VERSION = 1


def parse_log(version_files: dict[int, str]) -> dict[int, list[dict]]:
    """Parse {version: json-lines text} into {version: [action, ...]}.
    Versions must be contiguous from 0 (a gap means a missing commit
    file — fail loudly, never silently skip history).  Every line must
    carry exactly one known action key; a ``protocol`` action whose
    minReaderVersion exceeds what this reader implements raises
    (PROTOCOL.md requires readers to honor the gate, not guess)."""
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
            keys = [k for k in _ACTIONS if k in obj]
            if len(keys) != 1:
                raise ValueError(
                    f"version {v}: unknown action {sorted(obj)}"
                )
            if "protocol" in obj:
                mrv = obj["protocol"].get("minReaderVersion")
                if mrv is None or mrv > _MAX_READER_VERSION:
                    raise ValueError(
                        f"version {v}: unsupported protocol"
                        f" minReaderVersion={mrv}"
                        f" (this reader implements {_MAX_READER_VERSION})"
                    )
            actions.append(obj)
        out[v] = actions
    return out


def _fold(state: dict, action: dict, where: str) -> None:
    """Apply one action to a snapshot state in place."""
    if "add" in action:
        path = action["add"]["path"]
        if path in state["files"]:
            raise ValueError(f"{where}: double add of {path}")
        state["files"][path] = action["add"]
    elif "remove" in action:
        path = action["remove"]["path"]
        if path not in state["files"]:
            raise ValueError(f"{where}: remove of unknown {path}")
        del state["files"][path]
    elif "protocol" in action:
        state["protocol"] = action["protocol"]
    elif "metaData" in action:
        state["metaData"] = action["metaData"]
    elif "txn" in action:
        t = action["txn"]
        state["txn"][t["appId"]] = t.get("version")
    # commitInfo / cdc carry no snapshot state


def snapshot_state(
    log: dict[int, list[dict]], version: int
) -> dict:
    """Fold the action log through commits 0..version into the full
    snapshot state: {"files": {path: add}, "protocol": ...,
    "metaData": ..., "txn": {appId: version}}.  Double-add, unknown
    remove, and a missing metaData when any commit carried one are
    loud (the invariants real table formats enforce)."""
    if version not in log:
        raise ValueError(f"no such version {version}")
    state: dict = {
        "files": {},
        "protocol": None,
        "metaData": None,
        "txn": {},
    }
    for v in range(version + 1):
        for action in log[v]:
            _fold(state, action, f"v{v}")
    return state


def visible_files(
    log: dict[int, list[dict]], version: int
) -> dict[str, dict]:
    """Fold the action log through commits 0..version: returns
    {path: add-info} for every file visible in that snapshot."""
    return snapshot_state(log, version)["files"]


def snapshot_history(log: dict[int, list[dict]]) -> dict[int, list[str]]:
    """Every snapshot's sorted visible file list, one fold pass."""
    return {v: sorted(visible_files(log, v)) for v in sorted(log)}


# --- checkpoints (parquet-folded state + _last_checkpoint pointer) ----


def parse_last_checkpoint(text: str) -> dict:
    """The `_last_checkpoint` JSON: {"version": V, "size": N}."""
    obj = json.loads(text)
    if "version" not in obj:
        raise ValueError("_last_checkpoint missing version")
    return {"version": int(obj["version"]), "size": obj.get("size")}


def write_checkpoint(log: dict[int, list[dict]], version: int) -> bytes:
    """Fold commits 0..version and write the surviving actions as a
    checkpoint PARQUET file — one row per action, struct columns
    ``add`` / ``metaData`` / ``protocol`` / ``txn`` exactly as real
    Delta checkpoints lay them out — using the engine's own
    from-scratch writer (media.encode_parquet).  Returns the file
    bytes plus enough for a `_last_checkpoint` pointer via
    len()/json."""
    from downloader_spark.media import encode_parquet

    state = snapshot_state(log, version)
    rows: list[dict] = []
    if state["protocol"] is not None:
        rows.append({"protocol": state["protocol"]})
    if state["metaData"] is not None:
        rows.append({"metaData": state["metaData"]})
    for app_id in sorted(state["txn"]):
        rows.append(
            {"txn": {"appId": app_id, "version": state["txn"][app_id]}}
        )
    for path in sorted(state["files"]):
        rows.append({"add": state["files"][path]})
    if not rows:
        raise ValueError(f"nothing to checkpoint at version {version}")
    cols: dict[str, list] = {
        "add": [
            None
            if "add" not in r
            else {
                "path": r["add"]["path"],
                "size": r["add"].get("size"),
            }
            for r in rows
        ],
        "metaData": [
            None
            if "metaData" not in r
            else {
                "id": r["metaData"].get("id"),
                "name": r["metaData"].get("name"),
                "schemaString": r["metaData"].get("schemaString"),
            }
            for r in rows
        ],
        "protocol": [
            None
            if "protocol" not in r
            else {
                "minReaderVersion": r["protocol"]["minReaderVersion"],
                "minWriterVersion": r["protocol"].get(
                    "minWriterVersion"
                ),
            }
            for r in rows
        ],
        "txn": [
            None
            if "txn" not in r
            else {
                "appId": r["txn"]["appId"],
                "version": r["txn"].get("version"),
            }
            for r in rows
        ],
    }
    return encode_parquet(cols, compression="gzip", use_dictionary=True)


def read_checkpoint(data: bytes) -> list[dict]:
    """Read a checkpoint parquet back into its action list with the
    engine's own struct reassembly (media.read_parquet_struct_column).
    Byte-array struct fields come back as bytes — decoded to str here
    so the fold sees the same values the JSON commits carry."""
    from downloader_spark.media import (
        parse_parquet_metadata,
        read_parquet_struct_column,
    )

    meta = parse_parquet_metadata(data)
    present = [
        c
        for c in ("protocol", "metaData", "txn", "add", "remove")
        if c in meta["groups"]
    ]
    if not present:
        raise ValueError("checkpoint parquet has no action columns")

    def _destr(v):
        if isinstance(v, bytes):
            return v.decode("utf-8")
        if isinstance(v, dict):
            return {k: _destr(x) for k, x in v.items()}
        return v

    per_col = {c: read_parquet_struct_column(data, c) for c in present}
    n = len(per_col[present[0]])
    actions: list[dict] = []
    for i in range(n):
        row = {
            c: _destr(per_col[c][i])
            for c in present
            if per_col[c][i] is not None
        }
        if len(row) != 1:
            raise ValueError(
                f"checkpoint row {i} carries {len(row)} actions"
            )
        actions.append(row)
    return actions


def snapshot_state_from_checkpoint(
    checkpoint: bytes,
    checkpoint_version: int,
    tail: dict[int, str],
    version: int,
) -> dict:
    """Resolve a snapshot without replaying full history: fold the
    checkpoint's action rows (state at checkpoint_version), then
    replay only the JSON commits checkpoint_version+1..version.
    ``tail`` holds those commits (missing one raises — a gap in
    history is corruption, same contract as parse_log)."""
    if version < checkpoint_version:
        raise ValueError(
            f"version {version} predates checkpoint {checkpoint_version}"
            " (time travel below a checkpoint needs the full log)"
        )
    state: dict = {
        "files": {},
        "protocol": None,
        "metaData": None,
        "txn": {},
    }
    for action in read_checkpoint(checkpoint):
        _fold(state, action, f"checkpoint@{checkpoint_version}")
    for v in range(checkpoint_version + 1, version + 1):
        if v not in tail:
            raise ValueError(f"missing commit {v} after checkpoint")
        for line in tail[v].splitlines():
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            keys = [k for k in _ACTIONS if k in obj]
            if len(keys) != 1:
                raise ValueError(
                    f"version {v}: unknown action {sorted(obj)}"
                )
            _fold(state, obj, f"v{v}")
    return state
