"""Table-format snapshot log: fold mechanics + time travel.

The time-travel check is the one VERDICT asked for: reading version N
vs N-1 through the snapshot fold must classify row churn exactly as
the table_diff key's full-outer-join does (added / removed /
changed)."""

import pytest

from downloader_spark.operators.round15_ext import (
    _TBL_LOG_FILES,
    _TBL_PARTS,
    _tbl_part_bytes,
    _tbl_value,
)
from downloader_spark.tablelog import (
    parse_log,
    snapshot_history,
    visible_files,
)


def test_parse_log_and_fold():
    log = parse_log(_TBL_LOG_FILES)
    hist = snapshot_history(log)
    assert hist == {
        0: ["part-0.parquet", "part-1.parquet"],
        1: ["part-0.parquet", "part-1.parquet", "part-2.parquet"],
        2: ["part-0.parquet", "part-2.parquet", "part-3.parquet"],
        3: [
            "part-0.parquet", "part-2.parquet", "part-3.parquet",
            "part-4.parquet",
        ],
    }
    # add-info survives the fold
    assert visible_files(log, 0)["part-0.parquet"]["size"] == 50


def test_log_corruption_raises():
    with pytest.raises(ValueError):
        parse_log({})
    with pytest.raises(ValueError):
        parse_log({0: '{"add": {"path": "a"}}', 2: ""})  # gap
    with pytest.raises(ValueError):
        parse_log({0: '{"strange": 1}'})
    log = parse_log(
        {
            0: '{"add": {"path": "a"}}',
            1: '{"remove": {"path": "b"}}',  # remove of unknown
        }
    )
    with pytest.raises(ValueError):
        visible_files(log, 1)
    log2 = parse_log(
        {0: '{"add": {"path": "a"}}', 1: '{"add": {"path": "a"}}'}
    )
    with pytest.raises(ValueError):
        visible_files(log2, 1)
    assert visible_files(log2, 0) == {"a": {"path": "a"}}
    with pytest.raises(ValueError):
        visible_files(log2, 7)


def _snapshot_rows(version: int) -> dict[int, int]:
    """Read a snapshot through the fold + the engine's own parquet
    writer/reader, as {k: val} — the time-travel read path."""
    from downloader_spark.media import read_parquet_columns

    log = parse_log(_TBL_LOG_FILES)
    rows: dict[int, int] = {}
    for path in visible_files(log, version):
        cols = read_parquet_columns(_tbl_part_bytes(path), ["k", "val"])
        for k, v in zip(cols["k"], cols["val"]):
            assert k not in rows, f"key {k} in two live files at v{version}"
            rows[k] = v
    return rows


def _classify(old: dict[int, int], new: dict[int, int]) -> dict[str, set]:
    """The table_diff key's full-outer-join classification, reduced
    to dict form (pipeline_ext.py::table_diff semantics)."""
    return {
        "added": set(new) - set(old),
        "removed": set(old) - set(new),
        "changed": {
            k for k in set(old) & set(new) if old[k] != new[k]
        },
    }


def test_time_travel_matches_table_diff_classification():
    snaps = {v: _snapshot_rows(v) for v in range(4)}
    # v0 -> v1: pure append of part-2 (ids 100..149)
    assert _classify(snaps[0], snaps[1]) == {
        "added": set(range(100, 150)), "removed": set(), "changed": set()
    }
    # v1 -> v2: UPDATE — part-1 replaced by part-3, same keys, +1000
    assert _classify(snaps[1], snaps[2]) == {
        "added": set(), "removed": set(), "changed": set(range(50, 100))
    }
    # v2 -> v3: pure append of part-4
    assert _classify(snaps[2], snaps[3]) == {
        "added": set(range(150, 200)), "removed": set(), "changed": set()
    }
    # values themselves match the planted formula at every version
    assert snaps[1][60] == _tbl_value(60, 0)
    assert snaps[2][60] == _tbl_value(60, 1000)
    # sum over keys is version-invariant for overlapping ranges
    assert sum(snaps[2]) == sum(snaps[1])


def test_part_bytes_deterministic_and_self_readable():
    from downloader_spark.media import read_parquet_columns

    for path, (lo, hi, off, _kw) in _TBL_PARTS.items():
        data = _tbl_part_bytes(path)
        assert data == _tbl_part_bytes(path)  # regenerable per task
        cols = read_parquet_columns(data, ["k", "val"])
        assert cols["k"] == list(range(lo, hi))
        assert cols["val"] == [_tbl_value(i, off) for i in range(lo, hi)]


# --- round 16: full Delta commit vocabulary + parquet checkpoint ----


def test_r15_fixture_green_under_full_vocabulary_parser():
    """The VERDICT's explicit compat gate: extending parse_log to the
    real protocol vocabulary must keep the round-15 fixture (plain
    add/remove/commitInfo commits) byte-identical in behavior."""
    log = parse_log(_TBL_LOG_FILES)
    assert snapshot_history(log)[3] == [
        "part-0.parquet", "part-2.parquet", "part-3.parquet",
        "part-4.parquet",
    ]


def test_full_vocabulary_and_protocol_gate():
    from downloader_spark.tablelog import snapshot_state

    from downloader_spark.operators.round16_ext import _CP_LOG_FILES

    log = parse_log(_CP_LOG_FILES)
    st = snapshot_state(log, 6)
    assert sorted(st["files"]) == [
        "p2.parquet", "p4.parquet", "p5.parquet", "p6.parquet",
        "p7.parquet",
    ]
    assert st["protocol"] == {
        "minReaderVersion": 1, "minWriterVersion": 2,
    }
    assert st["metaData"]["id"] == "tbl-cp-16"
    assert st["txn"] == {"loader": 4}
    # the reader honors the protocol gate instead of guessing
    with pytest.raises(ValueError, match="minReaderVersion"):
        parse_log({0: '{"protocol": {"minReaderVersion": 3}}'})
    with pytest.raises(ValueError, match="minReaderVersion"):
        parse_log({0: '{"protocol": {"minWriterVersion": 2}}'})
    # unknown actions and multi-action lines stay loud
    with pytest.raises(ValueError, match="unknown action"):
        parse_log({0: '{"domainMetadata": {"domain": "x"}}'})
    with pytest.raises(ValueError, match="unknown action"):
        parse_log({0: '{"add": {"path": "a"}, "remove": {"path": "b"}}'})


def test_checkpoint_roundtrip_matches_full_replay():
    """write_checkpoint -> read_checkpoint -> tail replay must land on
    the exact state of a full log replay at every post-checkpoint
    version — protocol, metaData, txn and files all survive the
    parquet struct-column roundtrip."""
    from downloader_spark.tablelog import (
        read_checkpoint,
        snapshot_state,
        snapshot_state_from_checkpoint,
        write_checkpoint,
    )

    from downloader_spark.operators.round16_ext import _CP_LOG_FILES

    log = parse_log(_CP_LOG_FILES)
    for cp_version in (2, 4):
        cp = write_checkpoint(log, cp_version)
        tail = {v: _CP_LOG_FILES[v] for v in log if v > cp_version}
        for v in range(cp_version, 7):
            got = snapshot_state_from_checkpoint(cp, cp_version, tail, v)
            assert got == snapshot_state(log, v), (cp_version, v)
        # every checkpoint row carries exactly one action
        acts = read_checkpoint(cp)
        assert all(len(a) == 1 for a in acts)
        kinds = [next(iter(a)) for a in acts]
        assert kinds.count("protocol") == 1
        assert kinds.count("metaData") == 1
    # time travel below the checkpoint needs the full log — loud
    cp = write_checkpoint(log, 4)
    with pytest.raises(ValueError, match="predates"):
        snapshot_state_from_checkpoint(cp, 4, {}, 2)
    # a missing tail commit is corruption, not silence
    with pytest.raises(ValueError, match="missing commit"):
        snapshot_state_from_checkpoint(cp, 4, {6: _CP_LOG_FILES[6]}, 6)


def test_checkpoint_parquet_is_externally_readable():
    """The checkpoint is REAL parquet: pyarrow must see the same
    struct rows our reader folds (guards against a self-twinned
    writer/reader bug pair)."""
    import io

    import pyarrow.parquet as pq

    from downloader_spark.tablelog import write_checkpoint

    from downloader_spark.operators.round16_ext import _CP_LOG_FILES

    log = parse_log(_CP_LOG_FILES)
    cp = write_checkpoint(log, 4)
    t = pq.read_table(io.BytesIO(cp))
    adds = [r for r in t.column("add").to_pylist() if r is not None]
    assert sorted(a["path"] for a in adds) == [
        "p2.parquet", "p3.parquet", "p4.parquet", "p5.parquet",
    ]
    protos = [r for r in t.column("protocol").to_pylist() if r is not None]
    assert protos == [{"minReaderVersion": 1, "minWriterVersion": 2}]
    txns = [r for r in t.column("txn").to_pylist() if r is not None]
    assert txns == [{"appId": "loader", "version": 4}]
