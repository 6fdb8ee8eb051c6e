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
