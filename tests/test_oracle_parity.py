"""Differential test: every exact-checked query key vs its DuckDB oracle,
at the driver's correctness scale (sf0.01) — the same comparison the
driver runs for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from downloader_spark.plans.registry import registry
from tests.conftest import SF_DIR_MID
from tests.oracle import assert_matches_oracle, duck_connection
from tests.par import chunk_ids, chunks, run_chunk

_SPECS = registry()
_EXACT = sorted(name for name, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY = sorted(name for name, s in _SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR_MID)
    yield con
    con.close()


@pytest.mark.parametrize("keys", chunks(_EXACT), ids=chunk_ids(_EXACT))
def test_exact_query_matches_duckdb(spark, duck, keys):
    def check(name: str) -> None:
        spec = _SPECS[name]
        df = spec.fn(spark, SF_DIR_MID)
        # one cursor per key: DuckDB cursors are independent
        # connections over the same catalog, safe across threads
        cur = duck.cursor()
        try:
            assert_matches_oracle(df, cur, spec.oracle, name)
        finally:
            cur.close()

    run_chunk(keys, check)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = _SPECS[name]
    df = spec.fn(spark, SF_DIR_MID)
    n = df.count()
    assert n >= 0
    assert df.schema is not None
