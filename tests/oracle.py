"""DuckDB differential-oracle harness, mirroring the driver's check:
row count + sorted-column schema + order-insensitive value comparison.

We compare canonicalized values exactly (no tolerance): the engine's
queries are written so identical values are *guaranteed* (decimal-exact
float aggregation, tie-broken windows, UTC timestamps), so any diff is
a real defect.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from downloader_spark.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def normalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    rows = [tuple(canon(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort()
    return cols, rows


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str):
    got_cols, got_rows = normalize(spark_df.toPandas())
    exp_cols, exp_rows = normalize(con.execute(sql).df())
    assert got_cols == exp_cols, f"{name}: schema mismatch {got_cols} != {exp_cols}"
    assert len(got_rows) == len(exp_rows), (
        f"{name}: row count {len(got_rows)} != {len(exp_rows)}"
    )
    if got_rows != exp_rows:
        diffs = [
            (g, e) for g, e in zip(got_rows, exp_rows) if g != e
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
