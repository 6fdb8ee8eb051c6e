"""Deterministic float aggregation, identical across Spark and DuckDB.

Summing doubles is order-dependent; Spark's partial aggregation order
differs run-to-run and engine-to-engine, so ``SUM(double)`` can never
be hash-compared against another engine.  The fix: cast the money
column to DECIMAL first (exact, associative), aggregate in decimal,
and only then convert to DOUBLE and round.  Both engines then perform
the *same* exact arithmetic and emit the *same* double.

This also matters at 100 TB: decimal partial aggregation is still
map-side combinable and whole-stage-codegen'd; it costs a few percent
over double sums and buys reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dec(col: Column | str, scale: int = 4, precision: int = 18) -> Column:
    """Cast a float column to an exact decimal for associative aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(precision, scale))


def money_sum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact SUM of a 2-4dp float column, emitted as rounded DOUBLE."""
    return F.round(F.sum(dec(col, scale)).cast("double"), 2).alias(alias)


def money_avg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact-sum / count average, emitted as rounded DOUBLE.

    Division happens in double on both engines, on identical inputs,
    so the result is bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(dec(c, scale)).cast("double") / F.count(c), 2).alias(alias)


def sql_dec(expr: str, scale: int = 4, precision: int = 18) -> str:
    return f"CAST({expr} AS DECIMAL({precision},{scale}))"


def sql_money_sum(expr: str, alias: str, scale: int = 4) -> str:
    return f"round(CAST(SUM({sql_dec(expr, scale)}) AS DOUBLE), 2) AS {alias}"


def sql_money_avg(expr: str, alias: str, scale: int = 4) -> str:
    return (
        f"round(CAST(SUM({sql_dec(expr, scale)}) AS DOUBLE) / COUNT({expr}), 2) AS {alias}"
    )
