"""Skew-handling join helpers: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime by splitting oversized partitions, but it only works for
sort-merge joins and after the fact.  Salting is the explicit,
planner-independent form: replicate the small side R times, scatter
the big side's hot keys across R salt buckets, join on (key, salt).
Every row of the big side moves exactly once, and a key with 10^9
rows lands on R reducers instead of one.

``salted_join`` is semantics-preserving for inner equi-joins (each
big-side row matches exactly the same small-side rows as before —
proven by the differential test in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_by: str | None = None,
) -> DataFrame:
    """Inner equi-join with the big side salted across ``n_salts``
    buckets and the small side replicated once per bucket.

    ``salt_by``: a big-side column used to derive the salt
    deterministically (defaults to a uniform hash of the whole row
    via monotonically varying key column is NOT used — determinism
    matters for retries, so the salt comes from a hash of ``on`` plus
    ``salt_by`` when given, else from ``spark_partition_id()`` which
    is deterministic per task layout)."""
    if salt_by is not None:
        salt = F.pmod(F.hash(F.col(on), F.col(salt_by)), F.lit(n_salts))
    else:
        salt = F.pmod(F.spark_partition_id(), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "__salt"], "inner").drop("__salt")
    return out
