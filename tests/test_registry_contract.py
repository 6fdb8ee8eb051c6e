"""Registry-level contract checks, independent of query values.

The driver's correctness harness canonicalizes results with a pandas
sort + hash; complex-typed cells (arrays/maps/structs) crash it
(CORRECTNESS_r01: ``TypeError: unhashable type: 'list'`` on
``scalar_array``).  Guard every registered query's output schema so a
new operator can't reintroduce the failure mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from downloader_spark.plans.registry import registry
from tests.conftest import SF_DIR

_SPECS = registry()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_output_schema_is_driver_hashable(spark, name):
    df = _SPECS[name].fn(spark, SF_DIR)
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"{name}.{f.name}: complex type {f.dataType} breaks the driver canonicalizer"


def test_every_key_has_unique_callable():
    assert len(_SPECS) == len({id(s.fn) for s in _SPECS.values()})


def test_every_key_documented_and_tagged():
    for name, spec in _SPECS.items():
        assert spec.doc, f"{name}: missing docstring"
        assert spec.tags, f"{name}: missing tags"
        assert spec.oracle is not None, f"{name}: missing oracle (rows-only keys read as errors in CORRECTNESS)"


def test_oracle_sql_references_only_registered_views():
    import re

    allowed = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, spec in _SPECS.items():
        tables = set(
            re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", spec.oracle, re.I)
        )
        # CTE names and function-style sources are fine; real table refs
        # must be registered driver views
        ctes = set(re.findall(r"([a-z_][a-z0-9_]*)\s+AS\s*\(", spec.oracle, re.I))
        funcs = {t for t in tables if f"{t}(" in spec.oracle.replace(" ", "")}
        unknown = tables - allowed - ctes - funcs - {"read_blob"}
        # alias references like "FROM pairs p" resolve to CTEs already
        assert not {u for u in unknown if u not in spec.oracle.lower()}, (
            f"{name}: oracle references unregistered tables {unknown}"
        )
