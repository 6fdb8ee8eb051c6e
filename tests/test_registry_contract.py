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
