from __future__ import annotations

import importlib.util
import sys


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.count()
    assert rows > 0
    # one row per user (latest per key), and keys are unique
    assert df.select("user_id").distinct().count() == rows


def test_contract_shape(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_flagship_via_ingest_builds_and_queries_derived_state(spark, tmp_path):
    from downloader_spark.plans.flagship import flagship_via_ingest
    from tests.conftest import SF_DIR

    out = flagship_via_ingest(spark, SF_DIR, str(tmp_path / "state"), n_objects=20)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.dataset == "flagship-events"
    assert r.current_name.startswith("Events/2024/01/ev-")
    # content dedup happened inside ingest: distinct <= objects
    assert 1 <= r.n_distinct <= r.n_objects <= 20
