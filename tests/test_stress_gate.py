"""Promote the manual 10x stress scripts into an executable gate
(round-7 verdict item 6): the per-family growth bounds recorded in
PERF.md used to live only as pasted tables — a super-linear regression
would ship silently between rounds.  This gate re-runs every stress
family (the same clone corpora and keys as tests/stress_*.py) and
asserts the wall-clock growth ratio stays well inside the recorded
band.

Skipped by default (wall-clock heavy: ~31 keys at sf0.1 AND a 10x
clone of it each) — run at round close on a QUIET machine:

    RUN_STRESS=1 python -m pytest tests/test_stress_gate.py -q

Bound rationale: every PERF.md-recorded ratio is 1.1x-4.2x for 10x
input (volume-bound shuffles, fixed scheduling overheads).  The gate
asserts ratio <= 12.0 — three times the worst recorded key, far
below the ~100x signature of a pair-space (n^2) blowup, and slack
enough that scheduler noise cannot flake the gate while a structural
regression still trips it.
"""

from __future__ import annotations

import os
import sys
import time

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_STRESS"),
    reason="stress gate is wall-clock heavy; set RUN_STRESS=1 at round close",
)

# Import the stress modules (and mutate sys.path) only when the gate
# is actually enabled: the skipped default path must stay import-free
# so a future import-time cost or error in a stress module can never
# break collection of the whole suite.
if os.environ.get("RUN_STRESS"):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import stress_events_10x as s_events
    import stress_lm_score_10x as s_lm
    import stress_r7_10x as s_r7
    import stress_sf1_shape as s_shape
    import stress_sql_r6_10x as s_sql

    _FAMILIES = [
        (s_events, s_events.KEYS),
        (s_sql, s_sql.KEYS),
        (s_r7, s_r7.EVENT_KEYS + s_r7.DOC_KEYS),
        (s_lm, s_lm.KEYS),
    ]
    _SHAPE_KEYS = list(s_shape.KEYS)
else:
    _FAMILIES = []
    _SHAPE_KEYS = []

MAX_RATIO = 12.0
# below this many seconds at 1x the ratio is dominated by fixed
# per-query overhead (plan compile, stage scheduling), not data — the
# gate then bounds the 10x ABSOLUTE time instead
MIN_BASE_SEC = 0.5
MAX_SMALL_10X_SEC = 20.0

_CASES = [
    (mod, key) for mod, keys in _FAMILIES for key in keys
]


@pytest.fixture(scope="module")
def stress_env(spark):
    """Build every family's 10x clone once and warm every plan at the
    smallest SF so JIT/compile cost never lands inside a timed run."""
    from downloader_spark.plans.registry import registry

    reg = registry()
    for mod, keys in _FAMILIES:
        mod.build_clone(spark)
        for k in keys:
            mod.force(reg[k].fn(spark, "/root/testdata/sf0.001"))
    return reg


@pytest.mark.parametrize(
    "mod,key", _CASES, ids=[k for _, k in _CASES]
)
def test_10x_growth_is_subquadratic(spark, stress_env, mod, key):
    reg = stress_env
    t0 = time.perf_counter()
    mod.force(reg[key].fn(spark, mod.BASE))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    mod.force(reg[key].fn(spark, mod.CLONE_DIR))
    big = time.perf_counter() - t0
    if base < MIN_BASE_SEC:
        assert big <= MAX_SMALL_10X_SEC, (
            f"{key}: 1x too fast to ratio ({base:.2f}s) and 10x "
            f"absolute time {big:.2f}s exceeds {MAX_SMALL_10X_SEC}s"
        )
    else:
        assert big / base <= MAX_RATIO, (
            f"{key}: 10x/1x wall ratio {big / base:.1f} exceeds "
            f"{MAX_RATIO} ({base:.2f}s -> {big:.2f}s) — check for a "
            "pair-space or per-group-sort blowup"
        )


@pytest.fixture(scope="module")
def shape_env(spark):
    """Build the SHAPE-REALISTIC corpora (Heaps-law generated docs +
    10x-keyspace lineitem/orders — see tests/stress_sf1_shape.py for
    why clone corpora understate growth) and warm every plan."""
    from downloader_spark.plans.registry import registry

    reg = registry()
    s_shape.build(spark)
    for k in _SHAPE_KEYS:
        s_shape.force(reg[k].fn(spark, "/root/testdata/sf0.001"))
    return reg


@pytest.mark.parametrize("key", _SHAPE_KEYS)
def test_shape_10x_growth_is_subquadratic(spark, shape_env, key):
    """Wall-only arm of the sf1 shape bench (the standalone script
    additionally records shuffle-write bytes via the UI REST API,
    which the shared test session has disabled)."""
    reg = shape_env
    t0 = time.perf_counter()
    s_shape.force(reg[key].fn(spark, s_shape.BASE_DIR))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    s_shape.force(reg[key].fn(spark, s_shape.BIG_DIR))
    big = time.perf_counter() - t0
    if base < MIN_BASE_SEC:
        assert big <= MAX_SMALL_10X_SEC, (
            f"{key}: 1x too fast to ratio ({base:.2f}s) and 10x "
            f"absolute time {big:.2f}s exceeds {MAX_SMALL_10X_SEC}s"
        )
    else:
        assert big / base <= MAX_RATIO, (
            f"{key}: shape-10x/1x wall ratio {big / base:.1f} exceeds "
            f"{MAX_RATIO} ({base:.2f}s -> {big:.2f}s) — check for a "
            "vocabulary-growth or pair-space blowup"
        )
