"""Differential property tests for the round-7 ordered-series
operators vs pure-Python models on random inputs (hypothesis) —
the third-implementation check beside Spark==DuckDB oracle parity:
skyline dominance, sweep-line concurrency, and winnowing selection.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downloader_spark.operators.analytics_series import (
    CONC_GAP_S,
    daily_peak_concurrency,
    pareto_skyline,
)
from downloader_spark.operators.retrieval_rank import (
    WINNOW_W,
    _W_MOD,
    winnow_fingerprints,
)

# ------------------------------------------------------------- skyline

points_strategy = st.lists(
    st.tuples(st.integers(0, 30000), st.integers(1, 50)),
    min_size=1,
    max_size=20,
)


def model_skyline(points: list[tuple[int, int]]) -> set[int]:
    """Brute-force O(n²) dominance: keep index i iff no j dominates."""
    keep = set()
    for i, (ci, si) in enumerate(points):
        dominated = any(
            (cj <= ci and sj >= si and (cj < ci or sj > si))
            for j, (cj, sj) in enumerate(points)
            if j != i
        )
        if not dominated:
            keep.add(i)
    return keep


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(points_strategy)
def test_skyline_matches_bruteforce_dominance(spark, points):
    rows = [(i, f"p{i}", c, s) for i, (c, s) in enumerate(points)]
    df = spark.createDataFrame(
        rows, "p_partkey BIGINT, p_name STRING, cents BIGINT, p_size INT"
    )
    got = {r.p_partkey for r in pareto_skyline(df).collect()}
    assert got == model_skyline(points)


# --------------------------------------------------------- concurrency

_BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)
DAY_US = 86_400_000_000

events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3 * 86_400)),
    min_size=1,
    max_size=30,
)


def model_concurrency(rows: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-Python sessionize + clip + sweep."""
    by_user: dict[int, list[int]] = {}
    for u, off in rows:
        by_user.setdefault(u, []).append(off * 1_000_000 + int(_BASE.timestamp()) * 1_000_000)
    sessions = []
    for u, times in by_user.items():
        times.sort()
        start = prev = times[0]
        for t in times[1:]:
            if t - prev > CONC_GAP_S * 1_000_000:
                sessions.append((start, prev + CONC_GAP_S * 1_000_000))
                start = t
            prev = t
        sessions.append((start, prev + CONC_GAP_S * 1_000_000))
    deltas: dict[int, list[tuple[int, int]]] = {}
    for s, e in sessions:
        for day in range(s // DAY_US, (e - 1) // DAY_US + 1):
            deltas.setdefault(day, []).append((max(s, day * DAY_US), 1))
            deltas.setdefault(day, []).append((min(e, (day + 1) * DAY_US), -1))
    peaks = {}
    for day, ds in deltas.items():
        ds.sort()
        run = best = 0
        for _, d in ds:
            run += d
            best = max(best, run)
        peaks[day] = best
    return peaks


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_concurrency_matches_python_sweep(spark, rows):
    data = [
        (i, _BASE + timedelta(seconds=off), u)
        for i, (u, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
    got = {r.day: r.peak_concurrency for r in daily_peak_concurrency(df).collect()}
    assert got == model_concurrency(rows)


# ------------------------------------------------------------- winnow

VOCAB = ["aa", "bb", "cc", "dd"]
texts_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=3, max_size=20),
    min_size=1,
    max_size=5,
)


def _h20(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _W_MOD


def model_winnow(toks: list[str]) -> tuple[int, set[int]]:
    grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    keys = [
        _h20(g) * _W_MOD + (_W_MOD - 1 - pos) for pos, g in enumerate(grams)
    ]
    n = len(grams)
    sel = {
        min(keys[i : i + WINNOW_W])
        for i in range(0, n - WINNOW_W + 1)
    }
    return n, sel


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts_strategy)
def test_winnow_matches_python_model(spark, token_lists):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: (r.n_grams, r.n_fp, r.fp_checksum)
        for r in winnow_fingerprints(df).collect()
    }
    for i, toks in enumerate(token_lists):
        n, sel = model_winnow(toks)
        if n < WINNOW_W:
            assert i not in got  # no full window fits
            continue
        checksum = sum(k // _W_MOD for k in sel)
        assert got[i] == (n, len(sel), checksum)


def test_winnow_local_property_every_window_has_fingerprint(spark):
    """The winnowing guarantee: every WINNOW_W-gram stretch contains a
    selected fingerprint position (Schleimer et al. §4)."""
    toks = [VOCAB[(i * 7) % len(VOCAB)] for i in range(40)]
    n, sel = model_winnow(toks)
    sel_pos = {_W_MOD - 1 - (k % _W_MOD) for k in sel}
    for i in range(0, n - WINNOW_W + 1):
        assert any(i <= p < i + WINNOW_W for p in sel_pos)
