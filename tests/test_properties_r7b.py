"""Second differential property file for round-7 operators: KMV
sketch, vocab drift, MAD anomalies, forecast backtest, audience
overlap, degree profile, and top-k heavy hitters vs pure-Python
models (hashlib for the md5-derived draws, dict/sorted-list math for
everything else).
"""

from __future__ import annotations

import datetime
import hashlib
import math

from downloader_spark.operators.round7_ext import (
    DOW_SHIFT,
    FC_TEST_DAYS,
    KMV_K,
    agg_kmv_distinct,
    events_user_overlap,
    graph_degree,
    ts_anomaly_mad,
    ts_forecast_baseline,
    text_vocab_drift,
)

_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _patched(module, df):
    orig = module.load_table
    module.load_table = lambda s, d, n: df
    return orig


def _event_rows(specs):
    """specs: list of (user_id, event_type, value, ts_seconds[, props])."""
    out = []
    for i, spec in enumerate(specs):
        u, t, v, ts_s = spec[:4]
        props = spec[4] if len(spec) > 4 else None
        out.append(
            (
                i,
                datetime.datetime(1970, 1, 1)
                + datetime.timedelta(seconds=ts_s),
                u,
                t,
                v,
                props,
            )
        )
    return out


def h60(s: str) -> int:
    """The engines' shared 60-bit md5-derived hash, in Python."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --- agg_kmv_distinct --------------------------------------------------


def test_agg_kmv_estimator_matches_hashlib_model(spark):
    """40 distinct users: the sketch keeps the KMV_K smallest
    h60('kmv:<uid>') values and the estimate is
    (k-1)*2^59 DIV h_k * 2 — reproduced exactly with hashlib."""
    import downloader_spark.operators.round7_ext as r7

    users = list(range(40))
    specs = [(u, "view", 1.0, i) for i, u in enumerate(users)]
    # duplicate activity must not change the sketch (distinct first)
    specs += [(u, "view", 1.0, 1000 + i) for i, u in enumerate(users[:10])]
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        r = agg_kmv_distinct(spark, "x").collect()[0]
    finally:
        r7.load_table = orig
    hashes = sorted(h60(f"kmv:{u}") for u in users)
    h_k = hashes[KMV_K - 1]
    expect = (KMV_K - 1) * 576460752303423488 // h_k * 2
    assert (r.n_exact, r.n_in_sketch) == (40, KMV_K)
    assert r.kmv_estimate == expect


def test_agg_kmv_small_group_is_exact(spark):
    import downloader_spark.operators.round7_ext as r7

    specs = [(u, "tiny", 1.0, u) for u in range(KMV_K - 3)]
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        r = agg_kmv_distinct(spark, "x").collect()[0]
    finally:
        r7.load_table = orig
    assert r.n_in_sketch == KMV_K - 3
    assert r.kmv_estimate == r.n_exact == KMV_K - 3


# --- events_user_overlap ------------------------------------------------


def test_events_user_overlap_known_jaccard(spark):
    """A={1,2,3}, B={2,3,4,5}: inter=2, union=5, jaccard=400000."""
    import downloader_spark.operators.round7_ext as r7

    specs = [(u, "a", 1.0, u) for u in (1, 2, 3)]
    specs += [(u, "b", 1.0, 10 + u) for u in (2, 3, 4, 5)]
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        r = events_user_overlap(spark, "x").collect()[0]
    finally:
        r7.load_table = orig
    assert (r.type_a, r.type_b) == ("a", "b")
    assert (r.n_inter, r.n_union, r.jaccard_ppm) == (2, 5, 400_000)


# --- graph_degree -------------------------------------------------------


def test_graph_degree_histogram_both_sides(spark):
    """user 1 -> items {10, 20}; user 2 -> item {10}: user degrees
    {2:1, 1:1}; item degrees {10: 2, 20: 1} -> hist {2:1, 1:1}."""
    import downloader_spark.operators.round7_ext as r7

    specs = [
        (1, "view", 1.0, 0, '{"k": 10}'),
        (1, "view", 1.0, 1, '{"k": 20}'),
        (1, "view", 1.0, 2, '{"k": 10}'),  # duplicate edge
        (2, "view", 1.0, 3, '{"k": 10}'),
    ]
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {
            (r.side, r.degree): r.n_nodes
            for r in graph_degree(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got == {
        ("user", 2): 1,
        ("user", 1): 1,
        ("item", 2): 1,
        ("item", 1): 1,
    }


# --- ts_anomaly_mad -----------------------------------------------------


def test_ts_anomaly_mad_flags_planted_spike_only(spark):
    """Daily totals 100 cents for 14 days + one 1000-cent day: MAD is
    0-free (values vary by ±1), spike flagged, normal days not."""
    import downloader_spark.operators.round7_ext as r7

    vals = [1.00 + (0.01 * (i % 3)) for i in range(14)]  # 100..102 cents
    specs = [(0, "t", v, i * 86400) for i, v in enumerate(vals)]
    specs.append((0, "t", 10.0, 14 * 86400))  # 1000-cent spike day
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = [(r.day, r.v_cents) for r in ts_anomaly_mad(spark, "x").collect()]
    finally:
        r7.load_table = orig
    assert got == [(14, 1000)]


# --- ts_forecast_baseline ----------------------------------------------


def test_ts_forecast_baseline_perfect_weekly_pattern_scores_zero(spark):
    """A strict weekly pattern (value = f(dow)) over 4 weeks: the
    seasonal-naive prediction is exact on the held-out week."""
    import downloader_spark.operators.round7_ext as r7

    specs = []
    for day in range(28):
        dow = (day + DOW_SHIFT) % 7
        specs.append((0, "t", float(10 + dow), day * 86400 + 100))
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        r = ts_forecast_baseline(spark, "x").collect()[0]
    finally:
        r7.load_table = orig
    assert r.n_test_days == FC_TEST_DAYS
    assert r.mae_cents == 0 and r.mape_ppm == 0


def test_ts_forecast_baseline_known_error(spark):
    """Train weeks at 100 cents/day, test week at 150: MAE=50,
    MAPE=50/150."""
    import downloader_spark.operators.round7_ext as r7

    specs = [(0, "t", 1.0, d * 86400) for d in range(21)]       # train
    specs += [(0, "t", 1.5, d * 86400) for d in range(21, 28)]  # test
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        r = ts_forecast_baseline(spark, "x").collect()[0]
    finally:
        r7.load_table = orig
    assert r.mae_cents == 50
    assert r.mape_ppm == 50 * 7 * 1_000_000 // (150 * 7)


# --- text_vocab_drift ----------------------------------------------------


def test_text_vocab_drift_stable_token_zero_shifted_token_max(spark):
    """'stable' appears in every doc of both halves (drift 0);
    'onlyeven' appears only in even doc_ids (drift 1e6)."""
    import downloader_spark.operators.round7_ext as r7

    rows = []
    for d in range(10):
        tok = "onlyeven" if d % 2 == 0 else "fillertok"
        rows.append((d, f"stable {tok}", "en", "s", 10))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r7, df)
    try:
        got = {r.tok: r.drift_ppm for r in text_vocab_drift(spark, "x").collect()}
    finally:
        r7.load_table = orig
    assert got["stable"] == 0
    assert got["onlyeven"] == 1_000_000
    assert got["fillertok"] == 1_000_000
