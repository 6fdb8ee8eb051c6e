"""Differential property test for the round-9 ``stream_ewma`` batch
twin: the Spark higher-order-function fold (array_sort + aggregate
with explicit pmod-floor division) vs the pure-Python reference model
``streaming.stateful.fold_ewma`` on random inputs — including
NEGATIVE values, where floor division and truncating division
diverge (the exact trap the pmod arithmetic exists to avoid: Spark
``DIV`` truncates toward zero, Python ``//`` floors; DuckDB ``//``
also truncates, but the registry oracle only sees the non-negative
cents domain where floor == truncate).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downloader_spark.streaming.stateful import fold_ewma

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user 0..3, minute-offset 0..5, cents −5000..5000): duplicate
# (user, minute) pairs exercise the (ts, event_id) tie-break — the
# unique event_id is the row's list index.
event_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 5),
        st.integers(-5000, 5000),
    ),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(event_strategy)
def test_stream_ewma_matches_python_fold(spark, events):
    import downloader_spark.operators.round9_ext as r9

    base = dt.datetime(2024, 1, 1)
    rows = [
        (uid, base + dt.timedelta(minutes=m), i, cents / 100.0)
        for i, (uid, m, cents) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    orig = r9.load_table
    r9.load_table = lambda s, d, n: df
    try:
        got = {
            r.user_id: (r.n, r.ewma_cents)
            for r in r9.stream_ewma(spark, "ignored").collect()
        }
    finally:
        r9.load_table = orig

    model: dict[int, tuple[int, int]] = {}
    by_user: dict[int, list[tuple]] = {}
    for uid, ts, eid, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, v))
    for uid, evs in by_user.items():
        vals = [v for _, _, v in sorted(evs, key=lambda e: (e[0], e[1]))]
        model[uid] = fold_ewma(vals)
    assert got == model


# --------------------------------------- interval-overlap grid join

# (type 0=error / 1=purchase, second-offset 0..900): offsets straddle
# the 600 s grid-cell boundary, so pairs overlapping in one cell, in
# two cells, and exactly at cell edges all occur — the cases the
# overlap-start-cell exactly-once accounting must get right.
interval_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 900)),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(interval_strategy)
def test_join_interval_overlap_matches_brute_force(spark, events):
    import downloader_spark.operators.round9_ext as r9

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=s),
            0,
            "error" if t == 0 else "purchase",
            0.0,
            "{}",
        )
        for i, (t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    orig = r9.load_table
    r9.load_table = lambda s, d, n: df
    try:
        got = {
            r.error_id: (r.n_purchases, r.overlap_us)
            for r in r9.join_interval_overlap(spark, "ignored").collect()
        }
    finally:
        r9.load_table = orig

    # brute-force O(n*m) half-open overlap model in integer micros
    us = lambda s: s * 1_000_000 + 1_704_067_200_000_000  # 2024-01-01 UTC
    errs = [(i, us(s), us(s) + r9._ERR_LEN_US)
            for i, (t, s) in enumerate(events) if t == 0]
    purs = [(us(s), us(s) + r9._PUR_LEN_US)
            for i, (t, s) in enumerate(events) if t == 1]
    model: dict[int, tuple[int, int]] = {}
    for eid, a_s, a_e in errs:
        hits = [(min(a_e, b_e) - max(a_s, b_s))
                for b_s, b_e in purs if a_s < b_e and b_s < a_e]
        if hits:
            model[eid] = (len(hits), sum(hits))
    assert got == model


# ------------------------------------- mergeable-sketch rollup merge

# (nation 0..5, customer-id 0..200): region = nation % 2, small K-ish
# cardinalities so sketches both smaller and larger than K occur.
sketch_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 200)),
    min_size=1,
    max_size=60,
    unique=True,
)


@settings(**_SETTINGS)
@given(sketch_strategy)
def test_agg_sketch_rollup_merge_is_lossless(spark, custs):
    """The two-level Spark rollup must equal a single-level
    brute-force KMV computed directly per region with the same md5
    hash — the merge property, checked against a pure-Python model
    (hashlib md5, independent of both engines' SQL)."""
    import hashlib

    import downloader_spark.operators.round9_ext as r9
    from downloader_spark.operators.round7_ext import KMV_K

    cust = spark.createDataFrame(
        [(cid, nat) for nat, cid in custs],
        "c_custkey long, c_nationkey int",
    )
    nation = spark.createDataFrame(
        [(n, n % 2) for n in range(6)], "n_nationkey int, n_regionkey int"
    )
    region = spark.createDataFrame(
        [(0, "R0"), (1, "R1")], "r_regionkey int, r_name string"
    )
    tables = {"customer": cust, "nation": nation, "region": region}
    orig = r9.load_table
    r9.load_table = lambda s, d, n: tables[n]
    try:
        got = {
            r.region: (r.n_nations, r.n_exact, r.n_in_sketch, r.kmv_estimate)
            for r in r9.agg_sketch_rollup(spark, "ignored").collect()
        }
    finally:
        r9.load_table = orig

    def h60(cid: int) -> int:
        return int(hashlib.md5(f"kmvr:{cid}".encode()).hexdigest()[:15], 16)

    model = {}
    by_region: dict[int, list[tuple[int, int]]] = {}
    for nat, cid in custs:
        by_region.setdefault(nat % 2, []).append((nat, cid))
    for rk, rows in by_region.items():
        hs = sorted(h60(cid) for _, cid in rows)
        sk = hs[:KMV_K]
        n_exact = len(rows)
        if len(sk) < KMV_K or sk[-1] < KMV_K:
            est = n_exact
        else:
            est = (KMV_K - 1) * 576460752303423488 // sk[-1] * 2
        model[f"R{rk}"] = (
            len({n for n, _ in rows}),
            n_exact,
            len(sk),
            est,
        )
    assert got == model
