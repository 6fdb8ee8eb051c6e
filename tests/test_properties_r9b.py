"""Differential property tests for the round-9b operators: each
Spark plan vs an independent pure-Python model on random inputs.

Division-dialect note (measured, see round9b_ext's module docstring):
Spark ``DIV`` and DuckDB 1.0 ``//`` both TRUNCATE toward zero;
Python ``//`` floors.  The Python models below therefore use
``_tdiv`` (truncating division) wherever the operator's state can go
negative (the Holt trend) — using ``//`` would make the model wrong
on exactly the sign patterns hypothesis is asked to explore.

Rounding note: Spark's ``round()`` on DOUBLE converts the exact
binary value to BigDecimal and rounds HALF_UP; Python's ``round``
banker's-rounds.  The models replicate Spark via
``Decimal(x).quantize(..., ROUND_HALF_UP)``.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _tdiv2(v: int) -> int:
    """Truncate-toward-zero halving (Spark DIV / DuckDB //)."""
    return -((-v) // 2) if v < 0 else v // 2


def _round_spark(x: float, nd: int) -> float:
    """Spark/DuckDB round(): exact binary double -> HALF_UP at nd."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _patched(module, df):
    orig = module.load_table
    module.load_table = lambda s, d, n: df
    return orig


# --- ts_holt_linear --------------------------------------------------

# Negative cents exercise the truncating-division arm of BOTH state
# updates; duplicate (user, minute) pairs exercise the event_id
# tie-break.
holt_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(-5000, 5000)),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(holt_strategy)
def test_ts_holt_linear_matches_python_model(spark, events):
    import downloader_spark.operators.round9b_ext as r9b

    base = dt.datetime(2024, 1, 1)
    rows = [
        (uid, base + dt.timedelta(minutes=m), i, cents / 100.0)
        for i, (uid, m, cents) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.user_id: (r.n, r.level_cents, r.trend_cents, r.forecast_cents)
            for r in r9b.ts_holt_linear(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    by_user: dict[int, list[tuple]] = {}
    for uid, ts, eid, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, v))
    model = {}
    for uid, evs in by_user.items():
        cs = [
            math.floor(v * 100)
            for _, _, v in sorted(evs, key=lambda e: (e[0], e[1]))
        ]
        level, trend = cs[0], 0
        for c in cs[1:]:
            nl = _tdiv2(c + level + trend)
            trend = _tdiv2(nl - level + trend)
            level = nl
        model[uid] = (len(cs), level, trend, level + trend)
    assert got == model


# --- agg_moments -----------------------------------------------------

moments_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 56021)),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(moments_strategy)
def test_agg_moments_matches_python_model(spark, vals):
    import downloader_spark.operators.round9b_ext as r9b

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, t, f"t{t}", cents / 100.0, None)
        for i, (t, cents) in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.event_type: (r.n, r.mean_cents, r.skew_r6, r.kurt_r6)
            for r in r9b.agg_moments(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    groups: dict[str, list[int]] = {}
    for t, cents in vals:
        groups.setdefault(f"t{t}", []).append(math.floor(cents / 100.0 * 100))
    model = {}
    for ty, cs in groups.items():
        n = len(cs)
        s1, s2 = sum(cs), sum(c * c for c in cs)
        s3, s4 = sum(c**3 for c in cs), sum(c**4 for c in cs)
        dn, d1, d2, d3, d4 = (
            float(n),
            float(s1),
            float(s2),
            float(s3),
            float(s4),
        )
        mean = d1 / dn
        m2 = d2 / dn - mean * mean
        m3 = d3 / dn - 3 * mean * (d2 / dn) + 2 * mean * mean * mean
        m4 = (
            d4 / dn
            - 4 * mean * (d3 / dn)
            + 6 * mean * mean * (d2 / dn)
            - 3 * mean * mean * mean * mean
        )
        skew = _round_spark(m3 / (math.sqrt(m2) * m2), 6) if m2 > 0 else None
        kurt = _round_spark(m4 / (m2 * m2) - 3, 6) if m2 > 0 else None
        model[ty] = (n, _round_spark(mean, 2), skew, kurt)
    assert got == model


# --- events_interarrival ---------------------------------------------

gap_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3600)),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(gap_strategy)
def test_events_interarrival_matches_python_model(spark, events):
    import downloader_spark.operators.round9b_ext as r9b

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), uid, "e", 0.0, None)
        for i, (uid, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.user_id: (r.n_gaps, r.min_gap_us, r.max_gap_us, r.median_gap_us)
            for r in r9b.events_interarrival(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (uid, s) in enumerate(events):
        by_user.setdefault(uid, []).append((s * 1_000_000, i))
    model = {}
    for uid, evs in by_user.items():
        us = [u for u, _ in sorted(evs)]
        gs = sorted(us[i + 1] - us[i] for i in range(len(us) - 1))
        if not gs:
            model[uid] = (0, None, None, None)
        else:
            n = len(gs)
            med = gs[(n - 1) // 2] if n % 2 == 1 else (gs[n // 2 - 1] + gs[n // 2]) // 2
            model[uid] = (n, gs[0], gs[-1], med)
    assert got == model


# --- dedup_lines -----------------------------------------------------

# Small token vocabulary + repeated doc bodies make cross-doc line
# collisions (beyond the injected header/footer) actually occur.
lines_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 3), st.integers(1, 25)),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(lines_strategy)
def test_dedup_lines_matches_python_model(spark, docs):
    import downloader_spark.operators.round9b_ext as r9b

    texts = {
        doc_id: " ".join(f"w{(doc_id * 7 + body + i) % 5}" for i in range(nw))
        for doc_id, body, nw in docs
    }
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.doc_id: (r.n_lines, r.n_boiler, r.boiler_frac_r4)
            for r in r9b.dedup_lines(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    header = "copyright notice all rights reserved by the host site operator "
    footer = (
        " subscribe to our newsletter for more updates from this site today"
    )
    seeded = {}
    for d, t in texts.items():
        s = (header + t) if d % 3 == 0 else t
        if d % 5 == 0:
            s = s + footer
        seeded[d] = s
    lines: dict[int, list[str]] = {}
    for d, t in seeded.items():
        ws = [w for w in t.split(" ") if w]
        n_lines = max((len(ws) + 9) // 10, 1)
        lines[d] = [
            " ".join(ws[i * 10 : (i + 1) * 10]) for i in range(n_lines)
        ]
    freq: dict[str, set[int]] = {}
    for d, ls in lines.items():
        for line in ls:
            freq.setdefault(line, set()).add(d)
    model = {}
    for d, ls in lines.items():
        nb = sum(1 for line in ls if len(freq[line]) >= 5)
        model[d] = (
            len(ls),
            nb,
            _round_spark(nb / len(ls), 4),
        )
    assert got == model


# --- graph_kcore_peel ------------------------------------------------

membership_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 8)),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(membership_strategy)
def test_graph_kcore_peel_matches_python_model(spark, memberships):
    import downloader_spark.operators.round9b_ext as r9b

    rows = [(ok, s, 50.0) for ok, s in memberships]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_quantity double"
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.node: (r.degree_initial, r.in_core)
            for r in r9b.graph_kcore_peel(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    by_order: dict[int, set[int]] = {}
    for ok, s in memberships:
        by_order.setdefault(ok, set()).add(s)
    edges: set[tuple[int, int]] = set()
    for members in by_order.values():
        if len(members) > r9b._KCORE_ORDER_CAP:
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                edges.add((a, b))
    deg0: dict[int, int] = {}
    for a, b in edges:
        deg0[a] = deg0.get(a, 0) + 1
        deg0[b] = deg0.get(b, 0) + 1
    nodes = set(deg0)
    for _ in range(r9b._KCORE_ROUNDS):
        deg: dict[int, int] = {}
        for a, b in edges:
            if a in nodes and b in nodes:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        nodes = {n for n, d in deg.items() if d >= r9b._KCORE_K}
    model = {n: (d, n in nodes) for n, d in deg0.items()}
    assert got == model


# --- sample_temperature ----------------------------------------------

temp_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 4)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(temp_strategy)
def test_sample_temperature_matches_python_model(spark, docs):
    import downloader_spark.operators.round9b_ext as r9b

    df = spark.createDataFrame(
        [(d, "x", "en", f"s{src}", 1) for d, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.doc_id: (r.source, r.quota)
            for r in r9b.sample_temperature(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    counts: dict[str, int] = {}
    for _, src in docs:
        counts[f"s{src}"] = counts.get(f"s{src}", 0) + 1
    weights = {
        s: math.floor(math.sqrt(float(c)) * 1000) for s, c in counts.items()
    }
    tw = sum(weights.values())
    quota = {s: (w * r9b._TEMP_BUDGET) // tw for s, w in weights.items()}
    model = {}
    by_src: dict[str, list[int]] = {}
    for d, src in docs:
        by_src.setdefault(f"s{src}", []).append(d)
    for s, ds in by_src.items():
        ranked = sorted(
            ds, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        for d in ranked[: quota[s]]:
            model[d] = (s, quota[s])
    assert got == model


# --- embed_triplet_mining --------------------------------------------

triplet_strategy = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 2)),
    min_size=2,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(triplet_strategy)
def test_embed_triplet_mining_matches_python_model(spark, vecs):
    import downloader_spark.operators.round9b_ext as r9b

    def emb_of(vid: int) -> list[float]:
        return [((vid * 13 + i * 7) % 11 - 5) / 4.0 for i in range(8)]

    df = spark.createDataFrame(
        [(vid, emb_of(vid), lab) for vid, lab in vecs],
        "vec_id long, embedding array<float>, label int",
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.vec_id: (r.hard_pos_id, r.hard_pos_d2, r.hard_neg_id, r.hard_neg_d2)
            for r in r9b.embed_triplet_mining(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    def batch_of(vid: int) -> int:
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16) % 8

    def quant(vid: int) -> list[int]:
        # float32 storage round-trip, then the engine's floor-milli
        import numpy as np

        return [
            math.floor(float(np.float32(v)) * 1000) for v in emb_of(vid)
        ]

    pts = {vid: (batch_of(vid), lab, quant(vid)) for vid, lab in vecs}
    model = {}
    for vid, (b, lab, q) in pts.items():
        pos = []
        neg = []
        for o, (ob, olab, oq) in pts.items():
            if o == vid or ob != b:
                continue
            d2 = sum((a - c) * (a - c) for a, c in zip(q, oq))
            (pos if olab == lab else neg).append((d2, o))
        if not pos and not neg:
            # no batch peer at all -> no pair rows -> anchor absent
            continue
        hp = max(pos, key=lambda t: (t[0], -t[1])) if pos else None
        hn = min(neg) if neg else None
        model[vid] = (
            hp[1] if hp else None,
            hp[0] if hp else None,
            hn[1] if hn else None,
            hn[0] if hn else None,
        )
    assert got == model


# --- agg_rate_ci -----------------------------------------------------

rate_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 200)),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(rate_strategy)
def test_agg_rate_ci_matches_python_model(spark, vals):
    import downloader_spark.operators.round9b_ext as r9b

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, i, f"t{t}", float(v), None) for i, (t, v) in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r9b, df)
    try:
        got = {
            r.event_type: (r.n, r.s, r.center_r6, r.lo_r6, r.hi_r6)
            for r in r9b.agg_rate_ci(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig

    groups: dict[str, list[int]] = {}
    for t, v in vals:
        groups.setdefault(f"t{t}", []).append(1 if float(v) >= 100.0 else 0)
    model = {}
    for ty, flags in groups.items():
        n, s = len(flags), sum(flags)
        dn, ds = float(n), float(s)
        center = (ds + 2.0) / (dn + 4.0)
        half = (2.0 * math.sqrt(dn) / (dn + 4.0)) * math.sqrt(
            ds / dn * (1.0 - ds / dn) + 1.0 / dn
        )
        model[ty] = (
            n,
            s,
            _round_spark(center, 6),
            _round_spark(center - half, 6),
            _round_spark(center + half, 6),
        )
    assert got == model
