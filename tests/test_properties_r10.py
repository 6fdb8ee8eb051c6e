"""Differential property tests for the round-10 operators: each
Spark plan vs an independent pure-Python model on random inputs
(hypothesis), per the repo's three-layer correctness strategy
(oracle parity at sf0.01, pure-Python models on random inputs, plan
gates).  Division note: Spark ``DIV`` truncates toward zero; most
round-10 keys divide only non-negative quantities, where Python
``//`` agrees — the exception is ``ts_paa``, whose ``mean_cents``
divides a possibly-negative day-sum and therefore relies on
DIV-vs-``//`` truncate-toward-zero parity (the model below
special-cases truncation toward zero accordingly).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _patched(module, df):
    orig = module.load_table
    module.load_table = lambda s, d, n: df
    return orig


def _patched_tables(module, dfs):
    orig = module.load_table
    module.load_table = lambda s, d, n: dfs[n]
    return orig


# --- events_type_diversity -------------------------------------------

div_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 4)),  # (user, type)
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(div_strategy)
def test_events_type_diversity_matches_python_model(spark, pairs):
    import downloader_spark.operators.round10_ext as r10

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, uid, f"t{t}", 1.0, None) for i, (uid, t) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.user_id: (r.n_types, r.n_events, r.gini_ppm)
            for r in r10.events_type_diversity(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    counts: dict[int, dict[int, int]] = {}
    for uid, t in pairs:
        counts.setdefault(uid, {}).setdefault(t, 0)
        counts[uid][t] += 1
    model = {}
    for uid, per in counts.items():
        n = sum(per.values())
        s2 = sum(c * c for c in per.values())
        model[uid] = (len(per), n, (n * n - s2) * 1_000_000 // (n * n))
    assert got == model


# --- ts_paa ------------------------------------------------------------

paa_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # type
        st.integers(0, 30),  # day offset
        st.integers(-9999, 9999),  # cents
    ),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(paa_strategy)
def test_ts_paa_matches_python_model(spark, events):
    import downloader_spark.operators.round10_ext as r10

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=d), 0, f"t{t}", cents / 100.0, None)
        for i, (t, d, cents) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r10, df)
    try:
        got = {
            (r.event_type, r.segment): (r.n_days, r.sum_cents, r.mean_cents)
            for r in r10.ts_paa(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    S = r10._PAA_SEGMENTS
    daily: dict[tuple, int] = {}
    for t, d, cents in events:
        key = (f"t{t}", d)
        daily[key] = daily.get(key, 0) + math.floor(cents / 100.0 * 100)
    series: dict[str, list[int]] = {}
    for (t, d), v in sorted(daily.items()):
        series.setdefault(t, []).append(v)
    model: dict[tuple, tuple] = {}
    for t, vs in series.items():
        L = len(vs)
        segs: dict[int, list[int]] = {}
        for idx, v in enumerate(vs):
            segs.setdefault(idx * S // L, []).append(v)
        for s, seg in segs.items():
            total = sum(seg)
            # Spark DIV truncates; seg day-count > 0, sum may be < 0
            mean = abs(total) // len(seg)
            if total < 0:
                mean = -mean
            model[(t, s)] = (len(seg), total, mean)
    assert got == model


# --- agg_quantile_sketch_rollup ----------------------------------------

qsk_strategy = st.lists(
    st.tuples(
        st.integers(0, 9),  # nationkey
        st.integers(-99999, 999999),  # cents
    ),
    min_size=1,
    max_size=80,
)


@settings(**_SETTINGS)
@given(qsk_strategy)
def test_agg_quantile_sketch_rollup_matches_python_model(spark, custs):
    import downloader_spark.operators.round10_ext as r10

    nations = [(n, f"N{n}", n % 3, "") for n in range(10)]
    regions = [(r, f"R{r}", "") for r in range(3)]
    cust_rows = [
        (i, f"C{i}", n, cents / 100.0) for i, (n, cents) in enumerate(custs)
    ]
    dfs = {
        "customer": spark.createDataFrame(
            cust_rows,
            "c_custkey long, c_name string, c_nationkey long,"
            " c_acctbal double",
        ),
        "nation": spark.createDataFrame(
            nations,
            "n_nationkey long, n_name string, n_regionkey long,"
            " n_comment string",
        ),
        "region": spark.createDataFrame(
            regions, "r_regionkey long, r_name string, r_comment string"
        ),
    }
    orig = _patched_tables(r10, dfs)
    try:
        got = {
            r.region: (r.n, r.p50_lo_cents, r.p95_lo_cents)
            for r in r10.agg_quantile_sketch_rollup(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    W = r10._QSK_W

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    per_region: dict[int, list[int]] = {}
    for n, cents in custs:
        per_region.setdefault(n % 3, []).append(
            math.floor(cents / 100.0 * 100)
        )
    model = {}
    for rk, vals in per_region.items():
        buckets: dict[int, int] = {}
        for c in vals:
            b = tdiv(c, W)
            buckets[b] = buckets.get(b, 0) + 1
        n = len(vals)
        out = []
        for p in (50, 95):
            rank = (n * p + 99) // 100
            cum = 0
            pick = None
            for b in sorted(buckets):
                cum += buckets[b]
                if cum >= rank:
                    pick = b
                    break
            out.append(pick * W)
        model[f"R{rk}"] = (n, out[0], out[1])
    assert got == model


# --- embed_dim_profile ---------------------------------------------------

dim_strategy = st.lists(
    st.lists(
        st.floats(-4.0, 4.0, allow_nan=False, width=32),
        min_size=3,
        max_size=3,
    ),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(dim_strategy)
def test_embed_dim_profile_matches_python_model(spark, vecs):
    import downloader_spark.operators.round10_ext as r10

    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.dim: (r.n, r.s1_milli, r.s2_milli, r.min_milli, r.max_milli)
            for r in r10.embed_dim_profile(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    import numpy as np

    model = {}
    for d in range(3):
        qs = [
            math.floor(float(np.float32(v[d])) * 1000) for v in vecs
        ]
        model[d] = (
            len(qs),
            sum(qs),
            sum(q * q for q in qs),
            min(qs),
            max(qs),
        )
    assert got == model


# --- sample_systematic ----------------------------------------------------

sys_strategy = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 2)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(sys_strategy)
def test_sample_systematic_matches_python_model(spark, orders):
    import downloader_spark.operators.round10_ext as r10

    rows = [(k, f"P{p}") for k, p in orders]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderpriority string")
    orig = _patched(r10, df)
    try:
        got = {
            (r.o_orderkey, r.o_orderpriority, r.rn)
            for r in r10.sample_systematic(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    K = r10._SYS_K
    strata: dict[str, list[int]] = {}
    for k, p in orders:
        strata.setdefault(f"P{p}", []).append(k)
    model = set()
    for p, keys in strata.items():
        ranked = sorted(keys, key=lambda k: hashlib.md5(str(k).encode()).hexdigest())
        for i, k in enumerate(ranked, start=1):
            if i % K == 1:
                model.add((k, p, i))
    assert got == model


# --- text_char_classes ------------------------------------------------------

txt_strategy = st.lists(
    st.text(
        alphabet="aZ9 .,!\t-_", min_size=0, max_size=40
    ),
    min_size=1,
    max_size=20,
)


@settings(**_SETTINGS)
@given(txt_strategy)
def test_text_char_classes_matches_python_model(spark, texts):
    import downloader_spark.operators.round10_ext as r10

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.doc_id: (r.n_chars, r.n_alpha, r.n_digit, r.n_space, r.alpha_ppm)
            for r in r10.text_char_classes(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    model = {}
    for i, t in enumerate(texts):
        na = sum(c.isascii() and c.isalpha() for c in t)
        nd = sum(c.isdigit() for c in t)
        ns = t.count(" ")
        model[i] = (len(t), na, nd, ns, na * 1_000_000 // max(len(t), 1))
    assert got == model


# --- graph_clustering_coeff ---------------------------------------------

graph_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 6)),  # (order, supplier)
    min_size=1,
    max_size=50,
)


@settings(**_SETTINGS)
@given(graph_strategy)
def test_graph_clustering_coeff_matches_python_model(spark, pairs):
    import downloader_spark.operators.round10_ext as r10

    qty = float(r10._KCORE_MIN_QTY)
    rows = [(ok, s, qty) for ok, s in pairs]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_quantity double"
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.node: (r.degree, r.triangles, r.cc_ppm)
            for r in r10.graph_clustering_coeff(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    # model: same df-capped co-occurrence edges, brute-force triangles
    by_order: dict[int, set[int]] = {}
    for ok, s in pairs:
        by_order.setdefault(ok, set()).add(s)
    edges = set()
    for members in by_order.values():
        if len(members) > r10._KCORE_ORDER_CAP:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                edges.add((ms[i], ms[j]))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    model = {}
    for node, nbs in adj.items():
        d = len(nbs)
        tri = 0
        ns = sorted(nbs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if (min(ns[i], ns[j]), max(ns[i], ns[j])) in edges:
                    tri += 1
        cc = tri * 2_000_000 // (d * (d - 1)) if d >= 2 else 0
        model[node] = (d, tri, cc)
    assert got == model


# --- dedup_bloom_prefilter -----------------------------------------------

bloom_strategy = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=12),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(bloom_strategy)
def test_dedup_bloom_prefilter_matches_python_model(spark, texts):
    import downloader_spark.operators.round10_ext as r10

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.doc_id: (r.bloom_hit, r.in_corpus, r.is_false_positive)
            for r in r10.dedup_bloom_prefilter(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def positions(t: str) -> list[int]:
        return [
            h60(f"bloom{j}:{t}") % r10._BLOOM_M for j in range(r10._BLOOM_K)
        ]

    batch = [(i, t) for i, t in enumerate(texts) if i % r10._INC_MOD == 0]
    corpus = [(i, t) for i, t in enumerate(texts) if i % r10._INC_MOD != 0]
    bits = {p for _, t in corpus for p in positions(t)}
    corpus_texts = {t for _, t in corpus}
    model = {}
    for i, t in batch:
        hit = all(p in bits for p in positions(t))
        member = t in corpus_texts
        model[i] = (hit, member, hit and not member)
        if member:
            assert hit, "bloom filters must have no false negatives"
    assert got == model


# --- dedup_minhash_incremental (bipartite contract) -----------------------


def test_dedup_minhash_incremental_is_bipartite_and_verified(spark):
    """Planted near-dup check on synthetic docs: an exact duplicate
    crossing the batch/corpus split MUST surface (its bands collide
    everywhere); pairs inside one side must NOT, even when identical;
    every emitted pair's Jaccard is >= the 0.5 keep threshold."""
    import downloader_spark.operators.round10_ext as r10

    base = "the quick brown fox jumps over the lazy dog again and again"
    alt = "completely different content with no shared shingles at all here"
    rows = [
        (10, base, "en", "s", len(base)),  # batch (10 % 10 == 0)
        (20, alt, "en", "s", len(alt)),  # batch — dup of 30 inside? no: 20%10==0
        (3, base, "en", "s", len(base)),  # corpus dup of 10 -> must pair
        (7, base, "en", "s", len(base)),  # corpus dup -> must pair with 10
        (30, alt, "en", "s", len(alt)),  # batch dup of 20: SAME side -> no pair
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r10, df)
    try:
        pairs = {
            (r.doc_a, r.doc_b): r.jacc_ppm
            for r in r10.dedup_minhash_incremental(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    assert (10, 3) in pairs and (10, 7) in pairs
    assert pairs[(10, 3)] == 1_000_000  # exact duplicate
    for a, b in pairs:
        assert a % 10 == 0 and b % 10 != 0, "pairs must be batch x corpus"
    assert (20, 30) not in pairs and (30, 20) not in pairs


# --- multimodal png keys (model = closed-form synthesis) -------------------


def test_multimodal_png_stats_matches_closed_form(spark):
    import numpy as np

    import downloader_spark.operators.round10_ext as r10

    df = spark.createDataFrame([(i,) for i in [0, 1, 7, 255]], "doc_id long")
    orig = _patched(r10, df)
    try:
        got = {
            r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
            for r in r10.multimodal_png_stats(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig
    yy, xx = np.mgrid[0 : r10._PNG_H, 0 : r10._PNG_W]
    for doc in [0, 1, 7, 255]:
        sums = tuple(
            int(((doc * 7 + yy * 13 + xx * 5 + c * 3) % 256).sum())
            for c in range(3)
        )
        assert got[doc] == (r10._PNG_W, r10._PNG_H, *sums)


def test_multimodal_png_resize_matches_closed_form(spark):
    import numpy as np

    import downloader_spark.operators.round10_ext as r10

    df = spark.createDataFrame([(i,) for i in [0, 3, 42]], "doc_id long")
    orig = _patched(r10, df)
    try:
        got = {
            r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
            for r in r10.multimodal_png_resize(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig
    h, w, rh, rw = r10._PNG_H, r10._PNG_W, r10._PNG_RH, r10._PNG_RW
    for doc in [0, 3, 42]:
        sums = [0, 0, 0]
        for y2 in range(rh):
            for x2 in range(rw):
                y, x = y2 * h // rh, x2 * w // rw
                for c in range(3):
                    sums[c] += (doc * 7 + y * 13 + x * 5 + c * 3) % 256
        assert got[doc] == (rw, rh, *sums)


# --- events_survival_curve -------------------------------------------

surv_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),  # user
        st.sampled_from(["signup", "purchase", "view"]),
        st.integers(0, 20),  # day offset
    ),
    min_size=1,
    max_size=50,
)


@settings(**_SETTINGS)
@given(surv_strategy)
def test_events_survival_curve_matches_python_model(spark, events):
    import downloader_spark.operators.round10_ext as r10

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=d, minutes=i), uid, t, 1.0, None)
        for i, (uid, t, d) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.day: (r.n_at_risk, r.n_converted, r.surviving_ppm)
            for r in r10.events_survival_curve(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    first_signup: dict[int, dt.datetime] = {}
    for _, ts, uid, t, _, _ in rows:
        if t == "signup" and (uid not in first_signup or ts < first_signup[uid]):
            first_signup[uid] = ts
    conv: dict[int, int] = {}
    for _, ts, uid, t, _, _ in rows:
        if t == "purchase" and uid in first_signup and ts >= first_signup[uid]:
            us = int((ts - first_signup[uid]).total_seconds() * 1_000_000)
            day = us // 86_400_000_000
            if uid not in conv or day < conv[uid]:
                conv[uid] = day
    model = {}
    if first_signup:
        n = len(first_signup)
        for d in range(r10._SURV_MAX_DAY + 1):
            c = sum(1 for uid in first_signup if conv.get(uid, 10**9) <= d)
            model[d] = (n, c, (n - c) * 1_000_000 // n)
    assert got == model


# --- multimodal_wav_decimate -------------------------------------------


def test_multimodal_wav_decimate_matches_closed_form(spark):
    import downloader_spark.operators.round10_ext as r10

    df = spark.createDataFrame([(i,) for i in [0, 5, 99]], "doc_id long")
    orig = _patched(r10, df)
    try:
        got = {
            r.doc_id: (r.sample_rate, r.n_samples, r.energy)
            for r in r10.multimodal_wav_decimate(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig
    n, m = r10._DEC_N, r10._DEC_M
    for doc in [0, 5, 99]:
        e = sum(
            ((doc * 31 + (i * m) * 17) % 2003 - 1001) ** 2
            for i in range(n // m)
        )
        assert got[doc] == (r10._DEC_RATE // m, n // m, e)


# --- graph_degree_assortativity ------------------------------------------


@settings(**_SETTINGS)
@given(graph_strategy)
def test_graph_degree_assortativity_matches_python_model(spark, pairs):
    import downloader_spark.operators.round10_ext as r10

    qty = float(r10._KCORE_MIN_QTY)
    rows = [(ok, s, qty) for ok, s in pairs]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_quantity double"
    )
    orig = _patched(r10, df)
    try:
        out = r10.graph_degree_assortativity(spark, "ignored").collect()
    finally:
        r10.load_table = orig

    by_order: dict[int, set[int]] = {}
    for ok, s in pairs:
        by_order.setdefault(ok, set()).add(s)
    edges = set()
    for members in by_order.values():
        if len(members) > r10._KCORE_ORDER_CAP:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                edges.add((ms[i], ms[j]))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    duv = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    assert len(out) == 1
    r = out[0]
    m = len(duv)
    if m == 0:
        # SQL sums over an empty edge list are NULL in both engines
        assert (r.m, r.sx, r.sxx, r.sxy, r.assortativity) == (
            0, None, None, None, None,
        )
        return
    sx = sum(u for u, _ in duv)
    sxx = sum(u * u for u, _ in duv)
    sxy = sum(u * v for u, v in duv)
    assert (r.m, r.sx, r.sxx, r.sxy) == (m, sx, sxx, sxy)
    denom = m * sxx - sx * sx
    if denom == 0:
        assert r.assortativity is None
    else:
        from decimal import ROUND_HALF_UP, Decimal

        want = float(
            Decimal(float(m * sxy - sx * sx) / denom).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r.assortativity == want


# --- pipeline_gate_funnel ---------------------------------------------


@settings(**_SETTINGS)
@given(txt_strategy)
def test_pipeline_gate_funnel_matches_python_model(spark, texts):
    import downloader_spark.operators.round10_ext as r10

    # pad some texts past the min-chars gate so stage 2+ sees traffic
    texts = [t * 30 if i % 2 == 0 else t for i, t in enumerate(texts)]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.stage: (r.gate, r.n_in, r.n_out, r.drop_ppm)
            for r in r10.pipeline_gate_funnel(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    def flags(t: str) -> tuple[bool, bool, bool]:
        na = sum(c.isascii() and c.isalpha() for c in t)
        nd = sum(c.isdigit() for c in t)
        L = max(len(t), 1)
        return (
            len(t) >= r10._GATE_MIN_CHARS,
            na * 1_000_000 >= r10._GATE_ALPHA_PPM * L,
            nd * 1_000_000 <= r10._GATE_DIGIT_PPM * L,
        )

    fl = [flags(t) for t in texts]
    n0 = len(fl)
    n1 = sum(1 for f in fl if f[0])
    n2 = sum(1 for f in fl if f[0] and f[1])
    n3 = sum(1 for f in fl if all(f))
    model = {
        1: ("min_chars", n0, n1, (n0 - n1) * 1_000_000 // max(n0, 1)),
        2: ("alpha_ratio", n1, n2, (n1 - n2) * 1_000_000 // max(n1, 1)),
        3: ("digit_ratio", n2, n3, (n2 - n3) * 1_000_000 // max(n2, 1)),
    }
    assert got == model


# --- agg_ttest_ab --------------------------------------------------------

ttest_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 56021)),  # (user, cents)
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(ttest_strategy)
def test_agg_ttest_ab_matches_python_model(spark, purchases):
    import downloader_spark.operators.round10_ext as r10

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, uid, "purchase", cents / 100.0, None)
        for i, (uid, cents) in enumerate(purchases)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r10, df)
    try:
        out = r10.agg_ttest_ab(spark, "ignored").collect()
    finally:
        r10.load_table = orig

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    arms: dict[bool, list[int]] = {True: [], False: []}
    for uid, cents in purchases:
        treat = h60(f"ab:{uid}") % 100 < 50
        arms[treat].append(math.floor(cents / 100.0 * 100))
    t_, c_ = arms[True], arms[False]
    assert len(out) == 1
    r = out[0]
    assert (r.n_t, r.s1_t, r.s2_t) == (
        len(t_), sum(t_), sum(x * x for x in t_),
    )
    assert (r.n_c, r.s1_c, r.s2_c) == (
        len(c_), sum(c_), sum(x * x for x in c_),
    )
    if len(t_) < 2 or len(c_) < 2:
        assert r.t_stat is None
        return
    vt = (sum(x * x for x in t_) - sum(t_) ** 2 / len(t_)) / (len(t_) - 1)
    vc = (sum(x * x for x in c_) - sum(c_) ** 2 / len(c_)) / (len(c_) - 1)
    se2 = vt / len(t_) + vc / len(c_)
    if se2 == 0:
        assert r.t_stat is None
        return
    from decimal import ROUND_HALF_UP, Decimal

    want = float(
        Decimal(
            (sum(t_) / len(t_) - sum(c_) / len(c_)) / math.sqrt(se2)
        ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    assert r.t_stat == want


# --- dedup_rate_by_source -------------------------------------------------

src_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5)),  # (source, text id)
    min_size=1,
    max_size=50,
)


@settings(**_SETTINGS)
@given(src_strategy)
def test_dedup_rate_by_source_matches_python_model(spark, docs):
    import downloader_spark.operators.round10_ext as r10

    rows = [
        (i, f"text number {t}", "en", f"src{s}", 12)
        for i, (s, t) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.source: (r.n_docs, r.n_distinct, r.dup_ppm)
            for r in r10.dedup_rate_by_source(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    per: dict[str, list[int]] = {}
    for s, t in docs:
        per.setdefault(f"src{s}", []).append(t)
    model = {
        s: (len(ts), len(set(ts)),
            (len(ts) - len(set(ts))) * 1_000_000 // len(ts))
        for s, ts in per.items()
    }
    assert got == model


# --- dedup_lsh_tuning ------------------------------------------------------


def test_dedup_lsh_tuning_monotone_in_bands(spark):
    """Banding theory on a corpus with planted near-dups: MORE bands
    (fewer rows per band) can only ADD candidate pairs — the 6x2
    candidate set contains the 2x6 set — and exact duplicates must be
    candidates under EVERY config; precision is verified-over-
    candidates in ppm."""
    import downloader_spark.operators.round10_ext as r10

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(12):
        # three exact-dup clusters + unrelated fillers
        if i % 4 == 0:
            rows.append((i, base, "en", "s", len(base)))
        else:
            t = f"unrelated document number {i} with its own words {i * 7}"
            rows.append((i, t, "en", "s", len(t)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.cfg: (r.n_candidates, r.n_true, r.precision_ppm)
            for r in r10.dedup_lsh_tuning(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    # exact dups (3 docs -> 3 pairs) are candidates in every config
    for cfg, (n_cand, n_true, prec) in got.items():
        assert n_true >= 3, cfg
        assert 0 <= prec <= 1_000_000
        assert n_cand >= n_true
    # candidate yield is monotone in band count (2x6 ⊆ 3x4 ⊆ ... not
    # strictly nested pairwise, but the extremes are comparable)
    assert got["6x2"][0] >= got["2x6"][0]


# --- multimodal_phash_dedup ------------------------------------------------


def test_multimodal_phash_dedup_groups_planted_duplicates(spark):
    """The synthesis depends on doc_id mod 256 only, so d and d+256
    render IDENTICAL images — they must share an ahash and cluster;
    images from different residues overwhelmingly must not."""
    import downloader_spark.operators.round10_ext as r10

    ids = [1, 257, 513, 7, 263, 100]  # {1,257,513} and {7,263} planted
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    orig = _patched(r10, df)
    try:
        got = {
            r.doc_id: (r.ahash, r.cluster_size, r.is_dup)
            for r in r10.multimodal_phash_dedup(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    # planted identical images MUST share a signature and cluster
    # (recall contract); unrelated residues MAY also collide — aHash
    # is deliberately lossy, and these smooth gradients collide often
    assert got[1][0] == got[257][0] == got[513][0]
    assert got[1][1] >= 3 and got[1][2] is True
    assert got[7][0] == got[263][0] and got[7][1] >= 2 and got[7][2] is True
    assert len(got[1][0]) == 64 and set(got[1][0]) <= {"0", "1"}
    # cluster_size is consistent per signature
    sizes: dict[str, set] = {}
    for h, size, _ in got.values():
        sizes.setdefault(h, set()).add(size)
    assert all(len(s) == 1 for s in sizes.values())


# --- text_lang_confusion -----------------------------------------------


def test_text_lang_confusion_matches_python_model(spark):
    """Docs written in each profile's own stopwords must land on the
    diagonal; row ppm shares sum to ~1e6 per declared language."""
    import downloader_spark.operators.round10_ext as r10

    texts = {
        "en": "the cat and the dog is a friend of the house",
        "de": "der hund und die katze ist das tier und der baum",
        "fr": "le chien et la maison est les arbres et le chat",
        "es": "el perro y los gatos es las casas y el arbol",
    }
    rows = []
    for i, (lang, t) in enumerate(sorted(texts.items())):
        rows.append((i, t, lang, "s", len(t)))
    # one mislabeled doc: declared zh, english content
    rows.append((99, texts["en"], "zh", "s", len(texts["en"])))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r10, df)
    try:
        got = {
            (r.declared, r.detected): (r.n, r.row_ppm)
            for r in r10.text_lang_confusion(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    for lang in texts:
        assert got[(lang, lang)] == (1, 1_000_000), lang
    assert got[("zh", "en")] == (1, 1_000_000)


# --- agg_spearman ----------------------------------------------------------

spearman_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 500)),  # (type, cents)
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(spearman_strategy)
def test_agg_spearman_matches_python_model(spark, events):
    import downloader_spark.operators.round10_ext as r10

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 0, f"t{t}", cents / 100.0, None)
        for i, (t, cents) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = _patched(r10, df)
    try:
        got = {
            r.event_type: (r.n, r.spearman)
            for r in r10.agg_spearman(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig

    from decimal import ROUND_HALF_UP, Decimal

    by_type: dict[str, list[tuple[int, float]]] = {}
    for i, (t, cents) in enumerate(events):
        by_type.setdefault(f"t{t}", []).append((i, cents / 100.0))
    model = {}
    for t, evs in by_type.items():
        n = len(evs)
        vals = [v for _, v in evs]
        # 2x tie-averaged value ranks
        rx = []
        for _, v in evs:
            less = sum(1 for u in vals if u < v)
            ties = sum(1 for u in vals if u == v)
            rx.append(2 * (less + 1) + ties - 1)
        ry = [2 * (k + 1) for k in range(n)]  # arrival == time order
        sx, sy = sum(rx), sum(ry)
        sxx = sum(a * a for a in rx)
        syy = sum(a * a for a in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if dx == 0 or dy == 0:
            model[t] = (n, None)
        else:
            rho = (n * sxy - sx * sy) / math.sqrt(dx * dy)
            model[t] = (
                n,
                float(
                    Decimal(rho).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                ),
            )
    assert got == model


# --- multimodal_video_luma ------------------------------------------------


def test_multimodal_video_luma_matches_closed_form(spark):
    import downloader_spark.operators.round10_ext as r10

    df = spark.createDataFrame([(i,) for i in [0, 9, 300]], "doc_id long")
    orig = _patched(r10, df)
    try:
        got = {
            (r.doc_id, r.frame_no): (r.n_pixels, r.luma_sum)
            for r in r10.multimodal_video_luma(spark, "ignored").collect()
        }
    finally:
        r10.load_table = orig
    h, w = r10._VID_H, r10._VID_W
    for doc in [0, 9, 300]:
        for f in range(0, r10._VID_FRAMES, r10._VID_STEP):
            s = sum(
                (doc * 11 + f * 29 + y * 13 + x * 5) % 256
                for y in range(h)
                for x in range(w)
            )
            assert got[(doc, f)] == (h * w, s)
    assert len(got) == 3 * (r10._VID_FRAMES // r10._VID_STEP)
