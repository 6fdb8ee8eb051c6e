"""Differential property tests for the round-8 operators: triangle
counting, gaps-and-islands, BPE pair mining, and autocorrelation vs
independent pure-Python models on random inputs.

The Spark implementations use scale-shaped algorithms (degree-ordered
orientation, row_number anchors, vocab-collapsed weighting, moment
sums); the models here use the naive direct formulation — brute-force
triangle enumeration, linear streak walking, per-corpus-token pair
counting, textbook Pearson — so agreement validates the algebra, not
just a re-implementation.
"""

from __future__ import annotations

import hashlib
import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downloader_spark.operators.graph_ops import (
    TRI_MIN_QTY,
    TRI_ORDER_CAP,
    graph_triangles,
)
from downloader_spark.operators.training_prep import BPE_TOP_K, text_bpe_pairs
from downloader_spark.operators.windows import window_islands
from downloader_spark.operators.analytics_series import ACF_MAX_LAG, ts_autocorr

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _patched(module, df):
    """Context-manager-free monkeypatch helper used by every test."""
    orig = module.load_table
    module.load_table = lambda s, d, n: df
    return orig


# --- graph_triangles -------------------------------------------------

# (orderkey, suppkey) memberships; quantity pinned above the filter.
membership_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 8)),
    min_size=1,
    max_size=40,
)


def model_triangles(memberships):
    """Brute-force: build the co-membership edge set (per-order cap
    applied), then test every node triple."""
    by_order: dict[int, set[int]] = {}
    for ok, s in memberships:
        by_order.setdefault(ok, set()).add(s)
    edges = set()
    for members in by_order.values():
        if len(members) > TRI_ORDER_CAP:
            continue
        edges |= {
            (a, b) for a, b in itertools.combinations(sorted(members), 2)
        }
    nodes = sorted({n for e in edges for n in e})
    deg = {n: sum(1 for e in edges if n in e) for n in nodes}
    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (deg[n], tri[n]) for n in nodes}


@settings(**_SETTINGS)
@given(membership_strategy)
def test_graph_triangles_matches_bruteforce(spark, memberships):
    import downloader_spark.operators.graph_ops as go

    rows = [
        (ok, s, i, float(TRI_MIN_QTY), 1.0, 0.0, 0.0, "N", "O", None)
        for i, (ok, s) in enumerate(memberships)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    )
    orig = _patched(go, df)
    try:
        got = {
            r.s_suppkey: (r.degree, r.tri_count)
            for r in graph_triangles(spark, "ignored").collect()
        }
    finally:
        go.load_table = orig
    assert got == model_triangles(memberships)


def test_graph_triangles_order_cap_prunes_hot_order(spark):
    """One order touching CAP+2 suppliers must contribute NO edges."""
    import downloader_spark.operators.graph_ops as go

    hot = [(1, s) for s in range(TRI_ORDER_CAP + 2)]
    cold = [(2, 0), (2, 1), (3, 1), (3, 2), (4, 0), (4, 2)]  # one triangle
    rows = [
        (ok, s, i, float(TRI_MIN_QTY), 1.0, 0.0, 0.0, "N", "O", None)
        for i, (ok, s) in enumerate(hot + cold)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    )
    orig = _patched(go, df)
    try:
        got = {
            r.s_suppkey: (r.degree, r.tri_count)
            for r in graph_triangles(spark, "ignored").collect()
        }
    finally:
        go.load_table = orig
    # only the cold orders' triangle {0,1,2} survives
    assert got == {0: (2, 1), 1: (2, 1), 2: (2, 1)}


# --- window_islands --------------------------------------------------

days_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),  # (user, day)
    min_size=1,
    max_size=50,
)


def model_islands(user_days):
    """Walk each user's sorted distinct days linearly."""
    out = []
    by_user: dict[int, list[int]] = {}
    for u, d in set(user_days):
        by_user.setdefault(u, []).append(d)
    for u, ds in by_user.items():
        ds.sort()
        start = prev = ds[0]
        for d in ds[1:]:
            if d == prev + 1:
                prev = d
                continue
            out.append((u, start, prev, prev - start + 1))
            start = prev = d
        out.append((u, start, prev, prev - start + 1))
    return sorted(out)


@settings(**_SETTINGS)
@given(days_strategy)
def test_window_islands_matches_linear_walk(spark, user_days):
    import datetime as dt

    import downloader_spark.operators.windows as wmod

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (i, base + dt.timedelta(days=d, seconds=u), u, "view", 1.0, "{}")
        for i, (u, d) in enumerate(user_days)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    base_day = int(base.timestamp()) // 86400
    orig = _patched(wmod, df)
    try:
        got = sorted(
            (r.user_id, r.start_day - base_day, r.end_day - base_day, r.n_days)
            for r in window_islands(spark, "ignored").collect()
        )
    finally:
        wmod.load_table = orig
    assert got == model_islands(user_days)


# --- text_bpe_pairs --------------------------------------------------

word_strategy = st.text(alphabet="abc", min_size=1, max_size=6)
docs_strategy = st.lists(
    st.lists(word_strategy, min_size=1, max_size=12),
    min_size=1,
    max_size=6,
)


def model_bpe_pairs(docs):
    """Direct per-corpus-token pair counting — NO vocab collapse, so
    agreement proves the frequency-weighting algebra."""
    counts: dict[str, int] = {}
    for words in docs:
        for w in words:
            if len(w) < 2:
                continue
            for i in range(len(w) - 1):
                p = w[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return {
        p: (n, i + 1) for i, (p, n) in enumerate(ranked[:BPE_TOP_K])
    }


@settings(**_SETTINGS)
@given(docs_strategy)
def test_text_bpe_pairs_matches_direct_count(spark, docs):
    import downloader_spark.operators.training_prep as tp

    rows = [
        (i, " ".join(words), "en", "test", len(" ".join(words)))
        for i, words in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(tp, df)
    try:
        got = {
            r.pair: (r.n, r.rank)
            for r in text_bpe_pairs(spark, "ignored").collect()
        }
    finally:
        tp.load_table = orig
    assert got == model_bpe_pairs(docs)


# --- ts_autocorr -----------------------------------------------------

counts_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(1, 50)),  # (day, count)
    min_size=2,
    max_size=15,
    unique_by=lambda t: t[0],
)


def model_acf(day_counts):
    """Textbook Pearson over the lag-aligned observed pairs."""
    series = dict(day_counts)
    out = {}
    for lag in range(1, ACF_MAX_LAG + 1):
        pairs = [
            (series[d], series[d + lag]) for d in series if d + lag in series
        ]
        if not pairs:
            continue
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        num = n * sxy - sx * sy
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        r4 = (
            round(num / (math.sqrt(dx) * math.sqrt(dy)), 4)
            if dx > 0 and dy > 0
            else None
        )
        out[lag] = (n, num, dx, dy, r4)
    return out


@settings(**_SETTINGS)
@given(counts_strategy)
def test_ts_autocorr_matches_textbook_pearson(spark, day_counts):
    import datetime as dt

    import downloader_spark.operators.analytics_series as am

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    eid = 0
    for day, c in day_counts:
        for _ in range(c):
            rows.append(
                (eid, base + dt.timedelta(days=day), 1, "view", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = _patched(am, df)
    try:
        got = {
            r.lag: (r.n_pairs, r.cov_num, r.var_x_num, r.var_y_num, r.acf_r4)
            for r in ts_autocorr(spark, "ignored").collect()
        }
    finally:
        am.load_table = orig
    assert got == model_acf(day_counts)


# --- ts_changepoint --------------------------------------------------


def model_changepoint(day_counts):
    """Direct CUSUM: compute S'_k = n*prefix_k - k*total and argmax
    |S'| with earliest-day ties."""
    days = sorted(dict(day_counts).items())
    n = len(days)
    total = sum(c for _, c in days)
    best = None
    pc = 0
    for k, (d, c) in enumerate(days, start=1):
        pc += c
        s = n * pc - k * total
        key = (abs(s), -d)
        if best is None or key > best[0]:
            best = (key, d, s)
    return (n, total, best[1], best[2], abs(best[2]))


@settings(**_SETTINGS)
@given(counts_strategy)
def test_ts_changepoint_matches_direct_cusum(spark, day_counts):
    import datetime as dt

    import downloader_spark.operators.analytics_series as am
    from downloader_spark.operators.analytics_series import ts_changepoint

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    eid = 0
    for day, c in day_counts:
        for _ in range(c):
            rows.append(
                (eid, base + dt.timedelta(days=day), 1, "view", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    base_day = int(base.timestamp()) // 86400
    orig = _patched(am, df)
    try:
        got = [
            (r.n_days, r.total, r.cp_day - base_day, r.cusum_at_cp, r.abs_cusum)
            for r in ts_changepoint(spark, "ignored").collect()
        ]
    finally:
        am.load_table = orig
    assert got == [model_changepoint(day_counts)]


# --- sample_negative -------------------------------------------------


def test_sample_negative_is_stable_bounded_and_self_free(spark):
    """Structural invariants on the real corpus slice: every anchor
    draws <= K negatives, never itself, ranks are 1..k dense, and the
    draw is identical across two runs (determinism)."""
    from downloader_spark.operators.training_prep import NEG_K, sample_negative

    rows1 = sorted(
        (r.anchor_id, r.neg_id, r.neg_rank)
        for r in sample_negative(spark, "/root/testdata/sf0.001").collect()
    )
    rows2 = sorted(
        (r.anchor_id, r.neg_id, r.neg_rank)
        for r in sample_negative(spark, "/root/testdata/sf0.001").collect()
    )
    assert rows1 == rows2 and rows1
    by_anchor: dict[int, list[int]] = {}
    for a, nid, rk in rows1:
        assert a != nid
        by_anchor.setdefault(a, []).append(rk)
    for a, ranks in by_anchor.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= NEG_K


# --- text_repetition -------------------------------------------------


def model_repetition(docs):
    """Direct per-doc walk: trigram dup fraction + longest equal run."""
    out = {}
    for doc_id, words in docs.items():
        n = len(words)
        tris = [tuple(words[i : i + 3]) for i in range(n - 2)]
        n_tri, d_tri = len(tris), len(set(tris))
        max_run = run = 1
        for i in range(1, n):
            run = run + 1 if words[i] == words[i - 1] else 1
            max_run = max(max_run, run)
        dup_ppm = (
            (n_tri - d_tri) * 1_000_000 // n_tri if n_tri > 0 else None
        )
        out[doc_id] = (n, n_tri, d_tri, dup_ppm, max_run)
    return out


@settings(**_SETTINGS)
@given(docs_strategy)
def test_text_repetition_matches_direct_walk(spark, docs):
    import downloader_spark.operators.llm_text as lt
    from downloader_spark.operators.llm_text import text_repetition

    rows = [
        (i, " ".join(words), "en", "test", len(" ".join(words)))
        for i, words in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(lt, df)
    try:
        got = {
            r.doc_id: (
                r.n_tok, r.n_trigrams, r.distinct_trigrams, r.dup_ppm, r.max_run
            )
            for r in text_repetition(spark, "ignored").collect()
        }
    finally:
        lt.load_table = orig
    assert got == model_repetition({i: w for i, w in enumerate(docs)})


# --- join_asof_nearest -----------------------------------------------

# duplicate (user, seconds) rows are DELIBERATELY allowed: two signups
# in the same microsecond exercise the struct-max tie-break (smallest
# signup_id wins, matching the oracle's ORDER BY abs, s_us, signup_id);
# equidistant prev/next ties resolve to the prior match (smaller s_us)
asof_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                      # user
        st.sampled_from(["view", "signup", "purchase"]),
        st.integers(0, 20),                     # seconds offset (small → ties)
    ),
    min_size=1,
    max_size=30,
)


def model_asof_nearest(rows):
    purchases = [(i, u, s) for i, (u, t, s) in enumerate(rows) if t == "purchase"]
    signups = [(i, u, s) for i, (u, t, s) in enumerate(rows) if t == "signup"]
    out = {}
    for pid, pu, ps in purchases:
        cands = [
            (abs(ss - ps), ss, sid, (ss - ps) * 1_000_000)
            for sid, su, ss in signups
            if su == pu
        ]
        if cands:
            cands.sort()
            out[pid] = (cands[0][2], cands[0][3])
    return out


@settings(**_SETTINGS)
@given(asof_strategy)
def test_join_asof_nearest_matches_bruteforce(spark, rows):
    import datetime as dt

    import downloader_spark.operators.relational as rel
    from downloader_spark.operators.relational import join_asof_nearest

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    data = [
        (i, base + dt.timedelta(seconds=s), u, t, 1.0, "{}")
        for i, (u, t, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = _patched(rel, df)
    try:
        got = {
            r.purchase_id: (r.signup_id, r.delta_us)
            for r in join_asof_nearest(spark, "ignored").collect()
        }
    finally:
        rel.load_table = orig
    assert got == model_asof_nearest(rows)


# --- curriculum_order ------------------------------------------------

curr_strategy = st.lists(
    st.tuples(st.integers(0, 999), st.integers(0, 5000)),  # (doc_id, n_chars)
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


def model_curriculum(docs):
    """Single global sort — the thing the two-phase Spark plan must
    exactly reproduce without ever doing."""
    from downloader_spark.operators.training_prep import (
        CURR_BAND_CHARS,
        CURR_MAX_BAND,
    )

    def key(t):
        doc_id, n_chars = t
        band = min(n_chars // CURR_BAND_CHARS, CURR_MAX_BAND)
        return (band, hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id)

    ranked = sorted(docs, key=key)
    return {
        doc_id: (min(n // 512, 7), pos + 1)
        for pos, (doc_id, n) in enumerate(ranked)
    }


@settings(**_SETTINGS)
@given(curr_strategy)
def test_curriculum_order_matches_global_sort(spark, docs):
    import downloader_spark.operators.training_prep as tp
    from downloader_spark.operators.training_prep import curriculum_order

    rows = [(i, "x" * min(n, 10), "en", "t", n) for i, n in docs]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(tp, df)
    try:
        got = {
            r.doc_id: (r.band, r.global_pos)
            for r in curriculum_order(spark, "ignored").collect()
        }
    finally:
        tp.load_table = orig
    assert got == model_curriculum(docs)


# --- embed_pq --------------------------------------------------------


def model_pq(vectors):
    from downloader_spark.operators.llm_similarity import (
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
    )

    q = {
        vid: [math.floor(x * 1000) for x in v] for vid, v in vectors.items()
    }
    ranked = sorted(
        q, key=lambda vid: (hashlib.md5(str(vid).encode()).hexdigest(), vid)
    )
    anchors = {code: q[vid] for code, vid in enumerate(ranked[:PQ_K])}
    out = {}
    for vid, qa in q.items():
        codes, err = [], 0
        for m in range(PQ_M):
            lo, hi = m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM
            best = min(
                (
                    (
                        sum((qa[i] - av[i]) ** 2 for i in range(lo, hi)),
                        code,
                    )
                    for code, av in anchors.items()
                )
            )
            codes.append(best[1])
            err += best[0]
        out[vid] = (*codes, err)
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.dictionaries(
        st.integers(0, 99),
        st.lists(
            st.floats(-1, 1, allow_nan=False, allow_infinity=False, width=32),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_embed_pq_matches_bruteforce(spark, vectors):
    import downloader_spark.operators.llm_similarity as ls
    from downloader_spark.operators.llm_similarity import embed_pq

    rows = [(vid, v, 0) for vid, v in vectors.items()]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    orig = _patched(ls, df)
    try:
        got = {
            r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3, r.quant_err)
            for r in embed_pq(spark, "ignored").collect()
        }
    finally:
        ls.load_table = orig
    # model quantizes the FLOAT32 value Spark sees
    import struct as _s

    f32 = {
        vid: [_s.unpack("f", _s.pack("f", x))[0] for x in v]
        for vid, v in vectors.items()
    }
    assert got == model_pq(f32)


# --- window_cum_distinct ---------------------------------------------


def model_cum_distinct(rows):
    """Direct walk: per user per active day, distinct types so far."""
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, d, t in rows:
        by_user.setdefault(u, []).append((d, t))
    out = {}
    for u, evs in by_user.items():
        days = sorted({d for d, _ in evs})
        for day in days:
            seen = {t for d, t in evs if d <= day}
            out[(u, day)] = len(seen)
    return out


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 10),
            st.sampled_from(["view", "click", "purchase", "signup"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_window_cum_distinct_matches_direct_walk(spark, rows):
    import datetime as dt

    import downloader_spark.operators.windows as wmod
    from downloader_spark.operators.windows import window_cum_distinct

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    data = [
        (i, base + dt.timedelta(days=d, seconds=i), u, t, 1.0, "{}")
        for i, (u, d, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    base_day = int(base.timestamp()) // 86400
    orig = _patched(wmod, df)
    try:
        got = {
            (r.user_id, r.day - base_day): r.types_seen
            for r in window_cum_distinct(spark, "ignored").collect()
        }
    finally:
        wmod.load_table = orig
    assert got == model_cum_distinct(rows)


# --- bm25_rank (parameterized query terms) ---------------------------

_BM25_VOCAB = ["alpha", "beta", "gamma", "delta", "spark", "query"]

bm25_strategy = st.tuples(
    st.lists(  # corpus: each doc a non-empty word list (avgdl >= 1)
        st.lists(st.sampled_from(_BM25_VOCAB), min_size=1, max_size=12),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # arbitrary query-term list, any vocab subset
        st.sampled_from(_BM25_VOCAB), min_size=1, max_size=4, unique=True
    ),
)


def model_bm25(docs, terms):
    """Textbook integer-rational BM25 (same k1=1.2 b=0.75 constants
    multiplied through) computed doc-at-a-time in pure Python — all
    quantities are non-negative so Python // agrees with Spark DIV."""
    n = len(docs)
    avgdl = sum(len(d) for d in docs) // n
    df = {t: sum(1 for d in docs if t in d) for t in terms}
    out = {}
    for i, d in enumerate(docs):
        dl = len(d)
        score = 0
        for t in terms:
            tf = d.count(t)
            idf = n * 1_000_000 // (df[t] + 1)
            score += idf * (44 * avgdl * tf) // (
                20 * avgdl * tf + 6 * avgdl + 18 * dl
            )
        out[i] = (dl, score)
    return out


@settings(**_SETTINGS)
@given(bm25_strategy)
def test_bm25_rank_arbitrary_terms_match_python_model(spark, case):
    docs, terms = case
    import downloader_spark.operators.retrieval_rank as rr
    from downloader_spark.operators.retrieval_rank import bm25_rank

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    orig = _patched(rr, df)
    try:
        got = {
            r.doc_id: (r.dl, r.score_ppm)
            for r in bm25_rank(
                spark, "ignored", tuple(terms), topk=len(docs)
            ).collect()
        }
    finally:
        rr.load_table = orig
    assert got == model_bm25(docs, terms)


# --- sql_q21_last_shipper (order-statistics de-correlation) ----------

def _patched_tables(module, dfs):
    orig = module.load_table
    module.load_table = lambda s, d, n: dfs[n]
    return orig


q21_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),    # orderkey
        st.integers(0, 7),    # suppkey
        st.integers(0, 10),   # ship day offset
    ),
    min_size=1,
    max_size=40,
)


def model_q21(rows, statuses, supp_nation):
    """The classic double-correlated formulation, literally: for each
    l1 row check EXISTS(other supplier on the order) and NOT
    EXISTS(other supplier shipping strictly later)."""
    out: dict[str, int] = {}
    for i, (ok, sk, day) in enumerate(rows):
        if statuses[ok] != "F" or supp_nation[sk] != "NATION_4":
            continue
        others = [(ok2, sk2, d2) for ok2, sk2, d2 in rows if ok2 == ok and sk2 != sk]
        if not others:
            continue
        if any(d2 > day for _, _, d2 in others):
            continue
        name = f"supp-{sk}"
        out[name] = out.get(name, 0) + 1
    return out


@settings(**_SETTINGS)
@given(q21_strategy)
def test_sql_q21_matches_correlated_bruteforce(spark, rows):
    import datetime as dt

    import downloader_spark.operators.round6_ext as r6
    from downloader_spark.operators.round6_ext import sql_q21_last_shipper

    base = dt.datetime(2024, 1, 1)
    # half the orders finished, suppliers spread over 2 nations
    statuses = {ok: ("F" if ok % 2 == 0 else "O") for ok in range(6)}
    supp_nation = {sk: ("NATION_4" if sk % 2 == 0 else "NATION_9") for sk in range(8)}
    li = spark.createDataFrame(
        [
            (ok, 0, sk, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
             base + dt.timedelta(days=day))
            for i, (ok, sk, day) in enumerate(rows)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(ok, 0, statuses[ok], 1.0, base, "3-MEDIUM") for ok in range(6)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    supplier = spark.createDataFrame(
        [(sk, f"supp-{sk}", 0 if sk % 2 == 0 else 1, 0.0) for sk in range(8)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_4", 0), (1, "NATION_9", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    dfs = {"lineitem": li, "orders": orders, "supplier": supplier, "nation": nation}
    orig = _patched_tables(r6, dfs)
    try:
        got = {
            r.s_name: r.numwait
            for r in sql_q21_last_shipper(spark, "ignored").collect()
        }
    finally:
        r6.load_table = orig
    assert got == model_q21(rows, statuses, supp_nation)


# --- dedup_substring_spans (positional span dedup) -------------------

span_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=15),
    min_size=1,
    max_size=6,
)


def model_spans(docs, w=5, cap=20, min_run=3):
    """Literal formulation: enumerate positional grams, drop hot
    grams (> cap postings corpus-wide), collect matching-position
    pairs, walk consecutive runs per (a, b, delta) linearly."""
    grams = []  # (doc, pos, gram)
    for d, words in enumerate(docs):
        for i in range(len(words) - w + 1):
            grams.append((d, i + 1, " ".join(words[i : i + w])))
    from collections import Counter, defaultdict

    df = Counter(g for _, _, g in grams)
    kept = [(d, p, g) for d, p, g in grams if df[g] <= cap]
    by_gram = defaultdict(list)
    for d, p, g in kept:
        by_gram[g].append((d, p))
    runs = defaultdict(list)  # (a, b, delta) -> [pa...]
    for posts in by_gram.values():
        for da, pa in posts:
            for db, pb in posts:
                if da < db:
                    runs[(da, db, pa - pb)].append(pa)
    out = {}
    for (da, db, _delta), pas in runs.items():
        pas = sorted(set(pas))
        start = prev = pas[0]
        lens = []
        for p in pas[1:]:
            if p == prev + 1:
                prev = p
                continue
            lens.append(prev - start + 1)
            start = prev = p
        lens.append(prev - start + 1)
        cur = out.setdefault((da, db), [])
        cur.extend(lens)
    return {
        (a, b): (max(ls), max(ls) + w - 1, sum(1 for x in ls if x >= min_run))
        for (a, b), ls in out.items()
        if max(ls) >= min_run
    }


@settings(**_SETTINGS)
@given(span_strategy)
def test_dedup_substring_spans_matches_linear_walk(spark, docs):
    import downloader_spark.operators.round6_ext as r6
    from downloader_spark.operators.round6_ext import dedup_substring_spans

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    orig = _patched(r6, df)
    try:
        got = {
            (r.doc_a, r.doc_b): (r.max_run, r.span_tokens, r.n_spans)
            for r in dedup_substring_spans(spark, "ignored").collect()
        }
    finally:
        r6.load_table = orig
    assert got == model_spans(docs)


# --- text_lm_score (corpus-bigram LM scoring) ------------------------

lm_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10),
    min_size=1,
    max_size=6,
)


def model_lm_score(docs):
    """Direct formulation: corpus bigram + continuation counts, then
    per-doc average conditional probability in floor ppm."""
    from collections import Counter

    bigrams = []  # (doc, w1, bg)
    for d, words in enumerate(docs):
        for i in range(len(words) - 1):
            bigrams.append((d, words[i], f"{words[i]} {words[i+1]}"))
    c_bg = Counter(bg for _, _, bg in bigrams)
    c_w1 = Counter(w1 for _, w1, _ in bigrams)
    out = {}
    for d in range(len(docs)):
        mine = [(w1, bg) for dd, w1, bg in bigrams if dd == d]
        if not mine:
            continue
        total = sum(c_bg[bg] * 1_000_000 // c_w1[w1] for w1, bg in mine)
        out[d] = (len(mine), total // len(mine))
    return out


@settings(**_SETTINGS)
@given(lm_strategy)
def test_text_lm_score_matches_direct_count(spark, docs):
    import downloader_spark.operators.round6_ext as r6
    from downloader_spark.operators.round6_ext import text_lm_score

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    orig = _patched(r6, df)
    try:
        got = {
            r.doc_id: (r.n_bigrams, r.lm_score_ppm)
            for r in text_lm_score(spark, "ignored").collect()
        }
    finally:
        r6.load_table = orig
    assert got == model_lm_score(docs)
