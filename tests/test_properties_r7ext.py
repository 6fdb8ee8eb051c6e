"""Differential property tests for the round-7 operators: MAD,
seasonal decomposition, co-occurrence, OOV rate, and reservoir
determinism vs independent pure-Python models on random inputs.

The Spark implementations use scale-shaped algorithms (order-statistic
window medians, window MAs over a daily aggregate, distinct-basket
self-joins, broadcast top-k vocabularies); the models use the naive
direct formulation — sorted-list indexing, dict counting, set
intersection — so agreement validates the algebra, not a
re-implementation.
"""

from __future__ import annotations

import datetime
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downloader_spark.operators.round7_ext import (
    agg_dispersion,
    events_rfm,
    stream_dedup,
    DOW_SHIFT,
    RES_K,
    VOCAB_K,
    agg_mad,
    events_cooccurrence,
    sample_reservoir,
    text_oov_rate,
    ts_seasonal,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
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
    """specs: list of (user_id, event_type, value, ts_seconds)."""
    return [
        (
            i,
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(seconds=ts_s),
            u,
            t,
            v,
            None,
        )
        for i, (u, t, v, ts_s) in enumerate(specs)
    ]


# --- agg_mad ---------------------------------------------------------

values_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.floats(0.0, 500.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


def low_median(xs):
    s = sorted(xs)
    return s[(len(s) + 1) // 2 - 1]


def model_mad(pairs):
    out = {}
    by_t: dict[str, list[int]] = {}
    import math

    for t, v in pairs:
        by_t.setdefault(t, []).append(math.floor(v * 100))
    for t, vs in by_t.items():
        med = low_median(vs)
        mad = low_median([abs(v - med) for v in vs])
        out[t] = (len(vs), med, mad)
    return out


@settings(**_SETTINGS)
@given(values_strategy)
def test_agg_mad_matches_sorted_list_model(spark, pairs):
    import downloader_spark.operators.round7_ext as r7

    rows = _event_rows([(0, t, v, i) for i, (t, v) in enumerate(pairs)])
    df = spark.createDataFrame(rows, _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {
            r.event_type: (r.n, r.med_cents, r.mad_cents)
            for r in agg_mad(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got == model_mad(pairs)


# --- ts_seasonal -----------------------------------------------------

daily_strategy = st.lists(
    st.floats(0.0, 100.0, allow_nan=False, width=32),
    min_size=1,
    max_size=30,
)


def model_seasonal(day_values):
    """day_values[i] is the value total of day i (consecutive days)."""
    import math

    v = [math.floor(x * 100) for x in day_values]
    out: dict[int, list[int]] = {}
    for i in range(len(v)):
        lo, hi = i - 3, i + 3
        if lo < 0 or hi >= len(v):
            continue  # not a full window
        ma = sum(v[lo : hi + 1]) // 7
        dow = (i + DOW_SHIFT) % 7
        out.setdefault(dow, []).append(v[i] - ma)
    return {d: (len(r), sum(r)) for d, r in out.items()}


@settings(**_SETTINGS)
@given(daily_strategy)
def test_ts_seasonal_matches_centered_ma_model(spark, day_values):
    import downloader_spark.operators.round7_ext as r7

    # one event per day at noon, day i = epoch day i
    rows = _event_rows(
        [
            (0, "view", val, i * 86400 + 43200)
            for i, val in enumerate(day_values)
        ]
    )
    df = spark.createDataFrame(rows, _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {
            r.dow: (r.n_days, r.sum_resid_cents)
            for r in ts_seasonal(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got == model_seasonal(day_values)


# --- events_cooccurrence ---------------------------------------------

basket_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.sampled_from(["w", "x", "y", "z"])),
    min_size=1,
    max_size=40,
)


def model_cooccurrence(pairs):
    baskets: dict[int, set[str]] = {}
    for u, t in pairs:
        baskets.setdefault(u, set()).add(t)
    n_users = len(baskets)
    out = {}
    for a, b in itertools.combinations(sorted({t for _, t in pairs}), 2):
        n = sum(1 for ts in baskets.values() if a in ts and b in ts)
        if n:
            out[(a, b)] = (n, n * 1_000_000 // n_users)
    return out


@settings(**_SETTINGS)
@given(basket_strategy)
def test_events_cooccurrence_matches_set_model(spark, pairs):
    import downloader_spark.operators.round7_ext as r7

    rows = _event_rows(
        [(u, t, 1.0, i) for i, (u, t) in enumerate(pairs)]
    )
    df = spark.createDataFrame(rows, _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {
            (r.type_a, r.type_b): (r.n_users_both, r.support_ppm)
            for r in events_cooccurrence(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got == model_cooccurrence(pairs)


# --- text_oov_rate ---------------------------------------------------


def test_text_oov_rate_vocab_tie_breaks_lexicographically(spark):
    """With > VOCAB_K distinct tokens all at count 1, the vocabulary
    must be the lexicographically-first VOCAB_K — a doc of late-
    alphabet tokens is then 100% OOV."""
    import downloader_spark.operators.round7_ext as r7

    # VOCAB_K early tokens (t000..t099) + 3 late 'zz*' tokens
    early = " ".join(f"t{i:03d}" for i in range(VOCAB_K))
    late = "zza zzb zzc"
    df = spark.createDataFrame(
        [(1, early, "en", "s", len(early)), (2, late, "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(r7, df)
    try:
        got = {
            r.doc_id: (r.n_toks, r.n_oov, r.oov_ppm)
            for r in text_oov_rate(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got == {1: (VOCAB_K, 0, 0), 2: (3, 3, 1_000_000)}


def test_text_oov_rate_frequency_beats_alphabet(spark):
    """A high-frequency late-alphabet token must displace a
    singleton early-alphabet token from the vocabulary."""
    import downloader_spark.operators.round7_ext as r7

    # VOCAB_K singleton early tokens; 'zzz' appears 5 times -> vocab
    # = zzz + first VOCAB_K-1 early tokens; the LAST early token is
    # squeezed out
    early_toks = [f"t{i:03d}" for i in range(VOCAB_K)]
    early = " ".join(early_toks)
    df = spark.createDataFrame(
        [
            (1, early, "en", "s", len(early)),
            (2, "zzz zzz zzz zzz zzz", "en", "s", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(r7, df)
    try:
        got = {
            r.doc_id: (r.n_toks, r.n_oov) for r in
            text_oov_rate(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    # doc 1: only its last token (t099) fell out of vocab
    assert got == {1: (VOCAB_K, 1), 2: (5, 0)}


# --- sample_reservoir ------------------------------------------------


def test_sample_reservoir_exact_k_and_rerun_deterministic(spark):
    import downloader_spark.operators.round7_ext as r7

    rows = _event_rows(
        [(u, t, 1.0, i) for i, (u, t) in enumerate(
            (u, t) for u in range(20) for t in ("a", "b")
        )]
    )
    df = spark.createDataFrame(rows, _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        one = sorted(
            (r.event_type, r.event_id, r.draw_rank)
            for r in sample_reservoir(spark, "x").collect()
        )
        two = sorted(
            (r.event_type, r.event_id, r.draw_rank)
            for r in sample_reservoir(spark, "x").collect()
        )
    finally:
        r7.load_table = orig
    assert one == two  # deterministic across runs
    per_type = {
        t: [r for r in one if r[0] == t] for t in ("a", "b")
    }
    for t, rs in per_type.items():
        assert len(rs) == RES_K
        assert sorted(r[2] for r in rs) == list(range(1, RES_K + 1))


def test_sample_reservoir_small_group_returns_whole_group(spark):
    import downloader_spark.operators.round7_ext as r7

    rows = _event_rows([(0, "tiny", 1.0, i) for i in range(RES_K - 2)])
    df = spark.createDataFrame(rows, _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = sample_reservoir(spark, "x").collect()
    finally:
        r7.load_table = orig
    assert len(got) == RES_K - 2


# --- events_rfm / agg_dispersion / stream_dedup (batch 2) -------------


def test_events_rfm_quintiles_and_code(spark):
    """10 users, strictly increasing activity by user id: recency
    ntile must bucket 2-per-quintile, and user 0 (oldest, fewest,
    cheapest) scores 5/5/5 while user 9 scores 1/1/1."""
    import downloader_spark.operators.round7_ext as r7

    specs = []
    for u in range(10):
        # user u: u+1 events, last on day u, each valued (u+1) dollars
        for j in range(u + 1):
            specs.append((u, "view", float(u + 1), u * 86400 + j))
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {r.user_id: r.asDict() for r in events_rfm(spark, "x").collect()}
    finally:
        r7.load_table = orig
    assert got[9]["recency_days"] == 0 and got[0]["recency_days"] == 9
    assert got[9]["r_score"] == 1 and got[9]["f_score"] == 1
    assert got[9]["m_score"] == 1 and got[9]["rfm"] == 111
    assert got[0]["r_score"] == 5 and got[0]["f_score"] == 5
    assert got[0]["m_score"] == 5 and got[0]["rfm"] == 555
    # quintiles over 10 users: every score bucket holds exactly 2
    from collections import Counter

    assert Counter(v["r_score"] for v in got.values()) == {
        s: 2 for s in (1, 2, 3, 4, 5)
    }


def test_agg_dispersion_poisson_vs_bursty(spark):
    """Uniform 2-per-day traffic scores 0 ppm dispersion (variance
    0); the same volume packed into one day scores (n·Σc²−(Σc)²)
    /(n·Σc) exactly."""
    import downloader_spark.operators.round7_ext as r7

    specs = []
    # 'flat': 2 events/day for 5 days;  'burst': 10 events on day 0,
    # plus 1 on each of days 1-4 (so both have n_days=5, n_events=10|14)
    for d in range(5):
        specs += [(0, "flat", 1.0, d * 86400), (0, "flat", 1.0, d * 86400 + 1)]
    specs += [(0, "burst", 1.0, i) for i in range(10)]
    specs += [(0, "burst", 1.0, d * 86400) for d in range(1, 5)]
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {
            r.event_type: (r.n_days, r.n_events, r.dispersion_ppm)
            for r in agg_dispersion(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got["flat"] == (5, 10, 0)
    # burst: counts [10,1,1,1,1]; n=5, s1=14, s2=104 ->
    # (5*104 - 196)*1e6 // (5*14) = 324e6 // 70
    assert got["burst"] == (5, 14, 324_000_000 // 70)


def test_stream_dedup_keeps_timestamp_then_id_minimal_row(spark):
    import downloader_spark.operators.round7_ext as r7

    # same (user, type): two rows share the earliest ts -> the lower
    # event_id must win; a later row never wins
    rows = [
        (7, datetime.datetime(1970, 1, 1, 0, 0, 5), 1, "view", 1.0, None),
        (3, datetime.datetime(1970, 1, 1, 0, 0, 5), 1, "view", 1.0, None),
        (1, datetime.datetime(1970, 1, 1, 0, 0, 9), 1, "view", 1.0, None),
        (2, datetime.datetime(1970, 1, 1, 0, 0, 1), 1, "click", 1.0, None),
    ]
    df = spark.createDataFrame(rows, _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {
            (r.user_id, r.event_type): (r.first_event_id, r.first_us)
            for r in stream_dedup(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got == {
        (1, "view"): (3, 5_000_000),
        (1, "click"): (2, 1_000_000),
    }


# --- text_readability / sample_class_balance (batch 4) ----------------


def test_text_readability_known_values(spark):
    """Hand-computed Flesch milli on a two-sentence doc."""
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import text_readability

    text = "The cat sat. The dog ran away!"
    # words: the cat sat the dog ran away = 7
    # sentences: '.' and '!' -> 2; vowel groups (lower):
    # e,a,a,e,o,a,a,ay -> the(1) cat(1) sat(1) the(1) dog(1) ran(1)
    # away(2: a, ay) = 8
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(r7, df)
    try:
        r = text_readability(spark, "x").collect()[0]
    finally:
        r7.load_table = orig
    assert (r.n_words, r.n_sentences, r.n_syllables) == (7, 2, 8)
    expected = 206835 - 1015 * 7 // 2 - 84600 * 8 // 7
    assert r.flesch_milli == expected


def test_text_readability_no_terminal_punct_counts_one_sentence(spark):
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import text_readability

    df = spark.createDataFrame(
        [(1, "no punctuation here", "en", "s", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(r7, df)
    try:
        r = text_readability(spark, "x").collect()[0]
    finally:
        r7.load_table = orig
    assert r.n_sentences == 1 and r.n_words == 3


def test_sample_class_balance_exact_minority_count_per_class(spark):
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import sample_class_balance

    rows = []
    did = 0
    for lang, n in (("en", 20), ("de", 7), ("fr", 12)):
        for _ in range(n):
            rows.append((did, f"doc {did}", lang, "s", 8))
            did += 1
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = _patched(r7, df)
    try:
        got = sample_class_balance(spark, "x").collect()
        again = sample_class_balance(spark, "x").collect()
    finally:
        r7.load_table = orig
    from collections import Counter

    per_lang = Counter(r.lang for r in got)
    assert per_lang == {"en": 7, "de": 7, "fr": 7}  # minority = de (7)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))  # deterministic


# --- pipeline_dedup / text_novelty / embed_label_outliers (batch 5-6) -


def test_pipeline_dedup_funnel_counts(spark):
    """Crafted corpus: 2 exact dups of A, 1 prefix-variant of A
    (same 64-char prefix, different tail), 1 unique B."""
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import pipeline_dedup

    base = "alpha " * 20  # normalized prefix (64 chars) identical
    rows = [
        (1, base + "tail one", "en", "web", 1),
        (2, base + "tail one", "en", "web", 1),   # exact dup of 1
        (3, base + "tail two", "en", "web", 1),   # prefix dup of 1
        (4, "completely different text", "en", "api", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r7, df)
    try:
        got = {r.source: r.asDict() for r in pipeline_dedup(spark, "x").collect()}
    finally:
        r7.load_table = orig
    # web: 3 raw -> 2 exact survivors (1, 3) -> 1 prefix survivor (1)
    assert got["web"]["n_raw"] == 3
    assert got["web"]["n_exact"] == 2
    assert got["web"]["n_prefix"] == 1
    assert got["web"]["kept_ppm"] == 1_000_000 // 3
    assert got["api"] == {
        "source": "api", "n_raw": 1, "n_exact": 1, "n_prefix": 1,
        "kept_ppm": 1_000_000,
    }


def test_text_novelty_copy_scores_zero(spark):
    """doc 2 copies doc 1 verbatim -> novelty 0; doc 1 (first) and
    doc 3 (fresh text) score 1e6."""
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import text_novelty

    a = "the quick brown fox jumps over the lazy dog today"
    rows = [
        (1, a, "en", "s", 1),
        (2, a, "en", "s", 1),
        (3, "entirely novel content with fresh wording here now", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = _patched(r7, df)
    try:
        got = {r.doc_id: r.novelty_ppm for r in text_novelty(spark, "x").collect()}
    finally:
        r7.load_table = orig
    assert got[1] == 1_000_000
    assert got[2] == 0
    assert got[3] == 1_000_000


def test_embed_label_outliers_planted_outlier_ranks_first(spark):
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import embed_label_outliers

    # label 0: 5 vectors near [0.1]*4, one planted far at [0.9]*4
    rows = [(i, [0.1, 0.1, 0.1, 0.1], 0) for i in range(5)]
    rows.append((99, [0.9, 0.9, 0.9, 0.9], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    orig = _patched(r7, df)
    try:
        got = sorted(
            (r.rnk, r.vec_id) for r in embed_label_outliers(spark, "x").collect()
        )
    finally:
        r7.load_table = orig
    assert got[0] == (1, 99)  # the planted outlier is rank 1
    assert len(got) == 3


# --- events_dau_wau / events_new_returning (batch 8) ------------------


def test_events_dau_wau_dedups_users_across_week(spark):
    """User active on days 0 and 3 counts ONCE in day-3's WAU; day-7
    no longer sees day-0 activity."""
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import events_dau_wau

    specs = [
        (1, "view", 1.0, 0 * 86400),       # user 1, day 0
        (1, "view", 1.0, 3 * 86400),       # user 1 again, day 3
        (2, "view", 1.0, 3 * 86400),       # user 2, day 3
        (1, "view", 1.0, 7 * 86400),       # user 1, day 7
    ]
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {r.day: (r.dau, r.wau) for r in events_dau_wau(spark, "x").collect()}
    finally:
        r7.load_table = orig
    assert got[0] == (1, 1)
    assert got[3] == (2, 2)   # user 1 counted once despite 2 active days
    assert got[7] == (1, 2)   # window [1..7]: sees day-3 users, not day-0


def test_events_new_returning_first_day_split(spark):
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.operators.round7_ext import events_new_returning

    specs = [
        (1, "view", 1.0, 0),               # user 1 new on day 0
        (2, "view", 1.0, 0),               # user 2 new on day 0
        (1, "view", 1.0, 1 * 86400),       # user 1 returns day 1
        (3, "view", 1.0, 1 * 86400),       # user 3 new on day 1
    ]
    df = spark.createDataFrame(_event_rows(specs), _EVENT_SCHEMA)
    orig = _patched(r7, df)
    try:
        got = {
            r.day: (r.new_users, r.returning_users)
            for r in events_new_returning(spark, "x").collect()
        }
    finally:
        r7.load_table = orig
    assert got == {0: (2, 0), 1: (1, 1)}
