"""Differential property tests: the dedup/hash machinery vs an
independent pure-Python model on random inputs (hypothesis).

The oracle-parity tests prove Spark == DuckDB; these prove both match
a THIRD independent implementation, on inputs the fixed test tables
never exercise (degenerate docs, heavy duplication, tiny vocabularies).
Example counts are small because each example is a Spark round-trip.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from downloader_spark.operators.llm_dedup import (
    SIMHASH_BITS,
    STOP_SHINGLE_DF,
    ngram_jaccard_pairs,
    shingle_sets,
    simhash_signatures,
)

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=25),
    min_size=2,
    max_size=6,
)


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def model_shingles(text: str) -> set[str]:
    toks = text.split()
    if len(toks) < 3:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def model_ngram_pairs(texts: list[str]) -> dict[tuple[int, int], tuple[int, int]]:
    sh = {i: model_shingles(t) for i, t in enumerate(texts)}
    # stop-shingle df cap
    df: dict[str, int] = {}
    for s_set in sh.values():
        for s in s_set:
            df[s] = df.get(s, 0) + 1
    sh = {i: {s for s in ss if df[s] <= STOP_SHINGLE_DF} for i, ss in sh.items()}
    out = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if inter and union and inter * 5 >= union:
                out[(a, b)] = (inter, union)
    return out


def model_simhash(text: str) -> int:
    toks = set(text.split())
    sig = 0
    for k in range(SIMHASH_BITS):
        votes = sum(1 if (h60(t) >> k) & 1 else -1 for t in toks)
        if votes > 0:
            sig |= 1 << k
    return sig


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs_strategy)
def test_ngram_pairs_match_python_model(spark, token_lists):
    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs(df).collect()
    }
    assert got == model_ngram_pairs(texts)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs_strategy)
def test_shingle_sets_match_python_model(spark, token_lists):
    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got: dict[int, set[str]] = {}
    for r in shingle_sets(df).collect():
        got.setdefault(r.doc_id, set()).add(r.s)
    assert got == {i: model_shingles(t) for i, t in enumerate(texts)}


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs_strategy)
def test_simhash_matches_python_model(spark, token_lists):
    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    assert got == {i: model_simhash(t) for i, t in enumerate(texts)}


def test_sample_split_matches_python_md5_model(spark):
    from downloader_spark.operators.extended import (
        SPLIT_BUCKETS,
        TRAIN_UPTO,
        sample_split,
    )
    from tests.conftest import SF_DIR

    rows = sample_split(spark, SF_DIR).collect()
    for r in rows:
        b = h60(f"split:{r.doc_id}") % SPLIT_BUCKETS
        split = "train" if b < TRAIN_UPTO else ("val" if b < TRAIN_UPTO + 10 else "test")
        assert (r.bucket, r.split) == (b, split)
    # deterministic across re-evaluation
    again = {r.doc_id: r.split for r in sample_split(spark, SF_DIR).collect()}
    assert again == {r.doc_id: r.split for r in rows}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs_strategy)
def test_minhash_pairs_subset_of_ngram_pairs(spark, token_lists):
    """Every LSH-found pair (Jaccard >= 0.5) must also be found by the
    exhaustive inverted-index method (threshold 0.2), with identical
    exact inter/union values — LSH may miss pairs, never invent or
    mis-measure them."""
    from downloader_spark.operators.llm_dedup import minhash_pairs

    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    mh = {
        (r.doc_a, r.doc_b): (r.inter_size, r.union_size)
        for r in minhash_pairs(df).collect()
    }
    ng = {
        (r.doc_a, r.doc_b): (r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs(df).collect()
    }
    for pair, iv in mh.items():
        assert pair in ng and ng[pair] == iv


def test_null_and_empty_text_are_handled_not_fatal(spark):
    """NULL text drops out of the shingle/signature pipelines (no rows,
    no crash); empty text contributes its single degenerate shingle.
    Pins the semantics so a refactor can't turn nulls into NPEs."""
    from downloader_spark.operators.llm_dedup import (
        ngram_jaccard_pairs,
        simhash_signatures,
    )

    df = spark.createDataFrame(
        [(0, "aa bb cc dd"), (1, None), (2, "")], "doc_id long, text string"
    )
    sh = {(r.doc_id, r.s) for r in shingle_sets(df).collect()}
    assert sh == {(0, "aa bb cc"), (0, "bb cc dd"), (2, "")}
    sigs = {r.doc_id for r in simhash_signatures(df).collect()}
    assert sigs == {0, 2}  # null-text doc produces no signature
    assert ngram_jaccard_pairs(df).count() == 0


# ------------------------------------------------------- event analytics

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),            # user_id
        st.integers(min_value=0, max_value=10_000),       # seconds offset
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


def _events_df(spark, rows):
    import datetime as dt

    # tz-aware base: PySpark's non-Arrow createDataFrame converts NAIVE
    # datetimes through the process-local timezone (time.mktime), so on
    # a non-UTC runner naive fixtures would shift every instant by the
    # local offset and the absolute cohort-hour keys below would move.
    # An aware datetime pins the instant regardless of runner TZ.
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    data = [
        (i, base + dt.timedelta(seconds=s), u, t, 1.0, "{}")
        for i, (u, s, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def model_funnel(rows, window_s=3600):
    """Per-cohort-hour funnel counts, keyed by the user's first-seen
    hour (whole hours since epoch, matching the operator's integer
    floor-division bucketing of the fixture's 2024-01-01 base)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    base_us = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    firsts: dict[tuple[int, str], int] = {}
    first_seen: dict[int, int] = {}
    for u, s, t in rows:
        k = (u, t)
        if k not in firsts or s < firsts[k]:
            firsts[k] = s
        if u not in first_seen or s < first_seen[u]:
            first_seen[u] = s
    out: dict[int, list[int]] = {}
    for u, s0 in first_seen.items():
        cohort = (base_us + s0 * 1_000_000) // 3_600_000_000
        acc = out.setdefault(cohort, [0, 0, 0, 0])
        acc[0] += 1
        tv = firsts.get((u, "view"))
        tc = firsts.get((u, "click"))
        tp = firsts.get((u, "purchase"))
        if tv is None:
            continue
        acc[1] += 1
        if tc is not None and tc > tv and tc - tv <= window_s:
            acc[2] += 1
            if tp is not None and tp > tc and tp - tc <= window_s:
                acc[3] += 1
    return {c: tuple(v) for c, v in out.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_events_funnel_matches_python_model(spark, rows):
    import downloader_spark.operators.pipeline_ext as px
    from downloader_spark.operators.pipeline_ext import events_funnel

    df = _events_df(spark, rows)
    orig = px.load_table
    px.load_table = lambda s, d, n: df
    try:
        got = events_funnel(spark, "ignored").collect()
    finally:
        px.load_table = orig
    assert {
        r.cohort_hour: (r.n_users, r.step_view, r.step_click, r.step_purchase)
        for r in got
    } == model_funnel(rows)


def model_retention(rows):
    # cohort_day/day_offset in whole days since epoch; base date fixed
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    epoch = dt.datetime(1970, 1, 1)
    day_of = lambda s: int(
        ((base + dt.timedelta(seconds=s)) - epoch).total_seconds() // 86400
    )
    first: dict[int, int] = {}
    for u, s, _t in rows:
        d = day_of(s)
        if u not in first or d < first[u]:
            first[u] = d
    cells: dict[tuple[int, int], set[int]] = {}
    for u, s, _t in rows:
        key = (first[u], day_of(s) - first[u])
        cells.setdefault(key, set()).add(u)
    return {k: len(v) for k, v in cells.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_events_retention_matches_python_model(spark, rows):
    import downloader_spark.operators.pipeline_ext as px
    from downloader_spark.operators.pipeline_ext import events_retention

    df = _events_df(spark, rows)
    orig = px.load_table
    px.load_table = lambda s, d, n: df
    try:
        got = {
            (r.cohort_day, r.day_offset): r.active_users
            for r in events_retention(spark, "ignored").collect()
        }
    finally:
        px.load_table = orig
    assert got == model_retention(rows)


def model_attribution(rows, lookback_s):
    """Pure-Python first/last-touch model: for each purchase at (s, id),
    touches are same-user view/click events with s' in
    [s - lookback, s - 1] (µs-range frame excludes the same instant),
    ordered by (s', id)."""
    out = {}
    for i, (u, s, t) in enumerate(rows):
        if t != "purchase":
            continue
        touches = sorted(
            (s2, j)
            for j, (u2, s2, t2) in enumerate(rows)
            if u2 == u and t2 in ("view", "click")
            and s - lookback_s <= s2 < s  # strict: frame ends at us-1
        )
        if touches:
            (fs, fj), (ls, lj) = touches[0], touches[-1]
            out[i] = (fj, rows[fj][2], lj, rows[lj][2], len(touches))
        else:
            out[i] = (None, None, None, None, 0)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_events_attribution_matches_python_model(spark, rows):
    import downloader_spark.operators.pipeline_ext as px
    from downloader_spark.operators.pipeline_ext import (
        ATTRIB_LOOKBACK_S,
        events_attribution,
    )

    df = _events_df(spark, rows)
    orig = px.load_table
    px.load_table = lambda s, d, n: df
    try:
        got = {
            r.event_id: (
                r.first_touch_id, r.first_touch_type,
                r.last_touch_id, r.last_touch_type, r.n_touches,
            )
            for r in events_attribution(spark, "ignored").collect()
        }
    finally:
        px.load_table = orig
    assert got == model_attribution(rows, ATTRIB_LOOKBACK_S)


def test_events_attribution_same_instant_touch_excluded(spark):
    """A view at the purchase's exact microsecond must NOT attribute
    (range frame ends at us-1) — in both the operator and the model."""
    import downloader_spark.operators.pipeline_ext as px
    from downloader_spark.operators.pipeline_ext import (
        ATTRIB_LOOKBACK_S,
        events_attribution,
    )

    rows = [(1, 500, "view"), (1, 500, "purchase"), (1, 100, "click")]
    df = _events_df(spark, rows)
    orig = px.load_table
    px.load_table = lambda s, d, n: df
    try:
        (r,) = events_attribution(spark, "ignored").collect()
    finally:
        px.load_table = orig
    assert (r.first_touch_id, r.last_touch_id, r.n_touches) == (2, 2, 1)
    assert model_attribution(rows, ATTRIB_LOOKBACK_S)[1] == (
        2, "click", 2, "click", 1
    )


# ------------------------------------------------------------- network LPM


def test_join_ip_prefix_matches_bruteforce_model(spark):
    """The ladder-explode LPM join vs a brute-force Python model that
    checks every (ip, prefix) containment pair — same md5 derivations,
    independent matching algorithm, run on synthetic tables small
    enough to enumerate."""
    import downloader_spark.operators.network as net

    def oct_(tag, key, mod):
        return h60(f"{tag}:{key}") % mod

    n_nation, n_supp, n_cust, n_part, n_orders = 9, 30, 120, 700, 300
    tables = {
        "nation": spark.createDataFrame(
            [(k,) for k in range(n_nation)], "n_nationkey long"
        ),
        "supplier": spark.createDataFrame(
            [(k,) for k in range(1, n_supp + 1)], "s_suppkey long"
        ),
        "customer": spark.createDataFrame(
            [(k,) for k in range(1, n_cust + 1)], "c_custkey long"
        ),
        "part": spark.createDataFrame(
            [(k,) for k in range(1, n_part + 1)], "p_partkey long"
        ),
        "orders": spark.createDataFrame(
            [(k,) for k in range(1, n_orders + 1)], "o_orderkey long"
        ),
    }
    orig = net.load_table
    net.load_table = lambda s, d, name: tables[name]
    try:
        got = {
            r.o_orderkey: (r.ip, r.matched_len, r.asn)
            for r in net.join_ip_prefix(spark, "ignored").collect()
        }
    finally:
        net.load_table = orig

    # model: build the dedup'd prefix dict then brute-check containment
    prefixes = {}  # (start, plen) -> min asn
    for k in range(n_nation):
        key = ((k % net._A_MOD) * 16777216, 8)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 1000 + k)
    for k in range(1, n_supp + 1):
        start = oct_("a16", k, net._A_MOD) * 16777216 + oct_("b16", k, net._B_MOD) * 65536
        key = (start, 16)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 20000 + k)
    for k in range(1, n_cust + 1):
        start = (
            oct_("a24", k, net._A_MOD) * 16777216
            + oct_("b24", k, net._B_MOD) * 65536
            + oct_("c24", k, net._C_MOD) * 256
        )
        key = (start, 24)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 300000 + k)
    for k in range(1, n_part + 1):  # off-octet /20 level, sparsified
        if k % 23:
            continue
        start = (
            oct_("a20", k, net._A_MOD) * 16777216
            + oct_("b20", k, net._B_MOD) * 65536
            + oct_("c20", k, 2) * 4096
        )
        key = (start, 20)
        prefixes[key] = min(prefixes.get(key, 1 << 62), 50000 + k)

    want = {}
    for k in range(1, n_orders + 1):
        ip = (
            oct_("a", k, net._A_MOD) * 16777216
            + oct_("b", k, net._B_MOD) * 65536
            + oct_("c", k, net._C_MOD) * 256
            + k % 256
        )
        best = None
        for (start, plen), asn in prefixes.items():
            span = 1 << (32 - plen)
            if start <= ip < start + span:  # true containment check
                if best is None or plen > best[0]:
                    best = (plen, asn)
        if best is not None:
            want[k] = (ip, best[0], best[1])
    assert got == want
    assert len(want) == n_orders  # every IP hits at least its /8
    # all depths hit, including the off-octet /20 a fixed ladder misses
    assert {v[1] for v in want.values()} == {8, 16, 20, 24}


# ---------------------------------------------------------------- round 6


def model_pack(docs, budget, shards):
    """Pure-Python concat-and-split packer: docs = [(doc_id, lang, n_tok)]."""
    out = {}
    streams = {}
    for doc_id, lang, n_tok in sorted(docs):
        key = (lang, doc_id % shards)
        cum = streams.get(key, 0) + n_tok
        streams[key] = cum
        start = (cum - n_tok) // budget
        end = (cum - 1) // budget
        out[doc_id] = (start, end, end - start)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.integers(min_value=1, max_value=300), min_size=3, max_size=30),
)
def test_pack_sequences_matches_python_model(spark, toks):
    from downloader_spark.operators.training_prep import PACK_BUDGET, PACK_SHARDS

    langs = ["en", "de", "fr"]
    rows = [
        (i, langs[i % len(langs)], " ".join(["w"] * n)) for i, n in enumerate(toks)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.createOrReplaceTempView("__pack_prop_docs")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = df.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).cast("long").alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    got = {
        r["doc_id"]: (
            (r["cum"] - r["n_tok"]) // PACK_BUDGET,
            (r["cum"] - 1) // PACK_BUDGET,
        )
        for r in c.collect()
    }
    expected = model_pack(
        [(i, langs[i % len(langs)], n) for i, n in enumerate(toks)],
        PACK_BUDGET,
        PACK_SHARDS,
    )
    assert got == {k: v[:2] for k, v in expected.items()}
