"""Differential property tests for the round-11 algorithmic keys:
Spark plan vs an independent pure-Python model on random inputs
(hypothesis), per the repo's three-layer correctness strategy.

``text_bpe_train_steps`` is the algorithmic key of the round — the
model below reimplements weighted BPE training (pair counting over
the vocab, argmax with lexicographic tie-break, greedy left-to-right
merging) from the Sennrich et al. description, sharing no code with
the Spark side's replace()-driven rewrite.  Tiny alphabets force
frequency TIES, so the tie-break order is genuinely exercised.
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bpe_model(words: list[str], steps: int) -> list[tuple]:
    vocab = Counter(
        w for w in words if len(w) >= 2 and re.fullmatch("[a-z]+", w)
    )
    seqs = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, steps + 1):
        pc: Counter = Counter()
        for w, nw in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += nw
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, n))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


words_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(words_strategy)
def test_bpe_train_steps_matches_python_model(spark, words):
    import downloader_spark.operators.round11_ext as r11

    df = spark.createDataFrame(
        [(0, " ".join(words), "en", "s", len(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = r11.load_table
    r11.load_table = lambda s, d, n: df
    try:
        got = [
            (r.step, r.sym_a, r.sym_b, r.merged, r.n)
            for r in r11.text_bpe_train_steps(spark, "ignored")
            .orderBy("step")
            .collect()
        ]
    finally:
        r11.load_table = orig
    assert got == _bpe_model(words, r11._BPE_STEPS)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 5)),  # (order, supplier)
        min_size=1,
        max_size=50,
    )
)
def test_resource_alloc_matches_python_model(spark, rows):
    """RA index vs a brute-force model over a tiny co-occurrence
    graph (the lineitem edge recipe monkeypatched to raw pairs)."""
    import downloader_spark.operators.round11_ext as r11
    from downloader_spark.operators.round9b_ext import (
        _CN_MIN,
        _KCORE_ORDER_CAP,
    )

    li = spark.createDataFrame(
        [(ok, s, 50.0) for ok, s in rows],
        "l_orderkey long, l_suppkey long, l_quantity double",
    )
    orig = r11.load_table
    r11.load_table = lambda s, d, n: li
    try:
        got = {
            (r.u, r.v): (r.common, r.ra_upm, r.already_linked)
            for r in r11.graph_resource_alloc(spark, "ignored").collect()
        }
    finally:
        r11.load_table = orig

    # model: same cap, undirected edges, RA = sum 1e6 // deg(z)
    by_order: dict = {}
    for ok, s in set(rows):
        by_order.setdefault(ok, set()).add(s)
    edges = set()
    for members in by_order.values():
        if len(members) > _KCORE_ORDER_CAP:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                edges.add((ms[i], ms[j]))
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expect = {}
    nodes = sorted(nbrs)
    for i in range(len(nodes)):
        for j in range(i + 1, len(nodes)):
            u, v = nodes[i], nodes[j]
            shared = nbrs[u] & nbrs[v]
            if len(shared) >= _CN_MIN:
                ra = sum(1_000_000 // len(nbrs[z]) for z in shared)
                expect[(u, v)] = (len(shared), ra, (u, v) in edges)
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 3)),  # (user, type)
        min_size=2,
        max_size=60,
    )
)
def test_markov_stationary_matches_python_model(spark, rows):
    """Fixed-point power iteration vs a pure-Python model: per-term
    floor, ppm transition matrix, uniform ppm start — bit-equal."""
    import datetime as dt

    import downloader_spark.operators.round11_ext as r11

    base = dt.datetime(2024, 1, 1)
    ev = [
        (i, base + dt.timedelta(minutes=i), uid, f"t{t}", 1.0, None)
        for i, (uid, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = r11.load_table
    r11.load_table = lambda s, d, n: df
    try:
        got = {
            r.event_type: r.stationary_ppm
            for r in r11.events_markov_stationary(spark, "ignored").collect()
        }
    finally:
        r11.load_table = orig

    # model
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for i, (uid, t) in enumerate(rows):
        by_user[uid].append((i, f"t{t}"))  # ts order == event_id order
    counts: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    if not counts:
        assert got == {}
        return
    totals: Counter = Counter()
    for (a, _), n in counts.items():
        totals[a] += n
    p = {(a, b): n * 1_000_000 // totals[a] for (a, b), n in counts.items()}
    states = sorted(totals)
    v = {s: 1_000_000 // len(states) for s in states}
    for _ in range(r11._MK_ITERS):
        nv: Counter = Counter()
        for (a, b), ppm in p.items():
            if a in v:
                nv[b] += v[a] * ppm // 1_000_000
        v = dict(nv)
    assert got == v


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (type, user)
        min_size=1,
        max_size=80,
    )
)
def test_hll_distinct_matches_python_model(spark, rows):
    """The relational HyperLogLog vs a from-scratch Python model (own
    md5 hashing, own register fold, own integer estimator) — every
    emitted column bit-equal, including the HUGEINT-range raw
    estimate."""
    import datetime as dt
    import hashlib

    import downloader_spark.operators.round11_ext as r11

    base = dt.datetime(2024, 1, 1)
    ev = [
        (i, base, uid, f"t{t}", 1.0, None) for i, (t, uid) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = r11.load_table
    r11.load_table = lambda s, d, n: df
    try:
        got = {
            r.event_type: (r.n_exact, r.sum_scaled, r.n_zero, r.hll_raw_est)
            for r in r11.agg_hll_distinct(spark, "ignored").collect()
        }
    finally:
        r11.load_table = orig

    m, wbits, a1e4 = r11._HLL_M, r11._HLL_WBITS, r11._HLL_ALPHA_1E4
    expect = {}
    by_type: dict = {}
    for t, uid in rows:
        by_type.setdefault(f"t{t}", set()).add(uid)
    for et, users in by_type.items():
        regs = [0] * m
        for uid in users:
            h = int(hashlib.md5(f"hll:{uid}".encode()).hexdigest()[:15], 16)
            bucket, w = h % m, h // m
            rank = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
            regs[bucket] = max(regs[bucket], rank)
        sum_scaled = sum(1 << (wbits + 1 - r) for r in regs)
        n_zero = sum(1 for r in regs if r == 0)
        est = (a1e4 * m * m * (1 << (wbits + 1))) // (10000 * sum_scaled)
        expect[et] = (len(users), sum_scaled, n_zero, est)
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 2_000_000_000), min_size=1, max_size=60)
)
def test_group_split_never_leaks_and_matches_hash_model(spark, users):
    """GroupKFold integrity on adversarial user ids: every user's
    events land in ONE fold, the fold matches the md5 model, and the
    audit column is 0."""
    import hashlib

    import downloader_spark.operators.round11_ext as r11

    ev = [(i, uid) for i, uid in enumerate(users * 2)]  # 2 events/user
    df = spark.createDataFrame(ev, "event_id long, user_id long")
    orig = r11.load_table
    r11.load_table = lambda s, d, n: df
    try:
        rows = r11.sample_group_split(spark, "ignored").collect()
    finally:
        r11.load_table = orig
    assert all(r.n_leaky_users == 0 for r in rows)
    # fold model: md5-derived 60-bit hash mod k per USER
    k = r11._GS_FOLDS
    folds = {}
    for uid in set(users):
        h = int(hashlib.md5(f"fold:{uid}".encode()).hexdigest()[:15], 16)
        folds.setdefault(h % k, set()).add(uid)
    expect = {
        f: (len(us), sum(2 for u in users if u in us and True))
        for f, us in folds.items()
    }
    # per-fold event counts: each occurrence of a user contributes 2
    from collections import Counter

    occ = Counter(users)
    expect = {
        f: (len(us), sum(occ[u] * 2 for u in us)) for f, us in folds.items()
    }
    got = {r.fold: (r.n_users, r.n_events) for r in rows}
    assert got == expect
