"""Differential property tests for the round-12 algorithmic keys:
Spark plan vs an independent pure-Python model on random inputs
(hypothesis), per the repo's three-layer correctness strategy.

The algorithmic key of the round is ``dedup_suffix_spans`` — the
model below computes exact duplicated-L-gram coverage the OBVIOUS way
(a dict of every L-gram to its occurrence count, then interval
union), sharing nothing with the Spark side's per-partition suffix
arrays + advert/candidate reconciliation; random corpora with forced
repeats exercise within-partition runs, cross-partition singleton
pairs, and adjacent-interval merging.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _coverage_model(texts: list[str], L: int) -> set[tuple[int, int, int]]:
    """(doc_idx, span_start, span_end) merged coverage of duplicated
    L-grams, computed naively: count every gram globally, cover every
    position whose gram occurs >= 2 times, union adjacent windows."""
    from collections import Counter

    grams: Counter = Counter()
    for t in texts:
        for i in range(len(t) - L + 1):
            grams[t[i : i + L]] += 1
    out = set()
    for d, t in enumerate(texts):
        spans = []
        for i in range(len(t) - L + 1):
            if grams[t[i : i + L]] >= 2:
                lo, hi = i + 1, i + L  # 1-based inclusive
                if spans and lo <= spans[-1][1] + 1:
                    spans[-1] = (spans[-1][0], max(spans[-1][1], hi))
                else:
                    spans.append((lo, hi))
        for lo, hi in spans:
            out.add((d, lo, hi))
    return out


def _suffix_array_model(s: str) -> list[int]:
    return sorted(range(len(s)), key=lambda i: s[i:])


@given(
    st.lists(
        st.text(alphabet="ab", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=30, deadline=None)
def test_suffix_array_matches_naive_sort(texts):
    """The prefix-doubling suffix array must equal the naive
    sort-all-suffixes order, including across sentinel separators
    (ties impossible: suffixes of one string are distinct)."""
    import numpy as np

    from downloader_spark.operators.round12_ext import _suffix_array

    big = "\x01".join(texts) + "\x01"  # nonzero sentinel, still unique order
    arr = np.frombuffer(big.encode("utf-32-le"), np.uint32)
    got = _suffix_array(arr).tolist()
    assert got == _suffix_array_model(big)


corpus_strategy = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=60),
    min_size=2,
    max_size=10,
)


@given(corpus_strategy, st.data())
@settings(**_SETTINGS)
def test_dedup_suffix_spans_matches_naive_coverage(spark, texts, data):
    """Random corpora with planted repeats: the suffix-array plan's
    spans must equal the naive global-gram-count coverage model.  A
    small L (4) over a tiny alphabet forces dense collisions; a
    planted duplicate (one doc's slice copied into another) ensures
    cross-document coverage exists in most examples."""
    import downloader_spark.operators.round12_ext as r12

    L = 4
    # plant a cross-doc duplicate when any doc is long enough
    donors = [t for t in texts if len(t) >= L]
    if donors:
        src = donors[0]
        lo = data.draw(st.integers(0, len(src) - L))
        ln = data.draw(st.integers(L, min(len(src) - lo, 12)))
        texts = texts + [src[lo : lo + ln]]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    orig_l, orig = r12._SUF_L, r12.load_table
    r12._SUF_L = L
    r12.load_table = lambda s, d, n: df
    try:
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in r12.dedup_suffix_spans(spark, "ignored").collect()
        }
    finally:
        r12._SUF_L, r12.load_table = orig_l, orig
    assert got == _coverage_model(texts, L)


def test_suffix_spans_catch_what_shingles_miss(spark):
    """The VERDICT differential: a verbatim copied phrase SHORTER
    than dedup_substring_spans' floor (word 5-grams x 3-run = 7
    tokens) but >= _SUF_L chars.  The shingle key must report no pair
    for these docs; the suffix key must cover the copied span in
    both."""
    import downloader_spark.operators.round12_ext as r12
    from downloader_spark.operators.round6_ext import dedup_substring_spans
    import downloader_spark.operators.round6_ext as r6

    phrase = "quarterly revenue grew eleven percent"  # 5 tokens, 37 chars
    docs = [
        (1, "alpha beta gamma " + phrase + " delta epsilon zeta"),
        (2, "unrelated opening words here " + phrase + " and a closing"),
        (3, "completely different text with no duplication at all okay"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    orig6 = r6.load_table
    r6.load_table = lambda s, d, n: df
    try:
        pairs = dedup_substring_spans(spark, "ignored").collect()
    finally:
        r6.load_table = orig6
    assert pairs == [], "shingle floor should miss a 5-token span"

    orig12 = r12.load_table
    r12.load_table = lambda s, d, n: df
    try:
        spans = {
            (r.doc_id, r.span_start, r.span_end)
            for r in r12.dedup_suffix_spans(spark, "ignored").collect()
        }
    finally:
        r12.load_table = orig12
    covered_docs = {d for d, _, _ in spans}
    assert covered_docs == {1, 2}
    for d, lo, hi in spans:
        text = dict((i, t) for i, t in docs)[d]
        assert phrase in text[lo - 1 : hi]  # span covers the copy


@given(
    st.integers(0, 255),
    st.integers(0, 255),
    st.integers(0, 255),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_420_closed_form_per_macroblock(r, g, b):
    """One constant 16x16 macroblock through the REAL 4:2:0 byte path
    equals the pure integer closed form (YCbCr -> DC quant roundtrip
    at luma 16 / chroma 17 -> RGB), pixel-constant across the
    macroblock — the identity the oracle CTEs rely on."""
    import numpy as np

    from downloader_spark.media import (
        decode_jpeg_rgb,
        encode_jpeg_420,
    )

    img = np.full((16, 16, 3), (r, g, b), np.uint8)
    back = decode_jpeg_rgb(encode_jpeg_420(img, quality=50))

    def clamp(x):
        return max(0, min(255, x))

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    y = clamp(trunc_div(2990 * r + 5870 * g + 1140 * b + 5000, 10000))
    cb = clamp(trunc_div(-1687 * r - 3313 * g + 5000 * b + 1285000, 10000))
    cr = clamp(trunc_div(5000 * r - 4187 * g - 813 * b + 1285000, 10000))

    def dc_round(v, q00):
        x = 8 * (v - 128)
        dcq = (2 * x + q00) // (2 * q00) if x >= 0 else -((2 * -x + q00) // (2 * q00))
        return clamp((2 * dcq * q00 + 2056) // 16)

    y2, cb2, cr2 = dc_round(y, 16), dc_round(cb, 17), dc_round(cr, 17)
    r2 = clamp(trunc_div(1000000 * y2 + 1402000 * (cr2 - 128) + 500000, 1000000))
    g2 = clamp(
        trunc_div(
            1000000 * y2 - 344136 * (cb2 - 128) - 714136 * (cr2 - 128) + 500000,
            1000000,
        )
    )
    b2 = clamp(trunc_div(1000000 * y2 + 1772000 * (cb2 - 128) + 500000, 1000000))
    assert (back == np.array([r2, g2, b2], np.uint8)).all()


def _bfs_model(edges: set[tuple[int, int]], seeds: set[int], max_lvl: int):
    """Plain BFS over an undirected edge set."""
    from collections import deque

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    level = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        if level[n] >= max_lvl:
            continue
        for m in adj.get(n, ()):
            if m not in level:
                level[m] = level[n] + 1
                q.append(m)
    return level


@given(
    st.sets(
        st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_bfs_levels_match_queue_bfs(spark, edges):
    """The unrolled level-synchronous plan must equal a queue BFS on
    random graphs — first-visit anti-joins give MIN hop levels, and
    the level cap truncates identically.  The lineitem recipe is
    monkeypatched to a raw (order, supplier) table built so its
    co-order pairs realize exactly the random edge set (one synthetic
    order per edge, caps never bind)."""
    import downloader_spark.operators.round12_ext as r12

    rows = []
    for i, (u, v) in enumerate(sorted(edges)):
        rows.append((i, u, 50.0))
        rows.append((i, v, 50.0))
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_quantity double"
    )
    orig = r12.load_table
    r12.load_table = lambda s, d, n: li
    try:
        got = {
            r.node: r.level
            for r in r12.graph_bfs_levels(spark, "ignored").collect()
        }
    finally:
        r12.load_table = orig
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    seeds = {n for n in nodes if n % r12._BFS_SEED_MOD == 0}
    assert got == _bfs_model(edges, seeds, r12._BFS_MAX_LEVEL)


def test_suffix_and_shingle_forms_agree_on_long_planted_duplicate(spark):
    """The other half of the differential: a planted duplicate LONG
    enough for both detectors (>= 7 verbatim tokens for the shingle
    key's 5-gram x 3-run floor, >= 20 chars for the suffix key) must
    be reported by BOTH — the pair by the shingle index, covering
    spans in both docs by the suffix form."""
    import downloader_spark.operators.round12_ext as r12
    import downloader_spark.operators.round6_ext as r6

    phrase = (
        "the quick brown fox jumps over the lazy dog near the riverbank"
    )  # 12 tokens, 63 chars
    docs = [
        (1, "intro words before " + phrase + " trailing remark"),
        (2, "other framing text " + phrase + " different ending"),
        (3, "no duplication in this one at all whatsoever truly"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    orig6 = r6.load_table
    r6.load_table = lambda s, d, n: df
    try:
        pairs = {
            (r.doc_a, r.doc_b)
            for r in r6.dedup_substring_spans(spark, "ignored").collect()
        }
    finally:
        r6.load_table = orig6
    assert pairs == {(1, 2)}

    orig12 = r12.load_table
    r12.load_table = lambda s, d, n: df
    try:
        spans = {
            (r.doc_id, r.span_start, r.span_end)
            for r in r12.dedup_suffix_spans(spark, "ignored").collect()
        }
    finally:
        r12.load_table = orig12
    by_doc = {d: (lo, hi) for d, lo, hi in spans}
    assert set(by_doc) == {1, 2}
    for d, text in [(1, docs[0][1]), (2, docs[1][1])]:
        lo, hi = by_doc[d]
        assert phrase in text[lo - 1 : hi]
