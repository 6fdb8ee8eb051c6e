"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §1.4/D4: the reference's per-source watermark is exactly this
kind of keyed incremental state, advanced batch by batch at
routeviews.go:60-62).

``running_totals`` maintains per-key cumulative (count, sum) across
micro-batches — the canonical custom-state shape Spark's built-in
aggregations can't express when the update logic grows conditions
(per-key thresholds, custom eviction, ...).  State is a tiny tuple
per key in the state store, partitioned on the group key — the same
hash distribution every batch aggregation in this repo shuffles on.

Validated by equivalence: after draining a multi-batch backlog, the
last emitted row per key must equal the batch groupBy answer
(tests/test_streaming_equivalence.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n long, total double"
STATE_SCHEMA = "n long, total double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) across micro-batches.
    Emits the updated running totals for every key seen in the batch
    (output mode: update)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = "user_id long, n long, ewma_cents long"
EWMA_STATE_SCHEMA = "n long, ewma long"


def fold_ewma(values, n: int = 0, ewma: int = 0) -> tuple[int, int]:
    """The recursive integer EWMA fold: e' = (e + floor(v*100)) // 2,
    seeded by the first observation.  This is the pure-Python
    reference model shared by the streaming stateful operator (below)
    and the ``stream_ewma`` batch twin
    (operators/round9_ext.py) — the twin's property test
    (tests/test_properties_r9.py) asserts both engines against this
    fold.  Python ``//`` floors like the twin's pmod-floor Spark
    arithmetic (asserted on negatives too); DuckDB's ``//`` truncates
    toward zero, but the fold state is non-negative (value >= 0), and
    floor == truncate there — so the oracle agrees as well."""
    for v in values:
        cents = int(v * 100 // 1)
        ewma = cents if n == 0 else (ewma + cents) // 2
        n += 1
    return n, ewma


def _ewma_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Recursive integer EWMA (alpha = 1/2): e' = (e + v) DIV 2,
    seeded by the first observation.  Rows are folded in event-time
    order WITHIN each micro-batch (sorted on (ts, event_id));
    cross-batch order is the arrival order — correct whenever
    upstream delivers in event-time order (the micro-batched backlog
    drain), and the documented approximation otherwise (a true
    out-of-order-safe EWMA needs per-key reordering buffers keyed
    off the watermark).

    The group's batch may arrive as MULTIPLE Arrow chunks
    (spark.sql.execution.arrow.maxRecordsPerBatch splits large
    groups), and chunk boundaries fall at arbitrary post-shuffle
    positions — so the chunks are concatenated BEFORE the single
    sort+fold; sorting each chunk independently would make the fold
    order (hence the recursive result) nondeterministic for groups
    larger than one chunk."""
    n, ewma = state.get if state.exists else (0, 0)
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        n, ewma = fold_ewma(pdf["value"], n, ewma)
    state.update((n, ewma))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "ewma_cents": [ewma]}
    )


def streaming_ewma(events: DataFrame) -> DataFrame:
    """Per-user recursive EWMA across micro-batches — the stateful
    smoother whose recursion (each output depends on ALL prior
    inputs) no built-in streaming aggregation expresses; the state
    is two integers per key."""
    return events.groupBy("user_id").applyInPandasWithState(
        _ewma_update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HOLT_OUTPUT_SCHEMA = (
    "user_id long, n long, level_cents long, trend_cents long,"
    " forecast_cents long"
)
HOLT_STATE_SCHEMA = "k long, l long, b long"


def _tdiv2(x: int) -> int:
    """Integer division by 2 TRUNCATING toward zero — Spark ``DIV``
    and DuckDB 1.0 ``//`` semantics (Python ``//`` floors, which
    differs on negatives; the Holt trend state does go negative)."""
    q = abs(x) // 2
    return q if x >= 0 else -q


def fold_holt(cents, k: int = 0, l: int = 0, b: int = 0) -> tuple[int, int, int]:
    """The two-state Holt linear fold (alpha = beta = 1/2, exact
    integer cents), the pure-Python reference model shared by the
    streaming stateful operator below and the ``ts_holt_linear``
    batch twin (operators/round9b_ext.py):

        l' = (c + l + b) div 2     b' = ((l' - l) + b) div 2

    seeded l = first observation, b = 0.  ``div`` truncates toward
    zero on all three engines (Spark DIV, DuckDB //, _tdiv2 here) —
    the trend state dips negative on falling series, where floor and
    truncate genuinely differ."""
    for c in cents:
        c = int(c)
        if k == 0:
            l, b = c, 0
        else:
            l2 = _tdiv2(c + l + b)
            b = _tdiv2(l2 - l + b)
            l = l2
        k += 1
    return k, l, b


def _holt_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keyed Holt level+trend state advanced per micro-batch.  Same
    chunk discipline as ``_ewma_update``: one group's batch may span
    several Arrow chunks with arbitrary post-shuffle row order, so the
    chunks are concatenated and sorted ONCE on (ts, event_id) before
    the sequential fold — per-chunk sorting would make the recursion
    nondeterministic for groups larger than one chunk."""
    k, l, b = state.get if state.exists else (0, 0, 0)
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        cents = (pdf["value"] * 100).apply(lambda v: int(v // 1))
        k, l, b = fold_holt(cents, k, l, b)
    state.update((k, l, b))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [k],
            "level_cents": [l],
            "trend_cents": [b],
            "forecast_cents": [l + b],
        }
    )


def streaming_holt(events: DataFrame) -> DataFrame:
    """Per-user Holt linear (level + trend) smoother across
    micro-batches — the two-state generalization of
    ``streaming_ewma``; state is three integers per key, and the
    final drained state must equal the ``ts_holt_linear`` batch twin
    (tests/test_streaming_equivalence.py)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _holt_update,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOPK_K = 3
TOPK_OUTPUT_SCHEMA = "user_id long, n_seen long, top_cents array<long>"
TOPK_STATE_SCHEMA = "n_seen long, tops array<long>"


def fold_topk(cents, n_seen: int = 0, tops: list | None = None) -> tuple:
    """Bounded per-key top-k state: keep the TOPK_K largest integer
    cent values seen so far (descending, ties keep duplicates — it's
    a multiset of values, not of rows).  The pure-Python reference
    shared by the streaming operator below and its batch-equivalence
    test: custom bounded-state EVICTION is exactly the update logic
    built-in streaming aggregations cannot express."""
    tops = list(tops or [])
    for c in cents:
        tops.append(int(c))
        tops.sort(reverse=True)
        del tops[TOPK_K:]
        n_seen += 1
    return n_seen, tops


def _topk_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_seen, tops = state.get if state.exists else (0, [])
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        cents = (pdf["value"] * 100).apply(lambda v: int(v // 1))
        n_seen, tops = fold_topk(cents, n_seen, list(tops))
    state.update((n_seen, list(tops)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_seen": [n_seen], "top_cents": [list(tops)]}
    )


def streaming_user_topk(events: DataFrame) -> DataFrame:
    """Per-user TOP-K (K = ``TOPK_K``) largest event values across
    micro-batches — bounded custom state (K longs per key) with
    explicit eviction, the state shape dropDuplicates/windowed aggs
    can't hold.  Order of arrival does not matter (max-multiset is
    commutative), so no per-batch sort discipline is needed, unlike
    the EWMA/Holt folds."""
    return events.groupBy("user_id").applyInPandasWithState(
        _topk_update,
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- stateful sketch twin: per-key HyperLogLog registers as state ------

# mirrors operators/round11_ext.py's exact-register HLL (m = 64,
# p = 6, 54 rank bits, md5-derived 60-bit hash) — same constants, so
# the stateful stream and the batch key are bit-identical
_HLL_M = 64
_HLL_WBITS = 54
_HLL_ALPHA_1E4 = 7093

HLL_OUTPUT_SCHEMA = (
    "event_type string, sum_scaled long, n_zero int, hll_raw_est long"
)
HLL_STATE_SCHEMA = "regs array<int>"


def _hll_h60(user_id: int) -> int:
    """The _spark_h60('hll:' || user_id) mapping in Python: md5 is
    identical across Spark, DuckDB, and hashlib, so the stateful
    stream hashes into EXACTLY the registers the batch key fills."""
    import hashlib

    return int(
        hashlib.md5(f"hll:{user_id}".encode()).hexdigest()[:15], 16
    )


def _hll_fold_regs(regs: list[int]) -> tuple[int, int, int]:
    """(sum_scaled, n_zero, raw_est) from a register list (0 =
    never-hit bucket, contributing the full 2^55 term)."""
    sum_scaled = sum(1 << (_HLL_WBITS + 1 - m) for m in regs)
    n_zero = sum(1 for m in regs if m == 0)
    num = _HLL_ALPHA_1E4 * _HLL_M * _HLL_M * (1 << (_HLL_WBITS + 1))
    return sum_scaled, n_zero, num // (10000 * sum_scaled)


def _hll_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    regs = list(state.get[0]) if state.exists else [0] * _HLL_M
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            h = _hll_h60(int(uid))
            b, w = h % _HLL_M, h // _HLL_M
            r = (_HLL_WBITS + 1) - w.bit_length() if w else _HLL_WBITS + 1
            if r > regs[b]:
                regs[b] = r
    state.update((regs,))
    s, z, est = _hll_fold_regs(regs)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "sum_scaled": [s],
            "n_zero": [z],
            "hll_raw_est": [est],
        }
    )


def streaming_hll(events: DataFrame) -> DataFrame:
    """Per-event-type HyperLogLog maintained as PER-KEY STATE in the
    state store (``applyInPandasWithState``) — the stateful-operator
    form of the sketch family, complementing the foreachBatch
    register-table form (streaming/incremental_dedup.py's
    IncrementalHll): there the mergeable artifact is a parquet table
    unioned across batches; here it IS the state-store row (one
    64-int register array per key, hash-partitioned on the group key
    like every batch aggregation).  Emits the refreshed sketch per
    key per batch (update mode); after a backlog drain the last row
    per key is bit-identical to the batch key's fold
    (tests/test_streaming_equivalence.py)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _hll_update,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- stateful sketch twin: per-key KMV (k-minimum-values) as state -----

# mirrors operators/round7_ext.py's agg_kmv_distinct (k = 16, 60-bit
# md5 'kmv:'-tagged hash, (k-1)*2^59 DIV h_k * 2 estimator) — same
# constants and hash, so the stateful stream and the batch key agree
# bit-for-bit on the sketch AND the estimate
_KMV_K = 16

KMV_OUTPUT_SCHEMA = (
    "event_type string, n_in_sketch long, h_k long, kmv_estimate long"
)
KMV_STATE_SCHEMA = "hs array<long>"


def _kmv_h60(user_id: int) -> int:
    """The _spark_h60('kmv:' || user_id) mapping in Python (md5 is
    identical across Spark, DuckDB, and hashlib)."""
    import hashlib

    return int(
        hashlib.md5(f"kmv:{user_id}".encode()).hexdigest()[:15], 16
    )


def _kmv_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    hs = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            hs.add(_kmv_h60(int(uid)))
    # k smallest of (k smallest of old ∪ new) == k smallest of all
    # seen — the KMV merge law that makes truncated state sufficient
    sk = sorted(hs)[:_KMV_K]
    state.update((sk,))
    n, h_k = len(sk), sk[-1]
    if n < _KMV_K or h_k < _KMV_K:
        est = n  # sketch holds every distinct hash: exact
    else:
        est = (_KMV_K - 1) * (1 << 59) // h_k * 2
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_in_sketch": [n],
            "h_k": [h_k],
            "kmv_estimate": [est],
        }
    )


def streaming_kmv(events: DataFrame) -> DataFrame:
    """Per-event-type KMV distinct sketch maintained as PER-KEY STATE
    (``applyInPandasWithState``) — the stateful-operator form of
    agg_kmv_distinct, the way streaming_hll is the stateful form of
    agg_hll_distinct: the k-smallest-hash set IS the state-store row
    (<= k BIGINTs per key), truncation-mergeable across batches, so a
    restart resumes the sketch exactly.  Emits the refreshed sketch
    per key per batch (update mode); h_k only falls and n_in_sketch
    only rises, so the final row per key after a backlog drain equals
    the batch key's one-shot sketch over all events."""
    return events.groupBy("event_type").applyInPandasWithState(
        _kmv_update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- exponential-histogram sketch as state (round 13b) -----------------

EXPH_OUTPUT_SCHEMA = (
    "event_type string, n_events long, n_buckets long,"
    " p50_lb_qc long, p90_lb_qc long, p99_lb_qc long"
)
EXPH_STATE_SCHEMA = "buckets array<long>, counts array<long>"


def _exph_bucket(value: float) -> int:
    """The agg_exp_histogram bucket mapping in Python: quarter-octave
    log2 over value-in-cents, octave via int.bit_length (the same
    exact integer math as length(bin(v)) - 1)."""
    vc = max(1, int(value * 100 // 1))
    k = vc.bit_length() - 1
    sub = vc * 4 // (1 << k) - 4
    return 4 * k + sub


def _exph_lb_qc(bucket: int) -> int:
    k, sub = divmod(bucket, 4)
    return (1 << k) * (4 + sub)


def _exph_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        buckets, counts = state.get
        hist = dict(zip(buckets, counts))
    else:
        hist = {}
    for pdf in pdfs:
        for v in pdf["value"]:
            b = _exph_bucket(float(v))
            hist[b] = hist.get(b, 0) + 1
    total = sum(hist.values())
    if total == 0:
        # zero rows and no prior state: nothing to emit, and writing
        # empty arrays would clobber the (absent) state for no reason
        return
    items = sorted(hist.items())
    state.update(([b for b, _ in items], [c for _, c in items]))
    out = {"event_type": [key[0]], "n_events": [total], "n_buckets": [len(items)]}
    cum = 0
    targets = {p: (total * p + 99) // 100 for p in (50, 90, 99)}
    found: dict[int, int] = {}
    for b, c in items:
        cum += c
        for p, t in targets.items():
            if p not in found and cum >= t:
                found[p] = _exph_lb_qc(b)
    for p in (50, 90, 99):
        out[f"p{p}_lb_qc"] = [found[p]]
    yield pd.DataFrame(out)


def streaming_exp_histogram(events: DataFrame) -> DataFrame:
    """Per-event-type EXPONENTIAL HISTOGRAM maintained as PER-KEY
    STATE (``applyInPandasWithState``) — the stateful-operator form
    of agg_exp_histogram, the way streaming_kmv is the stateful form
    of agg_kmv_distinct: the (bucket, count) arrays ARE the
    state-store row, trivially mergeable (bucket-wise sum) across
    batches and restarts, and every emitted row re-derives
    p50/p90/p99 from the cumulative bucket walk with the identical
    integer ceil((n*p)/100) targets — so after a backlog drain the
    final row per key equals the batch key's answer bit-for-bit.
    This is how percentile dashboards stay incremental at 100 TB:
    the raw values are never retained, only ~120 bucket counts per
    key."""
    return events.groupBy("event_type").applyInPandasWithState(
        _exph_update,
        outputStructType=EXPH_OUTPUT_SCHEMA,
        stateStructType=EXPH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
