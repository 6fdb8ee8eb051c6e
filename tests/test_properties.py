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
