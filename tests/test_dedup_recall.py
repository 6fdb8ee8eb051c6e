"""Recall/behavior tests for the near-dup suite on planted duplicates.

The oracle-parity tests prove Spark and DuckDB compute the same
algorithm; these prove the algorithm actually FINDS near-duplicates —
planted pairs with known similarity structure must surface.
Mirrors the reference's table-driven fixture style
(/root/reference/download/common_test.go:101-188).
"""

from __future__ import annotations

import random

import pytest

from downloader_spark.operators.llm_dedup import (
    embed_pairs,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _mk_docs(spark):
    rng = random.Random(7)
    rows = []
    # 10 random base docs
    for i in range(10):
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(40))))
    # plant near-dups of docs 0..4: copy with ONE token swapped
    for i in range(5):
        toks = rows[i][1].split()
        toks[20] = "zulu"
        rows.append((100 + i, " ".join(toks)))
    # plant one exact dup of doc 5
    rows.append((200, rows[5][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def planted(spark):
    return _mk_docs(spark)


def test_minhash_finds_planted_pairs(planted):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_pairs(planted).collect()
    }
    for i in range(5):
        assert (i, 100 + i) in pairs, f"planted near-dup ({i},{100+i}) missed"
    assert (5, 200) in pairs, "exact dup missed"


def test_ngram_jaccard_finds_planted_pairs_with_exact_similarity(planted):
    rows = {(r.doc_a, r.doc_b): r for r in ngram_jaccard_pairs(planted).collect()}
    for i in range(5):
        r = rows[(i, 100 + i)]
        # one swapped token kills <= 3 of ~38 shingles
        assert r.jacc_ppm > 700_000, r
    exact = rows[(5, 200)]
    assert exact.inter_size == exact.union_size
    assert exact.jacc_ppm == 1_000_000


def test_simhash_near_for_planted_far_for_random(planted):
    sig = {r.doc_id: r.simhash for r in simhash_signatures(planted).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    # exact dup -> identical signature
    assert ham(sig[5], sig[200]) == 0
    # one-token swap -> small hamming distance
    for i in range(5):
        assert ham(sig[i], sig[100 + i]) <= 12
    # distinct random docs share vocabulary but differ in token SETS ->
    # strictly larger distance than the single-token-swap pairs on average
    planted_d = sum(ham(sig[i], sig[100 + i]) for i in range(5)) / 5
    random_d = sum(ham(sig[i], sig[j]) for i in range(5) for j in range(6, 10)) / 20
    assert planted_d < random_d


def test_embed_pairs_finds_planted_neighbors(spark):
    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant near-identical copies (tiny perturbation, same signs)
    for i in range(3):
        rows.append((100 + i, [float(x * 1.01) for x in base[i]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_a, r.vec_b): r.cos_ppm for r in embed_pairs(df).collect()}
    for i in range(3):
        assert got[(i, 100 + i)] >= 999_000, got


def test_duck_dot_guard_matches_spark_on_empty_embedding():
    """ADVICE r4: DuckDB's list_reduce raises on an empty list while
    Spark's aggregate(..., 0.0, ...) folds it to 0.0; the _DUCK_DOT
    guard must make a zero-length embedding degrade to 0.0 (and thus
    be dropped by the norm != 0 filter) instead of erroring the whole
    oracle."""
    import duckdb

    from downloader_spark.operators import llm_dedup, llm_similarity

    con = duckdb.connect()
    for mod in (llm_dedup, llm_similarity):
        val = con.execute(
            "SELECT "
            + mod._DUCK_DOT.format(a="[]::DOUBLE[]", b="[]::DOUBLE[]")
        ).fetchone()[0]
        assert val == 0.0, mod.__name__
    con.close()


def test_dedup_embed_oracle_survives_empty_embedding(spark, tmp_path):
    """End-to-end: the dedup_embed oracle SQL and the Spark pipeline
    both run on a corpus CONTAINING a zero-length embedding and agree
    exactly (the empty vector is norm-filtered on both engines)."""
    import duckdb

    from downloader_spark.operators.llm_dedup import SIGN_BITS
    from downloader_spark.plans.registry import registry
    from tests.oracle import assert_matches_oracle

    rng = random.Random(23)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(6)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((100, [float(x * 1.01) for x in base[0]]))  # planted near-dup
    rows.append((999, []))  # zero-length embedding: must not error
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pq = str(tmp_path / "embeddings_parquet")
    df.coalesce(1).write.parquet(pq)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    spec = registry()["dedup_embed"]
    got = embed_pairs(spark.read.parquet(pq), sign_bits=SIGN_BITS)
    assert_matches_oracle(got, con, spec.oracle, "dedup_embed_empty_vec")
    assert got.filter("vec_a = 999 OR vec_b = 999").count() == 0
    con.close()
