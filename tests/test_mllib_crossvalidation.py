"""Cross-validation against MLlib's MinHashLSH: the stock
implementation (random hash families, approxSimilarityJoin) must
agree with our deterministic pipeline on the planted near-dup
structure — same ground truth recovered by two independent LSH
implementations.

Gated on pyspark.ml availability (import-try per repo policy).
"""

from __future__ import annotations

import pytest

from downloader_spark.operators.llm_dedup import minhash_pairs
from tests.test_dedup_recall import _mk_docs

try:
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    HAVE_ML = True
except Exception:  # pragma: no cover
    HAVE_ML = False


@pytest.mark.skipif(not HAVE_ML, reason="pyspark.ml unavailable")
def test_mllib_minhash_agrees_on_planted_pairs(spark):
    from pyspark.sql import functions as F

    planted = _mk_docs(spark)
    # ours
    ours = {(r.doc_a, r.doc_b) for r in minhash_pairs(planted).collect()}

    # MLlib: shingle -> CountVectorizer (binary) -> MinHashLSH join
    docs = planted.select(
        "doc_id",
        F.expr(
            """array_distinct(transform(
                 sequence(0, greatest(size(split(text, ' ')) - 3, 0)),
                 i -> concat_ws(' ', split(text, ' ')[i],
                                split(text, ' ')[i+1], split(text, ' ')[i+2])))"""
        ).alias("sh"),
    )
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True)
    model = cv.fit(docs)
    feats = model.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=7)
    lsh_model = lsh.fit(feats)
    joined = lsh_model.approxSimilarityJoin(feats, feats, 0.5, distCol="jd")
    mllib = {
        (int(r.datasetA.doc_id), int(r.datasetB.doc_id))
        for r in joined.collect()
        if r.datasetA.doc_id < r.datasetB.doc_id
    }
    # both implementations must recover every planted pair
    expected = {(i, 100 + i) for i in range(5)} | {(5, 200)}
    assert expected <= ours
    assert expected <= mllib
