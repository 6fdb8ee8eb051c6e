"""Degenerate-input robustness: EVERY registry key must execute on a
fully EMPTY corpus (zero-row tables, correct schemas) without raising.

At 100 TB empty inputs are routine — an empty partition, a filter
that kills a day's drop, a first run before any data lands — and an
operator that crashes on them (instead of returning an empty or
degenerate-but-typed result) takes the whole pipeline down.  The
sweep caught embed_kmeans' centroid init KeyError on an empty slice
(now seeded at the origin).
"""

from __future__ import annotations

import os

import pytest

from downloader_spark.plans.registry import registry
from tests.par import chunk_ids, chunks, run_chunk

_SPECS = registry()
_CHUNKS = chunks(_SPECS)
_IDS = chunk_ids(_SPECS)
_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory) -> str:
    """Zero-row copies of every driver table, schemas preserved
    (written by Spark itself — a pandas round-trip would erase the
    types of empty object columns)."""
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in _TABLES:
        raw = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        raw.limit(0).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


def _survives(spark, data_dir: str, name: str) -> None:
    df = _SPECS[name].fn(spark, data_dir)
    assert df.count() >= 0
    assert df.schema is not None


@pytest.mark.parametrize("keys", _CHUNKS, ids=_IDS)
def test_key_survives_empty_corpus(spark, empty_dir, keys):
    run_chunk(keys, lambda k: _survives(spark, empty_dir, k))


@pytest.fixture(scope="module")
def single_row_dir(spark, tmp_path_factory) -> str:
    """Exactly ONE row per table — the other degenerate pole: n=1
    denominators (n-1 variance terms, (n+1) DIV 2 medians), windows
    that never fill (7-day MAs, trailing frames), one-point k-means
    slices, single-doc shingle sets, a corpus where query and corpus
    halves of the embeddings split can't both be non-empty."""
    d = str(tmp_path_factory.mktemp("single_sf"))
    for t in _TABLES:
        raw = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        raw.limit(1).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize("keys", _CHUNKS, ids=_IDS)
def test_key_survives_single_row_corpus(spark, single_row_dir, keys):
    run_chunk(keys, lambda k: _survives(spark, single_row_dir, k))


_CLONES = 64


@pytest.fixture(scope="module")
def identical_dir(spark, tmp_path_factory) -> str:
    """The third degenerate pole: EVERY row byte-identical — one row
    per table replicated ``_CLONES``×.  Every document is an exact
    duplicate of every other (dedup fan-out collapses to ONE giant
    cluster — the pole that blows up any candidate generator without
    a df cap), every event shares one (user, type, ts) (ntile and
    rank see nothing but ties, sessionization sees one instant,
    seasonality one bucket), every embedding is one repeated point
    (k-means slices are all-coincident, every pairwise cosine is 1),
    and all group-by keys have exactly one group."""
    d = str(tmp_path_factory.mktemp("identical_sf"))
    for t in _TABLES:
        raw = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        clones = raw.limit(1).crossJoin(spark.range(_CLONES)).drop("id")
        clones.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize("keys", _CHUNKS, ids=_IDS)
def test_key_survives_identical_corpus(spark, identical_dir, keys):
    run_chunk(keys, lambda k: _survives(spark, identical_dir, k))
