"""Registry-level contract checks, independent of query values.

The driver's correctness harness canonicalizes results with a pandas
sort + hash; complex-typed cells (arrays/maps/structs) crash it
(CORRECTNESS_r01: ``TypeError: unhashable type: 'list'`` on
``scalar_array``).  Guard every registered query's output schema so a
new operator can't reintroduce the failure mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from downloader_spark.plans.registry import registry
from tests.conftest import SF_DIR
from tests.par import chunk_ids, chunks, run_chunk

_SPECS = registry()


@pytest.mark.parametrize(
    "keys", chunks(_SPECS), ids=chunk_ids(_SPECS)
)
def test_output_schema_is_driver_hashable(spark, keys):
    def check(name: str) -> None:
        df = _SPECS[name].fn(spark, SF_DIR)
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ), (
                f"{name}.{f.name}: complex type {f.dataType} breaks the"
                " driver canonicalizer"
            )

    run_chunk(keys, check)


def test_every_key_has_unique_callable():
    assert len(_SPECS) == len({id(s.fn) for s in _SPECS.values()})


def test_every_key_documented_and_tagged():
    for name, spec in _SPECS.items():
        assert spec.doc, f"{name}: missing docstring"
        assert spec.tags, f"{name}: missing tags"
        assert spec.oracle is not None, f"{name}: missing oracle (rows-only keys read as errors in CORRECTNESS)"


def test_oracle_sql_references_only_registered_views():
    import re

    allowed = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, spec in _SPECS.items():
        tables = set(
            re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", spec.oracle, re.I)
        )
        # CTE names and function-style sources are fine; real table refs
        # must be registered driver views
        ctes = set(re.findall(r"([a-z_][a-z0-9_]*)\s+AS\s*\(", spec.oracle, re.I))
        funcs = {t for t in tables if f"{t}(" in spec.oracle.replace(" ", "")}
        unknown = tables - allowed - ctes - funcs - {"read_blob"}
        # alias references like "FROM pairs p" resolve to CTEs already
        assert not {u for u in unknown if u not in spec.oracle.lower()}, (
            f"{name}: oracle references unregistered tables {unknown}"
        )


def test_queries_rotation_puts_unconfirmed_keys_first(tmp_path, monkeypatch):
    """__spark_entry__.queries() orders least-recently-confirmed first.

    The driver verifies a bounded prefix of queries() per round, so the
    entry adapter must rotate: keys with no passing CORRECTNESS entry lead,
    then keys whose last pass is oldest.  Simulated with synthetic
    CORRECTNESS files in an isolated directory.
    """
    import importlib
    import json

    se = importlib.import_module("__spark_entry__")
    all_keys = list(_SPECS)
    r1 = {k: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
          for k in all_keys[:5]}
    # key 0 regressed in r2 (err) => its last PASS stays r1
    r2 = dict(r1)
    r2[all_keys[0]] = {"rows_match": False, "schema_match": True,
                       "hash_match": False, "err": "boom"}
    r2[all_keys[5]] = {"rows_match": True, "schema_match": True,
                       "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
    monkeypatch.setattr(se, "_HERE", str(tmp_path))

    ranked = list(se.queries())
    assert set(ranked) == set(all_keys)
    never = [k for k in all_keys if k not in set(all_keys[:6])]
    # never-confirmed first (in registry order), then r1-only, then r2
    assert ranked[: len(never)] == never
    r1_only = [all_keys[0]] + all_keys[1:5]
    assert set(ranked[len(never): len(never) + 5]) == set(r1_only)
    assert ranked[-1] == all_keys[5]


def test_queries_rotation_live_files_cover_unconfirmed_in_prefix():
    """With the repo's real CORRECTNESS history, every key not green in the
    latest round sits inside the driver's 50-key sample window."""
    import glob
    import importlib
    import json
    import os

    se = importlib.import_module("__spark_entry__")
    files = sorted(glob.glob(os.path.join(se._HERE, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver correctness files present")
    latest = json.load(open(files[-1]))
    green_latest = {
        k for k, r in latest.items()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    }
    ranked = list(se.queries())
    stale = [k for k in ranked if k not in green_latest]
    if len(stale) > 50:
        pytest.skip("more stale keys than one sample window; rotation still maximal")
    assert all(ranked.index(k) < 50 for k in stale)


def test_confirmation_freshness_within_rotation_horizon():
    """Driver-confirmation FRESHNESS gate (r10 verdict item 6): with
    50 keys sampled per round over a 260-key registry, a healthy
    least-recently-confirmed-first rotation re-confirms every key at
    least every ceil(260/50) + 1 = 6 rounds.  Assert no key's latest
    confirmation is older than that horizon unless it is already
    queued inside the next 50-key sample prefix (i.e. the debt drains
    next round by construction)."""
    import importlib

    se = importlib.import_module("__spark_entry__")
    last = se._last_confirmed_round()
    if not last:
        pytest.skip("no driver correctness files present")
    current = max(last.values())
    ranked = list(se.queries())
    horizon = -(-len(ranked) // 50) + 1  # ceil + 1 round of slack
    prefix = set(ranked[:50])
    overdue = [
        k
        for k in ranked
        if last.get(k, -1) < current - horizon + 1 and k not in prefix
    ]
    assert not overdue, (
        f"keys unconfirmed for > {horizon} rounds and not queued in the "
        f"next driver sample: {overdue}"
    )
    # and the prefix really is oldest-first: every key holding the
    # minimum confirmation round must be inside the sample window
    oldest = min(last.get(k, -1) for k in ranked)
    laggards = [k for k in ranked if last.get(k, -1) == oldest]
    if len(laggards) <= 50:
        assert all(k in prefix for k in laggards)


def test_udaf_salted_equals_direct(spark):
    """The salted two-phase pandas UDAF must produce exactly the direct
    GROUPED_AGG sums, per group, regardless of salt count — including
    under a skewed group (one lang with 10x the rows)."""
    import random

    from downloader_spark.operators.udfs import udaf_grouped_salted, _sum_chars

    rng = random.Random(3)
    rows = [(i, "hot", rng.randrange(1, 5000)) for i in range(5000)] + [
        (10_000 + i, f"cold{i % 7}", rng.randrange(1, 5000)) for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    direct = {
        r.lang: r.total
        for r in docs.groupBy("lang").agg(_sum_chars("n_chars").alias("total")).collect()
    }
    for n_salts in (1, 8, 32):
        salted = {
            r.lang: r.total_chars
            for r in udaf_grouped_salted(docs, n_salts=n_salts).collect()
        }
        assert salted == direct


def test_corr_degenerate_groups_yield_null_not_error(spark):
    """Spark 4 ANSI mode errors on double division by zero, so a
    single-doc or zero-variance group must take the NULL branch of the
    guard, never the division."""
    from downloader_spark.operators.analytics_ext import corr_stats

    docs = spark.createDataFrame(
        [
            (1, "a b", 3, "single"),       # one doc => zero variance
            (2, "x y", 3, "novar"),        # two docs, identical x and y
            (3, "p q", 3, "novar"),
            (4, "m n o", 5, "ok"),         # healthy group
            (5, "s", 1, "ok"),
        ],
        "doc_id long, text string, n_chars long, lang string",
    )
    rows = {r.lang: r for r in corr_stats(docs).collect()}
    assert rows["single"].corr_xy is None
    assert rows["single"].slope_yx is None
    assert rows["novar"].corr_xy is None
    assert rows["ok"].corr_xy is not None


def test_sign_buckets_short_embeddings_still_spread(spark):
    """zip_with NULL-pads mismatched lengths (it does not truncate):
    without explicit common-length slicing, every sub-64-dim vector
    would fold its hyperplane dots to NULL and land in bucket 0."""
    import random

    from downloader_spark.operators.llm_dedup import sign_buckets

    rng = random.Random(5)
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(16)]) for i in range(64)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sign_buckets(emb, sign_bits=8).groupBy("bucket").count().collect()
    assert len(got) > 10  # genuinely spread, not collapsed into bucket 0


def test_embed_pairs_zero_norm_vector_is_excluded_not_fatal(spark):
    from downloader_spark.operators.llm_dedup import embed_pairs

    rows = [
        (0, [1.0] * 16),
        (1, [1.0] * 16),      # near-identical of 0
        (2, [0.0] * 16),      # zero norm: undefined cosine
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_a, r.vec_b) for r in embed_pairs(emb, sign_bits=4).collect()}
    assert (0, 1) in got
    assert all(2 not in pair for pair in got)


def test_connected_components_long_chain_and_islands(spark):
    """Min-label propagation must converge past its per-round horizon:
    a 9-node chain has diameter 8 (several propagation rounds), and
    separate islands must keep distinct cluster ids."""
    from downloader_spark.operators.graph_ops import connected_components

    chain = [(i, i + 1) for i in range(10, 19)]          # 10..19 one component
    island = [(100, 101), (101, 102)]                    # 100..102
    pair = [(7, 3)]                                      # min id 3
    edges = spark.createDataFrame(chain + island + pair, "a long, b long")
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert {got[n] for n in range(10, 20)} == {10}
    assert {got[n] for n in (100, 101, 102)} == {100}
    assert got[7] == got[3] == 3
    assert len(got) == 10 + 3 + 2


def test_pipeline_corpus_dedup_keeps_min_doc_payload(spark):
    """The fixture has no duplicate texts, so the struct-min dedup's
    survivor selection is otherwise untested: with real duplicates the
    LOWEST doc_id must win and carry ITS OWN lang/quality payload."""
    import downloader_spark.operators.pipeline_ext as px

    good = "word " * 60 + "anchor ending text here now"  # passes the gate
    docs = spark.createDataFrame(
        [
            (5, good, "de", "s", len(good)),
            (2, good, "en", "s", len(good)),   # same text, lowest id
            (9, good, "fr", "s", len(good)),
            (3, good + " unique", "it", "s", len(good) + 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = px.load_table
    px.load_table = lambda s, d, n: docs
    try:
        rows = {r.doc_id: r for r in px.pipeline_corpus(spark, "x").collect()}
    finally:
        px.load_table = orig
    assert set(rows) == {2, 3}           # one survivor per content
    assert rows[2].lang == "en"           # the min doc's OWN payload
    assert rows[3].lang == "it"


@pytest.mark.parametrize(
    "keys", chunks(_SPECS), ids=chunk_ids(_SPECS)
)
def test_every_key_executes_on_tiny_sf(spark, keys):
    """EXECUTE every plan at sf0.001 — the smallest fixture surfaces
    empty groups, degenerate variances, and sparse joins that sf0.01
    never hits; under Spark's ANSI mode those turned into runtime
    DIVIDE_BY_ZERO crashes twice this round (dedup_embed, agg_corr).
    Building the plan (the schema test above) does not run it."""
    run_chunk(
        keys,
        lambda name: _SPECS[name]
        .fn(spark, SF_DIR)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
