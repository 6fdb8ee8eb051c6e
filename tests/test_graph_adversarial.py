"""Adversarial-graph coverage for connected_components: graphs whose
diameter exceeds the propagation round budget (round-3 review item #8).

Near-dup clusters are shallow, so the propagation path's MAX_ROUNDS=15
is generous for real corpora — these tests pin what happens when that
assumption is violated: the strict mode raises (never a silent
non-fixpoint), and the default mode falls back to the O(log n)
large-star/small-star alternation and still returns exact components.
"""

from __future__ import annotations

import random

import pytest

from downloader_spark.operators.graph_ops import (
    MAX_ROUNDS,
    _star_components,
    connected_components,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def _components_model(pairs):
    """Union-find ground truth: node -> min node id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    return {n: min(g) for g in groups.values() for n in g}


def _chain(n, start=0):
    return [(start + i, start + i + 1) for i in range(n - 1)]


def test_long_chain_raises_in_strict_mode(spark):
    """Diameter 24 > MAX_ROUNDS: propagation cannot reach the fixpoint
    and must refuse rather than return split components."""
    assert MAX_ROUNDS == 15  # the fixture's premise
    df = _edges_df(spark, _chain(25))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, on_nonconverge="raise")


def test_long_chain_resolves_via_star_fallback(spark):
    """Default mode: same chain, exact components via the fallback."""
    df = _edges_df(spark, _chain(25))
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(25)}


def test_star_components_exact_on_random_graphs(spark):
    """_star_components vs union-find on random multi-component graphs
    (chains, stars, cliques, isolated edges, shuffled ids)."""
    rng = random.Random(42)
    pairs = []
    pairs += _chain(20, start=0)                      # long chain
    pairs += [(100, 100 + i) for i in range(1, 8)]     # star
    pairs += [(200 + i, 200 + j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(300, 301), (400, 401)]                  # isolated edges
    for _ in range(40):                                # random noise comp
        a, b = rng.sample(range(500, 560), 2)
        pairs.append((min(a, b), max(a, b)))
    df = _edges_df(spark, pairs)
    sym = (
        df.selectExpr("a as src", "b as dst")
        .union(df.selectExpr("b as src", "a as dst"))
        .distinct()
    )
    got = {r.node: r.cluster_id for r in _star_components(sym, parts=4).collect()}
    assert got == _components_model(pairs)


def test_star_and_propagation_agree_on_shallow_graph(spark):
    """On a shallow (realistic near-dup) graph both paths return the
    identical labeling — the fallback changes rescue behavior, never
    results, so the dedup_clusters key hash is unaffected."""
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)]
    df = _edges_df(spark, pairs)
    via_prop = {
        r.node: r.cluster_id
        for r in connected_components(df, on_nonconverge="raise").collect()
    }
    sym = (
        df.selectExpr("a as src", "b as dst")
        .union(df.selectExpr("b as src", "a as dst"))
        .distinct()
    )
    via_star = {r.node: r.cluster_id for r in _star_components(sym, parts=2).collect()}
    assert via_prop == via_star == _components_model(pairs)
