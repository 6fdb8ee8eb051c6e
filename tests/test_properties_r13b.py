"""Round-13b property tests: the theta-sketch intersection estimator
against a third, pure-Python construction (pandas + hashlib — neither
the Spark plan nor the DuckDB oracle), and the estimator's exactness
guarantee when sketches are smaller than k."""

from __future__ import annotations

import hashlib

import pandas as pd

from downloader_spark.operators.round13b_ext import THETA_K, _THETA_REF
from downloader_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model(sf_dir: str) -> dict[str, tuple[int, int, int]]:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    full = 1 << 60
    sketches: dict[str, tuple[list[int], int]] = {}
    for t, grp in ev.groupby("event_type"):
        hashes = sorted({_h60(f"tht:{u}") for u in grp["user_id"]})
        # strict <: at exactly k distinct hashes the plan/oracle set
        # theta = h_k (their fullness test is max(rn) < k), so the
        # model must agree on that boundary
        theta = full if len(hashes) < THETA_K else hashes[THETA_K - 1]
        sketches[t] = (hashes[:THETA_K], theta)
    ref_h, ref_theta = sketches[_THETA_REF]
    ref_users = set(ev[ev["event_type"] == _THETA_REF]["user_id"])
    out = {}
    for t, (hs, theta) in sketches.items():
        shared = set(hs) & set(ref_h)
        if not shared:
            continue  # the sketch-sketch join drops the group
        th = min(theta, ref_theta)
        common = sum(1 for h in shared if h < th)
        if th == full:
            est = common
        else:
            est = common * (1 << 58) // th * 4
        exact = len(
            set(ev[ev["event_type"] == t]["user_id"]) & ref_users
        )
        out[t] = (exact, common, est)
    return out


def test_theta_intersect_matches_pure_python_model(spark):
    fn = registry()["agg_theta_intersect"].fn
    for sf in (SF, SF01):
        got = {
            r["event_type"]: (
                r["n_exact_both"],
                r["n_common"],
                r["theta_estimate"],
            )
            for r in fn(spark, sf).collect()
        }
        assert got == _model(sf)


def test_theta_intersect_exact_when_sketch_not_full(spark):
    """sf0.001 has 15 distinct users per type (< k=16): the sketch IS
    the set, so the estimate must equal the exact overlap."""
    rows = registry()["agg_theta_intersect"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["theta_estimate"] == r["n_exact_both"]


def test_theta_intersect_estimator_branch_fires_at_sf001(spark):
    """sf0.01 has 150 users per type (> k): the division branch runs
    and the estimate is within the theta family's k=16 error envelope
    of the truth (loose 3/sqrt(k) multiplicative band — a planted
    regression catch, not a statistical claim)."""
    rows = registry()["agg_theta_intersect"].fn(spark, SF01).collect()
    assert rows
    saw_estimator = False
    for r in rows:
        if r["theta_estimate"] != r["n_exact_both"]:
            saw_estimator = True
        assert 0 <= r["theta_estimate"] <= 4 * r["n_exact_both"] + 64
    assert saw_estimator


def test_graph_scc_matches_tarjan_model(spark):
    """Third construction for graph_scc: rebuild the planted edge
    list in pure Python, run TARJAN's algorithm (a completely
    different SCC method — one-pass DFS with a lowlink stack), and
    the distributed coloring result must induce the identical
    partition with the same max-node component ids."""
    import pandas as pd

    from downloader_spark.plans.registry import registry

    n = len(pd.read_parquet(f"{SF}/documents.parquet"))
    # planted edges: 2-cycles + alternating cross edges (mirror of
    # the key's own construction — the MODEL below is what differs)
    edges = {}
    for v in range(n):
        edges.setdefault(v, []).append(v - v % 2 + (1 - v % 2))
    n_cycles = n // 2
    for r0 in range(0, n_cycles - 1, 2):
        j = r0 // 2
        src_c, dst_c = (r0 + 1, r0) if j % 2 else (r0, r0 + 1)
        edges.setdefault(src_c * 2 + 1, []).append(dst_c * 2)

    # iterative Tarjan (no recursion limit issues)
    index = {}
    low = {}
    onstack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            advanced = False
            for i in range(pi, len(edges.get(v, []))):
                w = edges[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                cid = max(members)
                for w in members:
                    comp[w] = cid

    for v in range(n):
        if v not in index:
            strongconnect(v)

    got = {
        r["node"]: r["scc_id"]
        for r in registry()["graph_scc"].fn(spark, SF).collect()
    }
    assert got == comp
