#!/usr/bin/env python
"""sf1 SHAPE-REALISTIC spot-bench for the top-cost operator families
(round-9 verdict item 2): the clone-10x stress gate duplicates rows,
which provably UNDERSTATES vocabulary growth — a cloned corpus keeps
the same shingle/token/node vocabulary while a real 10x corpus grows
it (Heaps' law for text, new-node growth for graphs).  This script
measures the realistic direction:

- documents: generated at BOTH scales (5k and 50k docs) by the SAME
  Zipf-token generator, so the vocabulary grows sub-linearly with the
  corpus like real text (Heaps), docs carry a 15% near-duplicate rate
  (perturbed copies — dedup candidates exist at every scale), and the
  10x ratio isolates scale-up under vocabulary growth instead of
  comparing two different corpus shapes.
- lineitem AND orders: sf0.1 vs 10x offset-unions (6M / 1.5M rows)
  whose order/part/supplier/customer KEY SPACES also grow 10x — new
  graph nodes, not higher multiplicity (the clone direction would
  densify every node).  Orders must grow IN STEP with lineitem: the
  pagerank edge list is lineitem JOIN orders on orderkey, so growing
  only lineitem leaves 9/10 of the shifted keys dangling and the
  graph unchanged (the first run of this script measured exactly
  that — pagerank 0.77x wall at "10x" — an invalid data point, not
  a fast operator).

Per key and scale it records wall seconds AND shuffle-write bytes
(from the Spark UI REST API — the scale-limiting resource on a real
cluster), prints a PERF.md-ready table, and flags any key whose
wall-clock or shuffle growth exceeds the stress-gate band.

Run manually on a QUIET machine; results recorded in PERF.md:

    python tests/stress_sf1_shape.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark

KEYS = (
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_simhash",
    "text_lm_score",
    "graph_pagerank",
    "graph_triangles",
    # the round-9 cohort_by_doc family: prove the compact-docs-only
    # shuffle shape holds under Heaps-law vocabulary growth
    "text_repetition",
    "text_winnow",
    "text_hashvec",
    "text_tfidf",
    "text_collocations",
    # round-9b additions: the line-frequency dedup under Heaps-law
    # vocabulary growth, and the two co-supplier-graph operators whose
    # node/edge sets grow with the 10x key spaces
    "dedup_lines",
    "graph_kcore_peel",
    "graph_common_neighbors",
    # round-10 sweep (verdict item 3 + the new round-10 keys): events
    # and embeddings now GROW (generated at both scales — time axis
    # and user keyspace x10 at constant daily density; vector count
    # x10), so the interval join, the triplet miner, and the PAA
    # rollup measure real scale-up instead of a copied-verbatim table
    "join_interval_overlap",
    "embed_triplet_mining",
    "pipeline_split_hygiene",
    "dedup_minhash_incremental",
    "dedup_bloom_prefilter",
    "graph_clustering_coeff",
    "ts_paa",
    "sample_systematic",
    # round-10 batch 3/4: the 4-config LSH sweep (heaviest new key),
    # the codec-bound image dedup, and the rank/survival rollups
    "dedup_lsh_tuning",
    "multimodal_phash_dedup",
    "agg_spearman",
    "events_survival_curve",
    # round-11 keys: the lossy-codec pair (codec-bound, linear in
    # images), the sketch calibration (candidate-join-bound under
    # Heaps growth), iterative BPE (vocab-sized rounds), and the
    # degree-weighted link-prediction join
    "multimodal_jpeg_stats",
    "multimodal_jpeg_quality_sweep",
    "dedup_minhash_estimate_error",
    "text_bpe_train_steps",
    "graph_resource_alloc",
    "agg_hll_distinct",
    "events_markov_stationary",
    "multimodal_jpeg_color_stats",
    "text_keyword_rake",
    "events_bot_detection",
    "pipeline_multimodal",
    "sample_group_split",
    # round-12 keys: the 4:2:0 and restart-interval codec paths
    # (codec-bound, linear in images), the per-partition suffix-array
    # dedup (SA build is n log^2 n per partition; the exchange carries
    # locally-distinct grams), and the Arrow UDTF lateral expansion
    # (map-only, linear)
    "multimodal_jpeg_420_stats",
    "multimodal_jpeg_restart_stats",
    "dedup_suffix_spans",
    "udtf_lateral",
    # round-12 batch 2: CDC chunk dedup (position explode collapsed
    # map-side by the 1/32 boundary filter; hash-only exchange) and
    # the unrolled BFS (frontier joins against a checkpointed edge
    # list)
    "text_cdc_chunks",
    "graph_bfs_levels",
    "text_bpe_encode",
    "multimodal_adpcm_roundtrip",
    "multimodal_mulaw_roundtrip",
    "multimodal_alaw_roundtrip",
    # round-15 (verdict item 6): the settled top-15 cohort members not
    # yet covered above — the ANN family (vector count x10), SCC and
    # the AS-traffic/LPM pair (edge/event spaces grow with the key
    # shift), the cluster-stats rollup (Heaps-law docs), and the
    # page-decode audit (every generated table's files)
    "embed_ann_hnsw",
    "embed_ann_graph_recall",
    "embed_ann_graph",
    "graph_scc",
    "agg_as_traffic",
    "dedup_cluster_stats",
    "multimodal_parquet_pages",
    "join_ip_prefix6",
)

SRC = "/root/testdata/sf0.1"
BASE_DIR = "/tmp/sf1shape_base"   # 5k generated docs + sf0.1 lineitem
BIG_DIR = "/tmp/sf1shape_big"     # 50k generated docs + 6M lineitem
N_DOCS_BASE = 5_000
N_DOCS_BIG = 50_000
VOCAB = 8_000          # Zipf type universe; Heaps realizes a subset
ZIPF_A = 1.05
DUP_RATE = 0.15        # near-duplicate fraction (10% token perturbation)
KEY_SHIFT = 100_000_000
MAX_RATIO = 12.0       # stress-gate band (3x worst recorded linear key)
MIN_BASE_SEC = 0.5
MAX_SMALL_10X_SEC = 20.0


def gen_documents(n_docs: int, seed: int = 20260814) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, VOCAB + 1)
    p = 1.0 / ranks**ZIPF_A
    p /= p.sum()
    lengths = rng.integers(30, 91, size=n_docs)
    tokens = [
        ["w%d" % t for t in rng.choice(VOCAB, size=ln, p=p)]
        for ln in lengths
    ]
    # near-dups: perturbed copies of a random EARLIER doc
    n_dup = int(n_docs * DUP_RATE)
    for i in rng.choice(np.arange(n_docs // 2, n_docs), size=n_dup, replace=False):
        src = int(rng.integers(0, n_docs // 2))
        toks = list(tokens[src])
        for j in range(len(toks)):
            if rng.random() < 0.10:
                toks[j] = "w%d" % rng.choice(VOCAB, p=p)
        tokens[i] = toks
    texts = [" ".join(t) for t in tokens]
    langs = ["en", "zh", "de", "fr", "es"]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": [langs[i % len(langs)] for i in range(n_docs)],
            "source": ["src%d" % (i % 20) for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


N_EVENTS_BASE = 100_000   # matches sf0.1 density: /30 days /1500 users
N_DAYS_BASE = 30
N_USERS_BASE = 1_500
N_VECS_BASE = 5_000
EMB_DIMS = 64


def gen_events(scale: int, seed: int = 20260815) -> pd.DataFrame:
    """Events at constant DAILY DENSITY: the 10x direction grows the
    time axis and the user keyspace, not per-cell crowding — the
    realistic growth for interval joins (pairs grow with cells, not
    quadratically with density) and cohort/seasonality rollups."""
    rng = np.random.default_rng(seed)
    n = N_EVENTS_BASE * scale
    days = N_DAYS_BASE * scale
    start = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = days * 86_400_000_000
    ts = start + rng.integers(0, span_us, size=n).astype("timedelta64[us]")
    types = np.array(["view", "click", "purchase", "error", "signup"])
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, N_USERS_BASE * scale, size=n),
            "event_type": types[rng.integers(0, len(types), size=n)],
            "value": np.round(rng.uniform(0, 560, size=n), 2),
            "props": ["{}"] * n,
        }
    )


def gen_embeddings(scale: int, seed: int = 20260816) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = N_VECS_BASE * scale
    # 10 loose label clusters so triplet mining sees both positives
    # and negatives inside every md5-dealt batch
    labels = rng.integers(0, 10, size=n)
    centers = rng.normal(0, 1, size=(10, EMB_DIMS))
    vecs = (centers[labels] + rng.normal(0, 0.6, size=(n, EMB_DIMS))).astype(
        np.float32
    )
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(vecs),
            "label": labels.astype(np.int32),
        }
    )


def build(spark) -> None:
    from pyspark.sql import functions as F
    from downloader_spark.io import load_table

    for d, n_docs in ((BASE_DIR, N_DOCS_BASE), (BIG_DIR, N_DOCS_BIG)):
        if os.path.exists(f"{d}/_DONE"):
            continue
        os.makedirs(d, exist_ok=True)
        # generated documents (same generator both scales)
        spark.createDataFrame(gen_documents(n_docs)).repartition(
            32
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        # lineitem: real sf0.1 at base; 10x offset-union (10x key
        # cardinality on orderkey/partkey/suppkey) at big
        li = load_table(spark, SRC, "lineitem")
        if d == BIG_DIR:
            copies = [
                li.select(
                    (F.col("l_orderkey") + k * KEY_SHIFT).alias("l_orderkey"),
                    (F.col("l_partkey") + k * KEY_SHIFT).alias("l_partkey"),
                    (F.col("l_suppkey") + k * KEY_SHIFT).alias("l_suppkey"),
                    "l_linenumber", "l_quantity", "l_extendedprice",
                    "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                    "l_shipdate",
                )
                for k in range(10)
            ]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = li
        out.repartition(32).write.mode("overwrite").parquet(
            f"{d}/lineitem.parquet"
        )
        # orders must grow IN STEP with lineitem (same orderkey shift,
        # plus a custkey shift so the customer node space grows too):
        # graph_pagerank's edges are lineitem JOIN orders on orderkey,
        # and a lineitem-only growth leaves 9/10 of keys dangling.
        od = load_table(spark, SRC, "orders")
        if d == BIG_DIR:
            ocopies = [
                od.select(
                    (F.col("o_orderkey") + k * KEY_SHIFT).alias("o_orderkey"),
                    (F.col("o_custkey") + k * KEY_SHIFT).alias("o_custkey"),
                    "o_orderstatus", "o_totalprice", "o_orderdate",
                    "o_orderpriority",
                )
                for k in range(10)
            ]
            oout = ocopies[0]
            for c in ocopies[1:]:
                oout = oout.unionByName(c)
        else:
            oout = od
        oout.repartition(32).write.mode("overwrite").parquet(
            f"{d}/orders.parquet"
        )
        # events and embeddings: generated at BOTH scales (round 10)
        scale = 10 if d == BIG_DIR else 1
        spark.createDataFrame(gen_events(scale)).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{d}/events.parquet")
        spark.createDataFrame(gen_embeddings(scale)).repartition(
            32
        ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        # remaining tables: shared shape, copied verbatim
        for t in ("region", "nation", "customer", "supplier", "part"):
            if not os.path.exists(f"{d}/{t}.parquet"):
                shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
        open(f"{d}/_DONE", "w").close()


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


# --- shuffle bytes via the UI REST API ---------------------------------


def _ui(path: str):
    with urllib.request.urlopen(f"http://127.0.0.1:4040/api/v1/{path}") as r:
        return json.load(r)


def shuffle_write_bytes() -> int:
    """Total shuffle-write bytes across all completed stages so far;
    per-key usage diffs two snapshots around the forced run."""
    app = _ui("applications")[0]["id"]
    stages = _ui(f"applications/{app}/stages?status=COMPLETE")
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    spark = get_spark(
        app="sf1-shape-stress",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("building corpora (cached under /tmp/sf1shape_*)...", flush=True)
    build(spark)
    reg = registry()
    # optional subset (comma-separated) for incremental runs — new
    # keys measured without re-timing the whole recorded sweep
    only = os.environ.get("SPARK_GRAFT_STRESS_KEYS")
    keys = [k for k in KEYS if not only or k in only.split(",")]
    # warm every key's plan/codegen at the smallest SF
    for k in keys:
        force(reg[k].fn(spark, "/root/testdata/sf0.001"))

    rows = []
    bad = []
    for k in keys:
        rec = {"key": k}
        for tag, d in (("base", BASE_DIR), ("big", BIG_DIR)):
            sb0 = shuffle_write_bytes()
            t0 = time.perf_counter()
            force(reg[k].fn(spark, d))
            rec[f"{tag}_sec"] = round(time.perf_counter() - t0, 3)
            rec[f"{tag}_shuffle_mb"] = round(
                (shuffle_write_bytes() - sb0) / 1e6, 1
            )
        rec["wall_ratio"] = round(rec["big_sec"] / rec["base_sec"], 2)
        rec["shuffle_ratio"] = (
            round(rec["big_shuffle_mb"] / rec["base_shuffle_mb"], 2)
            if rec["base_shuffle_mb"] > 0
            else float("nan")
        )
        ok = (
            rec["big_sec"] <= MAX_SMALL_10X_SEC
            if rec["base_sec"] < MIN_BASE_SEC
            else rec["wall_ratio"] <= MAX_RATIO
        )
        rec["verdict"] = "ok" if ok else "SUPER-LINEAR?"
        if not ok:
            bad.append(k)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    print("\nPERF.md table:\n")
    print("| key | base s | 10x s | wall ratio | base shuffle MB "
          "| 10x shuffle MB | shuffle ratio | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| `{r['key']}` | {r['base_sec']} | {r['big_sec']} "
            f"| {r['wall_ratio']}x | {r['base_shuffle_mb']} "
            f"| {r['big_shuffle_mb']} | {r['shuffle_ratio']}x "
            f"| {r['verdict']} |"
        )
    if bad:
        print(f"\nFLAGGED: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
