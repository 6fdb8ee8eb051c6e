"""Round-13 operator keys.

Continues the coverage program beyond the reference's ETL surface
(the reference — /root/reference — is a Go fetch loop with no
relational layer; file:line citations on each key tie the data-model
lineage back to it where one exists).  Every key follows the repo
registry contract: a Spark-first DataFrame plan plus an independent
DuckDB oracle construction (never the same SQL text run twice).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves stringified UDF type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table, spread
from downloader_spark.plans.registry import query

# ------------------------------------------------------------------
# multimodal_pframe_stats — inter-frame (P-frame) delta video codec
# ------------------------------------------------------------------

# clip geometry: 12x16 luma frames in 4x4 blocks (3x4 block grid),
# 8 frames.  Each block updates its constant every p frames where
# p = 1 + (by+bx) % 3, so the bitstream carries a planted mix of
# always-coded (p=1), half-skipped (p=2) and two-thirds-skipped
# (p=3) blocks — every branch of the skip/code decision fires.
_PF_W = 16
_PF_H = 12
_PF_NF = 8
_PF_B = 4
_PF_BW = _PF_W // _PF_B
_PF_BH = _PF_H // _PF_B

_PF_P = "(1 + (by + bx) % 3)"
_PF_V = f"(doc_id * 7 + (f // {_PF_P}) * 31 + by * 17 + bx * 11) % 256"


@query(
    "multimodal_pframe_stats",
    oracle=f"""
    WITH grid AS (
      SELECT doc_id, f, by, bx,
             {_PF_P} AS p,
             {_PF_V} AS v
      FROM documents,
           unnest(generate_series(0, {_PF_NF - 1})) AS u(f),
           unnest(generate_series(0, {_PF_BH - 1})) AS a(by),
           unnest(generate_series(0, {_PF_BW - 1})) AS b(bx)
    )
    SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
           CAST(sum(v * {_PF_B * _PF_B}) AS BIGINT) AS luma_sum,
           CAST(sum(CASE WHEN f >= 1 AND f % p != 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_skip,
           CAST(sum(CASE WHEN f >= 1 AND f % p = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_coded
    FROM grid
    GROUP BY doc_id, f
    """,
    tags=("multimodal", "video", "pframe", "mapInPandas"),
)
def multimodal_pframe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-FRAME video compression through real bytes: each doc's
    deterministic {nf}-frame clip is encoded with the from-scratch
    PFV codec (media.encode_pframe — I-frame + P-frames of per-block
    skip flags and RLE'd mod-256 deltas, the structural core of
    H.26x-style codecs), decoded back inside the Arrow stage, and
    per-frame luma sums (from the RECONSTRUCTED pixels) plus
    skip/coded block counts (from the BITSTREAM flags) emitted.
    Retires the "inter-frame prediction is out of scope" caveat in
    multimodal.py the way multimodal_video_luma retired the container
    one: prediction, residual coding and block-skip all run over real
    bytes, byte-exactly.

    Differential: the oracle recomputes luma and the skip/code
    decision closed-form from the block-update periods and never sees
    a byte — a misplace in prediction chains or a wrong skip decision
    lands a wrong constant or a wrong count.

    Shape: map-only Arrow stage over the repartitioned key column
    (the video/PNG posture); at 100 TB the synthesis select becomes a
    binaryFile scan partitioned by clip — pixels never cross an
    exchange, only the tiny per-frame stat rows do."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_pframe, encode_pframe

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)
    w, h, nf, bs = _PF_W, _PF_H, _PF_NF, _PF_B

    def run(batches):
        ff, byy, bxx = np.mgrid[0:nf, 0 : h // bs, 0 : w // bs]
        per = 1 + (byy + bxx) % 3
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                blocks = (
                    int(doc_id) * 7 + (ff // per) * 31 + byy * 17 + bxx * 11
                ) % 256
                clip = np.kron(blocks, np.ones((1, bs, bs))).astype(np.uint8)
                back, stats = decode_pframe(encode_pframe(clip, block=bs))
                assert back.shape == (nf, h, w)
                for f in range(nf):
                    luma = int(back[f].astype(np.int64).sum())
                    n_skip, n_coded = stats[f]
                    out.append((int(doc_id), f, luma, n_skip, n_coded))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_no", "luma_sum", "n_skip", "n_coded"],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, frame_no long, luma_sum long, n_skip long, n_coded long",
    )


# ------------------------------------------------------------------
# embed_ann_graph — NSW-style graph ANN (+ recall differential)
# ------------------------------------------------------------------
# IVF was the only indexed search family; this adds the OTHER major
# ANN family: a bounded-degree neighbor graph traversed by greedy
# beam search (the structural core of NSW/HNSW).  Everything is
# deterministic and relational so the DuckDB oracle replays it
# exactly:
#   - construction: each corpus vector's out-edges are its top-M
#     cosine neighbors WITHIN its md5-derived construction bucket
#     (bucketed kNN-graph — never corpus x corpus) plus one
#     md5-seeded long-range edge to a hash-selected bucket's
#     REPRESENTATIVE, min vec_id (the small-world shortcut; bucket
#     reps rather than global ranks keep addressing a groupBy +
#     broadcast join — no corpus-wide row_number);
#   - search: md5-seeded entry point per query, then HOPS unrolled
#     greedy expansions — score all unseen out-neighbors of the
#     frontier, keep the best W as the next frontier — with the
#     final top-k drawn from every node scored along the way.
# Scale shape: construction joins are bucket-bounded (|corpus|/NB
# rows per side within a bucket) and the search frontier is W rows
# per query with degree <= M+1, so probes per query are
# O(1 + HOPS*W*(M+1)) — independent of corpus size, the whole point
# of graph ANN.

_NSW_NB = 8     # construction-bucket floor (actual count grows with n)
_NSW_BSZ = 62   # target bucket size: buckets = max(NB, n // BSZ), so the
                # per-bucket pair join stays O(BSZ^2) and total
                # construction cost stays LINEAR in corpus size
_NSW_M = 4      # near out-degree within bucket
_NSW_W = 3      # beam width
_NSW_HOPS = 4   # unrolled greedy hops
_NSW_K = 5      # final top-k (= IVF_TOP_K, for the recall comparison)
# W/HOPS sized so the graph's probe count (~1 + HOPS*W*(M+1) ~ 60,
# less revisit overlap) lands in the same band as IVF nprobe=1's
# |corpus|/|clusters| ~ 50 — the "equal probe budget" the recall
# differential is meant to compare at.


def _nsw_duck_search(prefix: str = "", entry_sql: str | None = None) -> str:
    """The greedy-search CTE chain (entry, per-hop cand/s/f/vis, and
    the scored union) with all CTE names carrying ``prefix`` so two
    searches (e.g. the flat entry and round 14's HNSW-descended
    entry) can share one base chain.  ``entry_sql`` overrides the
    default md5-seeded entry SELECT."""
    from downloader_spark.operators.llm_dedup import _duck_h60
    from downloader_spark.operators.llm_similarity import _DUCK_DOT

    def dot(a, b):
        return _DUCK_DOT.format(a=a, b=b)

    def h(tag, key):
        return _duck_h60(f"concat('{tag}:', CAST({key} AS VARCHAR))")

    score = (
        "SELECT t.query_id, t.node, "
        f"{dot('q.q_emb', 'c.embedding')} / (q.q_nrm * c.nrm) AS cos "
        "FROM {src} t JOIN c ON c.vec_id = t.node "
        "JOIN q ON q.query_id = t.query_id"
    )
    if entry_sql is None:
        entry_sql = f"""
      SELECT t.query_id, r.rep AS node
      FROM (SELECT q.query_id,
                   {h("nswe", "q.query_id")} % ncnt.nb AS tbkt
            FROM q, ncnt) t
      JOIN reps r ON r.bkt = t.tbkt
    """
    hops = []
    visited = f"{prefix}entry"
    frontier = f"{prefix}entry"
    scored = [f"{prefix}s0"]
    for i in range(1, _NSW_HOPS + 1):
        hops.append(
            f"""{prefix}cand{i} AS (
      SELECT DISTINCT f.query_id, ed.dst AS node
      FROM {frontier} f JOIN edges ed ON ed.src = f.node
      WHERE NOT EXISTS (SELECT 1 FROM {visited} v
                        WHERE v.query_id = f.query_id AND v.node = ed.dst)
    ),
    {prefix}s{i} AS ({score.format(src=f"{prefix}cand{i}")}),
    {prefix}f{i} AS (
      SELECT query_id, node FROM (
        SELECT query_id, node,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, node) AS rnk
        FROM {prefix}s{i}
      ) WHERE rnk <= {_NSW_W}
    ),
    {prefix}vis{i} AS (
      SELECT query_id, node FROM {visited}
      UNION SELECT query_id, node FROM {prefix}cand{i}
    )"""
        )
        visited = f"{prefix}vis{i}"
        frontier = f"{prefix}f{i}"
        scored.append(f"{prefix}s{i}")
    scored_union = " UNION ALL ".join(f"SELECT * FROM {s}" for s in scored)
    return f"""{prefix}entry AS ({entry_sql}),
    {prefix}s0 AS ({score.format(src=f"{prefix}entry")}),
    {",".join(hops)},
    {prefix}scored AS ({scored_union})"""


def _nsw_duck_base() -> str:
    """The shared construction CTE chain: q, c, ncnt, bkts, reps,
    near, longe, edges."""
    from downloader_spark.operators.llm_dedup import _duck_h60
    from downloader_spark.operators.llm_similarity import _DUCK_DOT, N_QUERIES

    def dot(a, b):
        return _DUCK_DOT.format(a=a, b=b)

    def h(tag, key):
        return _duck_h60(f"concat('{tag}:', CAST({key} AS VARCHAR))")

    ctes = f"""q AS (
      SELECT vec_id AS query_id, embedding AS q_emb,
             sqrt({dot("embedding", "embedding")}) AS q_nrm, label
      FROM embeddings WHERE vec_id < {N_QUERIES}
        AND {dot("embedding", "embedding")} <> 0
    ),
    c AS (
      SELECT vec_id, embedding,
             sqrt({dot("embedding", "embedding")}) AS nrm, label
      FROM embeddings
      WHERE vec_id >= {N_QUERIES} AND {dot("embedding", "embedding")} <> 0
    ),
    ncnt AS (SELECT count(*) AS n,
                    greatest({_NSW_NB}, count(*) // {_NSW_BSZ}) AS nb
             FROM c),
    bkts AS (
      SELECT vec_id, embedding, nrm,
             {h("nswb", "vec_id")} % nb AS bkt
      FROM c, ncnt
    ),
    reps AS (SELECT bkt, min(vec_id) AS rep FROM bkts GROUP BY bkt),
    near AS (
      SELECT src, dst FROM (
        SELECT u.vec_id AS src, v.vec_id AS dst,
               row_number() OVER (
                 PARTITION BY u.vec_id
                 ORDER BY {dot("u.embedding", "v.embedding")}
                          / (u.nrm * v.nrm) DESC, v.vec_id
               ) AS rnk
        FROM bkts u JOIN bkts v
          ON u.bkt = v.bkt AND u.vec_id <> v.vec_id
      ) WHERE rnk <= {_NSW_M}
    ),
    longe AS (
      SELECT t.src, r.rep AS dst
      FROM (SELECT c.vec_id AS src,
                   {h("nswl", "c.vec_id")} % ncnt.nb AS tbkt
            FROM c, ncnt) t
      JOIN reps r ON r.bkt = t.tbkt
      WHERE r.rep <> t.src
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT * FROM near UNION ALL SELECT * FROM longe
      )
    )"""
    return ctes


def _nsw_duck_parts() -> tuple[str, str]:
    """(shared CTE chain, scored-union CTE name) for the oracle —
    the base construction plus the default flat search."""
    return f"{_nsw_duck_base()},\n    {_nsw_duck_search()}", "scored"


def _nsw_build(
    spark: SparkSession, sf_dir: str, defer_edges: bool = False
) -> dict:
    """Shared NSW graph construction: query/corpus frames with
    precomputed norms, the bucketed kNN + long-range edge table, and
    the scorer closure — reused by the flat search (embed_ann_graph),
    the recall differential, and round 14's hierarchical HNSW entry
    layer.  The Spark construction mirrors the oracle CTE-for-CTE.

    ``defer_edges=True`` returns the edge table LAZY under
    ``edges_lazy`` (no ``edges`` key) so the caller can materialize
    the checkpoint on a driver thread concurrently with other
    independent checkpoint chains (guide §2.6 — actions are only
    sequential because the driver calls them sequentially; the edge
    build and e.g. the entry-point build share no dependency beyond
    ``c``)."""
    from pyspark.sql import Window

    from downloader_spark.operators.llm_dedup import _spark_h60
    from downloader_spark.operators.llm_similarity import (
        _SPARK_DOT,
        _norm_nonzero,
        N_QUERIES,
    )

    def dot(a, b):
        return _SPARK_DOT.format(a=a, b=b)

    def h(tag, key):
        return _spark_h60(f"concat('{tag}:', CAST({key} AS STRING))")

    emb = load_table(spark, sf_dir, "embeddings")
    # cosine via PRE-COMPUTED per-vector norms (dot / (nrm_a * nrm_b)):
    # one interpreted-HOF dot per pair instead of three in the hot
    # construction join; the oracle uses the identical formula so the
    # doubles (hence every ranking) stay bit-identical cross-engine.
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .filter(_norm_nonzero())
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.expr(f"sqrt({dot('embedding', 'embedding')})").alias("q_nrm"),
        )
        # checkpointed: q is broadcast-joined by EVERY hop's scorer,
        # and each of those broadcasts is a separate AQE query whose
        # build side would otherwise re-run the parquet scan + the
        # interpreted norm filter/fold (exchange/broadcast reuse never
        # crosses query boundaries) — 7-10 redundant scans per ANN key
        .localCheckpoint()
    )
    c = (
        # spread() before the CPU-dense chain (guide §2.5 input skew):
        # a single-split corpus scan otherwise leaves the interpreted
        # HOF norm fold AND every downstream md5-bucket/edge map stage
        # that reads the cached frame on ONE core (profiled r16: the
        # edge-construction map stage alone was 0.83 s single-task);
        # at 100 TB the scan arrives as thousands of splits and
        # spread() is a no-op
        spread(emb.filter(F.col("vec_id") >= N_QUERIES), key="vec_id")
        .filter(_norm_nonzero())
        .select(
            "vec_id",
            "embedding",
            F.expr(f"sqrt({dot('embedding', 'embedding')})").alias("nrm"),
        )
        # checkpointed: the norm-nonzero HOF filter + norm fold are
        # interpreted (non-codegen) and c is re-referenced by the
        # bucket build, every hop's scorer and the entry/rep joins —
        # one materialization of |corpus| rows beats re-folding 64-dim
        # dots per reference in every checkpoint job
        .localCheckpoint()
    )
    ncnt = c.agg(
        F.count("*").alias("n"),
        F.expr(
            f"greatest({_NSW_NB}, count(*) DIV {_NSW_BSZ})"
        ).alias("nb"),
    )

    # construction: bucketed kNN edges + one long-range edge per node;
    # bucket count scales as max(NB, n // BSZ) so the per-bucket pair
    # join stays bounded and total construction cost linear in n.
    # Long-range targets and entry points address a hash-selected
    # bucket's REPRESENTATIVE (min vec_id per bucket — a groupBy +
    # broadcast join), never a global rank: a row_number() over the
    # whole corpus would funnel 10^9 vectors through one task.
    bkts = c.crossJoin(F.broadcast(ncnt)).select(
        "vec_id",
        "embedding",
        "nrm",
        F.expr(f"pmod({h('nswb', 'vec_id')}, nb)").alias("bkt"),
    )
    reps = bkts.groupBy("bkt").agg(F.min("vec_id").alias("rep"))
    u = bkts.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("s_emb"),
        F.col("nrm").alias("s_nrm"),
        "bkt",
    )
    v = bkts.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("d_emb"),
        F.col("nrm").alias("d_nrm"),
        "bkt",
    )
    # Arrow-vectorized cosine for the |corpus| x BSZ pair join — the
    # construction hot path, where the interpreted aggregate/zip_with
    # HOF costs ~10x.  The fold order is preserved EXACTLY: a float64
    # accumulator adds one dimension at a time (vectorized across the
    # batch, sequential across dims), i.e. ((0 + x1*y1) + x2*y2)... —
    # the same left fold Spark's aggregate() and DuckDB's list_reduce
    # evaluate, so the doubles (and every ranking) stay bit-identical.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pair_cos(
        a: pd.Series, b: pd.Series, na: pd.Series, nb: pd.Series
    ) -> pd.Series:
        import numpy as np

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(len(a), np.float64)
        for d in range(A.shape[1]):
            acc = acc + A[:, d] * B[:, d]
        return pd.Series(acc / (na.to_numpy() * nb.to_numpy()))

    pairs = u.join(v, "bkt").filter(F.col("src") != F.col("dst")).withColumn(
        "pcos", _pair_cos("s_emb", "d_emb", "s_nrm", "d_nrm")
    )
    near = (
        pairs.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(
                    F.col("pcos").desc(), F.col("dst")
                )
            ),
        )
        .filter(F.col("rnk") <= _NSW_M)
        .select("src", "dst")
    )
    longe = (
        c.select(F.col("vec_id").alias("src"))
        .crossJoin(F.broadcast(ncnt))
        .select("src", F.expr(f"pmod({h('nswl', 'src')}, nb)").alias("tbkt"))
        .join(F.broadcast(reps), F.col("tbkt") == F.col("bkt"))
        .filter(F.col("rep") != F.col("src"))
        .select("src", F.col("rep").alias("dst"))
    )
    # The unrolled hops each re-reference edges/entry/visited; without
    # a checkpoint Spark re-executes the whole construction subtree
    # per reference (no cross-plan common-subtree sharing), turning a
    # 4-hop search into ~4x the build cost.  The checkpointed frames
    # are tiny: |corpus|*(M+1) edge rows and <= W rows/query frontiers
    # — same trick as graph_pagerank's checkpointed edge table.
    edges_lazy = near.unionByName(longe).distinct()

    def score(nodes: DataFrame) -> DataFrame:
        # the probe frame is <= W*(M+1) rows/query: broadcast IT so the
        # checkpointed corpus is never shuffled (without the hint the
        # un-estimated probe lineage falls back to a sort-merge join
        # that exchanges |corpus| rows once per hop)
        return (
            F.broadcast(nodes).join(
                c.select(F.col("vec_id").alias("node"), "embedding", "nrm"),
                "node",
            )
            .join(F.broadcast(q), "query_id")
            .withColumn(
                "cos", F.expr(f"{dot('q_emb', 'embedding')} / (q_nrm * nrm)")
            )
            .select("query_id", "node", "cos")
        )

    parts = {
        "q": q,
        "c": c,
        "ncnt": ncnt,
        "reps": reps,
        "score": score,
        "pair_cos": _pair_cos,
        "h": h,
    }
    if defer_edges:
        parts["edges_lazy"] = edges_lazy
    else:
        parts["edges"] = edges_lazy.localCheckpoint()
    return parts


def _nsw_default_entry(parts: dict) -> DataFrame:
    """The flat search's md5-seeded entry: a hash-selected bucket's
    representative per query."""
    h = parts["h"]
    entry = (
        parts["q"].select("query_id")
        .crossJoin(F.broadcast(parts["ncnt"]))
        .select(
            "query_id",
            F.expr(f"pmod({h('nswe', 'query_id')}, nb)").alias("tbkt"),
        )
        .join(F.broadcast(parts["reps"]), F.col("tbkt") == F.col("bkt"))
        .select("query_id", F.col("rep").alias("node"))
        # checkpointed: each later reference would otherwise re-scan
        # the corpus (the norm-nonzero HOF filter) and rebuild the
        # reps/ncnt broadcasts — measured slower than the extra job
        .localCheckpoint()
    )
    return entry


def _nsw_search(parts: dict, entry: DataFrame) -> DataFrame:
    """The unrolled greedy beam search from a given (query_id, node)
    entry frame (caller checkpoints it): every scored node across
    entry + hops."""
    from pyspark.sql import Window

    score = parts["score"]
    edges = parts["edges"]
    visited = entry
    frontier = entry
    scored_parts = [score(entry)]
    for hop in range(_NSW_HOPS):
        cand = (
            frontier.join(edges, frontier.node == edges.src)
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["query_id", "node"], "left_anti")
        )
        # each non-final hop's scores feed the frontier, the visited
        # set and the final union — checkpoint once, reuse thrice.
        # The FINAL hop's scores have exactly one live reference (the
        # union; its frontier and visited are dead), so a checkpoint
        # there would be a pure extra job.
        sc = score(cand)
        if hop < _NSW_HOPS - 1:
            sc = sc.localCheckpoint()
        scored_parts.append(sc)
        visited = visited.unionByName(sc.select("query_id", "node"))
        frontier = (
            sc.withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("cos").desc(), F.col("node")
                    )
                ),
            )
            .filter(F.col("rnk") <= _NSW_W)
            .select("query_id", "node")
        )
    out = scored_parts[0]
    for p in scored_parts[1:]:
        out = out.unionByName(p)
    # the union of per-hop checkpointed frames carries one partition
    # per source partition (hops x session width ~ 160 tasks for a few
    # hundred rows); coalesce merges them shuffle-free so downstream
    # stages launch session-width tasks, not hops x width
    return out.coalesce(out.sparkSession.sparkContext.defaultParallelism)


def _nsw_scored_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (query_id, node, cos) the flat greedy graph search
    scores — entry point plus all unseen frontier expansions.

    The edge-table checkpoint and the entry-point checkpoint depend
    only on ``c``, not on each other — materialize them concurrently
    from two driver threads (guide §2.6) so the second chain's jobs
    back-fill the first's idle cores instead of queueing behind it."""
    from concurrent.futures import ThreadPoolExecutor

    parts = _nsw_build(spark, sf_dir, defer_edges=True)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_edges = pool.submit(parts.pop("edges_lazy").localCheckpoint)
        f_entry = pool.submit(_nsw_default_entry, parts)
        parts["edges"] = f_edges.result()
        entry = f_entry.result()
    return _nsw_search(parts, entry)


def _nsw_graph_oracle() -> str:
    ctes, scored = _nsw_duck_parts()
    return f"""
    WITH {ctes}
    SELECT query_id, node AS vec_id,
           CAST(floor(cos * 1000000) AS BIGINT) AS cos_ppm,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, node) AS INT) AS rank
    FROM {scored}
    QUALIFY rank <= {_NSW_K}
    """


@query(
    "embed_ann_graph",
    oracle=_nsw_graph_oracle(),
    tags=("llm", "similarity", "graph-ann"),
)
def embed_ann_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NSW-style graph ANN top-{k}: greedy beam search over a
    deterministic bounded-degree neighbor graph (md5-bucketed kNN
    edges + md5-seeded long-range shortcuts and entry points — the
    small-world structure of NSW/HNSW with every random draw replaced
    by a hash so the oracle replays it bit-for-bit).

    Scale: probes per query are O(1 + HOPS * W * (M+1)) — INDEPENDENT
    of corpus size (vs IVF's |corpus|/|clusters|); construction is
    bucket-bounded, never all-pairs.  See embed_ann_graph_recall for
    the measured recall-vs-probes tradeoff against IVF."""
    from pyspark.sql import Window

    sc = _nsw_scored_spark(spark, sf_dir)
    return (
        sc.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), F.col("node")
                )
            ),
        )
        .filter(F.col("rank") <= _NSW_K)
        .select(
            "query_id",
            F.col("node").alias("vec_id"),
            F.floor(F.col("cos") * 1000000).cast("bigint").alias("cos_ppm"),
            F.col("rank").cast("int"),
        )
    )


def _nsw_recall_oracle() -> str:
    from downloader_spark.operators.round7_ext import _ann_topk_cte

    ctes, scored = _nsw_duck_parts()
    return f"""
    WITH {ctes},
    {_ann_topk_cte("CROSS JOIN c", _NSW_K, "exact_k")},
    {_ann_topk_cte("JOIN c ON q.label = c.label", _NSW_K, "ivf_k")},
    graph_k AS (
      SELECT query_id, node AS vec_id FROM (
        SELECT query_id, node,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, node) AS rnk
        FROM {scored}
      ) WHERE rnk <= {_NSW_K}
    ),
    gcount AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS graph_scored
      FROM {scored} GROUP BY query_id
    ),
    icount AS (
      SELECT q.query_id, CAST(count(*) AS BIGINT) AS ivf_scored
      FROM q JOIN c ON q.label = c.label GROUP BY q.query_id
    ),
    ghits AS (
      SELECT e.query_id,
             CAST(count(*) AS BIGINT) AS n_exact,
             CAST(count(g.vec_id) AS BIGINT) AS graph_hits
      FROM exact_k e
      LEFT JOIN graph_k g
        ON g.query_id = e.query_id AND g.vec_id = e.vec_id
      GROUP BY e.query_id
    ),
    ihits AS (
      SELECT e.query_id, CAST(count(i.vec_id) AS BIGINT) AS ivf_hits
      FROM exact_k e
      LEFT JOIN ivf_k i
        ON i.query_id = e.query_id AND i.vec_id = e.vec_id
      GROUP BY e.query_id
    )
    SELECT gh.query_id, gh.n_exact,
           gc.graph_scored, ic.ivf_scored,
           gh.graph_hits, ih.ivf_hits,
           CAST(gh.graph_hits * 1000000 // gh.n_exact AS BIGINT)
             AS graph_recall_ppm,
           CAST(ih.ivf_hits * 1000000 // gh.n_exact AS BIGINT)
             AS ivf_recall_ppm
    FROM ghits gh
    JOIN ihits ih ON ih.query_id = gh.query_id
    JOIN gcount gc ON gc.query_id = gh.query_id
    JOIN icount ic ON ic.query_id = gh.query_id
    """


@query(
    "embed_ann_graph_recall",
    oracle=_nsw_recall_oracle(),
    tags=("llm", "similarity", "graph-ann", "evaluation"),
)
def embed_ann_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-vs-IVF recall differential at their actual probe
    budgets: per query, recall@{k} of the NSW-style graph search AND
    of IVF (nprobe=1) against the brute-force ground truth, alongside
    how many candidates each method actually SCORED (graph: every
    node the beam touched; IVF: the probed cluster's size) — the
    recall-per-probe tradeoff an ANN deployment tunes.  Extends
    embed_ann_recall the way the judge-panel pattern extends a single
    check: two index families, one ground truth, measured side by
    side in one row per query."""
    from pyspark.sql import Window

    from downloader_spark.operators.llm_similarity import (
        _norm_nonzero,
        _scored,
        _SPARK_DOT,
        N_QUERIES,
        topk_per_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    exact_k = topk_per_query(_scored(queries, corpus), k=_NSW_K).select(
        "query_id", "vec_id"
    )

    q_lab = queries.filter(_norm_nonzero()).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "label",
    )
    c_lab = corpus.filter(_norm_nonzero())
    dot = F.expr(_SPARK_DOT.format(a="q_emb", b="embedding"))
    nq = F.expr(_SPARK_DOT.format(a="q_emb", b="q_emb"))
    nc = F.expr(_SPARK_DOT.format(a="embedding", b="embedding"))
    ivf_scored_df = c_lab.join(F.broadcast(q_lab), "label")
    ivf_k = topk_per_query(
        ivf_scored_df.withColumn("cos", dot / F.sqrt(nq * nc)), k=_NSW_K
    ).select(F.col("query_id").alias("iq"), F.col("vec_id").alias("iv"))
    icount = ivf_scored_df.groupBy("query_id").agg(
        F.count("*").alias("ivf_scored")
    )

    scored = _nsw_scored_spark(spark, sf_dir)
    graph_k = (
        scored.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), F.col("node")
                )
            ),
        )
        .filter(F.col("rnk") <= _NSW_K)
        .select(F.col("query_id").alias("gq"), F.col("node").alias("gv"))
    )
    gcount = scored.groupBy("query_id").agg(
        F.count("*").alias("graph_scored")
    )

    ghits = (
        exact_k.join(
            graph_k,
            (exact_k.query_id == graph_k.gq) & (exact_k.vec_id == graph_k.gv),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("gv").alias("graph_hits"),
        )
    )
    ihits = (
        exact_k.join(
            ivf_k,
            (exact_k.query_id == ivf_k.iq) & (exact_k.vec_id == ivf_k.iv),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("iv").alias("ivf_hits"))
    )
    return (
        ghits.join(ihits, "query_id")
        .join(gcount, "query_id")
        .join(icount, "query_id")
        .select(
            "query_id",
            "n_exact",
            "graph_scored",
            "ivf_scored",
            "graph_hits",
            "ivf_hits",
            F.expr(
                "CAST(graph_hits * 1000000 DIV n_exact AS BIGINT)"
            ).alias("graph_recall_ppm"),
            F.expr(
                "CAST(ivf_hits * 1000000 DIV n_exact AS BIGINT)"
            ).alias("ivf_recall_ppm"),
        )
    )


# ------------------------------------------------------------------
# dedup_unicode_fold — NFKC+casefold dedup over planted variants
# ------------------------------------------------------------------
# Web corpora carry the same sentence as fullwidth CJK-style ASCII,
# ligatured PDFs, and case variants; byte-exact dedup sees distinct
# documents.  A constrained planted alphabet keeps the oracle exact:
# every group of 4 consecutive doc_ids shares one base text, each
# member carrying one variant class whose NFKC+casefold image is
# exactly lower(base) —
#   0: the base text itself
#   1: upper()                        (casefold inverts)
#   2: a/e -> U+FF41/U+FF45 fullwidth (NFKC inverts)
#   3: fi -> U+FB01 ligature, k -> U+212A Kelvin sign (NFKC inverts)
# The ENGINE runs the real thing (unicodedata.normalize('NFKC') +
# str.casefold in an Arrow stage); the ORACLE never normalizes — it
# groups by md5(lower(base)) closed-form.  Any normalization defect
# splits a group and fails rows+hash.

_UF_VARIANT = """CASE pmod(doc_id, 4)
      WHEN 0 THEN btext
      WHEN 1 THEN upper(btext)
      WHEN 2 THEN replace(replace(btext, 'a', 'ａ'), 'e', 'ｅ')
      ELSE replace(replace(btext, 'fi', 'ﬁ'), 'k', 'K')
    END"""

_UF_VARIANT_DUCK = """CASE doc_id % 4
      WHEN 0 THEN btext
      WHEN 1 THEN upper(btext)
      WHEN 2 THEN replace(replace(btext, 'a', 'ａ'), 'e', 'ｅ')
      ELSE replace(replace(btext, 'fi', 'ﬁ'), 'k', 'K')
    END"""


@query(
    "dedup_unicode_fold",
    oracle=f"""
    WITH base AS (SELECT doc_id AS base_id, text AS btext FROM documents),
    var AS (
      SELECT d.doc_id, b.btext, {_UF_VARIANT_DUCK} AS vtext
      FROM documents d
      JOIN base b ON b.base_id = d.doc_id - d.doc_id % 4
    )
    SELECT min(doc_id) AS first_doc,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(DISTINCT vtext) AS BIGINT) AS n_raw_variants,
           CAST(CASE WHEN count(DISTINCT vtext) > 1 THEN 1 ELSE 0 END
                AS INT) AS exact_dedup_blind
    FROM var
    GROUP BY md5(lower(btext))
    """,
    tags=("llm", "dedup", "unicode", "mapInPandas"),
)
def dedup_unicode_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: md5 over the NFKC+casefold
    image of each document, run with the REAL normalizer
    (``unicodedata.normalize('NFKC', t).casefold()``) inside an
    Arrow-batched stage — the dedup pass that catches the
    width/ligature/case duplicate pairs ``dedup_exact_hash``'s raw
    byte hash structurally misses (every emitted group with
    exact_dedup_blind = 1 is such a catch).

    Differential: the oracle never normalizes — the planted variant
    classes are NFKC+casefold-invertible by construction, so it
    groups by md5(lower(base)) closed-form; a wrong fold (missed
    compatibility mapping, casefold-vs-lower confusion) splits a
    group and fails rows + hash.

    Scale shape: the fold is map-only (Arrow batches, no exchange);
    the group-by shuffles one 32-hex key per doc — identical posture
    to dedup_exact_hash, with keep-first min(doc_id) as the partial
    aggregate."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fold(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFKC", t).casefold()
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        F.col("doc_id").alias("base_id"), F.col("text").alias("btext")
    )
    # variant synthesis is fixture plumbing (a real corpus arrives
    # with its variants already present); the self-join shuffles on
    # base_id — no broadcast of a full text table
    var = (
        docs.select("doc_id")
        .withColumn("base_id", F.expr("doc_id - doc_id % 4"))
        .join(base, "base_id")
        .select("doc_id", F.expr(_UF_VARIANT).alias("vtext"))
    )
    return (
        var.withColumn("fh", F.md5(fold(F.col("vtext"))))
        .groupBy("fh")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("vtext").alias("n_raw_variants"),
        )
        .select(
            "first_doc",
            "n_members",
            "n_raw_variants",
            (F.col("n_raw_variants") > 1).cast("int").alias("exact_dedup_blind"),
        )
    )
