"""Round-11 operators: the real-bytes BASELINE JPEG family.

The pure-stdlib T.81 codec in downloader_spark/media.py (forward/
inverse DCT, Annex-K quantization with libjpeg quality scaling,
Annex-K Huffman entropy coding, JFIF markers) retires the grayscale
half of the JPEG stub in multimodal.py.  These keys run genuine
encode→decode byte paths inside Arrow ``mapInPandas`` stages and are
ORACLE-EXACT through the closed-form DC quantization math: every
synthesized image is constant per 8x8 block, so the whole lossy
pipeline collapses to one integer formula per block that DuckDB
replicates —

    x    = 8 * (v - 128)                       (DC of a constant block)
    DCq  = sign(x) * (2*|x| + q00) // (2*q00)  (round half away)
    dec  = clamp((2*DCq*q00 + 2056) // 16, 0, 255)

(the final // is truncation in BOTH engines; its numerator only goes
negative when dec clamps to 0 anyway).  Any defect anywhere in the
byte path — DCT, zigzag, Huffman tables, bit stuffing, marker layout
— breaks the hash, exactly the closed-form-synthesis posture of the
round-10 PNG/WAV/Y4M keys (round10_ext.py:414).

Reference analog: payloads are opaque byte streams the reference
never decodes (download/common.go:106); decode sits strictly
downstream of ingest, where these stages sit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table, spread
from downloader_spark.plans.registry import query

# image geometry: 3x2 grid of constant 8x8 blocks (deliberately
# non-square so width/height transposition cannot cancel out)
_J_BW = 3  # blocks per row
_J_BH = 2  # block rows
_J_W = _J_BW * 8
_J_H = _J_BH * 8
_J_PIX = "(doc_id * 11 + {by} * 17 + {bx} * 23) % 256"

# q00 = scaled Annex-K DC quantizer (jpeg_qtable(q)[0]); all three are
# powers of two, so DC'/8 in the decoder is never an exact half and
# the closed form is float-hazard-free end to end
_J_QUALITIES = ((25, 32), (50, 16), (75, 8))
_J_Q50 = 16


def _duck_dec(v: str, q00: int) -> str:
    """Closed-form decoded value of a constant block of ``v``."""
    x = f"(8 * (({v}) - 128))"
    dcq = (
        f"(CASE WHEN {x} >= 0 THEN (2 * {x} + {q00}) // {2 * q00}"
        f" ELSE -((2 * -{x} + {q00}) // {2 * q00}) END)"
    )
    return f"GREATEST(0, LEAST(255, (2 * {dcq} * {q00} + 2056) // 16))"


_J_BLOCK_GRID = (
    f"documents, unnest(generate_series(0, {_J_BH - 1})) AS u(by),"
    f" unnest(generate_series(0, {_J_BW - 1})) AS w(bx)"
)


@query(
    "multimodal_jpeg_stats",
    oracle=f"""
    WITH dec AS (
      SELECT doc_id,
             {_duck_dec(_J_PIX.format(by="by", bx="bx"), _J_Q50)} AS d
      FROM {_J_BLOCK_GRID}
    )
    SELECT doc_id,
           CAST({_J_W} AS INT) AS width,
           CAST({_J_H} AS INT) AS height,
           CAST(sum(d) * 64 AS BIGINT) AS sum_luma,
           CAST(min(d) AS INT) AS min_luma,
           CAST(max(d) AS INT) AS max_luma
    FROM dec GROUP BY doc_id
    """,
    tags=("multimodal", "image", "jpeg", "mapInPandas"),
)
def multimodal_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image geometry + exact luma stats through the REAL baseline
    JPEG byte path: each doc's deterministic grayscale image (constant
    per 8x8 block) is ENCODED to a genuine JFIF baseline JPEG
    (quality 50) and DECODED back inside an Arrow ``mapInPandas``
    stage (media.py's stdlib T.81 codec), then summed/min/maxed.

    Differential: the oracle never sees a byte — it recomputes every
    block's decoded value from the DC-quantization closed form, so
    the DCT, the quality-scaled quant table, the Huffman layer, bit
    stuffing, and the marker walk must ALL be correct for the hash to
    match (lossy-but-deterministic, unlike the lossless PNG sibling).

    Shape: map-only; pipelines with a binaryFile scan at production
    scale (the multimodal_inventory posture)."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_jpeg_gray, encode_jpeg_gray

    # CPU-dense Python stage over one parquet file's key column:
    # round-robin repartition spreads codec work across every core
    # (multimodal_png_stats precedent, round10_ext.py:453)
    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        by, bx = np.mgrid[0:_J_BH, 0:_J_BW]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                vals = (int(doc_id) * 11 + by * 17 + bx * 23) % 256
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                back = decode_jpeg_gray(
                    encode_jpeg_gray(img.astype(np.uint8), quality=50)
                )
                assert back.shape == (_J_H, _J_W)
                out.append(
                    (
                        int(doc_id),
                        _J_W,
                        _J_H,
                        int(back.sum(dtype=np.int64)),
                        int(back.min()),
                        int(back.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height",
                    "sum_luma", "min_luma", "max_luma",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int,"
        " sum_luma long, min_luma int, max_luma int",
    )


@query(
    "multimodal_jpeg_quality_sweep",
    oracle=f"""
    WITH sweep AS (
      {" UNION ALL ".join(
          f'''SELECT {q} AS quality, doc_id,
                 abs({_duck_dec(_J_PIX.format(by="by", bx="bx"), q00)}
                     - ({_J_PIX.format(by="by", bx="bx")})) AS err
              FROM {_J_BLOCK_GRID}'''
          for q, q00 in _J_QUALITIES
      )}
    )
    SELECT quality,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(err) * 64 AS BIGINT) AS total_abs_err
    FROM sweep GROUP BY quality
    """,
    tags=("multimodal", "image", "jpeg", "tuning", "mapInPandas"),
)
def multimodal_jpeg_quality_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-loss sweep: every image encoded AND decoded at
    quality 25/50/75 through the real JPEG byte path, reporting the
    corpus-total absolute reconstruction error per quality — the
    rate/distortion measurement a pipeline designer runs before
    committing a 100 TB image corpus to one setting (the LSH
    band-tuning analog for the codec family).

    Differential: per-quality q00 literals ({dict(_J_QUALITIES)})
    drive the same closed form in DuckDB; the three qualities cover
    both scaling regimes of the libjpeg quant formula (5000/q below
    50, 200-2q above).

    Shape: map-only sweep (3 encodes/decodes per image) feeding a
    6-row aggregate; the shuffle carries (quality, err) longs only."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_jpeg_gray, encode_jpeg_gray

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)
    qualities = [q for q, _ in _J_QUALITIES]

    def run(batches):
        by, bx = np.mgrid[0:_J_BH, 0:_J_BW]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                vals = (int(doc_id) * 11 + by * 17 + bx * 23) % 256
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
                    np.uint8
                )
                for q in qualities:
                    back = decode_jpeg_gray(encode_jpeg_gray(img, quality=q))
                    err = int(
                        np.abs(
                            back.astype(np.int64) - img.astype(np.int64)
                        ).sum()
                    )
                    out.append((q, int(doc_id), err))
            yield pd.DataFrame(out, columns=["quality", "doc_id", "abs_err"])

    per_doc = docs.mapInPandas(run, "quality int, doc_id long, abs_err long")
    return per_doc.groupBy("quality").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("abs_err").cast("long").alias("total_abs_err"),
    )


# ------------------------------------------------------------------
# graph_resource_alloc — Resource-Allocation link prediction
# ------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402

from downloader_spark.operators.llm_dedup import (  # noqa: E402
    _DUCK_SHINGLE_CTE,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    N_BANDS,
    N_HASHES,
    _duck_h60,
    hashed_shingle_sets,
)
from downloader_spark.operators.round9b_ext import (  # noqa: E402
    _CN_MIN,
    _KCORE_MIN_QTY,
    _KCORE_ORDER_CAP,
)

_RA_GRAPH_CTE = f"""
    su AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
      FROM lineitem WHERE l_quantity >= {_KCORE_MIN_QTY}
    ),
    capped AS (
      SELECT ok, s FROM (
        SELECT ok, s, count(*) OVER (PARTITION BY ok) AS n_s FROM su
      ) WHERE n_s <= {_KCORE_ORDER_CAP}
    ),
    e AS (
      SELECT DISTINCT a.s AS a, b.s AS b
      FROM capped a JOIN capped b ON a.ok = b.ok AND a.s < b.s
    ),
    adj AS (
      SELECT a AS node, b AS nb FROM e
      UNION ALL SELECT b, a FROM e
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
    )
"""


@query(
    "graph_resource_alloc",
    oracle=f"""
    WITH {_RA_GRAPH_CTE},
    shared AS (
      SELECT x.node AS u, y.node AS v, x.nb AS z
      FROM adj x JOIN adj y ON x.nb = y.nb AND x.node < y.node
    ),
    scored AS (
      SELECT s.u, s.v,
             CAST(count(*) AS BIGINT) AS common,
             CAST(sum(1000000 // dz.d) AS BIGINT) AS ra_upm
      FROM shared s JOIN deg dz ON dz.node = s.z
      GROUP BY s.u, s.v
      HAVING count(*) >= {_CN_MIN}
    )
    SELECT sc.u, sc.v, sc.common, sc.ra_upm,
           l.a IS NOT NULL AS already_linked
    FROM scored sc
    LEFT JOIN e l ON l.a = sc.u AND l.b = sc.v
    """,
    tags=("graph", "link-prediction"),
)
def graph_resource_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction (Zhou/Lü/Zhang 2009,
    public work) on the co-supplier graph: for every non-/already-
    linked pair sharing >= {_CN_MIN} neighbors, RA = Σ_z 1/deg(z)
    over the SHARED neighbors z — the index that discounts promiscuous
    hubs, where plain common-neighbor counting (graph_common_neighbors)
    treats every witness equally.  Emitted in exact integer
    micro-units (1e6 DIV deg) so both engines agree to the last digit.

    Shape: the candidate join is the adjacency self-join ON THE SHARED
    NEIGHBOR (fan-out bounded by the order-cap in the edge recipe);
    unlike the common-neighbor key the intermediate z RIDES THROUGH
    the join so its degree can weight the pair — one extra broadcast-
    sized equi-join on deg(z), then the same (u, v) aggregation.
    Never all-pairs; hub damping is the POINT of the statistic."""
    li = load_table(spark, sf_dir, "lineitem")
    su = (
        li.where(F.col("l_quantity") >= _KCORE_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    capped = (
        su.withColumn("n_s", F.count(F.lit(1)).over(Window.partitionBy("ok")))
        .where(F.col("n_s") <= _KCORE_ORDER_CAP)
        .drop("n_s")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = edges.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionAll(
        edges.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    x = adj.alias("x")
    y = adj.alias("y")
    shared = x.join(
        y, (F.col("x.nb") == F.col("y.nb")) & (F.col("x.node") < F.col("y.node"))
    ).select(
        F.col("x.node").alias("u"), F.col("y.node").alias("v"),
        F.col("x.nb").alias("z"),
    )
    scored = (
        shared.join(
            F.broadcast(deg.select(F.col("node").alias("z"), F.col("d").alias("dz"))),
            "z",
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum(F.expr("1000000 DIV dz")).cast("long").alias("ra_upm"),
        )
        .where(F.col("common") >= _CN_MIN)
    )
    linked = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.lit(True).alias("lk")
    )
    return scored.join(linked, ["u", "v"], "left").select(
        "u", "v", "common", "ra_upm",
        F.coalesce(F.col("lk"), F.lit(False)).alias("already_linked"),
    )


# ------------------------------------------------------------------
# dedup_minhash_estimate_error — sketch-vs-exact calibration
# ------------------------------------------------------------------


@query(
    "dedup_minhash_estimate_error",
    oracle=f"""
    WITH {_DUCK_SHINGLE_CTE},
    hsets AS (
      SELECT doc_id,
             list_distinct(list_transform(sh, s -> {_duck_h60("s")})) AS hh
      FROM shingled
    ),
    hps AS (
      SELECT doc_id, hh, list_transform(hh, x -> x % {MINHASH_P}) AS hp
      FROM hsets
    ),
    sigs AS (
      SELECT doc_id, hh,
             list_transform(generate_series(0, {N_HASHES - 1}),
               i -> list_aggregate(
                      list_transform(hp,
                        x -> ({MINHASH_A}[i + 1] * x + {MINHASH_B}[i + 1])
                             % {MINHASH_P}),
                      'min')) AS sig
      FROM hps
    ),
    bands AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(0, {N_BANDS - 1}),
               b -> concat(b, ':', md5(concat(sig[2*b+1], ',', sig[2*b+2]))))) AS band
      FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT len(list_filter(generate_series(1, {N_HASHES}),
                             i -> sa.sig[i] = sb.sig[i])) AS agree,
             len(list_intersect(sa.hh, sb.hh)) AS inter,
             len(sa.hh) + len(sb.hh) - len(list_intersect(sa.hh, sb.hh)) AS un
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.doc_a
      JOIN sigs sb ON sb.doc_id = c.doc_b
    ),
    errs AS (
      SELECT agree,
             abs(agree * 1000000 // {N_HASHES} - inter * 1000000 // un) AS err
      FROM scored
    )
    SELECT CAST(agree AS INT) AS agree,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(err) AS BIGINT) AS sum_abs_err_ppm,
           CAST(max(err) AS BIGINT) AS max_abs_err_ppm
    FROM errs GROUP BY agree
    """,
    tags=("llm", "dedup", "sketch", "observability"),
)
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash CALIBRATION: for every banded candidate pair, the
    sketch's Jaccard estimate (matching signature positions / 12)
    against the EXACT Jaccard, bucketed by agreement count — the
    measurement that tells a pipeline designer whether 12 hashes are
    enough before trusting the sketch on a 100 TB corpus ("measure,
    don't guess" applied to the sketch itself).

    Shape: candidates from the production banding (never all-pairs);
    the exact side reuses the hashed-postings co-occurrence count;
    the estimate side is a 12-column signature comparison on the
    already-joined pair rows — everything integer (ppm floors), so
    the oracle (which rebuilds the identical hash family) matches to
    the digit.  Output is |distinct agreement levels| rows."""
    docs = load_table(spark, sf_dir, "documents")
    ss = hashed_shingle_sets(docs).localCheckpoint()
    hp = ss.withColumn("hp", F.expr(f"pmod(h, {MINHASH_P})"))
    sigs = hp.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"pmod({MINHASH_A[i]} * hp + {MINHASH_B[i]}, {MINHASH_P})")
            ).alias(f"m{i}")
            for i in range(N_HASHES)
        ]
    ).localCheckpoint()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}:"),
                        F.md5(
                            F.concat(
                                F.col(f"m{2*b}").cast("string"),
                                F.lit(","),
                                F.col(f"m{2*b+1}").cast("string"),
                            )
                        ),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    )
    ba = bands.alias("a")
    bb = bands.alias("b")
    cand = (
        ba.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact intersection via the postings co-occurrence count (the
    # _verified_pairs recipe, unfiltered: calibration needs the low-
    # similarity candidates too)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ssc = ss.join(cand_docs, "doc_id", "left_semi")
    sizes = ss.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    inter = (
        cand.join(ssc.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(ssc.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sig_a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(N_HASHES)],
    )
    sig_b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(N_HASHES)],
    )
    agree_expr = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    scored = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            agree_expr.alias("agree"),
            F.coalesce(F.col("inter"), F.lit(0)).alias("inter"),
            (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0))).alias(
                "un"
            ),
        )
        .withColumn(
            "err",
            F.abs(
                F.expr(f"agree * 1000000 DIV {N_HASHES}")
                - F.expr("inter * 1000000 DIV un")
            ),
        )
    )
    return scored.groupBy(F.col("agree").cast("int").alias("agree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("err").cast("long").alias("sum_abs_err_ppm"),
        F.max("err").cast("long").alias("max_abs_err_ppm"),
    )


# ------------------------------------------------------------------
# text_bpe_train_steps — iterative BPE merge training (3 rounds)
# ------------------------------------------------------------------

_BPE_STEPS = 3

# DuckDB replica: the same three merge rounds as chained CTEs.  Each
# symbol is wrapped /sym/, so the winning pair's textual form
# '/a//b/' matches ONLY whole adjacent symbols (a bare 'a b' search
# would false-match inside multi-char symbols after round 1), and
# replace() consumes matches left-to-right exactly like the greedy
# merge pass of a real BPE trainer.
_BPE_VOCAB_CTE = """
    vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS nw
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) >= 2 AND regexp_full_match(w, '[a-z]+')
      GROUP BY w
    ),
    s0 AS (
      SELECT regexp_replace(w, '(.)', '/\\1/', 'g') AS seq, nw FROM vocab
    )
"""


def _bpe_duck_round(r: int) -> str:
    """pairs -> winner -> merged-sequences CTEs for round ``r``."""
    return f"""
    l{r} AS (
      SELECT string_split(substr(seq, 2, len(seq) - 2), '//') AS l, nw
      FROM s{r}
    ),
    p{r} AS (
      SELECT l[i] AS a, l[i + 1] AS b, CAST(sum(nw) AS BIGINT) AS n
      FROM l{r}, unnest(generate_series(1, len(l) - 1)) AS t(i)
      GROUP BY 1, 2
    ),
    w{r} AS (SELECT a, b, n FROM p{r} ORDER BY n DESC, a, b LIMIT 1),
    s{r + 1} AS (
      SELECT replace(seq, '/' || w{r}.a || '//' || w{r}.b || '/',
                     '/' || w{r}.a || w{r}.b || '/') AS seq, nw
      FROM s{r}, w{r}
    )"""


@query(
    "text_bpe_train_steps",
    oracle=f"""
    WITH {_BPE_VOCAB_CTE},
    {",".join(_bpe_duck_round(r) for r in range(_BPE_STEPS))}
    {" UNION ALL ".join(
        f"SELECT {r + 1} AS step, a AS sym_a, b AS sym_b,"
        f" a || b AS merged, n FROM w{r}"
        for r in range(_BPE_STEPS)
    )}
    """,
    tags=("llm", "text", "tokenizer", "bpe", "iterative"),
)
def text_bpe_train_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, {_BPE_STEPS} merge rounds (Sennrich et
    al. 2016, public work) — the iterative loop ``text_bpe_pairs``
    measures one round of: count adjacent symbol pairs over the
    frequency-weighted vocab, merge the argmax pair (ties broken
    lexicographically) in every word, repeat.  Output is the merge
    TABLE — (step, pair, merged symbol, weighted count) — the actual
    artifact a tokenizer trainer persists.

    Scale shape: like every real BPE trainer, the working set is the
    VOCAB (distinct words + counts), not the corpus — pair counting
    and merging cost O(|vocab| x word length) per round.  Each round
    is one map-side-combinable pair count + one argmax (a 1-row
    collect — the iterative-driver pattern of graph_pagerank /
    embed_kmeans) + one codegen'd string rewrite; the vocab table is
    localCheckpointed so round k+1 reads materialized partitions, not
    a growing lineage.  Greedy left-to-right merge semantics come
    from ``replace()``'s scan order, identical in both engines; the
    /sym/ wrapping keeps matches whole-symbol (an unwrapped 'a b'
    would false-match inside multi-char symbols after round 1)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") >= 2) & F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    seqs = vocab.select(
        F.regexp_replace("w", "(.)", "/$1/").alias("seq"), "nw"
    ).localCheckpoint()
    merges = []
    for step in range(1, _BPE_STEPS + 1):
        pairs = (
            seqs.select(
                F.expr(
                    "split(substr(seq, 2, length(seq) - 2), '//')"
                ).alias("l"),
                "nw",
            )
            # fully-merged words carry no pairs; Spark's sequence(0, -1)
            # would DESCEND (DuckDB's generate_series is empty) — drop
            # single-symbol rows before pair extraction
            .filter(F.expr("size(l) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(l) - 2),"
                        " i -> struct(l[i] AS a, l[i + 1] AS b))"
                    )
                ).alias("p"),
                "nw",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("nw").cast("long").alias("n"))
        )
        rows = pairs.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()
        if not rows:  # vocab exhausted (degenerate corpus): stop early
            break
        win = rows[0]
        merges.append((step, win.a, win.b, win.a + win.b, win.n))
        seqs = seqs.select(
            F.expr(
                f"replace(seq, '/{win.a}//{win.b}/', '/{win.a}{win.b}/')"
            ).alias("seq"),
            "nw",
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step int, sym_a string, sym_b string, merged string, n long"
    )


# ------------------------------------------------------------------
# agg_hll_distinct — real HyperLogLog, exact register math
# ------------------------------------------------------------------

from downloader_spark.operators.llm_dedup import _spark_h60  # noqa: E402

_HLL_M = 64  # registers (p = 6)
_HLL_WBITS = 54  # 60-bit hash: 6 bucket bits, 54 rank bits
# alpha_64 = 0.7213 / (1 + 1.079/64) = 0.709342...; the raw-estimate
# numerator alpha * m^2 in 1e-4 fixed point (7093 * 4096), times the
# 2^55 register scaling — exceeds int64, so HUGEINT / DECIMAL(38,0)
_HLL_ALPHA_1E4 = 7093


def hll_registers(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, m): the MERGEABLE HLL register table over
    any (event_type, user_id) DataFrame — the persisted artifact the
    batch key folds and the streaming incremental form unions across
    micro-batches (merge = max per register, so per-batch tables
    union and re-aggregate losslessly)."""
    hashed = ev.select(
        "event_type",
        F.expr(
            _spark_h60("concat('hll:', CAST(user_id AS STRING))")
        ).alias("h"),
    )
    parts = hashed.select(
        "event_type",
        F.expr(f"h % {_HLL_M}").alias("bucket"),
        F.expr(f"h DIV {_HLL_M}").alias("w"),
    )
    rank = (
        F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(F.lit(_HLL_WBITS + 1) - F.length(F.bin("w")))
    )
    return (
        parts.withColumn("r", rank)
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
    )


def hll_fold(regs: DataFrame) -> DataFrame:
    """Fold a register table (possibly a UNION of per-batch tables —
    re-maxed here, so merging is implicit) into (event_type,
    sum_scaled, n_zero, hll_raw_est)."""
    merged = regs.groupBy("event_type", "bucket").agg(
        F.max("m").alias("m")
    )
    folded = merged.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS + 1} - m)"))
        .cast("long")
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    num = _HLL_ALPHA_1E4 * _HLL_M * _HLL_M * (1 << (_HLL_WBITS + 1))
    return folded.select(
        "event_type",
        (
            F.col("s_present")
            + (F.lit(_HLL_M) - F.col("n_present"))
            * F.lit(1 << (_HLL_WBITS + 1))
        ).cast("long").alias("sum_scaled"),
        (F.lit(_HLL_M) - F.col("n_present")).cast("int").alias("n_zero"),
    ).withColumn(
        "hll_raw_est",
        F.expr(
            f"CAST(CAST({num} AS DECIMAL(38,0))"
            f" DIV (CAST(10000 AS DECIMAL(38,0)) * sum_scaled) AS BIGINT)"
        ),
    )


@query(
    "agg_hll_distinct",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type,
             {_duck_h60("concat('hll:', CAST(user_id AS VARCHAR))")} AS h
      FROM events
    ),
    parts AS (
      SELECT event_type, h % {_HLL_M} AS bucket, h // {_HLL_M} AS w
      FROM hashed
    ),
    regs AS (
      SELECT event_type, bucket,
             max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                      ELSE {_HLL_WBITS + 1} - len(bin(w)) END) AS m
      FROM parts GROUP BY event_type, bucket
    ),
    folded AS (
      SELECT event_type,
             CAST(sum(1::BIGINT << ({_HLL_WBITS + 1} - m)) AS BIGINT)
               AS s_present,
             CAST(count(*) AS BIGINT) AS n_present
      FROM regs GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    ),
    summed AS (
      SELECT f.event_type, e.n_exact,
             f.s_present
               + ({_HLL_M} - f.n_present)
                 * (1::BIGINT << {_HLL_WBITS + 1}) AS sum_scaled,
             CAST({_HLL_M} - f.n_present AS INT) AS n_zero
      FROM folded f JOIN exact e ON e.event_type = f.event_type
    )
    SELECT event_type, n_exact, sum_scaled, n_zero,
           CAST(({_HLL_ALPHA_1E4}::HUGEINT * {_HLL_M * _HLL_M}
                 * (1::HUGEINT << {_HLL_WBITS + 1}))
                // (10000::HUGEINT * sum_scaled) AS BIGINT) AS hll_raw_est
    FROM summed
    """,
    tags=("aggregate", "sketch", "hll", "observability"),
)
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL HyperLogLog (Flajolet et al. 2007, public work) built
    from relational algebra, run NEXT TO the exact distinct count it
    estimates — per event type, the {_HLL_M}-register sketch of
    distinct users: md5-derived 60-bit hash → 6 bucket bits + 54 rank
    bits, register = max leading-rank per bucket, harmonic fold, raw
    estimate alpha·m²/V.  Unlike `agg_approx` (Spark's built-in HLL++
    checked rows-only), every intermediate here is EXACT integer
    arithmetic the oracle replicates digit-for-digit: ranks via
    bit-length (len(bin(w))), the harmonic sum scaled by 2^55 so each
    2^-M term is an integer shift (never float), and the estimate as
    one HUGEINT/DECIMAL(38,0) division.  Emits the raw estimator plus
    n_zero (the input a linear-counting correction would take) beside
    n_exact — the sketch-accuracy audit, sibling to
    `dedup_minhash_estimate_error`.

    Shape: one partial-aggregated shuffle to (type, bucket) registers
    (|types| x {_HLL_M} rows — the mergeable persisted artifact; at
    100 TB rollups union registers and re-fold, never re-scan), then
    a |types|-row fold.  The exact count is a second aggregation on
    the same exchange key family."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    regs = hll_registers(ev)
    folded = regs.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS + 1} - m)"))
        .cast("long")
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    summed = folded.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.col("s_present")
            + (F.lit(_HLL_M) - F.col("n_present"))
            * F.lit(1 << (_HLL_WBITS + 1))
        ).cast("long").alias("sum_scaled"),
        (F.lit(_HLL_M) - F.col("n_present")).cast("int").alias("n_zero"),
    )
    num = _HLL_ALPHA_1E4 * _HLL_M * _HLL_M * (1 << (_HLL_WBITS + 1))
    return summed.withColumn(
        "hll_raw_est",
        F.expr(
            f"CAST(CAST({num} AS DECIMAL(38,0))"
            f" DIV (CAST(10000 AS DECIMAL(38,0)) * sum_scaled) AS BIGINT)"
        ),
    )


# ------------------------------------------------------------------
# events_markov_stationary — power iteration on the transition matrix
# ------------------------------------------------------------------

_MK_ITERS = 3
_MK_SCALE = 1_000_000  # fixed-point ppm


def _mk_duck_round(r: int) -> str:
    """One fixed-point power-iteration step as a CTE: v'(b) = sum_a
    floor(v(a) * P(a,b) / 1e6) — the floor is applied PER TERM, so
    the contract is bit-deterministic regardless of add order."""
    return f"""
    v{r + 1} AS (
      SELECT p.to_type AS event_type,
             CAST(sum(v.w * p.prob_ppm // {_MK_SCALE}) AS BIGINT) AS w
      FROM v{r} v JOIN p ON p.from_type = v.event_type
      GROUP BY p.to_type
    )"""


@query(
    "events_markov_stationary",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    p AS (
      SELECT from_type, to_type,
             CAST(n * {_MK_SCALE} // SUM(n) OVER (PARTITION BY from_type)
                  AS BIGINT) AS prob_ppm
      FROM c
    ),
    states AS (SELECT DISTINCT from_type AS event_type FROM c),
    v0 AS (
      SELECT event_type,
             CAST({_MK_SCALE} // (SELECT count(*) FROM states) AS BIGINT) AS w
      FROM states
    ),
    {",".join(_mk_duck_round(r) for r in range(_MK_ITERS))}
    SELECT event_type, w AS stationary_ppm FROM v{_MK_ITERS}
    """,
    tags=("events", "analytics", "iterative", "markov"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain by
    {_MK_ITERS} POWER-ITERATION steps over `events_transitions`'
    matrix — "where do user sessions spend their time in the limit",
    the chain-level summary the per-edge matrix can't give directly.

    All arithmetic is fixed-point ppm with the floor applied PER TERM
    (v'(b) = Σ_a floor(v(a)·P(a,b)/1e6)), so the result is exactly
    reproducible in any engine and independent of float addition
    order — the same bit-determinism discipline as graph_pagerank's
    integer contributions.  Mass lost to flooring (< |states| ppm per
    step) is the documented contract, not drift.

    Shape: one window shuffle on user_id builds the pair counts; the
    matrix is |types|² rows (tiny, broadcast) and each iteration is a
    broadcast join + |types|-row aggregate — iteration cost is
    independent of corpus size, exactly how a 100 TB chain summary
    should behave.  Unrolled {_MK_ITERS}x like graph_pagerank."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    c = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = c.select(
        "from_type",
        "to_type",
        F.expr(f"n * {_MK_SCALE} DIV sum(n) OVER (PARTITION BY from_type)")
        .alias("prob_ppm"),
    ).localCheckpoint()
    states = p.select(F.col("from_type").alias("event_type")).distinct()
    n_states = states.count()  # |types| — a scalar, the iterative-driver pattern
    v = states.select(
        "event_type", F.lit(_MK_SCALE // max(n_states, 1)).cast("long").alias("w")
    )
    for _ in range(_MK_ITERS):
        v = (
            v.join(
                F.broadcast(p),
                v.event_type == p.from_type,
            )
            .groupBy(F.col("to_type").alias("et"))
            .agg(
                F.sum(F.expr(f"w * prob_ppm DIV {_MK_SCALE}"))
                .cast("long")
                .alias("w")
            )
            .select(F.col("et").alias("event_type"), "w")
        )
    return v.select("event_type", F.col("w").alias("stationary_ppm"))


# ------------------------------------------------------------------
# multimodal_jpeg_color_stats — 3-component 4:4:4 color byte path
# ------------------------------------------------------------------

# per-channel synthesis (constant per 8x8 block, distinct per channel)
_J_RGBPIX = "(doc_id * 11 + {by} * 17 + {bx} * 23 + {c} * 31) % 256"
_J_QC50 = 17  # jpeg_qtable(50, chroma=True)[0] — Annex-K K.2 DC entry


def _duck_clamp255(e: str) -> str:
    return f"GREATEST(0, LEAST(255, {e}))"


def _jpeg_color_duck() -> str:
    """The full color closed form as chained CTEs: fixed-point RGB ->
    YCbCr, per-component DC-quantization roundtrip (luma q00
    {_J_Q50}, chroma q00 {_J_QC50}), fixed-point YCbCr -> RGB.  Every
    divide is a truncating integer division whose numerator is only
    negative when the result clamps to 0, so trunc-vs-floor can never
    diverge between the engines and the codec."""
    r = _J_RGBPIX.format(by="by", bx="bx", c=0)
    g = _J_RGBPIX.format(by="by", bx="bx", c=1)
    b = _J_RGBPIX.format(by="by", bx="bx", c=2)
    return f"""
    rgb AS (
      SELECT doc_id, {r} AS r, {g} AS g, {b} AS b FROM {_J_BLOCK_GRID}
    ),
    ycc AS (
      SELECT doc_id,
        {_duck_clamp255("(2990*r + 5870*g + 1140*b + 5000) // 10000")} AS y,
        {_duck_clamp255("(-1687*r - 3313*g + 5000*b + 1285000) // 10000")} AS cb,
        {_duck_clamp255("(5000*r - 4187*g - 813*b + 1285000) // 10000")} AS cr
      FROM rgb
    ),
    dec AS (
      SELECT doc_id,
             {_duck_dec("y", _J_Q50)} AS y2,
             {_duck_dec("cb", _J_QC50)} AS cb2,
             {_duck_dec("cr", _J_QC50)} AS cr2
      FROM ycc
    ),
    px AS (
      SELECT doc_id,
        {_duck_clamp255(
            "(1000000*y2 + 1402000*(cr2 - 128) + 500000) // 1000000")} AS r2,
        {_duck_clamp255(
            "(1000000*y2 - 344136*(cb2 - 128) - 714136*(cr2 - 128)"
            " + 500000) // 1000000")} AS g2,
        {_duck_clamp255(
            "(1000000*y2 + 1772000*(cb2 - 128) + 500000) // 1000000")} AS b2
      FROM dec
    )"""


@query(
    "multimodal_jpeg_color_stats",
    oracle=f"""
    WITH {_jpeg_color_duck()}
    SELECT doc_id,
           CAST({_J_W} AS INT) AS width,
           CAST({_J_H} AS INT) AS height,
           CAST(sum(r2) * 64 AS BIGINT) AS sum_r,
           CAST(sum(g2) * 64 AS BIGINT) AS sum_g,
           CAST(sum(b2) * 64 AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "image", "jpeg", "color", "mapInPandas"),
)
def multimodal_jpeg_color_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image RGB channel sums through the REAL 3-component COLOR
    JPEG byte path: fixed-point YCbCr transform, 4:4:4 interleaved
    MCUs, Annex-K luminance AND chrominance quantization tables —
    encode then decode inside the Arrow stage (media.py's
    encode_jpeg_color/decode_jpeg_rgb), channel-summed.  Retires the
    color half of the JPEG stub (chroma SUBSAMPLING remains the
    honest out-of-scope piece).

    Differential: the oracle chains the ENTIRE lossy pipeline as
    integer CTEs — RGB→YCbCr (1e4 fixed point), three per-component
    DC-quantization roundtrips (luma q00 {_J_Q50}, chroma q00
    {_J_QC50} — the chroma table's non-power-of-two entry exercises
    the closed form off the dyadic easy case), YCbCr→RGB (1e6 fixed
    point) — so the color transform, both quant tables, interleaved
    MCU ordering, and three DC predictor chains must all be right.

    Shape: map-only, round-robin spread, same posture as the
    grayscale sibling."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_jpeg_rgb, encode_jpeg_color

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        by, bx = np.mgrid[0:_J_BH, 0:_J_BW]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                chans = [
                    (int(doc_id) * 11 + by * 17 + bx * 23 + c * 31) % 256
                    for c in range(3)
                ]
                img = np.repeat(
                    np.repeat(np.stack(chans, axis=-1), 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                back = decode_jpeg_rgb(encode_jpeg_color(img, quality=50))
                assert back.shape == (_J_H, _J_W, 3)
                sums = back.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (int(doc_id), _J_W, _J_H,
                     int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int,"
        " sum_r long, sum_g long, sum_b long",
    )


# ------------------------------------------------------------------
# text_keyword_rake — RAKE keyword extraction (islands shape)
# ------------------------------------------------------------------

# delimiter words for phrase candidacy (RAKE stopword role); small
# fixed list matching the corpus register
_RAKE_STOPS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")
_RAKE_TOP_K = 40


@query(
    "text_keyword_rake",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, i AS pos, t.w AS w,
             t.w IN {_RAKE_STOPS} AS is_stop
      FROM (
        SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
      ), unnest(generate_series(1, len(l))) AS u(i),
        LATERAL (SELECT l[i] AS w) t
      WHERE len(t.w) >= 2 AND regexp_full_match(t.w, '[a-z]+')
    ),
    isl AS (
      SELECT doc_id, pos, w,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM (SELECT * FROM toks WHERE NOT is_stop)
    ),
    ph AS (
      SELECT doc_id, grp, w,
             count(*) OVER (PARTITION BY doc_id, grp) AS plen
      FROM isl
    ),
    wscore AS (
      SELECT w,
             CAST(sum(plen) * 1000 // count(*) AS BIGINT) AS score_milli
      FROM ph GROUP BY w
    ),
    phrases AS (
      SELECT doc_id, grp,
             string_agg(p.w, ' ' ORDER BY p.pos) AS phrase,
             CAST(sum(s.score_milli) AS BIGINT) AS score_milli
      FROM (SELECT doc_id, grp, w, pos FROM isl) p
      JOIN wscore s ON s.w = p.w
      GROUP BY doc_id, grp
    ),
    ranked AS (
      SELECT phrase,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             max(score_milli) AS score_milli
      FROM phrases GROUP BY phrase
    )
    SELECT phrase, n_occurrences, score_milli,
           CAST(row_number() OVER (ORDER BY score_milli DESC, phrase)
                AS INT) AS rank
    FROM ranked
    QUALIFY rank <= {_RAKE_TOP_K}
    """,
    tags=("llm", "text", "keywords", "islands"),
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, public work): split
    each document at delimiter words, score every remaining CONTIGUOUS
    word run (candidate phrase) by the summed degree/frequency ratio
    of its words, report the corpus top-{_RAKE_TOP_K} phrases.

    Relational shape: phrase segmentation is the GAPS-AND-ISLANDS
    trick (pos - row_number over the non-stop rows groups each
    contiguous run without any per-doc UDF), word scores are one
    aggregation over the islands (deg(w) = Σ phrase-length via a
    whole-partition count window, freq(w) = row count — score kept in
    exact integer milli-units), and the phrase score re-joins word
    scores back to the islands.  Everything shuffles (long, string)
    rows; the global top-k is a 40-row TakeOrdered tail."""
    # spread the single-split scan before the explode + per-token
    # regex (CPU-dense map work; no-op at 100 TB) — hash-partitioning
    # on doc_id is the distribution the island window needs, so no
    # further exchange is planned for it
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        key="doc_id",
    )
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "w"),
        )
        .filter((F.length("w") >= 2) & F.col("w").rlike("^[a-z]+$"))
    )
    nonstop = toks.filter(~F.col("w").isin(*_RAKE_STOPS))
    wi = Window.partitionBy("doc_id").orderBy("pos")
    isl = nonstop.withColumn(
        "grp", F.col("pos") - F.row_number().over(wi)
    )
    wp = Window.partitionBy("doc_id", "grp")
    ph = isl.withColumn("plen", F.count(F.lit(1)).over(wp))
    wscore = ph.groupBy("w").agg(
        F.expr("CAST(sum(plen) * 1000 DIV count(*) AS BIGINT)").alias(
            "score_milli"
        )
    )
    phrases = (
        isl.join(wscore, "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(pos, w))),"
                       " s -> s.w)"),
                " ",
            ).alias("phrase"),
            F.sum("score_milli").cast("long").alias("score_milli"),
        )
    )
    ranked = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("score_milli").alias("score_milli"),
    )
    top = ranked.orderBy(
        F.col("score_milli").desc(), "phrase"
    ).limit(_RAKE_TOP_K)
    wr = Window.orderBy(F.col("score_milli").desc(), "phrase")
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "phrase", "n_occurrences", "score_milli", "rank"
    )


# ------------------------------------------------------------------
# events_bot_detection — traffic-hygiene heuristics (islands + lag)
# ------------------------------------------------------------------

_BOT_MIN_EVENTS = 20
_BOT_GAP_DUP_PPM = 400_000  # >= 40% duplicated inter-arrival gaps
_BOT_MAX_RUN = 8  # >= 8 consecutive identical event types


@query(
    "events_bot_detection",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
             CASE WHEN event_type = lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)
               THEN 0 ELSE 1 END AS brk
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS run_id
      FROM seq
    ),
    runlen AS (
      SELECT user_id, CAST(max(n) AS BIGINT) AS max_type_run
      FROM (
        SELECT user_id, run_id, count(*) AS n
        FROM runs GROUP BY user_id, run_id
      ) GROUP BY user_id
    ),
    gaps AS (
      SELECT user_id,
             CAST(count(gap_us) AS BIGINT) AS n_gaps,
             CAST(count(DISTINCT gap_us) AS BIGINT) AS n_distinct_gaps
      FROM seq GROUP BY user_id
    ),
    base AS (
      SELECT g.user_id,
             CAST(n_gaps + 1 AS BIGINT) AS n_events,
             n_gaps,
             CASE WHEN n_gaps > 0
                  THEN (n_gaps - n_distinct_gaps) * 1000000 // n_gaps
                  ELSE 0 END AS dup_gap_ppm,
             r.max_type_run
      FROM gaps g JOIN runlen r ON r.user_id = g.user_id
    )
    SELECT user_id, n_events, dup_gap_ppm, max_type_run,
           n_events >= {_BOT_MIN_EVENTS}
             AND (dup_gap_ppm >= {_BOT_GAP_DUP_PPM}
                  OR max_type_run >= {_BOT_MAX_RUN}) AS is_bot
    FROM base
    """,
    tags=("events", "hygiene", "islands", "window"),
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-hygiene BOT heuristics per user — the pre-training
    corpus question "is this activity organic?" asked of the event
    stream: (1) inter-arrival REGULARITY (share of duplicated gap
    values in ppm — schedulers fire on fixed periods, humans don't),
    (2) the longest run of identical event types (islands via the
    classic break-flag running sum), with a conjunction flag at
    >= {_BOT_MIN_EVENTS} events and (>= 40% duplicate gaps or a run
    of {_BOT_MAX_RUN}).

    Shape: ONE window shuffle on user_id drives the lag-gap, the
    break flags, and the running run-id (same partitioning, Catalyst
    plans one exchange); run lengths and gap distinctness are then
    two partial-aggregated rollups.  Total order (ts, event_id) keeps
    ties engine-stable."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wo))
        ).alias("gap_us"),
        F.when(
            F.col("event_type") == F.lag("event_type").over(wo), 0
        ).otherwise(1).alias("brk"),
    )
    # ONE windowed pass feeds both rollups: without the checkpoint,
    # column pruning specializes the two consumers' subtrees (gap_us
    # vs brk/run_id) so neither ReusedExchange nor a shared scan
    # survives — measured 2 full event scans + 2 window shuffles.
    runs = seq.withColumn(
        "run_id",
        F.sum("brk").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).localCheckpoint()
    runlen = (
        runs.groupBy("user_id", "run_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.max("n").cast("long").alias("max_type_run"))
    )
    gaps = runs.groupBy("user_id").agg(
        F.count("gap_us").cast("long").alias("n_gaps"),
        F.countDistinct("gap_us").cast("long").alias("n_distinct_gaps"),
    )
    base = gaps.join(runlen, "user_id").select(
        "user_id",
        (F.col("n_gaps") + 1).cast("long").alias("n_events"),
        "n_gaps",
        F.when(
            F.col("n_gaps") > 0,
            F.expr("(n_gaps - n_distinct_gaps) * 1000000 DIV n_gaps"),
        ).otherwise(F.lit(0)).cast("long").alias("dup_gap_ppm"),
        "max_type_run",
    )
    return base.select(
        "user_id",
        "n_events",
        "dup_gap_ppm",
        "max_type_run",
        (
            (F.col("n_events") >= _BOT_MIN_EVENTS)
            & (
                (F.col("dup_gap_ppm") >= _BOT_GAP_DUP_PPM)
                | (F.col("max_type_run") >= _BOT_MAX_RUN)
            )
        ).alias("is_bot"),
    )


# ------------------------------------------------------------------
# pipeline_multimodal — end-to-end image-corpus dedup pipeline
# ------------------------------------------------------------------

from downloader_spark.operators.round10_ext import (  # noqa: E402
    _PH_CELLS,
    _PNG_H,
    _PNG_W,
    _phash_gray_sql,
)


@query(
    "pipeline_multimodal",
    oracle=f"""
    WITH cells AS (
      SELECT doc_id, source,
             y2 * {_PH_CELLS} + x2 AS cell,
             {_phash_gray_sql(f"(y2 * {_PNG_H}) // {_PH_CELLS}",
                              f"(x2 * {_PNG_W}) // {_PH_CELLS}")} AS gray
      FROM documents,
           unnest(generate_series(0, {_PH_CELLS - 1})) AS u(y2),
           unnest(generate_series(0, {_PH_CELLS - 1})) AS v(x2)
    ),
    tot AS (
      SELECT doc_id, sum(gray) AS total FROM cells GROUP BY doc_id
    ),
    bits AS (
      SELECT c.doc_id, c.source, c.cell,
             CASE WHEN c.gray * {_PH_CELLS * _PH_CELLS} > t.total
                  THEN '1' ELSE '0' END AS b
      FROM cells c JOIN tot t ON c.doc_id = t.doc_id
    ),
    sigs AS (
      SELECT doc_id, source, string_agg(b, '' ORDER BY cell) AS ahash
      FROM bits GROUP BY doc_id, source
    ),
    keep AS (
      SELECT doc_id, source, ahash,
             doc_id = min(doc_id) OVER (PARTITION BY ahash) AS kept
      FROM sigs
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
           CAST((count(*) - count(CASE WHEN kept THEN 1 END)) * 1000000
                // count(*) AS BIGINT) AS drop_ppm
    FROM keep GROUP BY source
    """,
    tags=("multimodal", "pipeline", "image", "dedup", "mapInPandas"),
)
def pipeline_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END image-corpus pipeline (the multimodal sibling of
    ``pipeline_corpus``): real PNG bytes decoded in the Arrow stage →
    aHash perceptual signature → global first-wins keep-list (min
    doc_id per signature — the deterministic survivor rule of
    ``dedup_exact_hash``) → per-source retention report, the summary
    a 100 TB image-ingest run publishes.

    Composes the round-10 byte path and the A5 survivor discipline in
    one plan: the codec stage emits (doc_id, source, 64-bit ahash),
    the keep-list is one window min over the signature, and the
    report is one |sources|-row rollup — pixels never pass an
    exchange.

    Differential: the oracle recomputes signatures closed-form
    (never sees a byte) and replays the same survivor rule."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_png, encode_png, resize_nearest

    n = spark.sparkContext.defaultParallelism
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .repartition(n)
    )
    w, h, g = _PNG_W, _PNG_H, _PH_CELLS

    def run(batches):
        yy, xx = np.mgrid[0:h, 0:w]
        for pdf in batches:
            out = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                px = np.stack(
                    [
                        (int(doc_id) * 7 + yy * 13 + xx * 5 + c * 3) % 256
                        for c in range(3)
                    ],
                    axis=-1,
                ).astype(np.uint8)
                small = resize_nearest(decode_png(encode_png(px)), g, g)
                gray = small.astype(np.int64).sum(axis=2)
                total = int(gray.sum())
                bits = (gray.reshape(-1) * (g * g) > total).astype(np.uint8)
                out.append(
                    (int(doc_id), str(source),
                     "".join("1" if b else "0" for b in bits))
                )
            yield pd.DataFrame(out, columns=["doc_id", "source", "ahash"])

    sigs = docs.mapInPandas(run, "doc_id long, source string, ahash string")
    w_cl = Window.partitionBy("ahash")
    keep = sigs.withColumn(
        "kept", F.col("doc_id") == F.min("doc_id").over(w_cl)
    )
    return keep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.count(F.when(F.col("kept"), 1)).cast("long").alias("n_kept"),
        F.expr(
            "CAST((count(1) - count(CASE WHEN kept THEN 1 END)) * 1000000"
            " DIV count(1) AS BIGINT)"
        ).alias("drop_ppm"),
    )


# ------------------------------------------------------------------
# sample_group_split — group-integrity train/val split + leakage audit
# ------------------------------------------------------------------

_GS_FOLDS = 5


@query(
    "sample_group_split",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id, event_id,
             {_duck_h60("concat('fold:', CAST(user_id AS VARCHAR))")}
               % {_GS_FOLDS} AS fold
      FROM events
    ),
    per_fold AS (
      SELECT fold,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(count(*) AS BIGINT) AS n_events
      FROM assigned GROUP BY fold
    ),
    leak AS (
      SELECT CAST(count(*) AS BIGINT) AS n_leaky_users FROM (
        SELECT user_id FROM assigned
        GROUP BY user_id HAVING count(DISTINCT fold) > 1
      )
    )
    SELECT p.fold, p.n_users, p.n_events,
           CAST(p.n_events * 1000000
                // sum(p.n_events) OVER () AS BIGINT) AS share_ppm,
           l.n_leaky_users
    FROM per_fold p CROSS JOIN leak l
    """,
    tags=("sampling", "training", "split", "audit"),
)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-INTEGRITY k-fold split (GroupKFold semantics): every
    event lands in the fold of its USER (md5-derived hash mod
    {_GS_FOLDS}), so no user's data can leak across train/validation
    — the split discipline ``sample_split`` (per-row) cannot give.
    Emits per-fold user/event counts and share, WITH the leakage
    audit inline: n_leaky_users counts users observed in more than
    one fold, and must be 0 by construction — the audit is computed
    from the assigned data, not assumed, so a broken hash or a
    nondeterministic assignment surfaces as a nonzero column (and a
    hash mismatch).

    Shape: assignment is a stateless row-local hash (no shuffle);
    both rollups partial-aggregate on small keys; the leakage audit
    groups by user (the natural event-table clustering).  Fold
    assignment by deterministic hash is exactly how a 100 TB corpus
    splits without a coordination pass."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    assigned = ev.select(
        "user_id",
        "event_id",
        F.expr(
            _spark_h60("concat('fold:', CAST(user_id AS STRING))")
            + f" % {_GS_FOLDS}"
        ).alias("fold"),
    )
    per_fold = assigned.groupBy("fold").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    leak = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .where(F.col("nf") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaky_users"))
    )
    return (
        per_fold.withColumn(
            "share_ppm",
            F.expr("CAST(n_events * 1000000 DIV sum(n_events) OVER () AS BIGINT)"),
        )
        .crossJoin(F.broadcast(leak))
        .select(
            "fold", "n_users", "n_events", "share_ppm", "n_leaky_users"
        )
    )
