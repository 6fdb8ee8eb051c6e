"""Round-12 operator keys.

Continues the coverage program beyond the reference's ETL surface
(the reference — /root/reference — is a Go fetch loop with no
relational layer; file:line citations on each key tie the data-model
lineage back to it where one exists).  Every key follows the repo
registry contract: a Spark-first DataFrame plan plus an independent
DuckDB oracle construction (never the same SQL text run twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table, spread
from downloader_spark.plans.registry import query
from downloader_spark.operators.round11_ext import (
    _duck_clamp255,
    _duck_dec,
    _J_Q50,
    _J_QC50,
)

# ------------------------------------------------------------------
# multimodal_jpeg_420_stats — chroma-subsampled 4:2:0 color JPEG
# ------------------------------------------------------------------

# image geometry: 3x2 grid of constant 16x16 MACROBLOCKS (the 4:2:0
# MCU unit), deliberately non-square; distinct synthesis constants
# from the 4:4:4 sibling so the two keys can never share bytes
_J4_MW = 3  # macroblocks per row
_J4_MH = 2  # macroblock rows
_J4_W = _J4_MW * 16
_J4_H = _J4_MH * 16
_J4_PIX = "(doc_id * 13 + {my} * 19 + {mx} * 29 + {c} * 37) % 256"

_J4_GRID = (
    f"documents, unnest(generate_series(0, {_J4_MH - 1})) AS u(my),"
    f" unnest(generate_series(0, {_J4_MW - 1})) AS w(mx)"
)


def _jpeg_420_duck() -> str:
    """The 4:2:0 closed form as chained CTEs.  An image constant per
    16x16 macroblock keeps the whole lossy path closed-form: the 2x2
    chroma average of four equal samples is exact under any rounding,
    each of the four luma blocks inside the MCU carries the same DC,
    and replication upsampling reproduces the constant — so the CTE
    chain is RGB -> YCbCr (1e4 fixed point), per-component DC
    quantization roundtrip (luma q00 {q}, chroma q00 {qc}), YCbCr ->
    RGB (1e6 fixed point), exactly as in the 4:4:4 sibling but over
    the MACROBLOCK grid.  What the closed form does NOT forgive is
    engine-side structure: the 6-block MCU interleave (4 Y in raster
    order + Cb + Cr), the 0x22/0x11 sampling declaration, three DC
    predictor chains with 4 luma blocks per step, the subsample and
    the upsample — a mistake in any of them lands the wrong constant
    in the wrong macroblock."""
    r = _J4_PIX.format(my="my", mx="mx", c=0)
    g = _J4_PIX.format(my="my", mx="mx", c=1)
    b = _J4_PIX.format(my="my", mx="mx", c=2)
    return f"""
    rgb AS (
      SELECT doc_id, {r} AS r, {g} AS g, {b} AS b FROM {_J4_GRID}
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
    "multimodal_jpeg_420_stats",
    oracle=f"""
    WITH {_jpeg_420_duck()}
    SELECT doc_id,
           CAST({_J4_W} AS INT) AS width,
           CAST({_J4_H} AS INT) AS height,
           CAST(sum(r2) * 256 AS BIGINT) AS sum_r,
           CAST(sum(g2) * 256 AS BIGINT) AS sum_g,
           CAST(sum(b2) * 256 AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "image", "jpeg", "chroma-subsampling", "mapInPandas"),
)
def multimodal_jpeg_420_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image RGB channel sums through the REAL chroma-subsampled
    4:2:0 JPEG byte path — the last documented piece of the JPEG
    family (media.py's encode_jpeg_420/decode_jpeg_rgb): 2x2-average
    Cb/Cr subsampling, 16x16 MCUs interleaving four luma blocks + Cb
    + Cr (T.81 A.2.3), sampling-factor-general decode with
    replication upsampling — encode then decode inside the Arrow
    stage, channel-summed.

    Differential: the oracle chains the entire lossy pipeline as
    integer CTEs over the MACROBLOCK grid (see _jpeg_420_duck); the
    engine path must get the 6-block interleave, the 0x22 sampling
    declaration, the subsample/upsample pair, and all three DC
    predictor chains right to land the same 256-pixel constants.

    Shape: map-only, round-robin spread over every core; pixels never
    cross an exchange (the multimodal_jpeg_color_stats posture —
    round11_ext.py)."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_jpeg_rgb, encode_jpeg_420

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        my, mx = np.mgrid[0:_J4_MH, 0:_J4_MW]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                chans = [
                    (int(doc_id) * 13 + my * 19 + mx * 29 + c * 37) % 256
                    for c in range(3)
                ]
                img = np.repeat(
                    np.repeat(np.stack(chans, axis=-1), 16, axis=0), 16, axis=1
                ).astype(np.uint8)
                back = decode_jpeg_rgb(encode_jpeg_420(img, quality=50))
                assert back.shape == (_J4_H, _J4_W, 3)
                sums = back.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (int(doc_id), _J4_W, _J4_H,
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
# dedup_suffix_spans — exact substring dedup via per-partition
# suffix arrays (Lee et al. 2021 ExactSubstr at span granularity)
# ------------------------------------------------------------------

# minimum duplicated span length in CHARACTERS.  Deliberately shorter
# than dedup_substring_spans' floor (word 5-grams, runs >= 3 => >= 7
# verbatim tokens): a copied phrase of ~4 words is invisible to the
# shingle index but exact here.
_SUF_L = 20

# suffix-array input cap in CHARACTERS: each partition's docs build
# SAs over char-capped, doc-granular chunks so per-chunk n log^2 n
# cost is pinned and total CPU grows linearly with the corpus
# (round-15 sf1 weak flag).  Swept 256k/128k/64k on the sf1 shape
# probe: 3.15x / 2.84x / 2.23x wall at 10x with shuffle flat at
# ~9.7x (linear) and sf0.1 isolation unchanged — 64k keeps every
# lexsort round's working set cache-resident and the extra exchange
# rows are noise next to the SA CPU it removes.
_SUF_CHUNK = 1 << 16


def _suffix_array(arr):
    """Suffix array by prefix doubling: O(n log^2 n) with every
    comparison vectorized.  ``arr`` is a codepoint array; returns the
    permutation sorting all suffixes.

    Each doubling round sorts by the (rank, rank-at-offset-k) pair.
    The pair is PACKED into one int64 — rank * (n+2) + (second+1) —
    so the round is ONE unstable argsort instead of lexsort's two
    stable radix passes (~2x less sort work per round; stability is
    irrelevant because tied packed keys are exactly the pairs that
    receive equal new ranks).  Ranks are DENSIFIED up front
    (np.unique inverse, order-preserving), so every rank and every
    offset-k rank is < n and the packing never overflows its slot."""
    import numpy as np

    n = len(arr)
    rank = np.unique(arr, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        packed = rank * (n + 2)
        packed[: n - k] += rank[k:] + 1
        order = np.argsort(packed)
        p_ord = packed[order]
        new = np.empty(n, np.int64)
        diff = np.ones(n, bool)
        diff[1:] = p_ord[1:] != p_ord[:-1]
        new[order] = np.cumsum(diff) - 1
        rank = new
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


@query(
    "dedup_suffix_spans",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i, substr(text, i, {_SUF_L}) AS g
      FROM documents,
           unnest(generate_series(1, greatest(len(text) - {_SUF_L - 1}, 0)))
             AS u(i)
    ),
    dup AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
    cov AS (
      SELECT doc_id, i AS s, i + {_SUF_L - 1} AS e
      FROM pos WHERE g IN (SELECT g FROM dup)
    ),
    isl AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM cov
    ),
    grp AS (
      SELECT doc_id, s, e,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid
      FROM isl
    )
    SELECT doc_id,
           CAST(min(s) AS BIGINT) AS span_start,
           CAST(max(e) AS BIGINT) AS span_end,
           CAST(max(e) - min(s) + 1 AS BIGINT) AS span_chars
    FROM grp GROUP BY doc_id, gid
    """,
    tags=("llm", "dedup", "substring", "suffix-array", "applyInPandas"),
)
def dedup_suffix_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated-substring coverage at {_SUF_L}-char
    granularity (Lee et al. 2021's ExactSubstr, the suffix-array
    form): per document, the merged character spans covered by some
    {_SUF_L}-gram that occurs >= 2 times ANYWHERE in the corpus.
    Catches what the positional shingle index
    (dedup_substring_spans, round6_ext.py:721) structurally misses —
    a duplicated span shorter than its word-5-gram x 3-run floor.

    Spark shape — local resolve, then reconcile only the unresolved:
    1. one SUFFIX ARRAY per partition over the partition's docs
       concatenated with a non-character sentinel 0x110000
       (prefix-doubling, fully vectorized; separators make grams
       doc-bounded with no cross-partition state, and can never
       collide with content — literal NULs in documents are ordinary
       characters, exactly as the oracle's substr treats them);
    2. SA-adjacent runs with a shared {_SUF_L}-prefix resolve
       within-partition repeats LOCALLY: their coverage leaves the
       Python stage as pre-merged (doc, start, end) INTERVALS, and
       the run's gram is advertised once — repeated positions never
       reach an exchange individually;
    3. only locally-UNIQUE grams ship as (gram, doc, pos) candidates;
       a gram is corpus-duplicated iff its candidates count >= 2 or
       any partition advertised it — one hash exchange on the gram;
    4. covered intervals (local + reconciled) merge per doc by the
       running-max gaps-and-islands window.
    Coverage is partition-invariant (local-covered implies global-
    duplicated; every globally-duplicated singleton meets a matching
    candidate or advert), so round-robin spread is safe — and the
    same invariant makes the SA input CAP sound: each partition's
    docs are processed in char-capped CHUNKS (_SUF_CHUNK, doc-
    granular — separators already stop grams at doc bounds, so no
    overlap is needed), each with its own suffix array.  SA build is
    n log^2 n, so capping n pins per-chunk cost and total CPU grows
    LINEARLY with the corpus (the round-15 sf1 probe measured the
    uncapped build at 5.76x wall on 10x data; chunking is observably
    identical output because a chunk boundary is exactly a partition
    boundary the invariant already covers).  At 100 TB the exchange
    carries one row per chunk-locally-distinct gram — the worst case
    matches the standard gram-shuffle, and every within-chunk repeat
    (boilerplate, the common case in crawl data) is absorbed before
    the shuffle."""
    import numpy as np
    import pandas as pd

    n_par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    L = _SUF_L

    def resolve(batches):
        ids: list[int] = []
        texts: list[str] = []
        for pdf in batches:
            ids.extend(int(x) for x in pdf["doc_id"])
            texts.extend(str(t) for t in pdf["text"])
        def frame(kind, gram, doc, s, e):
            return pd.DataFrame(
                {
                    "kind": pd.array(kind, dtype="int32"),
                    "gram": pd.array(gram, dtype="string"),
                    "doc_id": pd.array(doc, dtype="Int64"),
                    "s": pd.array(s, dtype="Int64"),
                    "e": pd.array(e, dtype="Int64"),
                }
            )

        if not ids:
            yield frame([], [], [], [], [])
            return
        out_kind: list[int] = []
        out_gram: list[str | None] = []
        out_doc: list[int | None] = []
        out_s: list[int | None] = []
        out_e: list[int | None] = []

        def one_chunk(cids: list[int], ctexts: list[str]) -> None:
            # Separator = 0x110000, one past the last Unicode code
            # point: it can never collide with document content, so a
            # document containing a literal NUL is handled exactly
            # like the oracle's substr (which counts NUL-containing
            # grams).
            sep = np.array([0x110000], np.uint32)
            parts: list[np.ndarray] = []
            for t in ctexts:
                if parts:
                    parts.append(sep)
                parts.append(
                    np.frombuffer(t.encode("utf-32-le"), np.uint32)
                )
            arr = np.concatenate(parts) if parts else np.zeros(0, np.uint32)
            n = len(arr)
            if n < L:
                return
            sa = _suffix_array(arr)
            # valid[i]: the L-gram at sa[i] fits inside one document —
            # i.e. no separator (and no end-of-buffer) within its first
            # L chars.  sep_next[p] = position of the first separator
            # at/after p (n when none), so validity is one comparison;
            # no n x L gram matrix is ever materialized (the former
            # padded[sa[:,None]+arange(L)] cost ~4L bytes per input
            # char — ~80x the text at L=20).
            sep_next = np.minimum.accumulate(
                np.where(arr == 0x110000, np.arange(n), n)[::-1]
            )[::-1]
            valid = sa + L <= sep_next[sa]
            # eq_next[i]: suffixes sa[i] and sa[i+1] share their first
            # L chars.  Vectorized first-mismatch sweep over a
            # SHRINKING index set: adjacent SA pairs mostly diverge in
            # the first few chars, so each column pass touches only the
            # still-equal pairs — O(n) memory, no gram rows.
            eq_next = np.zeros(n, bool)
            eq_next[:-1] = valid[:-1] & valid[1:]
            a_sa, b_sa = sa[:-1], sa[1:]
            live = np.flatnonzero(eq_next[:-1])
            for j in range(L):
                if live.size == 0:
                    break
                still = arr[a_sa[live] + j] == arr[b_sa[live] + j]
                eq_next[live[~still]] = False
                live = live[still]
            # run ids over SA order: a run = maximal stretch of equal
            # valid grams (the suffix array's grouping, no hashing)
            starts_new_run = np.ones(n, bool)
            starts_new_run[1:] = ~eq_next[:-1]
            run_id = np.cumsum(starts_new_run) - 1
            # doc offsets: global position -> (doc index, 1-based pos)
            lens = np.array([len(t) for t in ctexts], np.int64)
            doc_start = np.concatenate([[0], np.cumsum(lens + 1)[:-1]])
            vpos = sa[valid]
            vrun = run_id[valid]
            run_sizes = np.bincount(vrun, minlength=run_id[-1] + 1)
            sizes_of = run_sizes[vrun]
            di = np.searchsorted(doc_start, vpos, "right") - 1
            lpos = vpos - doc_start[di] + 1  # 1-based char position
            cid_arr = np.asarray(cids, np.int64)

            def grams_at(gp: np.ndarray) -> list[str]:
                # bulk gram extraction: gather the m x L codepoint
                # windows from the chunk buffer, decode utf-32 ONCE,
                # slice the L-char pieces off the one big string —
                # replaces a per-row python str slice (the former
                # per-singleton loop was the stage's hottest python
                # line at ~1.35M candidates/pass)
                if gp.size == 0:
                    return []
                win = arr[gp[:, None] + np.arange(L)]
                big = win.tobytes().decode("utf-32-le")
                return [big[i : i + L] for i in range(0, len(big), L)]

            # singletons -> candidates for cross-chunk reconcile
            single = sizes_of == 1
            m = int(single.sum())
            if m:
                out_kind.extend([1] * m)
                out_gram.extend(grams_at(vpos[single]))
                out_doc.extend(cid_arr[di[single]].tolist())
                sp = lpos[single]
                out_s.extend(sp.tolist())
                out_e.extend((sp + (L - 1)).tolist())
            # runs >= 2: one advert per run + locally-merged intervals
            rep = single.copy()
            np.logical_not(rep, out=rep)
            if rep.any():
                first_of_run = np.zeros(len(vrun), bool)
                first_of_run[np.unique(vrun, return_index=True)[1]] = True
                adv = rep & first_of_run
                k = int(adv.sum())
                out_kind.extend([2] * k)
                out_gram.extend(grams_at(vpos[adv]))
                out_doc.extend([None] * k)
                out_s.extend([None] * k)
                out_e.extend([None] * k)
                # merge covered positions into intervals per doc:
                # sorted (doc, pos), group starts where the doc
                # changes or the gap exceeds adjacency, group end =
                # last member (positions ascend within a group)
                order = np.lexsort((lpos[rep], di[rep]))
                dd, pp = di[rep][order], lpos[rep][order]
                brk = np.ones(len(pp), bool)
                brk[1:] = (dd[1:] != dd[:-1]) | (pp[1:] > pp[:-1] + L)
                starts = np.flatnonzero(brk)
                ends = np.concatenate([starts[1:] - 1, [len(pp) - 1]])
                g = len(starts)
                out_kind.extend([0] * g)
                out_gram.extend([None] * g)
                out_doc.extend(cid_arr[dd[starts]].tolist())
                out_s.extend(pp[starts].tolist())
                out_e.extend((pp[ends] + (L - 1)).tolist())

        # char-capped, doc-granular chunking: SA cost per chunk is
        # pinned at ~_SUF_CHUNK log^2 _SUF_CHUNK regardless of how
        # large the partition grows (an oversized single doc still
        # forms its own chunk — its SA is irreducible at any layout)
        start = 0
        acc = 0
        for idx, t in enumerate(texts):
            acc += len(t)
            if acc >= _SUF_CHUNK:
                one_chunk(ids[start : idx + 1], texts[start : idx + 1])
                start = idx + 1
                acc = 0
        if start < len(texts):
            one_chunk(ids[start:], texts[start:])
        yield frame(out_kind, out_gram, out_doc, out_s, out_e)

    raw = (
        docs.repartition(n_par)
        .mapInPandas(
            resolve,
            "kind int, gram string, doc_id long, s long, e long",
        )
        .localCheckpoint()  # three consumers below; resolve runs once
    )
    cand = raw.filter(F.col("kind") == 1).select("gram", "doc_id", "s", "e")
    local_iv = raw.filter(F.col("kind") == 0).select("doc_id", "s", "e")
    # dup verdict in ONE aggregation over the non-interval rows:
    # a gram is corpus-duplicated iff >= 2 candidates OR any advert —
    # sum/max over kind computes both in one map-combinable pass,
    # where the former count-then-unionByName-then-distinct chain paid
    # an extra exchange + aggregation for the advert dedup and one
    # more full read of the checkpointed resolve output (guide §2.4)
    dup_gram = (
        raw.filter(F.col("kind") != 0)
        .groupBy("gram")
        .agg(
            F.sum(F.when(F.col("kind") == 1, 1).otherwise(0)).alias("n_cand"),
            F.max("kind").alias("mxk"),
        )
        .filter((F.col("n_cand") >= 2) | (F.col("mxk") == 2))
        .select("gram")
    )
    cross_iv = cand.join(dup_gram, "gram", "left_semi").select(
        "doc_id", "s", "e"
    )
    iv = local_iv.unionByName(cross_iv)
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        iv.withColumn(
            "brk",
            F.when(
                F.col("s")
                > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1,
                1,
            ).otherwise(0),
        )
        .withColumn("gid", F.sum("brk").over(w_run))
        .groupBy("doc_id", "gid")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            (F.max("e") - F.min("s") + 1).alias("span_chars"),
        )
        .drop("gid")
    )
    return merged


# ------------------------------------------------------------------
# udtf_lateral — Spark 4 Arrow-optimized Python UDTF (lateral join)
# ------------------------------------------------------------------


@query(
    "udtf_lateral",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, '.') AS l FROM documents
    ),
    seg AS (
      SELECT doc_id, i AS seg_idx, trim(l[i], ' ') AS t
      FROM parts, unnest(generate_series(1, len(l))) AS u(i)
    )
    SELECT doc_id,
           CAST(seg_idx AS INT) AS seg_idx,
           CAST(len(t) AS INT) AS seg_chars,
           CAST(len(regexp_extract_all(t, '[^ ]+')) AS INT) AS seg_words
    FROM seg WHERE t <> ''
    """,
    tags=("udtf", "arrow", "lateral", "text"),
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``@udtf`` table function driven through a LATERAL
    join with ``useArrow=True`` — the one modern Python-API surface
    the UDF family rows (udfs.py: pandas_udf scalar / grouped agg /
    applyInPandas) didn't yet cover.  The function is a deterministic
    text-span emitter (segments split on '.', 1-based ordinal among
    ALL split parts, kept when non-blank, with char and word counts),
    chosen precisely because plain SQL replicates it — so the Arrow
    UDTF evaluation path itself is what the oracle exact-checks.

    Shape: map-only lateral expansion (one UDTF call per row, Arrow
    batch transfer both ways, no shuffle at all); the plan gate
    asserts ArrowEvalPythonUDTF, i.e. the vectorized eval mode rather
    than pickled row-at-a-time."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="seg_idx int, seg_chars int, seg_words int",
        useArrow=True,
    )
    class SegmentEmitter:
        def eval(self, text: str):
            if text is None:
                return
            for i, p in enumerate(text.split("."), 1):
                t = p.strip(" ")
                if t:
                    yield i, len(t), sum(1 for w in t.split(" ") if w)

    spark.udtf.register("seg_emit_r12", SegmentEmitter)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return spark.sql(
        "SELECT d.doc_id, s.seg_idx, s.seg_chars, s.seg_words"
        " FROM {d} d, LATERAL seg_emit_r12(d.text) s",
        d=docs,
    )


# ------------------------------------------------------------------
# multimodal_jpeg_restart_stats — DRI/RSTn restart-interval scans
# ------------------------------------------------------------------

# distinct geometry from the plain-gray sibling (3x2): 4x3 blocks,
# restart interval 2 MCUs => 5 RSTn markers per image
_JR_BW = 4
_JR_BH = 3
_JR_W = _JR_BW * 8
_JR_H = _JR_BH * 8
_JR_RI = 2
_JR_PIX = "(doc_id * 23 + {by} * 31 + {bx} * 41) % 256"

_JR_GRID = (
    f"documents, unnest(generate_series(0, {_JR_BH - 1})) AS u(by),"
    f" unnest(generate_series(0, {_JR_BW - 1})) AS w(bx)"
)


@query(
    "multimodal_jpeg_restart_stats",
    oracle=f"""
    WITH dec AS (
      SELECT doc_id,
             {{dec}} AS d
      FROM {_JR_GRID}
    )
    SELECT doc_id,
           CAST({_JR_W} AS INT) AS width,
           CAST({_JR_H} AS INT) AS height,
           CAST(sum(d) * 64 AS BIGINT) AS sum_luma,
           CAST(min(d) AS INT) AS min_luma,
           CAST(max(d) AS INT) AS max_luma
    FROM dec GROUP BY doc_id
    """.format(dec=_duck_dec(_JR_PIX.format(by="by", bx="bx"), _J_Q50)),
    tags=("multimodal", "image", "jpeg", "restart-markers", "mapInPandas"),
)
def multimodal_jpeg_restart_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grayscale JPEG byte path under RESTART INTERVALS — encode
    with DRI={_JR_RI} (byte-aligned RSTn markers every {_JR_RI} MCUs,
    modulo-8 sequence, per-interval DC predictor resets: T.81 E.1.4,
    the stream-resynchronization form a parallel or error-tolerant
    100 TB decoder consumes), decode back through the segment-aware
    reader, and aggregate luma stats.

    Differential: constant 8x8 blocks keep the DC closed form, but
    the predictor chain now RESTARTS every {_JR_RI} blocks — an
    encoder or decoder that mishandles the reset, the marker
    sequence, or the byte alignment lands wrong constants (vs the
    plain-scan sibling multimodal_jpeg_stats where one long predictor
    chain would forgive a missing reset).

    Shape: map-only, round-robin spread (the JPEG-family posture)."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_jpeg_gray, encode_jpeg_gray

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        by, bx = np.mgrid[0:_JR_BH, 0:_JR_BW]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                vals = (int(doc_id) * 23 + by * 31 + bx * 41) % 256
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(
                    np.uint8
                )
                data = encode_jpeg_gray(
                    img, quality=50, restart_interval=_JR_RI
                )
                back = decode_jpeg_gray(data)
                assert back.shape == (_JR_H, _JR_W)
                out.append(
                    (
                        int(doc_id), _JR_W, _JR_H,
                        int(back.sum(dtype=np.int64)),
                        int(back.min()), int(back.max()),
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


# ------------------------------------------------------------------
# text_cdc_chunks — content-defined chunking (FastCDC-style) for
# chunk-level dedup
# ------------------------------------------------------------------

from downloader_spark.operators.round6_ext import _h60_duck, _h60_spark

_CDC_W = 8    # rolling-window width (chars)
_CDC_MOD = 32  # boundary when h60(window) % 32 == 0 -> ~32-char chunks


@query(
    "text_cdc_chunks",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, i
      FROM documents,
           unnest(generate_series({_CDC_W}, len(text))) AS u(i)
      WHERE {_h60_duck(f"substr(text, i - {_CDC_W - 1}, {_CDC_W})")}
              % {_CDC_MOD} = 0
      UNION
      SELECT doc_id, len(text) FROM documents WHERE len(text) >= 1
    ),
    ch AS (
      SELECT doc_id, i AS e,
             coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1
               AS s
      FROM b
    ),
    h AS (
      SELECT c.doc_id, md5(substr(d.text, CAST(c.s AS INT),
                                  CAST(c.e - c.s + 1 AS INT))) AS hh,
             c.e - c.s + 1 AS l
      FROM ch c JOIN documents d USING (doc_id)
    ),
    nd AS (SELECT hh, count(DISTINCT doc_id) AS ndocs FROM h GROUP BY hh)
    SELECT h.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           CAST(sum(CASE WHEN nd.ndocs >= 2 THEN h.l ELSE 0 END) AS BIGINT)
             AS dup_chars
    FROM h JOIN nd USING (hh)
    GROUP BY h.doc_id
    """,
    tags=("llm", "dedup", "cdc", "chunking", "text"),
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync idea, public
    work): a chunk boundary falls wherever the {_CDC_W}-char window's
    md5-derived hash is 0 mod {_CDC_MOD}, so boundaries move WITH the
    content — an insertion early in a document shifts every byte
    offset but leaves later chunk boundaries (hence chunk hashes)
    intact, which is what makes chunk-level dedup robust where
    fixed-size blocking is not.  Per doc: chunk count plus how many
    chunks (and chars) also appear verbatim in ANOTHER document —
    the storage/dedup win estimate a training-data lake computes
    before chunk-level sharing.

    Construction differential: the Spark side never window-lags —
    boundary positions fold into a per-doc SORTED ARRAY (one row per
    doc again after the aggregation) and chunk spans come from an
    index-aware ``transform`` over that array, exploded and sliced
    JVM-side; the oracle is the classic lag-window + join-back form.

    Shape: the position explode is the same token-stream-sized pass
    every text key pays, immediately collapsed map-side by the
    boundary filter (~1/{_CDC_MOD} survival) and the per-doc
    collect_set; the chunk-hash exchange then carries (doc, 32-hex,
    len) rows — never chunk text (md5 computed before the shuffle).
    Cross-doc counting is one partial-aggregated groupBy on the
    hash.  Measured alternative, rejected: evaluating the boundary
    predicate IN-ROW via filter(transform(sequence(...), i -> md5
    window hash)) avoids the explode's per-row text copy (O(len^2)
    bytes/doc — relevant at 100 KB docs) but runs 8x SLOWER at sf0.1
    (32.5 s vs 4 s): md5 inside a higher-order-function lambda drops
    the whole expression to interpreted evaluation (the
    text_lm_score CodegenFallback class).  At corpora whose docs are
    large enough for the copy to dominate, the right form is a
    mapInPandas boundary scan (the dedup_suffix_spans posture), not
    the HOF."""
    # spread: the boundary scan (one md5 per char position) is the
    # dominant cost and otherwise runs in the scan's single task
    # (profiled r16: one 2.35 s single-task stage of a 3.6 s key);
    # hash-partitioning on doc_id also lets the per-doc boundary
    # aggregation below reuse the exchange
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        key="doc_id",
    )
    pos = docs.selectExpr(
        "doc_id",
        "text",
        f"CASE WHEN length(text) >= {_CDC_W}"
        f" THEN sequence({_CDC_W}, length(text)) ELSE array() END AS idx",
    ).select("doc_id", "text", F.explode("idx").alias("i"))
    bounds = (
        pos.where(
            F.expr(
                _h60_spark(f"substring(text, i - {_CDC_W - 1}, {_CDC_W})")
                + f" % {_CDC_MOD} = 0"
            )
        )
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("bs"))
    )
    spans = (
        docs.where(F.length("text") >= 1)
        .join(bounds, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "text",
            "array_sort(array_distinct(concat(coalesce(bs, array()),"
            " array(length(text))))) AS bs",
        )
        .selectExpr(
            "doc_id",
            "text",
            # index-aware transform: span j runs from (previous
            # boundary + 1) to boundary j (1-based element_at)
            "transform(bs, (b, j) -> struct("
            " CASE WHEN j = 0 THEN 1 ELSE element_at(bs, j) + 1 END AS s,"
            " b AS e)) AS spans",
        )
        .select("doc_id", "text", F.explode("spans").alias("sp"))
        .selectExpr(
            "doc_id",
            "md5(substring(text, sp.s, sp.e - sp.s + 1)) AS hh",
            "CAST(sp.e - sp.s + 1 AS BIGINT) AS l",
        )
        .localCheckpoint()  # two consumers: per-hash fanout + per-doc agg
    )
    nd = spans.groupBy("hh").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    return (
        spans.join(nd, "hh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("ndocs") >= 2).cast("bigint")).alias("dup_chunks"),
            F.sum(
                F.when(F.col("ndocs") >= 2, F.col("l")).otherwise(F.lit(0))
            ).alias("dup_chars"),
        )
    )


# ------------------------------------------------------------------
# graph_bfs_levels — level-synchronous BFS vs a recursive-CTE oracle
# ------------------------------------------------------------------

_BFS_MIN_QTY = 45   # same co-supplier edge recipe as graph_triangles
_BFS_ORDER_CAP = 20
_BFS_SEED_MOD = 25  # seeds: suppliers with s % 25 == 0
_BFS_MAX_LEVEL = 3


def _bfs_edges(li: DataFrame) -> DataFrame:
    """Undirected co-supplier edge list (both directions), the
    graph_triangles/kcore recipe: suppliers sharing an order with
    l_quantity >= {_BFS_MIN_QTY}, orders capped at {_BFS_ORDER_CAP}
    suppliers so the per-order pair fan-out is bounded."""
    from pyspark.sql import Window as W

    su = (
        li.where(F.col("l_quantity") >= _BFS_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    capped = (
        su.withColumn("n_s", F.count(F.lit(1)).over(W.partitionBy("ok")))
        .where(F.col("n_s") <= _BFS_ORDER_CAP)
        .drop("n_s")
    )
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") != F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )


@query(
    "graph_bfs_levels",
    oracle=f"""
    WITH RECURSIVE su AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
      FROM lineitem WHERE l_quantity >= {_BFS_MIN_QTY}
    ),
    capped AS (
      SELECT ok, s FROM (
        SELECT ok, s, count(*) OVER (PARTITION BY ok) AS n_s FROM su
      ) WHERE n_s <= {_BFS_ORDER_CAP}
    ),
    e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM capped a JOIN capped b ON a.ok = b.ok AND a.s <> b.s
    ),
    bfs AS (
      SELECT DISTINCT u AS node, 0 AS level FROM e
      WHERE u % {_BFS_SEED_MOD} = 0
      UNION
      SELECT e.v, bfs.level + 1 FROM bfs JOIN e ON e.u = bfs.node
      WHERE bfs.level < {_BFS_MAX_LEVEL}
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(min(level) AS INT) AS level
    FROM bfs GROUP BY node
    """,
    tags=("graph", "bfs", "iterative", "traversal"),
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-synchronous breadth-first search: minimum hop distance
    (<= {_BFS_MAX_LEVEL}) from the seed suppliers (s %
    {_BFS_SEED_MOD} == 0) over the co-supplier graph — the reach /
    blast-radius traversal every lineage or contamination audit runs
    (which documents are within k hops of a known-bad source).

    Construction differential: the oracle is a genuine WITH RECURSIVE
    fixpoint; the Spark side is the level-synchronous unrolled form —
    per level one (frontier JOIN edges) hop, one distinct, one
    ANTI-JOIN against the visited set (so each node keeps its FIRST
    visit level = min hops), with the edge list checkpointed once and
    reused by all levels.  Agreement means the unrolled dataflow
    implements the fixpoint exactly.

    100 TB shape: each level is an equi-join of a (usually small)
    frontier against the edge table partitioned on u — frontier rows
    broadcast when tiny; the visited set grows monotonically but
    carries (node, level) longs only.  Unbounded-depth BFS would wrap
    this loop with localCheckpoint per level and a convergence check
    (dedup_clusters precedent); {_BFS_MAX_LEVEL} unrolled levels keep
    the oracle a static string."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = _bfs_edges(li).localCheckpoint()
    frontier = (
        edges.select(F.col("u").alias("node"))
        .where(F.col("node") % _BFS_SEED_MOD == 0)
        .distinct()
        .withColumn("level", F.lit(0))
    )
    visited = frontier
    for lvl in range(1, _BFS_MAX_LEVEL + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("u")), "u", "inner"
            )
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(lvl))
        )
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited.select(
        "node", F.col("level").cast("int").alias("level")
    )


# ------------------------------------------------------------------
# text_bpe_encode — tokenizer APPLICATION (fixed merge table)
# ------------------------------------------------------------------

# a pretrained merge table, applied in training order; chained so
# round 2 merges a multi-char symbol produced by round 1
_BPE_MERGES = (("t", "h"), ("th", "e"), ("a", "n"))


@query(
    "text_bpe_encode",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
      ) WHERE len(w) >= 2 AND regexp_full_match(w, '[a-z]+')
    ),
    seq AS (
      SELECT doc_id, len(w) AS n_chars,
             replace(replace(replace(
               regexp_replace(w, '(.)', '/\\1/', 'g'),
               '/{_BPE_MERGES[0][0]}//{_BPE_MERGES[0][1]}/',
               '/{_BPE_MERGES[0][0] + _BPE_MERGES[0][1]}/'),
               '/{_BPE_MERGES[1][0]}//{_BPE_MERGES[1][1]}/',
               '/{_BPE_MERGES[1][0] + _BPE_MERGES[1][1]}/'),
               '/{_BPE_MERGES[2][0]}//{_BPE_MERGES[2][1]}/',
               '/{_BPE_MERGES[2][0] + _BPE_MERGES[2][1]}/') AS s
      FROM words
    ),
    tok AS (
      SELECT doc_id, n_chars,
             (len(s) - len(replace(s, '/', ''))) // 2 AS n_tokens
      FROM seq
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) - sum(n_tokens) AS BIGINT) AS n_merges
    FROM tok GROUP BY doc_id
    """,
    tags=("llm", "text", "tokenizer", "bpe"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of text_bpe_train_steps
    (round11_ext.py trains the merge table; this key ENCODES the
    corpus with one): each alphabetic word is exploded to wrapped
    characters and the pretrained merges {_BPE_MERGES} are applied in
    training order via the /sym/-wrapped replace chain (greedy
    left-to-right in both engines = real BPE merge semantics; merge 2
    consumes merge 1's multi-char output, so ordering is load-
    bearing).  Emits per-doc word/char/token/merge counts — the
    tokens-per-doc statistic every pretraining mix is budgeted in.

    Shape: pure one-pass JVM string rewriting (explode, three codegen
    replaces, two aggregations — no Python, no iteration, no
    collect); the merge table rides along as literals exactly like a
    production tokenizer-apply stage broadcasts its vocab.  At 100 TB
    this is embarrassingly parallel: the only exchange is the final
    partial-aggregated per-doc rollup."""
    m = _BPE_MERGES
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("w"),
        )
        .where(F.length("w") >= 2)
        .where(F.col("w").rlike("^[a-z]+$"))
    )
    seq = words.selectExpr(
        "doc_id",
        "length(w) AS n_chars",
        "replace(replace(replace("
        " regexp_replace(w, '(.)', '/$1/'),"
        f" '/{m[0][0]}//{m[0][1]}/', '/{m[0][0] + m[0][1]}/'),"
        f" '/{m[1][0]}//{m[1][1]}/', '/{m[1][0] + m[1][1]}/'),"
        f" '/{m[2][0]}//{m[2][1]}/', '/{m[2][0] + m[2][1]}/') AS s",
    )
    tok = seq.selectExpr(
        "doc_id",
        "n_chars",
        "(length(s) - length(replace(s, '/', ''))) DIV 2 AS n_tokens",
    )
    return tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum("n_chars") - F.sum("n_tokens")).alias("n_merges"),
    )


# ------------------------------------------------------------------
# multimodal_adpcm_roundtrip — IMA ADPCM audio codec byte path
# ------------------------------------------------------------------

from downloader_spark.media import _ADPCM_INDEX, _ADPCM_STEPS

_ADPCM_N = 48  # samples per clip (recursion depth for the oracle)
_ADPCM_SYNTH = "((doc_id * 37 + i * i * 13) % 65536) - 32768"


def _adpcm_duck() -> str:
    """The ENTIRE IMA encode+decode as one recursive integer fold:
    the decoder reconstructs exactly the encoder's predictor chain,
    so decoded[i] is the encoder's post-update predictor — one
    (pred, step-index) recursion replicates the whole lossy codec.
    DuckDB's lateral alias reuse lets each step's intermediates (step
    size, magnitude bits b4/b2/b1, reconstruction delta) chain inside
    a single SELECT; the step/index tables ride as list literals."""
    steps = "[" + ", ".join(str(v) for v in _ADPCM_STEPS) + "]"
    index = "[" + ", ".join(str(v) for v in _ADPCM_INDEX) + "]"
    return f"""
    r AS (
        SELECT doc_id, 0 AS i, 0 AS pred, 0 AS idx,
               CAST(0 AS BIGINT) AS sum_abs, CAST(0 AS BIGINT) AS sum_err
        FROM documents
      UNION ALL
        SELECT doc_id, i + 1, new_pred, new_idx,
               sum_abs + abs(new_pred), sum_err + abs(new_pred - s)
        FROM (
          SELECT doc_id, i, pred, idx, sum_abs, sum_err,
                 {_ADPCM_SYNTH} AS s,
                 ({steps})[idx + 1] AS step,
                 abs(s - pred) AS adiff,
                 CASE WHEN adiff >= step THEN 1 ELSE 0 END AS b4,
                 adiff - b4 * step AS d2,
                 CASE WHEN d2 >= step // 2 THEN 1 ELSE 0 END AS b2,
                 d2 - b2 * (step // 2) AS d3,
                 CASE WHEN d3 >= step // 4 THEN 1 ELSE 0 END AS b1,
                 step // 8 + b4 * step + b2 * (step // 2)
                   + b1 * (step // 4) AS vpdiff,
                 GREATEST(-32768, LEAST(32767,
                   pred + CASE WHEN s < pred THEN -vpdiff ELSE vpdiff END))
                   AS new_pred,
                 GREATEST(0, LEAST(88,
                   idx + ({index})[b4 * 4 + b2 * 2 + b1 + 1])) AS new_idx
          FROM r WHERE i < {_ADPCM_N}
        )
    )"""


@query(
    "multimodal_adpcm_roundtrip",
    oracle=f"""
    WITH RECURSIVE {_adpcm_duck()}
    SELECT doc_id,
           CAST({_ADPCM_N} AS INT) AS n_samples,
           CAST(sum_abs AS BIGINT) AS sum_abs_decoded,
           CAST(sum_err AS BIGINT) AS sum_abs_err,
           CAST(pred AS INT) AS last_pred
    FROM r WHERE i = {_ADPCM_N}
    """,
    tags=("multimodal", "audio", "adpcm", "codec", "mapInPandas"),
)
def multimodal_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed AUDIO through a real codec byte path — IMA/DVI
    ADPCM (public 1992 spec; WAV format tag 0x0011): each doc's
    deterministic {_ADPCM_N}-sample int16 waveform is encoded to
    genuine 4-bit ADPCM nibbles (packed two per byte) and decoded
    back inside the Arrow stage (media.py's encode_adpcm /
    decode_adpcm), then reduced to decoded-signal and
    reconstruction-error sums plus the final predictor.  Retires the
    compressed-audio gap in the codec family (WAV was PCM-only).

    Differential: the codec is pure INTEGER arithmetic on a (pred,
    step-index) state, so the oracle replays the entire lossy
    encode+decode as a {_ADPCM_N}-deep recursive CTE — nibble
    quantization thresholds, reconstruction rounding (step>>3 base),
    both clamps, and the index walk must all match bit-for-bit;
    the jumpy full-range synth waveform exercises predictor clamping
    and step-table saturation at both ends.

    Shape: map-only, round-robin spread (the codec-family posture);
    the oracle recursion is |docs| x {_ADPCM_N} rows — oracle-side
    cost only, never the engine's."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_adpcm, encode_adpcm

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        i = np.arange(_ADPCM_N, dtype=np.int64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                s = ((int(doc_id) * 37 + i * i * 13) % 65536) - 32768
                dec = decode_adpcm(
                    encode_adpcm(s.tolist()), _ADPCM_N
                ).astype(np.int64)
                out.append(
                    (
                        int(doc_id), _ADPCM_N,
                        int(np.abs(dec).sum()),
                        int(np.abs(dec - s).sum()),
                        int(dec[-1]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sum_abs_decoded",
                    "sum_abs_err", "last_pred",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, n_samples int, sum_abs_decoded long,"
        " sum_abs_err long, last_pred int",
    )


# ------------------------------------------------------------------
# multimodal_mulaw_roundtrip — G.711 mu-law companding byte path
# ------------------------------------------------------------------

_ULAW_N = 64
_ULAW_SYNTH = "((doc_id * 29 + i * 101) % 65536) - 32768"


@query(
    "multimodal_mulaw_roundtrip",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_ULAW_SYNTH} AS v
      FROM documents, unnest(generate_series(0, {_ULAW_N - 1})) AS u(i)
    ),
    enc AS (
      SELECT doc_id, v,
             CASE WHEN v < 0 THEN 1 ELSE 0 END AS sign,
             LEAST(abs(v), 32635) + 132 AS m
      FROM s
    ),
    seg AS (
      SELECT doc_id, v, sign, m, len(bin(m)) - 8 AS e FROM enc
    ),
    dec AS (
      SELECT doc_id, v,
             CASE WHEN sign = 1 THEN 132 - t ELSE t - 132 END AS d
      FROM (
        SELECT doc_id, v, sign,
               (((m >> (e + 3)) & 15) * 8 + 132) << e AS t
        FROM seg
      )
    )
    SELECT doc_id,
           CAST({_ULAW_N} AS INT) AS n_samples,
           CAST(sum(abs(d)) AS BIGINT) AS sum_abs_decoded,
           CAST(sum(abs(d - v)) AS BIGINT) AS sum_abs_err,
           CAST(max(abs(d - v)) AS INT) AS max_abs_err
    FROM dec GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "g711", "companding", "mapInPandas"),
)
def multimodal_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 mu-law companding (the public telephony standard)
    through the real byte path: each doc's deterministic
    {_ULAW_N}-sample int16 waveform is companded to genuine 8-bit
    mu-law bytes and expanded back inside the Arrow stage (media.py's
    fully-vectorized encode_mulaw/decode_mulaw), then reduced to
    decoded-signal and quantization-error sums.  Completes the audio
    family: PCM (WAV), adaptive differential (ADPCM), and logarithmic
    companding.

    Differential: mu-law is stateless per sample, so the oracle is
    the closed integer form straight from the spec — bias, clip,
    segment from the bit length (len(bin(m)) - 8), mantissa
    extraction, midpoint reconstruction, sign fold — while the engine
    side packs and unpacks real uint8 bytes; the synth waveform
    sweeps the full int16 range, so every segment (and the clip) is
    exercised.

    Shape: map-only, round-robin spread (codec-family posture)."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_mulaw, encode_mulaw

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        i = np.arange(_ULAW_N, dtype=np.int64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                v = ((int(doc_id) * 29 + i * 101) % 65536) - 32768
                d = decode_mulaw(encode_mulaw(v)).astype(np.int64)
                out.append(
                    (
                        int(doc_id), _ULAW_N,
                        int(np.abs(d).sum()),
                        int(np.abs(d - v).sum()),
                        int(np.abs(d - v).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sum_abs_decoded",
                    "sum_abs_err", "max_abs_err",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, n_samples int, sum_abs_decoded long,"
        " sum_abs_err long, max_abs_err int",
    )


# ------------------------------------------------------------------
# multimodal_alaw_roundtrip — G.711 A-law companding byte path
# ------------------------------------------------------------------

_ALAW_N = 64
_ALAW_SYNTH = "((doc_id * 31 + i * 97) % 65536) - 32768"


@query(
    "multimodal_alaw_roundtrip",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_ALAW_SYNTH} AS v
      FROM documents, unnest(generate_series(0, {_ALAW_N - 1})) AS u(i)
    ),
    m AS (
      -- the 13-bit domain: v >> 3 as a FLOOR division (DuckDB // and
      -- Spark DIV truncate toward zero, so negatives need the
      -- -((-v + 7) // 8) form)
      SELECT doc_id, v,
             CASE WHEN v >= 0 THEN v // 8 ELSE -((-v + 7) // 8) END AS m13
      FROM s
    ),
    enc AS (
      SELECT doc_id, v, m13 >= 0 AS pos,
             CASE WHEN m13 >= 0 THEN m13 ELSE -m13 - 1 END AS mag
      FROM m
    ),
    seg AS (
      SELECT doc_id, v, pos, mag,
             GREATEST(len(bin(mag)) - 5, 0) AS e
      FROM enc
    ),
    dec AS (
      SELECT doc_id, v,
             -- decoded magnitude: mant back to the segment midpoint
             CASE WHEN pos THEN 1 ELSE -1 END
               * CASE WHEN e = 0 THEN mant * 16 + 8
                      WHEN e = 1 THEN mant * 16 + 264
                      ELSE (mant * 16 + 264) << (e - 1) END AS d
      FROM (
        SELECT doc_id, v, pos, e,
               (mag >> GREATEST(e, 1)) & 15 AS mant
        FROM seg
      )
    )
    SELECT doc_id,
           CAST({_ALAW_N} AS INT) AS n_samples,
           CAST(sum(abs(d)) AS BIGINT) AS sum_abs_decoded,
           CAST(sum(abs(d - v)) AS BIGINT) AS sum_abs_err,
           CAST(max(abs(d - v)) AS INT) AS max_abs_err
    FROM dec GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "g711", "companding", "mapInPandas"),
)
def multimodal_alaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 A-law companding — the mu-law sibling with different
    structure everywhere it matters: a 13-bit operating domain
    (arithmetic >>3, which is a FLOOR shift the oracle must spell as
    a negative-safe division), ones-complement negative magnitudes,
    the alternating-bit 0x55 XOR convention, an INVERTED sign-bit
    meaning versus mu-law, and segment-0/1 special cases in the
    reconstruction.  Engine side companded to real bytes and back
    (media.py's vectorized encode_alaw/decode_alaw); oracle is the
    closed integer form.  Together with mu-law this closes both
    halves of the G.711 standard.

    Shape: map-only, round-robin spread (codec-family posture)."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_alaw, encode_alaw

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        i = np.arange(_ALAW_N, dtype=np.int64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                v = ((int(doc_id) * 31 + i * 97) % 65536) - 32768
                d = decode_alaw(encode_alaw(v)).astype(np.int64)
                out.append(
                    (
                        int(doc_id), _ALAW_N,
                        int(np.abs(d).sum()),
                        int(np.abs(d - v).sum()),
                        int(np.abs(d - v).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sum_abs_decoded",
                    "sum_abs_err", "max_abs_err",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, n_samples int, sum_abs_decoded long,"
        " sum_abs_err long, max_abs_err int",
    )
