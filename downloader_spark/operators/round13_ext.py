"""Round-13 operator keys.

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

from downloader_spark.io import load_table
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
