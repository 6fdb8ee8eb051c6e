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

from downloader_spark.io import load_table
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
