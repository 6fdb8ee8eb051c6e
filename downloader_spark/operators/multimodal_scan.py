"""Binary-file inventory scan as a registered query key.

The reference's only catalog is the bucket listing itself
(/root/reference/file/api.go:52-65, NamesToMD5); the Spark-native
equivalent is a ``binaryFile`` scan projected to (file, size) — the
inventory DataFrame of SURVEY §1.4/D1.  The payload decode pipeline
built on the same scan lives in ``downloader_spark.multimodal``.

Oracle note: DuckDB's ``read_blob`` needs a literal path, so the
oracle pins the driver's correctness scale directory (sf0.01) — the
Spark side receives the same directory via ``sf_dir``.  DuckDB 1.0
cannot md5 a BLOB, so the digest column (computed JVM-side in the
full inventory, multimodal.with_media_metadata) is excluded from the
checked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.multimodal import scan_binary
from downloader_spark.plans.registry import query


@query(
    "multimodal_inventory",
    oracle="""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file,
           size AS size_bytes
    FROM read_blob('/root/testdata/sf0.01/*.parquet')
    """,
    tags=("multimodal", "scan"),
)
def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory of a binary corpus: one row per file with basename
    and byte size.  binaryFile scans parallelize per file and the
    ``content`` column is pruned away here — the scan reads only file
    metadata, not payloads."""
    return scan_binary(spark, sf_dir, glob="*.parquet").select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"),
        F.col("length").alias("size_bytes"),
    )


CHUNK_BYTES = 256


@query(
    "multimodal_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, CAST(len(text) AS BIGINT) AS nb FROM documents
    ), g AS (
      SELECT doc_id, text, nb,
             unnest(generate_series(0, CAST((nb - 1) // {CHUNK_BYTES} AS BIGINT)))
               AS ci
      FROM t WHERE nb > 0
    )
    SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
           CAST(ci * {CHUNK_BYTES} AS BIGINT) AS start_byte,
           CAST(LEAST({CHUNK_BYTES}, nb - ci * {CHUNK_BYTES}) AS BIGINT)
             AS chunk_bytes,
           md5(substring(text, CAST(ci * {CHUNK_BYTES} + 1 AS BIGINT),
                         {CHUNK_BYTES})) AS chunk_md5
    FROM g
    """,
    tags=("multimodal", "chunking", "explode"),
)
def multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size byte-range chunking of an opaque payload — the
    blob-splitting step a multimodal pipeline runs before per-chunk
    upload/hashing/dedup (the reference streams whole objects,
    common.go:103-111; content-defined or fixed chunking is how
    that generalizes when objects stop fitting in one part).  Each
    payload explodes into ceil(len/{CHUNK_BYTES}) ranges carrying
    offset, length, and the chunk's own md5 — the manifest a
    content-addressed store or a multipart upload wants.

    The documents corpus stands in for the binary column (it is
    pure ASCII, test-asserted, so byte arithmetic == char
    arithmetic and both engines hash identical slices; a real
    binary column would swap substring for a byte slice with the
    same plan).  Shuffle-free map + explode, like text_chunk — the
    chunk manifest streams out of the scan at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "text", F.length("text").cast("long").alias("nb")
    ).filter(F.col("nb") > 0)
    g = t.select(
        "doc_id",
        "text",
        "nb",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.expr(f"(nb - 1) DIV {CHUNK_BYTES}"))
        ).alias("ci"),
    )
    return g.select(
        "doc_id",
        F.col("ci").cast("long").alias("chunk_idx"),
        (F.col("ci") * CHUNK_BYTES).cast("long").alias("start_byte"),
        F.least(F.lit(CHUNK_BYTES), F.col("nb") - F.col("ci") * CHUNK_BYTES)
        .cast("long")
        .alias("chunk_bytes"),
        F.md5(
            F.expr(f"substring(text, CAST(ci * {CHUNK_BYTES} + 1 AS INT), {CHUNK_BYTES})")
        ).alias("chunk_md5"),
    )


# Uniform frame sampling: frames drawn per asset, evenly spaced.
FRAME_SAMPLES = 8
# Deterministic fake media clock (no codecs in this container): an
# asset's duration is derived from its size — the Spark-side plumbing
# (schema, explode shape, per-frame fingerprint) is real and checked.
FRAME_DUR_BASE_MS = 1_000
FRAME_DUR_MOD_MS = 59_000


@query(
    "multimodal_frames",
    oracle=f"""
    WITH assets AS (
      SELECT doc_id,
             CAST({FRAME_DUR_BASE_MS} + (n_chars * 7) % {FRAME_DUR_MOD_MS}
                  AS BIGINT) AS duration_ms
      FROM documents
    )
    SELECT doc_id, duration_ms,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(i * duration_ms // {FRAME_SAMPLES} AS BIGINT) AS ts_ms,
           md5(CAST(doc_id AS VARCHAR) || ':' ||
               CAST(i * duration_ms // {FRAME_SAMPLES} AS VARCHAR)) AS frame_md5
    FROM assets, unnest(generate_series(0, {FRAME_SAMPLES - 1})) AS t(i)
    """,
    tags=("multimodal", "video", "frames"),
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame sampling for video-shaped assets: K=8 evenly
    spaced sample timestamps per asset plus a per-frame fingerprint —
    the manifest a frame-extraction stage consumes (decode itself is
    stubbed: no codec libraries in this container, so the "frame" is
    a deterministic md5 of (asset, timestamp); the plumbing — per-
    asset duration metadata, explode fanout, sampling arithmetic,
    fingerprint schema — is the real Spark shape and is what the
    oracle checks).

    Timestamps are i*duration DIV K — integer floor division, exact
    in both engines.  Shuffle-free: metadata projection + explode
    streams straight out of the scan; at 100 TB the manifest joins
    back to the binary payloads by doc_id for the Arrow-batched
    mapInPandas decode (downloader_spark.multimodal), never the
    other way around."""
    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        "doc_id",
        F.expr(
            f"CAST({FRAME_DUR_BASE_MS} + (n_chars * 7) % {FRAME_DUR_MOD_MS} AS BIGINT)"
        ).alias("duration_ms"),
    )
    frames = assets.select(
        "doc_id",
        "duration_ms",
        F.explode(F.sequence(F.lit(0), F.lit(FRAME_SAMPLES - 1))).alias("i"),
    )
    ts = F.expr(f"i * duration_ms DIV {FRAME_SAMPLES}")
    return frames.select(
        "doc_id",
        "duration_ms",
        F.col("i").cast("long").alias("frame_idx"),
        ts.cast("long").alias("ts_ms"),
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), ts.cast("string"))
        ).alias("frame_md5"),
    )
