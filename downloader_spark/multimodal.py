"""Multimodal columns (SURVEY.md §2.B north star): opaque binary
payloads + typed metadata in one DataFrame, with decode /
feature-extract stages as Arrow-batched Python stages.

Model: an image/audio/video corpus at 100 TB is a DataFrame with a
``binary`` content column and typed metadata columns — exactly the
shape ``spark.read.format('binaryFile')`` produces (path, length,
modificationTime, content), and exactly how the reference treats its
payloads (opaque byte streams, /root/reference/download/common.go:106
``io.Copy`` — bytes are never parsed).

The decode step HERE is STUBBED: the third-party image/audio codecs
aren't in this container, so ``decode_image_features`` derives a
deterministic fake feature vector from the bytes (clearly marked;
swap the body for PIL/ffmpeg in production).  Everything AROUND the
stub — the binaryFile scan, the mapInPandas batch plumbing, the
schema contract, the partition behavior — is real and tested.  For
genuinely-real decode with zero dependencies, see
``downloader_spark.media``: pure-Python BMP / WAV / PNG (zlib, all
five filters) / YUV4MPEG2 video codecs, a baseline-sequential T.81
JPEG family (grayscale, 4:4:4 color, 4:2:0 chroma-subsampled,
restart-interval scans; vectorized DCT/Huffman — rounds 11-12), and
an IMA ADPCM audio codec (round 12), and a PFV inter-frame video
codec (round 13: I-frame + P-frames of block-skip flags and RLE'd
deltas — the structural core of H.26x prediction, rebuilt from
scratch) with decode / stats / resize stages whose bytes round-trip
through the same Arrow path.  The remaining honest stub is
full-standard H.264 itself (entropy-coded transform residuals +
motion search); its inter-frame PREDICTION structure is now real via
PFV.

Scale notes: binaryFile scans parallelize per file;
``spark.sql.files.maxPartitionBytes`` governs packing of small files
into tasks.  The mapInPandas stage is Arrow-batched
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory
= batch_rows * payload size) and pipelines with the scan — no
shuffle anywhere in decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FAKE_FEATURES = 8

BINARY_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def scan_binary(spark: SparkSession, directory: str, glob: str = "*") -> DataFrame:
    """binaryFile scan over a directory: one row per file with the
    payload as an opaque binary column plus metadata."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
    )


def with_media_metadata(binary_df: DataFrame) -> DataFrame:
    """Typed metadata projection over a binary scan: basename, file
    extension as the media container hint, size, and content digest —
    all JVM-side (the payload is NOT shipped to Python here)."""
    return binary_df.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"),
        F.lower(F.regexp_extract("path", r"\.([A-Za-z0-9]+)$", 1)).alias("ext"),
        F.col("length").alias("size_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
        "content",
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("n_features", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(content: bytes) -> np.ndarray:
    """STUB decoder: derives N_FAKE_FEATURES deterministic floats in
    [0, 1) from the payload's sha256.  Replace with a real codec
    (PIL / torchaudio / ffmpeg) in production — the container has no
    media libraries, and the Spark-side contract (batch shape, schema,
    determinism) is what this repo tests."""
    d = hashlib.sha256(content).digest()
    ints = np.frombuffer(d[: N_FAKE_FEATURES * 4], dtype=">u4").astype(np.float64)
    return ints / 2**32


def decode_image_features(binary_df: DataFrame) -> DataFrame:
    """Decode/feature-extract stage over a binary corpus via
    mapInPandas: Arrow-batched, pipelined with the scan, no shuffle.
    Output schema is fixed (file, size_bytes, n_features, features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "file": pdf["path"].str.extract(r"([^/]+)$")[0],
                    "size_bytes": pdf["length"],
                    "n_features": N_FAKE_FEATURES,
                    "features": [f.tolist() for f in feats],
                }
            )

    return binary_df.mapInPandas(run, schema=_FEATURE_SCHEMA)


MODALITIES = ("image", "audio", "video")


def extract_features(binary_df: DataFrame, modality: str = "image") -> DataFrame:
    """Modality-tagged feature extraction over a binary corpus: same
    Arrow-batched plumbing as ``decode_image_features`` with the
    modality folded into the (stubbed) feature derivation, so image /
    audio / video corpora produce distinct, deterministic features.
    Swap ``_fake_decode`` for the real per-modality codec in
    production; schema and batch shape are the contract."""
    if modality not in MODALITIES:
        raise ValueError(f"unknown modality {modality!r}; expected {MODALITIES}")

    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(modality.encode() + b":" + bytes(c))
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "file": pdf["path"].str.extract(r"([^/]+)$")[0],
                    "modality": modality,
                    "features": [f.tolist() for f in feats],
                }
            )

    return binary_df.mapInPandas(run, schema=schema)


def resize_images(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize stage, STUBBED: emits the target geometry plus a
    deterministic digest of (payload, geometry) standing in for the
    resized bytes — the real body is one PIL call.  The Spark shape
    is what matters: map-only, Arrow-batched, output payload column
    typed binary so downstream stages (feature extract, partitioned
    write) compose unchanged."""
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                hashlib.sha256(
                    f"{width}x{height}:".encode() + bytes(c)
                ).digest()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "file": pdf["path"].str.extract(r"([^/]+)$")[0],
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    return binary_df.mapInPandas(run, schema=schema)


def sample_frames(binary_df: DataFrame, every_n_bytes: int = 65536) -> DataFrame:
    """Frame-sampling stub shaped like video frame extraction: emits
    one row per sampled 'frame' (here: per every_n_bytes chunk
    boundary, deterministically) — demonstrates the one-to-many
    mapInPandas expansion a real frame sampler needs."""
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"file": [], "frame_idx": [], "frame_digest": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                data = bytes(content)
                n = max(1, len(data) // every_n_bytes)
                for i in range(n):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out["file"].append(name)
                    out["frame_idx"].append(i)
                    out["frame_digest"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, schema=schema)
