"""Real (if minimal) media decode for the multimodal pipeline:
pure-Python codecs for two genuinely-standard uncompressed container
formats — 24-bit BI_RGB BMP (struct-parsed) and PCM16 WAV (stdlib
``wave``) — plus the Arrow-batched Spark stages built on them.

This replaces the manifest-only posture of ``multimodal.py``'s
stubbed stages for these two formats: here the decode path REALLY
decodes payload bytes into pixel / sample arrays inside
``mapInPandas``, resizes real images, and re-encodes real bytes — so
the schema contract, the Arrow batch shape, and the numeric plumbing
are exercised end-to-end with no media library in the container.
Production swaps ``decode_bmp``/``decode_wav`` for PIL / ffmpeg
bindings; the Spark stages do not change.

Scale notes: every stage is map-only (decode pipelines with the
binaryFile scan, no shuffle); peak executor memory is
``arrow.maxRecordsPerBatch`` × payload size, same bound as the
stubbed stages.  (Reference analog: payloads are opaque byte streams,
/root/reference/download/common.go:106 — decode is strictly
downstream of ingest, which is exactly where these stages sit.)
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --- BMP: 24-bit uncompressed (BI_RGB), bottom-up rows -----------------

_BMP_PIXEL_OFFSET = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_PIXEL_OFFSET + img_size, 0, 0, _BMP_PIXEL_OFFSET
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = px[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an (h, w, 3) uint8 RGB array.
    Supports the format ``encode_bmp`` writes (positive height =
    bottom-up) plus top-down (negative height) files."""
    if len(data) < _BMP_PIXEL_OFFSET or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (header={hdr_size}, bpp={bpp}, "
            f"compression={compression}); fixture codec reads BI_RGB 24-bit"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = body.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if bottom_up else rgb.copy()


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (height, width, 3) —
    the pure-numpy reference resizer (floor sampling: source index =
    target index * src_extent // dst_extent)."""
    h, w, _ = pixels.shape
    yy = (np.arange(height) * h) // height
    xx = (np.arange(width) * w) // width
    return pixels[yy][:, xx]


# --- WAV: PCM16 via the stdlib wave module -----------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a mono PCM16 RIFF/WAVE payload."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono PCM16 WAV payload into (sample_rate, int16 array)."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getsampwidth() != 2 or wv.getnchannels() != 1:
            raise ValueError(
                "fixture codec reads mono PCM16 WAV; got "
                f"width={wv.getsampwidth()} channels={wv.getnchannels()}"
            )
        rate = wv.getframerate()
        frames = wv.readframes(wv.getnframes())
    return rate, np.frombuffer(frames, dtype="<i2")


# --- PNG: 8-bit truecolor RGB via stdlib zlib ---------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # bytes per pixel (8-bit RGB); filters reference byte-bpp


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick whichever of left /
    up / up-left is closest to a + b - c, ties broken left, up,
    up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a REAL 8-bit truecolor
    PNG (zlib-deflated IDAT, per-row filter bytes, CRC-checked
    chunks).  The row filter deliberately CYCLES through all five
    standard types (y mod 5: None/Sub/Up/Average/Paeth) so any decoder
    of these bytes must implement every unfilter path — the
    round-trip tests therefore cover the full filter suite, not just
    the trivial one."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    raw = px.astype(np.int32)
    zero = np.zeros((1, 3), dtype=np.int32)
    lines = bytearray()
    prev = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        row = raw[y]
        left = np.vstack([zero, row[:-1]])
        f = y % 5
        if f == 0:
            filt = row
        elif f == 1:  # Sub: minus the byte bpp positions left
            filt = row - left
        elif f == 2:  # Up: minus the byte directly above
            filt = row - prev
        elif f == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            upleft = np.vstack([zero, prev[:-1]])
            p = left + prev - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            filt = row - pred
        lines.append(f)
        lines.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor (color type 2, non-interlaced) PNG
    into an (h, w, 3) uint8 RGB array: chunk walk with CRC
    verification, zlib inflate, then per-row unfiltering of all five
    standard filter types."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or color != 2 or comp or filt or inter:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={inter}); fixture codec reads 8-bit RGB"
                )
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * _PNG_BPP
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    bpp = _PNG_BPP
    for y in range(h):
        f = raw[pos]
        pos += 1
        cur = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if f == 0:
            rec = cur
        elif f == 1:  # Sub — rec[x] = sum of filt bytes up to x, per
            # channel: mod distributes over the left-recurrence, so the
            # whole row is one vectorized cumulative sum mod 256
            rec = (
                cur.reshape(-1, bpp)
                .cumsum(axis=0, dtype=np.int64)
                .reshape(stride)
                % 256
            ).astype(np.int32)
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average — sequential left dependency; channels
            # are independent, so run one plain-int recurrence per
            # channel (numpy scalar indexing is ~10x slower per step)
            c_l = cur.tolist()
            p_l = prev.tolist()
            rec_l = [0] * stride
            for ch in range(bpp):
                left = 0
                for i in range(ch, stride, bpp):
                    left = (c_l[i] + ((left + p_l[i]) >> 1)) & 255
                    rec_l[i] = left
            rec = np.asarray(rec_l, dtype=np.int32)
        elif f == 4:  # Paeth — same per-channel recurrence; carry the
            # up-left byte forward instead of re-indexing prev
            c_l = cur.tolist()
            p_l = prev.tolist()
            rec_l = [0] * stride
            for ch in range(bpp):
                a = 0  # left (reconstructed)
                ul = 0  # up-left (previous row, one pixel back)
                for i in range(ch, stride, bpp):
                    b = p_l[i]
                    p = a + b - ul
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - ul if p >= ul else ul - p
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = ul
                    a = (c_l[i] + pred) & 255
                    rec_l[i] = a
                    ul = b
            rec = np.asarray(rec_l, dtype=np.int32)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, 3)


# --- Y4M: uncompressed YUV4MPEG2 video via plain header parsing --------

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode an (n, h, w, 3) uint8 Y'UV (C444) frame stack as a REAL
    YUV4MPEG2 stream — the standard uncompressed video interchange
    container (mjpegtools/ffmpeg-compatible): one ASCII stream header,
    then per frame a FRAME marker + raw planar Y, U, V bytes.  C444
    (no chroma subsampling) keeps the payload lossless, so round-trips
    are bit-exact and oracle-checkable."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) YUV frames, got {fr.shape}")
    n, h, w, _ = fr.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode())
    for i in range(n):
        out.extend(b"FRAME\n")
        # planar: all Y, then all U, then all V
        for c in range(3):
            out.extend(fr[i, :, :, c].tobytes())
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a C444 YUV4MPEG2 stream into (fps, (n, h, w, 3) uint8
    planar-Y'UV frame stack)."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace").split(" ")
    w = h = fps = None
    colorspace = "C420jpeg"  # the spec default when absent
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            fps = int(tok[1:].split(":")[0])
        elif tok.startswith("C"):
            colorspace = tok
    if colorspace != "C444":
        raise ValueError(
            f"unsupported Y4M colorspace {colorspace}; fixture codec reads C444"
        )
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if fps is None:
        raise ValueError("Y4M header missing F (frame-rate) token")
    plane = w * h
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("Y4M frame marker missing")
        pos = fnl + 1
        if pos + 3 * plane > len(data):
            raise ValueError("Y4M truncated frame payload")
        planes = [
            np.frombuffer(data, np.uint8, plane, pos + c * plane).reshape(h, w)
            for c in range(3)
        ]
        frames.append(np.stack(planes, axis=-1))
        pos += 3 * plane
    return fps, np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)


# --- Spark stages: real decode through the Arrow path ------------------

_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # per-channel mean in exact integer milli-units:
        # sum(channel) * 1000 // n_pixels — reproducible everywhere
        T.StructField("mean_rgb_milli", T.ArrayType(T.LongType())),
        # digest of the CANONICAL pixel buffer (row-major top-down
        # RGB), independent of container padding / row order
        T.StructField("pixel_md5", T.StringType()),
    ]
)


def decode_image_pixels(binary_df: DataFrame) -> DataFrame:
    """REAL image decode over a binary corpus: parse each BMP payload
    into its pixel array inside Arrow-batched ``mapInPandas`` and emit
    geometry + exact integer channel means + a canonical pixel digest.
    Map-only; pipelines with the binaryFile scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in _IMAGE_SCHEMA}
            for path, content in zip(pdf["path"], pdf["content"]):
                px = decode_bmp(bytes(content))
                h, w, _ = px.shape
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["file"].append(path.rsplit("/", 1)[-1])
                out["width"].append(w)
                out["height"].append(h)
                out["mean_rgb_milli"].append(
                    [int(s) * 1000 // (h * w) for s in sums]
                )
                out["pixel_md5"].append(hashlib.md5(px.tobytes()).hexdigest())
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, schema=_IMAGE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_bmp(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: decode each BMP, nearest-neighbor resample,
    re-encode — the output column carries genuine BMP bytes a
    downstream decode stage can read back (round-trip asserted in
    tests).  Same schema contract as the stubbed ``resize_images``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "file": [p.rsplit("/", 1)[-1] for p in pdf["path"]],
                    "width": width,
                    "height": height,
                    "resized": [
                        encode_bmp(
                            resize_nearest(decode_bmp(bytes(c)), width, height)
                        )
                        for c in pdf["content"]
                    ],
                }
            )

    return binary_df.mapInPandas(run, schema=_RESIZE_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        # rms in exact integer micro-units of full scale:
        # isqrt(mean(x^2) scaled) keeps it reproducible everywhere
        T.StructField("rms_micro", T.LongType()),
    ]
)


def audio_stats(binary_df: DataFrame) -> DataFrame:
    """REAL audio decode over a binary corpus: parse each PCM16 WAV
    payload into its sample array and emit rate / duration / peak /
    integer-exact RMS.  rms_micro = isqrt(mean(x²) · 10¹²) // 32768 —
    all-integer, so the value is bit-stable across platforms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in _AUDIO_SCHEMA}
            for path, content in zip(pdf["path"], pdf["content"]):
                rate, samples = decode_wav(bytes(content))
                n = len(samples)
                sq = int(np.square(samples, dtype=np.int64).sum())
                out["file"].append(path.rsplit("/", 1)[-1])
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // rate if rate else 0)
                out["peak"].append(
                    int(np.abs(samples.astype(np.int32)).max()) if n else 0
                )
                out["rms_micro"].append(
                    math.isqrt(sq * 10**12 // n) // 32768 if n else 0
                )
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, schema=_AUDIO_SCHEMA)
