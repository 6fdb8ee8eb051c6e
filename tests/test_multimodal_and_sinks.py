"""Tests for the multimodal binary pipeline and the partitioned sink.

Covers: binaryFile scan schema, JVM-side metadata projection, the
REAL magic-byte-dispatched Arrow decode (per-format features checked
against test-side numpy over the original pixels), the frame-sampling
expansion, the date-partitioned Parquet round-trip, and partition
pruning on the written layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.multimodal import (
    N_FEATURES,
    decode_image_features,
    sample_frames,
    scan_binary,
    with_media_metadata,
)
from downloader_spark.sinks import write_date_partitioned
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def binary_df(spark):
    return scan_binary(spark, SF_DIR, glob="*.parquet")


def test_scan_binary_schema_and_rows(binary_df):
    assert {f.name for f in binary_df.schema.fields} == {
        "path",
        "modificationTime",
        "length",
        "content",
    }
    assert binary_df.count() == 10  # one per driver table


def test_media_metadata_projection(binary_df):
    rows = {r.file: r for r in with_media_metadata(binary_df).collect()}
    assert rows["region.parquet"].ext == "parquet"
    assert rows["region.parquet"].size_bytes > 0
    assert len(rows["region.parquet"].content_md5) == 32


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    """A mixed-format corpus: real payloads from the from-scratch
    encoders plus one junk file no decoder claims."""
    import numpy as np

    from downloader_spark import media

    d = tmp_path_factory.mktemp("media_corpus")
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    frames = rng.randint(0, 256, (4, 16, 16), dtype=np.uint8)
    rate, samples = 8000, (
        (np.sin(np.arange(400) / 8.0) * 12000).astype(np.int16)
    )
    (d / "img.png").write_bytes(media.encode_png(rgb))
    (d / "img.bmp").write_bytes(media.encode_bmp(rgb))
    (d / "img.gif").write_bytes(media.encode_gif_gray(gray))
    (d / "img.jpg").write_bytes(media.encode_jpeg_color(rgb, quality=90))
    (d / "tone.wav").write_bytes(media.encode_wav(samples, rate))
    (d / "clip.pfv").write_bytes(media.encode_pframe(frames, block=4))
    (d / "junk.bin").write_bytes(b"\x00\x01definitely not media\xff" * 40)
    return str(d), rgb, gray, frames, (rate, samples)


def test_decode_image_features_real_dispatch(spark, media_dir):
    """Magic-byte dispatch decodes every image container for real:
    geometry and mean-luma features must equal test-side numpy over
    the ORIGINAL pixels (PNG/BMP/GIF are lossless); junk and
    non-image media are loud 'unsupported' rows, never fake data."""
    import numpy as np

    d, rgb, gray, _frames, _audio = media_dir
    out = {
        r.file: r
        for r in decode_image_features(scan_binary(spark, d)).collect()
    }
    assert out["img.png"].format == "png"
    assert out["img.bmp"].format == "bmp"
    assert out["img.gif"].format == "gif"
    assert out["img.jpg"].format == "jpeg"
    px = rgb.astype(np.int64)
    luma = (
        px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    ).astype(np.float64) / 1000.0
    for f in ("img.png", "img.bmp"):
        r = out[f]
        assert r.n_features == N_FEATURES == len(r.features)
        w, h, ch, mean = r.features[:4]
        assert (w, h, ch) == (32.0, 24.0, 3.0)
        assert abs(mean - float(luma.mean())) < 1e-9
        assert r.features[5] == float(luma.min())
        assert r.features[6] == float(luma.max())
    g = out["img.gif"]
    assert g.features[:4] == [
        16.0, 16.0, 1.0, float(gray.astype(np.float64).mean())
    ]
    j = out["img.jpg"]  # lossy: geometry is exact, stats are decoded
    assert j.features[:3] == [32.0, 24.0, 3.0]
    assert 0.0 <= j.features[3] <= 255.0
    # loud rows for everything that is not an image
    for f in ("junk.bin", "tone.wav", "clip.pfv"):
        r = out[f]
        assert r.format == "unsupported"
        assert r.n_features == 0 and r.features == []
    # deterministic
    out2 = {
        r.file: r.features
        for r in decode_image_features(scan_binary(spark, d)).collect()
    }
    assert out2 == {f: r.features for f, r in out.items()}


def test_sample_frames_expands_one_to_many(binary_df):
    frames = sample_frames(binary_df, every_n_bytes=16384).collect()
    per_file: dict[str, int] = {}
    for r in frames:
        per_file[r.file] = per_file.get(r.file, 0) + 1
        assert len(r.frame_digest) == 32
    # bigger files must yield more frames; every file yields >= 1
    assert per_file["lineitem.parquet"] > per_file["region.parquet"] >= 1
    # frame indices are dense from 0
    li = sorted(r.frame_idx for r in frames if r.file == "lineitem.parquet")
    assert li == list(range(len(li)))


def test_date_partitioned_write_roundtrip_and_pruning(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "archive")
    write_date_partitioned(events, out, ts_col="ts")

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # partition columns materialized from the path
    assert {"year", "month", "day"} <= {f.name for f in back.schema.fields}

    pruned = back.filter((F.col("month") == 1) & (F.col("day") == 1))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # Partition pruning: the scan must carry partition filters, and the
    # row count must equal the true day-1 count.
    assert "PartitionFilters: [" in plan and "month" in plan
    expect = events.filter(
        (F.month("ts") == 1) & (F.dayofmonth("ts") == 1)
    ).count()
    assert pruned.count() == expect == pruned.select("event_id").distinct().count()


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    from downloader_spark.sinks import write_bucketed

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    # disable auto-broadcast: at real scale neither side of a
    # fact-to-fact join broadcasts; the point of bucketing is the
    # shuffle-free sort-merge join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            orders, "orders_b", str(tmp_path / "orders_b"), ["o_orderkey"], 8
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            str(tmp_path / "li_b"),
            ["o_orderkey"],
            8,
        )
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no shuffle on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_binary_corpus_dedup_pipeline(spark, tmp_path):
    """Integration: binary scan -> content digest -> exact dedup —
    the reference's archive dedup (A5) applied to a multimodal corpus."""
    import shutil

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.bin").write_bytes(b"payload-one")
    (d / "b.bin").write_bytes(b"payload-two")
    shutil.copy(d / "a.bin", d / "c.bin")  # duplicate content

    meta = with_media_metadata(scan_binary(spark, str(d), glob="*.bin"))
    from pyspark.sql import Window

    w = Window.partitionBy("content_md5").orderBy("file")
    kept = (
        meta.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("file", "content_md5")
    )
    rows = {r.file for r in kept.collect()}
    assert rows == {"a.bin", "b.bin"}  # c.bin deduped against a.bin


def test_extract_features_per_modality_real_decoders(spark, media_dir):
    import numpy as np

    from downloader_spark.multimodal import extract_features

    d, _rgb, _gray, frames, (rate, samples) = media_dir
    bdf = scan_binary(spark, d)
    aud = {r.file: r for r in extract_features(bdf, "audio").collect()}
    vid = {r.file: r for r in extract_features(bdf, "video").collect()}

    w = aud["tone.wav"]
    assert w.format == "wav"
    s64 = samples.astype(np.float64)
    assert w.features[0] == float(len(samples))
    assert w.features[1] == float(rate)
    assert abs(w.features[2] - s64.mean()) < 1e-9
    assert w.features[4] == float(s64.min())
    assert w.features[5] == float(s64.max())
    # images/video are not audio: loud rows
    assert aud["img.png"].format == "unsupported"
    assert aud["clip.pfv"].format == "unsupported"

    v = vid["clip.pfv"]
    assert v.format == "pfv"
    f64 = frames.astype(np.float64)
    assert v.features[:3] == [4.0, 16.0, 16.0]
    assert abs(v.features[3] - f64.mean()) < 1e-9
    assert abs(v.features[7] - np.abs(np.diff(f64, axis=0)).mean()) < 1e-9
    assert vid["tone.wav"].format == "unsupported"

    with pytest.raises(ValueError):
        extract_features(bdf, "hologram")


def test_resize_images_real_roundtrip(spark, media_dir):
    import numpy as np

    from downloader_spark import media
    from downloader_spark.multimodal import resize_images

    d, rgb, gray, _frames, _audio = media_dir
    out = {r.file: r for r in resize_images(scan_binary(spark, d), 8, 6).collect()}
    # lossless containers: the resized BMP must decode to exactly the
    # nearest-neighbor resample of the original pixels
    want = media.resize_nearest(rgb, 8, 6)
    for f in ("img.png", "img.bmp"):
        got = media.decode_bmp(bytes(out[f].resized))
        assert np.array_equal(got, want), f
    got_gray = media.decode_bmp(bytes(out["img.gif"].resized))
    assert np.array_equal(
        got_gray,
        np.repeat(media.resize_nearest(
            np.repeat(gray[:, :, None], 3, axis=2), 8, 6
        )[:, :, :1], 3, axis=2),
    )
    # unsupported payloads carry a NULL payload, loudly tagged
    assert out["junk.bin"].format == "unsupported"
    assert out["junk.bin"].resized is None


def test_sample_frames_real_video_decode(spark, media_dir):
    import hashlib

    d, _rgb, _gray, frames, _audio = media_dir
    rows = [
        r for r in sample_frames(scan_binary(spark, d)).collect()
        if r.file == "clip.pfv"
    ]
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        0, 1, 2, 3
    ]
    by_idx = {r.frame_idx: r for r in rows}
    for i in range(4):
        assert by_idx[i].format == "pfv"
        assert by_idx[i].frame_digest == hashlib.md5(
            frames[i].tobytes()
        ).hexdigest()


def test_corrupt_payloads_yield_loud_error_rows(spark, tmp_path, media_dir):
    """One corrupt file must NOT fail the whole Spark task: decoders
    raise struct.error (truncated PNG), KeyError (bit-flipped JPEG
    Huffman table), IndexError (flip in the entropy stream) — the
    dispatch sites catch DECODE_ERRORS and emit the docstring-promised
    loud format='error:<fmt>' row alongside intact neighbors."""
    import numpy as np

    from downloader_spark import media

    d, rgb, gray, _f, _a = media_dir
    c = tmp_path / "corrupt"
    c.mkdir()
    (c / "trunc.png").write_bytes(media.encode_png(rgb)[:30])  # struct.error
    jpg = bytearray(media.encode_jpeg_color(rgb, quality=90))
    j_key = bytearray(jpg)
    j_key[21] ^= 0xFF  # Huffman-table flip -> KeyError
    (c / "flipkey.jpg").write_bytes(bytes(j_key))
    j_idx = bytearray(jpg)
    j_idx[180] ^= 0xFF  # entropy-stream flip -> IndexError
    (c / "flipidx.jpg").write_bytes(bytes(j_idx))
    (c / "trunc.gif").write_bytes(media.encode_gif_gray(gray)[:20])
    (c / "good.bmp").write_bytes(media.encode_bmp(rgb))

    rows = {
        r.file: r
        for r in decode_image_features(scan_binary(spark, str(c))).collect()
    }
    good = rows["good.bmp"]
    assert good.format == "bmp" and good.n_features == N_FEATURES
    expected = {
        "trunc.png": "error:png",
        "flipkey.jpg": "error:jpeg",
        "trunc.gif": "error:gif",
    }
    for f, fmt in expected.items():
        assert rows[f].format == fmt, (f, rows[f])
        assert rows[f].n_features == 0 and rows[f].features == []
    # the entropy flip either decodes to garbage pixels (fine) or is a
    # loud error row — never a task failure
    assert rows["flipidx.jpg"].format in ("jpeg", "error:jpeg")

    from downloader_spark.multimodal import extract_features, resize_images

    ext = {r.file: r for r in extract_features(scan_binary(spark, str(c)), "image").collect()}
    assert ext["trunc.png"].format == "error:png"
    rz = {r.file: r for r in resize_images(scan_binary(spark, str(c)), 8, 8).collect()}
    assert rz["trunc.png"].format == "error:png" and rz["trunc.png"].resized is None
    assert rz["good.bmp"].resized is not None
