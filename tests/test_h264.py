"""H.264 container layer: spec-pinned bit mechanics + loud descopes.

Everything asserted here is fixed by the public ITU-T H.264 spec
(Annex B byte streams, 7.3/7.4 syntax, Table 7-11) and verifiable
without an external decoder; the predicted/CAVLC path is descoped and
must FAIL loudly, never decode approximately."""

import random

import numpy as np
import pytest

from downloader_spark.h264 import (
    _BitReader,
    _BitWriter,
    _ep_insert,
    _ep_strip,
    _nal,
    _pps_rbsp,
    _sps_rbsp,
    decode_h264_ipcm,
    encode_h264_ipcm,
    parse_pps,
    parse_sps,
)


def test_exp_golomb_pinned_vectors():
    """ue(v) codewords straight from the spec's Table 9-1."""
    for v, bits in [(0, "1"), (1, "010"), (2, "011"), (3, "00100"),
                    (4, "00101"), (5, "00110"), (6, "00111"),
                    (7, "0001000"), (255, "0" * 8 + "1" + "0" * 8)]:
        w = _BitWriter()
        w.ue(v)
        w.align_zero()
        got = "".join(f"{b:08b}" for b in w.buf)[: len(bits)]
        assert got == bits, (v, got, bits)
    # se(v) mapping: 0,1,-1,2,-2,... (spec 9.1.1)
    for v in range(-9, 10):
        w = _BitWriter()
        w.se(v)
        stop = _BitWriter()
        stop.ue(2 * v - 1 if v > 0 else -2 * v)
        assert w.buf == stop.buf or (w._acc, w._n) == (stop._acc, stop._n)
    r = _BitReader(bytes([0b01001101]))  # 010 -> ue=1, 011 -> ue=2
    assert r.ue() == 1 and r.ue() == 2


def test_emulation_prevention_pinned_and_fuzz():
    # pinned vectors: every 00 00 0x needs an escape
    assert _ep_insert(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert _ep_insert(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert _ep_insert(b"\x00\x00\x02") == b"\x00\x00\x03\x02"
    assert _ep_insert(b"\x00\x00\x03") == b"\x00\x00\x03\x03"
    assert _ep_insert(b"\x00\x00\x04") == b"\x00\x00\x04"
    assert _ep_insert(b"\x00\x00\x00\x00\x00") == (
        b"\x00\x00\x03\x00\x00\x03\x00"
    )
    assert _ep_strip(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    rng = random.Random(5)
    for _ in range(400):
        payload = bytes(
            rng.choice([0, 0, 0, 1, 2, 3, 255])
            for _ in range(rng.randrange(0, 48))
        )
        assert _ep_strip(_ep_insert(payload)) == payload
    # no start-code emulation survives in the escaped stream
    esc = _ep_insert(bytes(64))
    assert b"\x00\x00\x01" not in esc and b"\x00\x00\x00" not in esc


def test_sps_pps_roundtrip():
    sps = parse_sps(_sps_rbsp(4, 3))
    assert sps["profile"] == 66 and (sps["mb_w"], sps["mb_h"]) == (4, 3)
    assert sps["poc_type"] == 2 and sps["log2_max_frame_num"] == 4
    pps = parse_pps(_pps_rbsp())
    assert pps["init_qp"] == 26 and pps["deblock_ctrl"] == 1


def test_ipcm_roundtrip_multiframe_multimb():
    rng = np.random.RandomState(11)
    luma = rng.randint(0, 256, (3, 32, 48), dtype=np.uint8)
    cb = rng.randint(0, 256, (3, 16, 24), dtype=np.uint8)
    cr = rng.randint(0, 256, (3, 16, 24), dtype=np.uint8)
    enc = encode_h264_ipcm(luma, cb, cr)
    assert enc.startswith(b"\x00\x00\x00\x01\x67")  # SPS first
    y, b, r = decode_h264_ipcm(enc)
    assert np.array_equal(y, luma)
    assert np.array_equal(b, cb) and np.array_equal(r, cr)
    # default chroma is flat 128
    y2, b2, r2 = decode_h264_ipcm(encode_h264_ipcm(luma))
    assert np.array_equal(y2, luma) and (b2 == 128).all() and (r2 == 128).all()


def test_ipcm_zero_plane_forces_emulation_prevention():
    z = np.zeros((1, 16, 16), np.uint8)
    enc = encode_h264_ipcm(z)
    assert b"\x00\x00\x03" in enc  # escapes actually fired
    y, b, r = decode_h264_ipcm(enc)
    assert (y == 0).all() and (b == 128).all()


def test_out_of_profile_streams_raise_loudly():
    luma = np.full((1, 16, 16), 7, np.uint8)
    good = encode_h264_ipcm(luma)
    # truncation anywhere fails
    for cut in (4, 6, 20, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            decode_h264_ipcm(good[:cut])
    with pytest.raises(ValueError):
        decode_h264_ipcm(b"\xde\xad\xbe\xef")  # no start code
    with pytest.raises(ValueError):
        encode_h264_ipcm(np.zeros((1, 15, 16), np.uint8))  # not MB-aligned
    # a predicted macroblock (mb_type 0 = I_4x4): the descoped path
    w = _BitWriter()
    w.ue(0)   # first_mb_in_slice
    w.ue(7)   # slice_type I
    w.ue(0)   # pps id
    w.u(0, 4)  # frame_num
    w.ue(0)   # idr_pic_id
    w.u(0, 1)  # no_output_of_prior_pics_flag (dec_ref_pic_marking)
    w.u(0, 1)  # long_term_reference_flag
    w.se(0)   # slice_qp_delta
    w.ue(1)   # disable deblocking
    w.ue(0)   # mb_type I_4x4  <-- out of profile
    bad = (
        _nal(7, 3, _sps_rbsp(1, 1))
        + _nal(8, 3, _pps_rbsp())
        + _nal(5, 3, w.trailing())
    )
    with pytest.raises(ValueError, match="out of profile"):
        decode_h264_ipcm(bad)
    # CABAC PPS is refused at parse time
    cab = bytearray(_pps_rbsp())
    with pytest.raises(ValueError, match="CABAC"):
        # pps bits: ue(0) ue(0) then entropy flag — flip it
        r = _BitWriter()
        r.ue(0)
        r.ue(0)
        r.u(1, 1)  # entropy_coding_mode_flag = 1
        r.u(0, 1)
        r.ue(0)
        r.ue(0)
        r.ue(0)
        r.u(0, 1)
        r.u(0, 2)
        r.se(0)
        r.se(0)
        r.se(0)
        r.u(1, 1)
        r.u(0, 1)
        r.u(0, 1)
        parse_pps(r.trailing())
    del cab


def test_dec_ref_pic_marking_bits_present_and_read():
    """Spec 7.3.3/7.3.3.3: IDR slices with nal_ref_idc != 0 carry a
    2-bit dec_ref_pic_marking() between idr_pic_id and slice_qp_delta.
    A conformant external stream may set either flag — both must parse
    to the same pixels; omitting them (the pre-fix encoder) is the
    self-twinned desync this test pins against."""
    luma = np.arange(256, dtype=np.int64).reshape(1, 16, 16) % 256
    luma = luma.astype(np.uint8)

    def slice_rbsp(no_output: int, long_term: int) -> bytes:
        w = _BitWriter()
        w.ue(0)   # first_mb_in_slice
        w.ue(7)   # slice_type I
        w.ue(0)   # pps id
        w.u(0, 4)  # frame_num
        w.ue(0)   # idr_pic_id
        w.u(no_output, 1)
        w.u(long_term, 1)
        w.se(0)   # slice_qp_delta
        w.ue(1)   # disable deblocking
        w.ue(25)  # mb_type I_PCM
        w.align_zero()
        w.bytes_aligned(luma[0].tobytes())
        w.bytes_aligned(bytes([128]) * 64)
        w.bytes_aligned(bytes([128]) * 64)
        return w.trailing()

    for flags in ((0, 0), (1, 0), (0, 1), (1, 1)):
        stream = (
            _nal(7, 3, _sps_rbsp(1, 1))
            + _nal(8, 3, _pps_rbsp())
            + _nal(5, 3, slice_rbsp(*flags))
        )
        y, b, r = decode_h264_ipcm(stream)
        assert np.array_equal(y, luma), flags
        assert (b == 128).all() and (r == 128).all()
    # the encoder emits exactly this layout (roundtrips the same bytes)
    enc = encode_h264_ipcm(luma)
    assert np.array_equal(decode_h264_ipcm(enc)[0], luma)
    # non-IDR reference slice with MMCO (adaptive marking) is descoped
    w = _BitWriter()
    w.ue(0)   # first_mb_in_slice
    w.ue(7)   # slice_type I
    w.ue(0)   # pps id
    w.u(0, 4)  # frame_num
    w.u(1, 1)  # adaptive_ref_pic_marking_mode_flag = 1 -> MMCO
    w.se(0)
    w.ue(1)
    bad = (
        _nal(7, 3, _sps_rbsp(1, 1))
        + _nal(8, 3, _pps_rbsp())
        + _nal(1, 3, w.trailing())
    )
    with pytest.raises(ValueError, match="MMCO"):
        decode_h264_ipcm(bad)


def test_multimodal_dispatch_claims_h264():
    from downloader_spark.multimodal import (
        VIDEO_FORMATS,
        _video_features,
        sniff_format,
    )

    luma = (
        np.arange(2 * 16 * 16, dtype=np.int64).reshape(2, 16, 16) % 256
    ).astype(np.uint8)
    enc = encode_h264_ipcm(luma)
    assert sniff_format(enc) == "h264"
    assert "h264" in VIDEO_FORMATS
    feats = _video_features("h264", enc)
    assert feats[:3] == [2.0, 16.0, 16.0]
    assert feats[3] == float(luma.astype(np.float64).mean())
    # corrupt h264 stays a loud error path (ValueError contract)
    with pytest.raises(ValueError):
        _video_features("h264", enc[: len(enc) // 2])
