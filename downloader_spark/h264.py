"""Intra-only H.264 (ITU-T Rec. H.264 / MPEG-4 AVC) — the container
layer, from scratch.

What is REAL here (everything the public spec pins bit-exactly and
that is verifiable without an external decoder): Annex-B byte streams
(4-byte start codes), NAL unit headers, RBSP emulation-prevention
(00 00 0x -> 00 00 03 0x insertion and removal), Exp-Golomb ue(v)/
se(v), baseline-profile SPS and PPS parsing/serialization, IDR slice
headers (pic_order_cnt_type 2, deblocking disabled), and I_PCM
macroblocks — byte-aligned raw 4:2:0 samples, mb_type 25 of Table
7-11, the spec's own lossless escape hatch.  An I_PCM-only stream is
valid baseline H.264 that any conformant player decodes.

What is deliberately OUT of profile: predicted macroblocks (I_4x4 /
I_16x16) and the CAVLC entropy layer.  Their VLC tables cannot be
validated inside this container (no ffmpeg/libav/openh264 exists
here, and unlike the zstd FSE tables there is no encoder to solve
them against empirically) — a self-twinned implementation would
roundtrip its own bugs invisibly, so out-of-profile mb_types raise
loudly instead (SURVEY §2 records the descope).  Decode proves the
container format; the encoder supplies real bytes — the same posture
as the other codec families (media.py).

Reference lineage: the reference treats all payloads as opaque byte
streams (/root/reference/download/common.go:106); media decode is a
downstream-consumer capability this engine adds.
"""

from __future__ import annotations

import numpy as np

_START = b"\x00\x00\x00\x01"
_PROFILE_BASELINE = 66
_NAL_SPS = 7
_NAL_PPS = 8
_NAL_IDR = 5
_MB_I_PCM = 25  # Table 7-11 (I-slice mb_type)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, v: int, bits: int) -> None:
        if v < 0 or v >> bits:
            raise ValueError(f"u({bits}) out of range: {v}")
        for i in range(bits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((v >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = self._n = 0

    def ue(self, v: int) -> None:
        if v < 0:
            raise ValueError("ue(v) must be non-negative")
        code = v + 1
        nbits = code.bit_length()
        self.u(0, nbits - 1)
        self.u(code, nbits)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while self._n:
            self.u(0, 1)

    def bytes_aligned(self, payload: bytes) -> None:
        if self._n:
            raise ValueError("writer not byte-aligned")
        self.buf.extend(payload)

    def trailing(self) -> bytes:
        """rbsp_trailing_bits: stop bit then zero-pad to a byte."""
        self.u(1, 1)
        self.align_zero()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, rbsp: bytes) -> None:
        self.data = rbsp
        self.pos = 0  # bit position

    def u(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated RBSP")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("Exp-Golomb code too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        """pcm_alignment_zero_bit* — padding bits must be zero."""
        while self.pos & 7:
            if self.u(1):
                raise ValueError("non-zero PCM alignment bit")

    def bytes_aligned(self, n: int) -> bytes:
        if self.pos & 7:
            raise ValueError("reader not byte-aligned")
        byte = self.pos >> 3
        if byte + n > len(self.data):
            raise ValueError("truncated PCM samples")
        self.pos += 8 * n
        return self.data[byte : byte + n]


def _ep_insert(rbsp: bytes) -> bytes:
    """Emulation prevention: 00 00 {00,01,02,03} -> 00 00 03 xx."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ep_strip(ebsp: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            if i + 1 < n and ebsp[i + 1] > 3:
                raise ValueError("invalid emulation-prevention sequence")
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    header = bytes([(ref_idc << 5) | nal_type])
    return _START + header + _ep_insert(rbsp)


def _sps_rbsp(mb_w: int, mb_h: int) -> bytes:
    w = _BitWriter()
    w.u(_PROFILE_BASELINE, 8)  # profile_idc
    w.u(0, 8)  # constraint flags + reserved_zero_2bits
    w.u(20, 8)  # level_idc 2.0
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4 -> MaxFrameNum 16
    w.ue(2)  # pic_order_cnt_type (no POC syntax)
    w.ue(0)  # max_num_ref_frames (IDR-only stream)
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)  # pic_width_in_mbs_minus1
    w.ue(mb_h - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    w.u(0, 1)  # frame_cropping_flag
    w.u(0, 1)  # vui_parameters_present_flag
    return w.trailing()


def _pps_rbsp() -> bytes:
    w = _BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(0, 1)  # entropy_coding_mode_flag: CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(1, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    return w.trailing()


def encode_h264_ipcm(
    luma: np.ndarray, cb: np.ndarray | None = None, cr: np.ndarray | None = None
) -> bytes:
    """Encode (n_frames, h, w) uint8 luma — plus optional 4:2:0
    chroma planes of shape (n_frames, h//2, w//2), default flat 128 —
    as an Annex-B baseline H.264 stream of IDR pictures made entirely
    of I_PCM macroblocks.  h and w must be multiples of 16 (no
    cropping window is emitted).  Lossless by construction: I_PCM
    carries raw samples."""
    luma = np.asarray(luma)
    if luma.ndim != 3 or luma.dtype != np.uint8:
        raise ValueError("luma must be (n, h, w) uint8")
    n, h, wpx = luma.shape
    if h % 16 or wpx % 16:
        raise ValueError("frame dims must be multiples of 16")
    if cb is None:
        cb = np.full((n, h // 2, wpx // 2), 128, np.uint8)
    if cr is None:
        cr = np.full((n, h // 2, wpx // 2), 128, np.uint8)
    if cb.shape != (n, h // 2, wpx // 2) or cr.shape != cb.shape:
        raise ValueError("chroma planes must be 4:2:0")
    mb_w, mb_h = wpx // 16, h // 16
    out = bytearray()
    out += _nal(_NAL_SPS, 3, _sps_rbsp(mb_w, mb_h))
    out += _nal(_NAL_PPS, 3, _pps_rbsp())
    for f in range(n):
        w = _BitWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(7)  # slice_type: I (all slices of the picture)
        w.ue(0)  # pic_parameter_set_id
        w.u(0, 4)  # frame_num (log2_max_frame_num = 4; IDR resets)
        w.ue(f % 2)  # idr_pic_id (consecutive IDRs must differ)
        # dec_ref_pic_marking() — mandatory when nal_ref_idc != 0
        # (spec 7.3.3 / 7.3.3.3; IDR form):
        w.u(0, 1)  # no_output_of_prior_pics_flag
        w.u(0, 1)  # long_term_reference_flag
        w.se(0)  # slice_qp_delta
        w.ue(1)  # disable_deblocking_filter_idc: off
        for my in range(mb_h):
            for mx in range(mb_w):
                w.ue(_MB_I_PCM)  # mb_type
                w.align_zero()  # pcm_alignment_zero_bit*
                yblk = luma[f, my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                cblk = cb[f, my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                rblk = cr[f, my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                w.bytes_aligned(yblk.tobytes())
                w.bytes_aligned(cblk.tobytes())
                w.bytes_aligned(rblk.tobytes())
        out += _nal(_NAL_IDR, 3, w.trailing())
    return bytes(out)


def _split_nals(data: bytes) -> list[bytes]:
    """Annex-B: split on 00 00 01 (with optional leading zero)."""
    nals = []
    i = 0
    n = len(data)
    # find first start code
    while i + 3 <= n and data[i : i + 3] != b"\x00\x00\x01":
        if data[i] != 0:
            raise ValueError("garbage before first start code")
        i += 1
    if i + 3 > n:
        raise ValueError("no start code found")
    i += 3
    start = i
    while i + 3 <= n:
        if data[i : i + 3] == b"\x00\x00\x01":
            end = i
            while end > start and data[end - 1] == 0:
                end -= 1
            nals.append(data[start:end])
            i += 3
            start = i
        else:
            i += 1
    nals.append(data[start:])
    return [x for x in nals if x]


def parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)  # constraint flags
    level = r.u(8)
    sps_id = r.ue()
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise ValueError("high-profile SPS extensions unsupported")
    log2_mfn = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        raise ValueError("pic_order_cnt_type 1 unsupported")
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps allowed
    mb_w = r.ue() + 1
    mb_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise ValueError("interlaced streams unsupported")
    r.u(1)  # direct_8x8_inference_flag
    if r.u(1):  # frame_cropping_flag
        raise ValueError("cropping window unsupported")
    return {
        "profile": profile,
        "level": level,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_mfn,
        "poc_type": poc_type,
        "mb_w": mb_w,
        "mb_h": mb_h,
    }


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    cabac = r.u(1)
    if cabac:
        raise ValueError("CABAC entropy coding unsupported (CAVLC only)")
    r.u(1)  # bottom_field_pic_order_in_frame_present
    if r.ue():  # num_slice_groups_minus1
        raise ValueError("slice groups (FMO) unsupported")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    init_qp = r.se() + 26
    r.se()
    r.se()
    deblock_ctrl = r.u(1)
    r.u(1)  # constrained_intra_pred_flag
    r.u(1)  # redundant_pic_cnt_present_flag
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "init_qp": init_qp,
        "deblock_ctrl": deblock_ctrl,
    }


def decode_h264_ipcm(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode an Annex-B baseline H.264 stream whose pictures consist
    of I_PCM macroblocks: NAL walk, emulation-prevention strip,
    SPS/PPS/IDR-slice-header parse, per-macroblock mb_type + aligned
    raw 4:2:0 samples.  Returns (luma, cb, cr) arrays of shape
    (n, h, w) / (n, h/2, w/2).  Any predicted macroblock type —
    the transform + CAVLC path this repo explicitly descopes — raises
    ValueError('mb_type ... out of profile'), never silent garbage."""
    sps = None
    pps = None
    frames_y: list[np.ndarray] = []
    frames_cb: list[np.ndarray] = []
    frames_cr: list[np.ndarray] = []
    for nal in _split_nals(data):
        nal_type = nal[0] & 0x1F
        if (nal[0] & 0x80) != 0:
            raise ValueError("forbidden_zero_bit set")
        rbsp = _ep_strip(nal[1:])
        if nal_type == _NAL_SPS:
            sps = parse_sps(rbsp)
            continue
        if nal_type == _NAL_PPS:
            pps = parse_pps(rbsp)
            continue
        if nal_type not in (_NAL_IDR, 1):
            continue  # SEI / AUD / filler are legal to skip
        if sps is None or pps is None:
            raise ValueError("slice before SPS/PPS")
        r = _BitReader(rbsp)
        if r.ue() != 0:
            raise ValueError("multi-slice pictures unsupported")
        slice_type = r.ue()
        if slice_type % 5 != 2:  # 2/7 = I
            raise ValueError(f"non-I slice_type {slice_type} out of profile")
        r.ue()  # pic_parameter_set_id
        r.u(sps["log2_max_frame_num"])  # frame_num
        if nal_type == _NAL_IDR:
            r.ue()  # idr_pic_id
        if sps["poc_type"] == 0:
            raise ValueError("pic_order_cnt_type 0 unsupported")
        if (nal[0] >> 5) & 3:  # nal_ref_idc != 0 -> dec_ref_pic_marking()
            if nal_type == _NAL_IDR:
                r.u(1)  # no_output_of_prior_pics_flag
                r.u(1)  # long_term_reference_flag
            elif r.u(1):  # adaptive_ref_pic_marking_mode_flag
                raise ValueError("MMCO ref-pic marking unsupported")
        r.se()  # slice_qp_delta
        if pps["deblock_ctrl"]:
            if r.ue() != 1:
                raise ValueError(
                    "in-loop deblocking out of profile (idc must be 1)"
                )
        mb_w, mb_h = sps["mb_w"], sps["mb_h"]
        y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        cbp = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        crp = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        for my in range(mb_h):
            for mx in range(mb_w):
                mb_type = r.ue()
                if mb_type != _MB_I_PCM:
                    raise ValueError(
                        f"mb_type {mb_type} out of profile (predicted"
                        " macroblocks / CAVLC residuals are descoped;"
                        " only I_PCM decodes — see SURVEY §2)"
                    )
                r.align()
                yb = np.frombuffer(r.bytes_aligned(256), np.uint8)
                cbb = np.frombuffer(r.bytes_aligned(64), np.uint8)
                crb = np.frombuffer(r.bytes_aligned(64), np.uint8)
                y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                    yb.reshape(16, 16)
                )
                cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                    cbb.reshape(8, 8)
                )
                crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                    crb.reshape(8, 8)
                )
        if r.u(1) != 1:
            raise ValueError("missing rbsp stop bit")
        frames_y.append(y)
        frames_cb.append(cbp)
        frames_cr.append(crp)
    if not frames_y:
        raise ValueError("no coded pictures in stream")
    return (
        np.stack(frames_y),
        np.stack(frames_cb),
        np.stack(frames_cr),
    )
