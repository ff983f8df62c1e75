"""From-scratch H.264/AVC (ISO/IEC 14496-10) parsing + I_PCM decode.

What is REAL here, for arbitrary web-corpus avc1 streams:

- RBSP extraction with emulation-prevention stripping (00 00 03),
  and the writer-side inverse;
- Exp-Golomb bit reader/writer (ue/se/u(n));
- full SPS parsing — profile/level, the high-profile chroma/bit-depth
  branch, frame cropping — yielding the TRUE display dimensions any
  corpus pipeline wants from an avc1 sample entry (the stsd width/
  height lies whenever cropping is present);
- PPS parsing (entropy mode, slice groups, deblocking-present flag);
- slice-header-level keyframe identification (NAL type 5 / I slice).

Pixel decoding covers the I_PCM macroblock subset: mb_type 25 carries
raw uncompressed samples, is mandatory-support in EVERY profile, and
is exactly what this repo's own writer twin emits — so avc1 MP4s
written by ``encode_avc1_mp4`` round-trip byte-exactly through
``decode_ipcm_idr``. Residual entropy coding (CAVLC/CABAC) is the one
named boundary of the codec ladder: a predicted/transform-coded
macroblock makes the decoder return None and the caller falls back to
the metadata-only path (tests/test_h264_codec.py pins that contract).

Reference parity note: the reference service has no video tier at all
(SURVEY §2); this module belongs to the beyond-reference multimodal
tier (frame sampling over opaque binary columns).
"""

from __future__ import annotations

import struct


class H264Error(ValueError):
    pass


# ------------------------------------------------------------------ bits


def _strip_emulation(nal: bytes) -> bytes:
    """NAL payload -> RBSP: remove emulation_prevention_three_byte
    (00 00 03 -> 00 00 when the 03 precedes a byte <= 3)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(nal)
    while i < n:
        b = nal[i]
        # spec (7.4.1): the 03 is an escape only when the NEXT byte is
        # 00-03; a conforming encoder emits nothing else after 00 00 03,
        # but crawled junk can — stripping unconditionally would shift
        # every subsequent I_PCM byte and decode wrong pixels silently
        if zeros >= 2 and b == 3 and (i + 1 >= n or nal[i + 1] <= 3):
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _insert_emulation(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position
        self._last_one: int | None = None  # rbsp_stop_one_bit cache

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise H264Error("bitstream exhausted")
            v = (v << 1) | ((self._d[byte] >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise H264Error("bad exp-golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        while self._pos & 7:
            if self.u(1) != 0:
                raise H264Error("pcm_alignment_zero_bit not zero")

    def more_rbsp_data(self) -> bool:
        """7.2: data remains before the rbsp_stop_one_bit (the LAST set
        bit in the RBSP) — the CAVLC slice-layer loop condition."""
        if self._last_one is None:
            last = -1
            for i in range(len(self._d) - 1, -1, -1):
                b = self._d[i]
                if b:
                    last = i * 8 + (7 - (b & -b).bit_length() + 1)
                    break
            self._last_one = last
        return self._pos < self._last_one

    def bytes_(self, n: int) -> bytes:
        if self._pos & 7:
            raise H264Error("byte read while unaligned")
        start = self._pos >> 3
        if start + n > len(self._d):
            raise H264Error("bitstream exhausted")
        self._pos += 8 * n
        return self._d[start : start + n]


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while len(self._bits) & 7:
            self._bits.append(0)

    def bytes_(self, data: bytes) -> None:
        assert len(self._bits) & 7 == 0
        for b in data:
            self.u(b, 8)

    def rbsp_trailing(self) -> None:
        self._bits.append(1)
        self.align_zero()

    def data(self) -> bytes:
        assert len(self._bits) & 7 == 0, "unaligned rbsp"
        out = bytearray(len(self._bits) >> 3)
        for i, bit in enumerate(self._bits):
            if bit:
                out[i >> 3] |= 0x80 >> (i & 7)
        return bytes(out)


# ------------------------------------------------------------- SPS / PPS

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps(rbsp: bytes) -> dict:
    """seq_parameter_set_data (7.3.2.1.1) -> the fields a corpus
    pipeline needs; raises H264Error on malformed input."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint_set flags + reserved
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            raise H264Error("scaling matrices unsupported")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    width_mbs = r.ue() + 1
    height_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    # vui ignored
    if chroma_format_idc == 1:
        cux, cuy = 2, 2 * (2 - frame_mbs_only)
    elif chroma_format_idc == 2:
        cux, cuy = 2, 2 - frame_mbs_only
    else:
        cux, cuy = 1, 2 - frame_mbs_only
    width = width_mbs * 16 - cux * (crop[0] + crop[1])
    height = (2 - frame_mbs_only) * height_map_units * 16 - cuy * (crop[2] + crop[3])
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "separate_colour_plane": separate_colour_plane,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "frame_mbs_only": frame_mbs_only,
        "width_mbs": width_mbs,
        "height_mbs": (2 - frame_mbs_only) * height_map_units,
        "crop": crop,
        "width": width,
        "height": height,
    }


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy_coding_mode = r.u(1)  # 0 = CAVLC, 1 = CABAC
    pic_order_present = r.u(1)
    num_slice_groups = r.ue() + 1
    if num_slice_groups > 1:
        raise H264Error("FMO slice groups unsupported")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    pic_init_qp = r.se() + 26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    deblocking_control_present = r.u(1)
    r.u(1)  # constrained_intra_pred_flag
    r.u(1)  # redundant_pic_cnt_present_flag
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "entropy_coding_mode": entropy_coding_mode,
        "pic_order_present": pic_order_present,
        "pic_init_qp": pic_init_qp,
        "deblocking_control_present": deblocking_control_present,
    }


# --------------------------------------------------------------- decode

_NAL_IDR = 5
_NAL_SLICE = 1
_NAL_SPS = 7
_NAL_PPS = 8

_I_PCM_MB_TYPE = 25


def nal_units_avcc(sample: bytes, length_size: int) -> list[bytes]:
    """Split one MP4 avc1 sample (length-prefixed) into NAL units."""
    out = []
    pos = 0
    n = len(sample)
    while pos + length_size <= n:
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if ln == 0 or pos + ln > n:
            raise H264Error("bad NAL length")
        out.append(sample[pos : pos + ln])
        pos += ln
    return out


def _parse_slice_header(
    r: _BitReader, sps: dict, pps: dict, nal_type: int, nal_ref_idc: int
) -> dict:
    first_mb = r.ue()
    slice_type = r.ue()
    r.ue()  # pps_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == _NAL_IDR:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["pic_order_present"]:
            r.se()
    elif sps["poc_type"] == 1:
        raise H264Error("poc_type 1 slice header unsupported")
    if nal_type == _NAL_IDR:
        r.u(1)  # no_output_of_prior_pics_flag
        r.u(1)  # long_term_reference_flag
    else:
        if slice_type % 5 != 2:
            raise H264Error("non-I slice unsupported")
        if nal_ref_idc != 0:
            # dec_ref_pic_marking for non-IDR reference slices
            # (7.3.3.3) — real encoders emit NAL-type-1 I slices with
            # ref_idc>0; skipping this bit misaligns everything after
            # frame_num and the first mb_type reads garbage
            if r.u(1):  # adaptive_ref_pic_marking_mode_flag
                while True:
                    op = r.ue()  # memory_management_control_operation
                    if op == 0:
                        break
                    if op in (1, 2, 4, 6):
                        r.ue()
                    elif op == 3:
                        r.ue()
                        r.ue()
                    # op 5 carries no arguments
    slice_qp_delta = r.se()
    if pps["deblocking_control_present"]:
        idc = r.ue()  # disable_deblocking_filter_idc
        if idc != 1:
            r.se()  # slice_alpha_c0_offset_div2
            r.se()  # slice_beta_offset_div2
    return {"first_mb": first_mb, "slice_type": slice_type, "qp_delta": slice_qp_delta}


def decode_ipcm_picture(nals: list[bytes], sps: dict, pps: dict) -> bytes | None:
    """All slice NALs of one IDR picture (I_PCM macroblocks) ->
    full-frame luma bytes (display-cropped), or None when any
    macroblock is NOT I_PCM (the CAVLC/CABAC residual boundary —
    caller falls back to metadata). Slices may carry any first_mb
    split of the picture, in any order (real encoders slice pictures);
    every macroblock must be covered exactly once.

    4:2:0 8-bit only (chroma samples are read and discarded: the
    extraction tier is grayscale, matching the rest of the image
    ladder)."""
    if pps["entropy_coding_mode"] != 0:
        return None  # CABAC: out of scope, metadata-only fallback
    if sps["chroma_format_idc"] != 1:
        return None
    wmb, hmb = sps["width_mbs"], sps["height_mbs"]
    n_mbs = wmb * hmb
    coded_w = wmb * 16
    luma = bytearray(coded_w * hmb * 16)
    covered = [False] * n_mbs
    saw_slice = False
    try:
        for nal in nals:
            if not nal:
                continue
            nal_type = nal[0] & 0x1F
            if nal_type not in (_NAL_IDR, _NAL_SLICE):
                continue
            saw_slice = True
            r = _BitReader(_strip_emulation(nal[1:]))
            hdr = _parse_slice_header(r, sps, pps, nal_type, (nal[0] >> 5) & 3)
            if hdr["slice_type"] % 5 != 2:
                return None
            mb = hdr["first_mb"]
            while True:
                if mb >= n_mbs or covered[mb]:
                    return None
                if r.ue() != _I_PCM_MB_TYPE:
                    return None  # predicted/transform-coded MB: boundary
                r.align()
                block = r.bytes_(256)
                r.bytes_(128)  # Cb + Cr, discarded (grayscale tier)
                mbx, mby = (mb % wmb) * 16, (mb // wmb) * 16
                for row in range(16):
                    at = (mby + row) * coded_w + mbx
                    luma[at : at + 16] = block[row * 16 : row * 16 + 16]
                covered[mb] = True
                mb += 1
                if not r.more_rbsp_data():
                    break
    except H264Error:
        return None
    if not saw_slice or not all(covered):
        return None  # picture not fully covered by its slices
    # apply display cropping (4:2:0 frame units)
    left, _right, top, _bottom = sps["crop"]
    w, h = sps["width"], sps["height"]
    x0, y0 = 2 * left, 2 * top * (2 - sps["frame_mbs_only"])
    out = bytearray(w * h)
    for row in range(h):
        src = (y0 + row) * coded_w + x0
        out[row * w : row * w + w] = luma[src : src + w]
    return bytes(out)


def decode_ipcm_idr(nal: bytes, sps: dict, pps: dict) -> bytes | None:
    """Single-slice convenience wrapper over :func:`decode_ipcm_picture`."""
    return decode_ipcm_picture([nal], sps, pps)


# ---------------------------------------------------------------- write


def _nal(ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    return bytes([(ref_idc << 5) | nal_type]) + _insert_emulation(rbsp)


def write_sps(width: int, height: int) -> bytes:
    """Baseline (profile 66) SPS NAL for an 8-bit 4:2:0 progressive
    frame of arbitrary dims (cropping emitted when not MB-aligned)."""
    wmb = (width + 15) // 16
    hmb = (height + 15) // 16
    crop_r = (wmb * 16 - width) // 2
    crop_b = (hmb * 16 - height) // 2
    if (wmb * 16 - width) % 2 or (hmb * 16 - height) % 2:
        raise H264Error("dims must be even (4:2:0 crop units)")
    w = _BitWriter()
    w.u(66, 8)  # profile_idc: Baseline
    w.u(0xC0, 8)  # constraint_set0+1
    w.u(30, 8)  # level 3.0
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2 (no POC lsb in slice headers)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num
    w.ue(wmb - 1)
    w.ue(hmb - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(0, 1)  # direct_8x8_inference
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui absent
    w.rbsp_trailing()
    return _nal(3, _NAL_SPS, w.data())


def write_pps() -> bytes:
    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(0, 1)  # CAVLC
    w.u(0, 1)  # pic_order_present
    w.ue(0)  # one slice group
    w.ue(0)
    w.ue(0)
    w.u(0, 1)  # weighted_pred
    w.u(0, 2)  # weighted_bipred
    w.se(0)  # pic_init_qp_minus26
    w.se(0)
    w.se(0)
    w.u(0, 1)  # deblocking_control_present
    w.u(0, 1)  # constrained_intra_pred
    w.u(0, 1)  # redundant_pic_cnt_present
    w.rbsp_trailing()
    return _nal(3, _NAL_PPS, w.data())


def write_ipcm_idr(
    width: int, height: int, luma: bytes, idr_pic_id: int = 0, n_slices: int = 1
) -> bytes | list[bytes]:
    """IDR slice NAL(s) carrying the frame as I_PCM macroblocks
    (losslessly; pad rows/cols replicate edges so cropping restores the
    exact input). Chroma planes are neutral 128. With ``n_slices`` > 1
    the picture is split into consecutive first_mb runs — the shape
    real encoders emit — and a LIST of NALs is returned; slice_type is
    then 2 ("I", not all-I 7), per 7.4.3."""
    if len(luma) != width * height:
        raise H264Error("luma size mismatch")
    wmb = (width + 15) // 16
    hmb = (height + 15) // 16
    n_mbs = wmb * hmb
    n_slices = max(1, min(n_slices, n_mbs))
    chroma = bytes([128]) * 128
    nals = []
    per = (n_mbs + n_slices - 1) // n_slices
    for s in range(n_slices):
        first, last = s * per, min((s + 1) * per, n_mbs)
        if first >= last:
            break
        w = _BitWriter()
        w.ue(first)  # first_mb_in_slice
        w.ue(7 if n_slices == 1 else 2)  # slice_type
        w.ue(0)  # pps_id
        w.u(0, 4)  # frame_num (log2_max_frame_num = 4)
        w.ue(idr_pic_id)
        w.u(0, 1)  # no_output_of_prior_pics
        w.u(0, 1)  # long_term_reference
        w.se(0)  # slice_qp_delta
        for mb in range(first, last):
            mbx, mby = (mb % wmb) * 16, (mb // wmb) * 16
            w.ue(_I_PCM_MB_TYPE)
            w.align_zero()  # pcm_alignment_zero_bit(s)
            block = bytearray(256)
            for row in range(16):
                y = min(mby + row, height - 1)
                for col in range(16):
                    x = min(mbx + col, width - 1)
                    block[row * 16 + col] = luma[y * width + x]
            w.bytes_(bytes(block))
            w.bytes_(chroma)
        w.rbsp_trailing()
        nals.append(_nal(3, _NAL_IDR, w.data()))
    return nals[0] if n_slices == 1 else nals


def build_avcc(sps_nal: bytes, pps_nal: bytes, length_size: int = 4) -> bytes:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1)."""
    return (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3]])
        + bytes([0xFC | (length_size - 1), 0xE0 | 1])
        + struct.pack(">H", len(sps_nal))
        + sps_nal
        + bytes([1])
        + struct.pack(">H", len(pps_nal))
        + pps_nal
    )


def parse_avcc(box: bytes) -> dict | None:
    """avcC body -> {length_size, sps: [...], pps: [...]} or None."""
    if len(box) < 7 or box[0] != 1:
        return None
    length_size = (box[4] & 3) + 1
    n_sps = box[5] & 0x1F
    pos = 6
    sps = []
    for _ in range(n_sps):
        if pos + 2 > len(box):
            return None
        ln = struct.unpack_from(">H", box, pos)[0]
        pos += 2
        if pos + ln > len(box):
            return None
        sps.append(box[pos : pos + ln])
        pos += ln
    if pos >= len(box):
        return None
    n_pps = box[pos]
    pos += 1
    pps = []
    for _ in range(n_pps):
        if pos + 2 > len(box):
            return None
        ln = struct.unpack_from(">H", box, pos)[0]
        pos += 2
        if pos + ln > len(box):
            return None
        pps.append(box[pos : pos + ln])
        pos += ln
    return {"length_size": length_size, "sps": sps, "pps": pps}
