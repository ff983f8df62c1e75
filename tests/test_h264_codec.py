"""From-scratch H.264/avc1 layer (extraction/h264_codec.py + the
mp4_codec avc1 glue).

What must hold: SPS/PPS parse real streams (incl. the high-profile
branch and frame cropping), the writer twin emits conformant
Baseline I_PCM IDR streams that round-trip BYTE-EXACTLY (I_PCM is
lossless), keyframe metadata comes from stss/IDR scan, and the
CAVLC/CABAC residual boundary degrades to metadata-only — never a
crash (the permanent-boundary contract from VERDICT r4 task 6).

Beyond-reference scope: the reference service has no video tier
(SURVEY §2).
"""

from __future__ import annotations

import pytest

from ocr_service_spark.extraction.h264_codec import (
    H264Error,
    _BitReader,
    _BitWriter,
    _insert_emulation,
    _strip_emulation,
    build_avcc,
    decode_ipcm_idr,
    parse_avcc,
    parse_pps,
    parse_sps,
    write_ipcm_idr,
    write_pps,
    write_sps,
)
from ocr_service_spark.extraction.mp4_codec import (
    avc1_stream_info,
    encode_avc1_mp4,
    mp4_frames,
    mp4_video_track,
)


def _gradient(w: int, h: int, seed: int = 0) -> bytes:
    return bytes(((x * 7 + y * 13 + seed * 29) % 256) for y in range(h) for x in range(w))


def _parsed_pair(width: int, height: int) -> tuple[dict, dict]:
    sps = parse_sps(_strip_emulation(write_sps(width, height)[1:]))
    pps = parse_pps(_strip_emulation(write_pps()[1:]))
    return sps, pps


# ------------------------------------------------------------- bit layer


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    vals_ue = [0, 1, 2, 3, 7, 25, 255, 65535]
    vals_se = [0, 1, -1, 2, -2, 26, -26, 1000]
    for v in vals_ue:
        w.ue(v)
    for v in vals_se:
        w.se(v)
    w.rbsp_trailing()
    r = _BitReader(w.data())
    assert [r.ue() for _ in vals_ue] == vals_ue
    assert [r.se() for _ in vals_se] == vals_se


def test_emulation_prevention_roundtrip():
    for raw in (b"\x00\x00\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03\x04",
                bytes(64), b"ab\x00\x00\x01cd\x00\x00\x00"):
        enc = _insert_emulation(raw)
        # no start-code-like pattern survives encoding
        for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
            assert bad not in enc
        assert _strip_emulation(enc) == raw


# ------------------------------------------------------------- SPS / PPS


def test_sps_writer_parser_roundtrip_with_cropping():
    sps = parse_sps(_strip_emulation(write_sps(36, 22)[1:]))
    assert sps["profile_idc"] == 66
    assert (sps["width"], sps["height"]) == (36, 22)  # true display dims
    assert sps["width_mbs"] == 3 and sps["height_mbs"] == 2  # coded 48x32
    assert sps["crop"] == (0, 6, 0, 5)


def test_sps_high_profile_branch():
    # hand-pack a High (100) SPS with chroma_format_idc=1 + 8-bit depth
    # — fields the baseline writer never emits, so writer and parser
    # cannot share a bug here
    w = _BitWriter()
    w.u(100, 8)  # profile_idc High
    w.u(0, 8)
    w.u(41, 8)  # level 4.1
    w.ue(0)  # sps_id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # qpprime bypass
    w.u(0, 1)  # no scaling matrix
    w.ue(4)  # log2_max_frame_num_minus4 -> 8
    w.ue(0)  # poc_type 0
    w.ue(4)  # log2_max_poc_lsb_minus4 -> 8
    w.ue(3)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(119)  # 1920 / 16 - 1
    w.ue(67)  # 1088 / 16 - 1
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8
    w.u(1, 1)  # cropping: 1920x1080
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.ue(4)  # crop_bottom 4 * CropUnitY(2) = 8 rows
    w.u(0, 1)  # no vui
    w.rbsp_trailing()
    sps = parse_sps(w.data())
    assert sps["profile_idc"] == 100 and sps["level_idc"] == 41
    assert (sps["width"], sps["height"]) == (1920, 1080)
    assert sps["log2_max_frame_num"] == 8 and sps["log2_max_poc_lsb"] == 8


def test_pps_parse_and_avcc_roundtrip():
    sps_nal, pps_nal = write_sps(32, 32), write_pps()
    pps = parse_pps(_strip_emulation(pps_nal[1:]))
    assert pps["entropy_coding_mode"] == 0  # CAVLC
    assert pps["pic_init_qp"] == 26
    cfg = parse_avcc(build_avcc(sps_nal, pps_nal))
    assert cfg["length_size"] == 4
    assert cfg["sps"] == [sps_nal] and cfg["pps"] == [pps_nal]


def test_sps_rejects_scaling_matrices_and_fmo_pps():
    w = _BitWriter()
    w.u(100, 8)
    w.u(0, 8)
    w.u(41, 8)
    w.ue(0)
    w.ue(1)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(1, 1)  # seq_scaling_matrix_present -> unsupported
    w.rbsp_trailing()
    with pytest.raises(H264Error):
        parse_sps(w.data())


# ------------------------------------------------------- I_PCM roundtrip


def test_ipcm_idr_roundtrip_cropped_dims():
    W, H = 36, 22
    frames = [_gradient(W, H, f) for f in range(3)]
    mp4 = encode_avc1_mp4(W, H, frames, fps=4)
    out = mp4_frames(mp4)
    assert out is not None and len(out) == 3
    for i, (w, h, luma, ts) in enumerate(out):
        assert (w, h) == (W, H)
        assert luma == frames[i]  # I_PCM is LOSSLESS: byte-exact
        assert ts == round(i * 0.25, 6)


def test_ipcm_survives_zero_runs_via_emulation_prevention():
    # all-black frames put long 0x00 runs inside the NAL: without
    # emulation-prevention bytes these would read as start codes /
    # corrupt the RBSP
    W = H = 32
    frames = [bytes(W * H), _gradient(W, H, 1)]
    out = mp4_frames(encode_avc1_mp4(W, H, frames))
    assert out is not None
    assert out[0][2] == frames[0] and out[1][2] == frames[1]


def test_avc1_stream_info_metadata():
    mp4 = encode_avc1_mp4(48, 48, [_gradient(48, 48, f) for f in range(4)], fps=2)
    info = avc1_stream_info(mp4)
    assert info["profile_idc"] == 66 and info["entropy"] == "cavlc"
    assert (info["width"], info["height"]) == (48, 48)
    assert info["n_samples"] == 4
    assert info["keyframes"] == [1, 2, 3, 4]  # stss: every IDR is sync
    assert info["keyframe_ts"] == [0.0, 0.5, 1.0, 1.5]
    track = mp4_video_track(mp4)
    assert track["sync_samples"] == [1, 2, 3, 4]


def test_odd_dims_rejected():
    with pytest.raises(H264Error):
        write_sps(33, 22)  # odd width: not representable in 4:2:0 crop units


# ------------------------------------------- the residual-coding boundary


def _non_pcm_slice_nal() -> bytes:
    """A syntactically valid IDR slice header whose first macroblock is
    I_NxN (mb_type 0, CAVLC residuals follow) — exactly the coding the
    from-scratch ladder does not decode."""
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I
    w.ue(0)  # pps_id
    w.u(0, 4)  # frame_num
    w.ue(0)  # idr_pic_id
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)  # slice_qp_delta
    w.ue(0)  # mb_type = I_NxN  <-- boundary
    w.u(0, 1)  # transform_size_8x8 would follow... keep bits arbitrary
    w.rbsp_trailing()
    return bytes([0x65]) + _insert_emulation(w.data())


def test_residual_coded_frame_degrades_to_metadata_only():
    sps, pps = _parsed_pair(32, 32)
    assert decode_ipcm_idr(_non_pcm_slice_nal(), sps, pps) is None

    # container level: splice the non-PCM slice over a real avc1 MP4's
    # sample (equal length so the stbl stays valid) — mp4_frames falls
    # back to None while stream metadata STAYS available
    good = encode_avc1_mp4(32, 32, [_gradient(32, 32)])
    track = mp4_video_track(good)
    off, size, _ts = track["samples"][0]
    frame_nal = _non_pcm_slice_nal()
    import struct as _s

    spliced_sample = (
        _s.pack(">I", size - 4) + frame_nal + bytes(size - 4 - len(frame_nal))
    )
    spliced = good[:off] + spliced_sample + good[off + size :]
    assert mp4_frames(spliced) is None  # residual boundary: no pixels
    info = avc1_stream_info(spliced)  # ...but metadata survives
    assert info is not None and info["entropy"] == "cavlc"
    assert (info["width"], info["height"]) == (32, 32)


def test_cabac_pps_degrades_to_metadata_only():
    sps, _ = _parsed_pair(32, 32)
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1)  # entropy_coding_mode = CABAC
    w.u(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.rbsp_trailing()
    cabac_pps = parse_pps(w.data())
    assert cabac_pps["entropy_coding_mode"] == 1
    nal = write_ipcm_idr(32, 32, _gradient(32, 32))
    assert decode_ipcm_idr(nal, sps, cabac_pps) is None  # CABAC boundary


def test_truncation_fuzz_never_crashes():
    mp4 = encode_avc1_mp4(32, 32, [_gradient(32, 32, f) for f in range(2)])
    for cut in range(0, len(mp4), 97):
        mp4_frames(mp4[:cut])  # None or frames; never an exception
        avc1_stream_info(mp4[:cut])
    # bit-flip fuzz over the mdat region
    buf = bytearray(mp4)
    for at in range(50, min(len(buf), 1500), 83):
        buf[at] ^= 0xFF
        mp4_frames(bytes(buf))
        avc1_stream_info(bytes(buf))
        buf[at] ^= 0xFF


# ---------------------------------------------------- Spark operator path


def test_sample_frames_operator_decodes_avc1(spark):
    from ocr_service_spark.operators.multimodal import sample_frames

    frames = [bytes([v]) * (16 * 16) for v in (10, 20, 30)]
    payload = encode_avc1_mp4(16, 16, frames, fps=2)
    df = spark.createDataFrame([("v://a1", bytearray(payload))], "url string, html binary")
    rows = sorted(sample_frames(df, fps=0.5).collect(), key=lambda r: r.frame_no)
    assert [r.pixel_sum for r in rows] == [10 * 256, 20 * 256, 30 * 256]
    assert [r.frame_ts for r in rows] == [0.0, 0.5, 1.0]
    assert all((r.width, r.height) == (16, 16) for r in rows)


# ------------------------------------------------------------ fuzz layer

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_sps_pps_parsers_never_crash_on_junk(data):
    # untrusted-input contract: H264Error or a dict, never any other
    # exception (IndexError/struct.error/RecursionError/...)
    for parser in (parse_sps, parse_pps):
        try:
            parser(data)
        except H264Error:
            pass


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_ipcm_decoder_never_crashes_on_junk_nal(data):
    sps, pps = _parsed_pair(32, 32)
    decode_ipcm_idr(data, sps, pps)  # None or pixels, never an exception


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=128))
def test_emulation_strip_insert_roundtrip_property(data):
    assert _strip_emulation(_insert_emulation(data)) == data


# ----------------------------------------------------- multi-slice pictures


def test_multi_slice_picture_roundtrip():
    # real encoders slice pictures: 4 slices over a 64x48 frame (12 MBs)
    # must reassemble byte-exactly, slice order independent
    from ocr_service_spark.extraction.h264_codec import decode_ipcm_picture

    W, H = 64, 48
    frame = _gradient(W, H, 3)
    sps, pps = _parsed_pair(W, H)
    nals = write_ipcm_idr(W, H, frame, n_slices=4)
    assert isinstance(nals, list) and len(nals) == 4
    assert decode_ipcm_picture(nals, sps, pps) == frame
    assert decode_ipcm_picture(list(reversed(nals)), sps, pps) == frame
    # a missing slice leaves MBs uncovered -> None, not garbage pixels
    assert decode_ipcm_picture(nals[:-1], sps, pps) is None
    # a duplicated slice double-covers -> None
    assert decode_ipcm_picture(nals + [nals[0]], sps, pps) is None


def test_multi_slice_mp4_roundtrip_end_to_end():
    W, H = 36, 22  # cropping + multi-slice together
    frames = [_gradient(W, H, f) for f in range(2)]
    mp4 = encode_avc1_mp4(W, H, frames, n_slices=3)
    out = mp4_frames(mp4)
    assert out is not None
    assert [f[2] for f in out] == frames
    assert avc1_stream_info(mp4)["keyframes"] == [1, 2]


def _nonidr_ipcm_slice_nal(w_mbs: int, h_mbs: int, luma_mb: bytes) -> bytes:
    """A spec-conformant NAL-type-1 (non-IDR) I slice, nal_ref_idc=3,
    carrying every macroblock as I_PCM — includes dec_ref_pic_marking
    (7.3.3.3) with one adaptive MMCO op, the field the round-5 review
    found the parser skipping."""
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I
    w.ue(0)  # pps_id
    w.u(1, 4)  # frame_num
    # non-IDR + ref_idc>0 -> dec_ref_pic_marking:
    w.u(1, 1)  # adaptive_ref_pic_marking_mode_flag
    w.ue(1)  # mmco op 1 (mark short-term unused)
    w.ue(0)  # difference_of_pic_nums_minus1
    w.ue(0)  # mmco op 0: end of loop
    w.se(0)  # slice_qp_delta
    for _ in range(w_mbs * h_mbs):
        w.ue(25)  # mb_type I_PCM
        w.align_zero()
        w.bytes_(luma_mb)
        w.bytes_(bytes(128))  # Cb+Cr
    w.rbsp_trailing()
    return bytes([0x61]) + _insert_emulation(w.data())  # ref_idc=3, type=1


def test_nonidr_reference_ipcm_slice_decodes():
    """Real encoders emit NAL-type-1 I_PCM pictures with ref_idc>0;
    before the round-5 fix the skipped dec_ref_pic_marking bit
    misaligned the reader and the picture fell back to None."""
    from ocr_service_spark.extraction.h264_codec import decode_ipcm_picture

    sps, pps = _parsed_pair(16, 16)
    luma_mb = bytes(range(128)) + bytes(range(128))
    nal = _nonidr_ipcm_slice_nal(1, 1, luma_mb)
    out = decode_ipcm_picture([nal], sps, pps)
    assert out is not None
    assert out == luma_mb


def test_strip_emulation_keeps_non_escape_03():
    """Spec 7.4.1: 00 00 03 is an escape only when the next byte is
    00-03; crawled junk with 00 00 03 F0 must keep the 03 as data."""
    from ocr_service_spark.extraction.h264_codec import _strip_emulation

    assert _strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert _strip_emulation(b"\x00\x00\x03\xf0") == b"\x00\x00\x03\xf0"
    assert _strip_emulation(b"\x00\x00\x03") == b"\x00\x00"  # trailing escape
