"""From-scratch MP4 (ISO BMFF) sample-table reader + MJPEG writer twin
(extraction/mp4_codec.py).

The reader resolves the real stsd/stts/stsc/stsz/stco quintet; the
writer emits conformant single-track MJPEG. Solid-gray frames
round-trip the baseline JPEG codec EXACTLY (constant blocks survive DC
quantization), which q61's closed-form oracle relies on.

Beyond-reference scope: the reference service has no video endpoint
(SURVEY §2); this is the multimodal frame-sampling tier.
"""

from __future__ import annotations

import struct

import pytest

from ocr_service_spark.extraction.jpeg_codec import decode_jpeg_gray
from ocr_service_spark.extraction.mp4_codec import (
    Mp4Error,
    encode_mjpeg_mp4,
    mp4_frames,
    mp4_video_track,
)


def _solid(v: int, n: int = 256) -> bytes:
    return bytes([v % 256]) * n


def test_roundtrip_solid_frames_exact_with_real_timestamps():
    lumas = [_solid(v) for v in (0, 77, 148, 200, 255)]
    payload = encode_mjpeg_mp4(16, 16, lumas, fps=2)
    frames = mp4_frames(payload, max_frames=8)
    assert len(frames) == 5
    for k, (w, h, luma, ts) in enumerate(frames):
        assert (w, h) == (16, 16)
        assert luma == lumas[k]  # DC-only blocks survive quantization
        assert ts == k * 0.5  # media timescale, not a caller-side guess


def test_track_metadata_and_sample_table():
    payload = encode_mjpeg_mp4(16, 16, [_solid(9), _solid(10)], fps=4)
    track = mp4_video_track(payload)
    assert track["codec"] == "jpeg"
    assert (track["width"], track["height"]) == (16, 16)
    assert len(track["samples"]) == 2
    # samples are contiguous in the single chunk
    (o0, s0, t0), (o1, s1, t1) = track["samples"]
    assert o1 == o0 + s0
    assert (t0, t1) == (0.0, 0.25)


def test_gradient_frames_decode_matches_direct_jpeg_decode():
    g = bytes((x * 13 + y * 7) % 256 for y in range(16) for x in range(16))
    payload = encode_mjpeg_mp4(16, 16, [g], fps=1)
    track = mp4_video_track(payload)
    off, size, _ts = track["samples"][0]
    direct = decode_jpeg_gray(payload[off : off + size])
    (w, h, luma, _), = mp4_frames(payload)
    assert (w, h, luma) == direct  # the demuxer adds nothing lossy


def test_max_frames_caps_decode():
    payload = encode_mjpeg_mp4(16, 16, [_solid(v) for v in range(6)], fps=2)
    assert len(mp4_frames(payload, max_frames=3)) == 3


def test_multi_chunk_stsc_runs():
    # rewrite the single-chunk file into two chunks (2 + 1 samples)
    # without moving the mdat: chunk 2 starts at sample 3's offset.
    payload = encode_mjpeg_mp4(16, 16, [_solid(1), _solid(2), _solid(3)], fps=2)
    track = mp4_video_track(payload)
    third_off = track["samples"][2][0]
    first_off = track["samples"][0][0]
    old_stsc = (
        struct.pack(">I", 8 + 8 + 12) + b"stsc" + struct.pack(">II", 0, 1)
        + struct.pack(">III", 1, 3, 1)
    )
    new_stsc = (
        struct.pack(">I", 8 + 8 + 24) + b"stsc" + struct.pack(">II", 0, 2)
        + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 1, 1)
    )
    old_stco = (
        struct.pack(">I", 8 + 8 + 4) + b"stco" + struct.pack(">II", 0, 1)
        + struct.pack(">I", first_off)
    )
    new_stco = (
        struct.pack(">I", 8 + 8 + 8) + b"stco" + struct.pack(">II", 0, 2)
        + struct.pack(">II", first_off, third_off)
    )
    assert old_stsc in payload and old_stco in payload
    patched = payload.replace(old_stsc, new_stsc).replace(old_stco, new_stco)
    # ancestor box sizes are now stale by +16 (stsc +12, stco +4);
    # grow them (rfind: the box tree lives in the trailing moov —
    # searching forward could hit entropy bytes inside mdat)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        idx = patched.rfind(fourcc)
        size = struct.unpack_from(">I", patched, idx - 4)[0]
        patched = (
            patched[: idx - 4]
            + struct.pack(">I", size + 16)
            + patched[idx:]
        )
    frames = mp4_frames(patched)
    assert [set(f[2]) for f in frames] == [{1}, {2}, {3}]


def test_uniform_stsz_path():
    payload = encode_mjpeg_mp4(16, 16, [_solid(5), _solid(5)], fps=2)
    track = mp4_video_track(payload)
    sizes = [s for _o, s, _t in track["samples"]]
    assert sizes[0] == sizes[1]  # identical frames -> identical streams
    # rewrite stsz to the uniform-size form
    old = (
        struct.pack(">I", 8 + 12 + 8) + b"stsz" + struct.pack(">III", 0, 0, 2)
        + struct.pack(">II", sizes[0], sizes[1])
    )
    new = (
        struct.pack(">I", 8 + 12) + b"stsz" + struct.pack(">III", 0, sizes[0], 2)
    )
    assert old in payload
    patched = payload.replace(old, new)
    # shrink ancestors by 8 so the box tree stays consistent
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        idx = patched.rfind(fourcc)
        size = struct.unpack_from(">I", patched, idx - 4)[0]
        patched = (
            patched[: idx - 4] + struct.pack(">I", size - 8) + patched[idx:]
        )
    frames = mp4_frames(patched)
    assert len(frames) == 2 and set(frames[0][2]) == {5}


def test_non_video_and_garbage_return_none():
    assert mp4_frames(b"") is None
    assert mp4_frames(b"\x00" * 64) is None
    # ftyp but no moov
    assert mp4_frames(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 8) is None


def test_truncation_fuzz_never_crashes():
    payload = encode_mjpeg_mp4(16, 16, [_solid(33), _solid(66)], fps=2)
    for cut in range(0, len(payload), 97):
        out = mp4_frames(payload[:cut])  # may be None; must not raise
        assert out is None or len(out) <= 2
    # corrupt every 53rd byte
    for pos in range(20, len(payload), 53):
        mutated = bytearray(payload)
        mutated[pos] ^= 0xFF
        out = mp4_frames(bytes(mutated))
        assert out is None or isinstance(out, list)


def test_sample_outside_file_rejected():
    payload = encode_mjpeg_mp4(16, 16, [_solid(7)], fps=2)
    track = mp4_video_track(payload)
    off, size, _ = track["samples"][0]
    # truncate the mdat so the sample span dangles
    assert mp4_video_track(payload[: off + size - 1]) is None


def test_non_mjpeg_codec_is_metadata_only():
    payload = encode_mjpeg_mp4(16, 16, [_solid(4)], fps=2)
    patched = payload.replace(b"jpeg", b"avc1", 1)  # stsd entry format
    track = mp4_video_track(patched)
    assert track is not None and track["codec"] == "avc1"
    assert mp4_frames(patched) is None  # honest stub boundary


def test_empty_frame_list_rejected():
    with pytest.raises(Mp4Error):
        encode_mjpeg_mp4(16, 16, [])


def test_sample_frames_operator_decodes_mp4(spark):
    from ocr_service_spark.operators.multimodal import sample_frames

    payload = encode_mjpeg_mp4(16, 16, [_solid(10), _solid(20), _solid(30)], fps=2)
    df = spark.createDataFrame([("v://1", bytearray(payload))], "url string, html binary")
    rows = sorted(sample_frames(df, fps=0.5).collect(), key=lambda r: r.frame_no)
    assert [r.pixel_sum for r in rows] == [10 * 256, 20 * 256, 30 * 256]
    assert [r.frame_ts for r in rows] == [0.0, 0.5, 1.0]  # media ts, not fps arg
    assert all((r.width, r.height) == (16, 16) for r in rows)


def test_truncated_stss_degrades_not_raises():
    """A download cut inside the stss header must degrade (sync=None /
    metadata intact), never raise struct.error (round-5 review fix)."""
    from ocr_service_spark.extraction.mp4_codec import (
        encode_avc1_mp4,
        mp4_video_track,
    )

    good = encode_avc1_mp4(32, 32, [bytes(32 * 32)])
    at = good.find(b"stss")
    assert at > 0
    # cut the file right after the stss version/flags word: the box
    # header parse sees a short box at EOF
    cut = good[: at + 8]
    # must not raise — any degradation (None track or sync=None) is fine
    track = mp4_video_track(cut)
    assert track is None or track["sync_samples"] is None


def test_phantom_stss_entries_filtered_consistently():
    """stss sample numbers outside 1..n_samples must not inflate
    n_keyframes relative to keyframe_ts (consumers pair them)."""
    import struct

    from ocr_service_spark.extraction.mp4_codec import (
        avc1_stream_info,
        encode_avc1_mp4,
    )

    good = encode_avc1_mp4(32, 32, [bytes(32 * 32), bytes(32 * 32)])
    at = good.find(b"stss")
    body = at + 4
    n_sync = struct.unpack_from(">I", good, body + 4)[0]
    assert n_sync == 2
    # overwrite entry 2 with a phantom sample number (99)
    patched = bytearray(good)
    struct.pack_into(">I", patched, body + 8 + 4, 99)
    info = avc1_stream_info(bytes(patched))
    assert info["keyframes"] == [1]
    assert len(info["keyframes"]) == len(info["keyframe_ts"])
