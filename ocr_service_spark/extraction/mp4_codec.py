"""From-scratch ISO BMFF (MP4) sample-table reader + MJPEG writer twin.

Reader: walks moov/trak/mdia/minf/stbl and resolves the classic
sample-table quintet — stsd (codec entry + coded dims), stts (decode
timing), stsc (sample→chunk runs), stsz (sizes), stco/co64 (chunk
offsets) — into per-sample byte spans + timestamps, exactly the way a
conformant demuxer locates frames. Samples whose stsd entry format is
``jpeg`` (QuickTime Motion-JPEG: each sample is a bare baseline JPEG
stream) decode to real pixels via the repo's from-scratch baseline
JPEG codec (jpeg_codec.decode_jpeg_gray). ``avc1`` (H.264) tracks get
the from-scratch codec layer in extraction/h264_codec.py: full
SPS/PPS parsing (profile/level/true cropped dims for ANY stream),
keyframe indexing (stss or IDR NAL scan), and real pixel decode for
I_PCM macroblock streams — the coding this repo's own writer twin
emits, losslessly. The ONE remaining boundary of the codec ladder is
residual entropy decoding (CAVLC/CABAC-coded predicted macroblocks):
such frames yield metadata + keyframe positions but no pixels, and
tests/test_h264_codec.py pins that fallback contract. hev1/other
codecs yield sample METADATA only.

Writer twin (tests + synthetic corpora, like png_codec/encode_tiff_gray):
emits a minimal but conformant single-video-track MJPEG file — ftyp +
mdat of concatenated JPEGs + a moov carrying the full stbl — readable
by any demuxer. All samples share ONE chunk so the reader's
cumulative-size offset walk is exercised, not just trivial 1:1 runs.

Reference parity note: the reference service has no video endpoint
(SURVEY §2) — this module is part of the beyond-reference multimodal
tier the brief asks for (frame sampling over opaque binary columns).
"""

from __future__ import annotations

import struct
from typing import Iterator

from ocr_service_spark.extraction.jpeg_codec import (
    JpegError,
    decode_jpeg_gray,
    encode_jpeg_gray,
)

_VIDEO_HANDLER = b"vide"
# sample-entry formats whose samples are self-contained baseline JPEG
# streams (QuickTime Motion-JPEG A; 'mjpa' adds a field header this
# decoder does not parse, so it stays metadata-only)
_MJPEG_FORMATS = {b"jpeg"}


class Mp4Error(ValueError):
    pass


def _boxes(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = buf[pos + 4 : pos + 8]
        header = 8
        if size == 1 and pos + 16 <= end:
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            return
        yield btype, pos + header, pos + size
        pos += size


def _child(buf: bytes, start: int, end: int, fourcc: bytes) -> tuple[int, int] | None:
    for btype, body, bend in _boxes(buf, start, end):
        if btype == fourcc:
            return body, bend
    return None


def mp4_video_track(payload: bytes) -> dict | None:
    """First video track's codec + dims + per-sample (offset, size,
    timestamp-seconds) list, or None when the file carries no
    resolvable video sample table."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    moov = _child(payload, 0, len(payload), b"moov")
    if moov is None:
        return None
    for btype, tbody, tend in _boxes(payload, *moov):
        if btype != b"trak":
            continue
        mdia = _child(payload, tbody, tend, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != _VIDEO_HANDLER:
            continue
        mdhd = _child(payload, *mdia, b"mdhd")
        timescale = 0
        if mdhd is not None:
            ver = payload[mdhd[0]]
            at = mdhd[0] + (20 if ver == 1 else 12)
            if at + 4 <= mdhd[1]:
                timescale = struct.unpack_from(">I", payload, at)[0]
        minf = _child(payload, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _child(payload, *minf, b"stbl")
        if stbl is None:
            continue
        track = _read_sample_table(payload, *stbl, timescale or 1)
        if track is not None:
            return track
    return None


def _read_sample_table(
    buf: bytes, start: int, end: int, timescale: int
) -> dict | None:
    stsd = _child(buf, start, end, b"stsd")
    stts = _child(buf, start, end, b"stts")
    stsc = _child(buf, start, end, b"stsc")
    stsz = _child(buf, start, end, b"stsz")
    stco = _child(buf, start, end, b"stco")
    co64 = _child(buf, start, end, b"co64") if stco is None else None
    if not all((stsd, stsz)) or (stco is None and co64 is None):
        return None

    # stsd: first sample entry -> format fourcc + coded dims (+ codec
    # config boxes past the 86-byte VisualSampleEntry header, e.g. avcC)
    body, bend = stsd
    if body + 16 > bend:
        return None
    entry = body + 8
    fmt = buf[entry + 4 : entry + 8]
    width = height = 0
    if entry + 36 <= bend:
        width, height = struct.unpack_from(">HH", buf, entry + 32)
    avcc = None
    entry_size = struct.unpack_from(">I", buf, entry)[0]
    entry_end = min(entry + entry_size, bend)
    if fmt == b"avc1" and entry + 86 < entry_end:
        got = _child(buf, entry + 86, entry_end, b"avcC")
        if got is not None:
            avcc = buf[got[0] : got[1]]

    # stsz: uniform or per-sample sizes
    body, bend = stsz
    uniform, n_samples = struct.unpack_from(">II", buf, body + 4)
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if body + 12 + 4 * n_samples > bend:
            return None
        sizes = list(struct.unpack_from(f">{n_samples}I", buf, body + 12))

    # chunk offsets
    if stco is not None:
        body, bend = stco
        n_chunks = struct.unpack_from(">I", buf, body + 4)[0]
        if body + 8 + 4 * n_chunks > bend:
            return None
        offsets = list(struct.unpack_from(f">{n_chunks}I", buf, body + 8))
    else:
        body, bend = co64
        n_chunks = struct.unpack_from(">I", buf, body + 4)[0]
        if body + 8 + 8 * n_chunks > bend:
            return None
        offsets = list(struct.unpack_from(f">{n_chunks}Q", buf, body + 8))

    # stsc runs -> samples-per-chunk for each chunk (1-based)
    runs: list[tuple[int, int]] = []
    if stsc is not None:
        body, bend = stsc
        n_runs = struct.unpack_from(">I", buf, body + 4)[0]
        at = body + 8
        for _ in range(n_runs):
            if at + 12 > bend:
                return None
            first_chunk, spc, _sd = struct.unpack_from(">III", buf, at)
            runs.append((first_chunk, spc))
            at += 12
    if not runs:
        runs = [(1, 1)]

    # stts -> cumulative decode timestamps
    deltas: list[int] = []
    if stts is not None:
        body, bend = stts
        n_ent = struct.unpack_from(">I", buf, body + 4)[0]
        at = body + 8
        for _ in range(n_ent):
            if at + 8 > bend:
                break
            cnt, delta = struct.unpack_from(">II", buf, at)
            deltas.extend([delta] * min(cnt, n_samples - len(deltas)))
            at += 8
    while len(deltas) < n_samples:
        deltas.append(deltas[-1] if deltas else 0)

    samples: list[tuple[int, int, float]] = []
    sample_idx, run_idx, ts = 0, 0, 0
    for chunk_no, chunk_off in enumerate(offsets, 1):
        while run_idx + 1 < len(runs) and runs[run_idx + 1][0] <= chunk_no:
            run_idx += 1
        pos = chunk_off
        for _ in range(runs[run_idx][1]):
            if sample_idx >= n_samples:
                break
            size = sizes[sample_idx]
            if pos + size > len(buf):
                return None  # sample table points outside the file
            samples.append((pos, size, round(ts / timescale, 6)))
            ts += deltas[sample_idx]
            pos += size
            sample_idx += 1
    if sample_idx < n_samples:
        return None  # chunk map does not cover every sample

    # stss: sync-sample (keyframe) numbers, 1-based; absent = all sync
    sync: list[int] | None = None
    stss = _child(buf, start, end, b"stss")
    if stss is not None:
        body, bend = stss
        # a download cut mid-moov can truncate stss right after its
        # header: degrade to sync=None (all-sync), don't raise
        if body + 8 <= bend:
            n_sync = struct.unpack_from(">I", buf, body + 4)[0]
            if body + 8 + 4 * n_sync <= bend:
                sync = list(struct.unpack_from(f">{n_sync}I", buf, body + 8))

    return {
        "codec": fmt.decode("latin-1"),
        "width": width,
        "height": height,
        "timescale": timescale,
        "samples": samples,
        "sync_samples": sync,
        "avcc": avcc,
    }


def mp4_frames(
    payload: bytes, max_frames: int = 8
) -> list[tuple[int, int, bytes, float]] | None:
    """Decoded (width, height, luma, ts_seconds) per video sample —
    MJPEG samples through the baseline JPEG codec, avc1 samples through
    the H.264 I_PCM decoder — or None when the track is absent or its
    coding is past the from-scratch boundary (CAVLC/CABAC residuals:
    the caller falls back to the metadata-only path)."""
    track = mp4_video_track(payload)
    if track is None:
        return None
    if track["codec"] == "avc1":
        return _avc1_frames(payload, track, max_frames)
    if track["codec"].encode("latin-1") not in _MJPEG_FORMATS:
        return None
    out = []
    for off, size, ts in track["samples"][:max_frames]:
        try:
            w, h, luma = decode_jpeg_gray(payload[off : off + size])
        except JpegError:
            return None  # corrupt sample: honest fallback, not a crash
        out.append((w, h, luma, ts))
    return out or None


def _avc1_sps_pps(track: dict) -> tuple[dict, dict] | None:
    from ocr_service_spark.extraction.h264_codec import (
        H264Error,
        _strip_emulation,
        parse_avcc,
        parse_pps,
        parse_sps,
    )

    cfg = parse_avcc(track["avcc"]) if track.get("avcc") else None
    if not cfg or not cfg["sps"] or not cfg["pps"]:
        return None
    try:
        sps = parse_sps(_strip_emulation(cfg["sps"][0][1:]))
        pps = parse_pps(_strip_emulation(cfg["pps"][0][1:]))
    except H264Error:
        return None
    sps["_length_size"] = cfg["length_size"]
    return sps, pps


def _avc1_frames(
    payload: bytes, track: dict, max_frames: int
) -> list[tuple[int, int, bytes, float]] | None:
    from ocr_service_spark.extraction.h264_codec import (
        H264Error,
        decode_ipcm_picture,
        nal_units_avcc,
    )

    got = _avc1_sps_pps(track)
    if got is None:
        return None
    sps, pps = got
    out = []
    for off, size, ts in track["samples"][:max_frames]:
        try:
            nals = nal_units_avcc(payload[off : off + size], sps["_length_size"])
        except H264Error:
            return None
        # all slice NALs of the access unit decode together (a picture
        # may be split into several first_mb slices)
        luma = decode_ipcm_picture(nals, sps, pps)
        if luma is None:
            return None  # residual-coded frame: metadata-only fallback
        out.append((sps["width"], sps["height"], luma, ts))
    return out or None


def avc1_stream_info(payload: bytes, track: dict | None = None) -> dict | None:
    """Codec-layer metadata for ANY avc1 MP4 (no pixel decode needed):
    H.264 profile/level, the TRUE display dims from the SPS (the stsd
    dims lie when cropping is present), entropy mode, and the keyframe
    sample numbers + timestamps (stss when present, else an IDR NAL
    scan over the sample table). None when the file has no parsable
    avc1 track. Callers that already hold the parsed track (the media
    route parses it first for codec dispatch) pass it in to avoid a
    second full container walk per document."""
    if track is None:
        track = mp4_video_track(payload)
    if track is None or track["codec"] != "avc1":
        return None
    got = _avc1_sps_pps(track)
    if got is None:
        return None
    sps, pps = got
    if track["sync_samples"] is not None:
        # drop phantom stss entries (sample numbers outside 1..n) so
        # keyframes and keyframe_ts stay the same length on malformed
        # files — consumers pair them positionally
        n = len(track["samples"])
        keyframes = [i for i in track["sync_samples"] if 1 <= i <= n]
    else:
        from ocr_service_spark.extraction.h264_codec import (
            H264Error,
            nal_units_avcc,
        )

        keyframes = []
        for i, (off, size, _ts) in enumerate(track["samples"], 1):
            try:
                nals = nal_units_avcc(payload[off : off + size], sps["_length_size"])
            except H264Error:
                continue
            if any(n and (n[0] & 0x1F) == 5 for n in nals):
                keyframes.append(i)
    ts_by_no = {i: ts for i, (_o, _s, ts) in enumerate(track["samples"], 1)}
    return {
        "profile_idc": sps["profile_idc"],
        "level_idc": sps["level_idc"],
        "width": sps["width"],
        "height": sps["height"],
        "entropy": "cabac" if pps["entropy_coding_mode"] else "cavlc",
        "n_samples": len(track["samples"]),
        "keyframes": keyframes,
        "keyframe_ts": [ts_by_no[i] for i in keyframes if i in ts_by_no],
    }


# ---------------------------------------------------------------- writer

def _box(fourcc: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + fourcc + body


_UNITY_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mjpeg_mp4(
    width: int, height: int, lumas: list[bytes], fps: int = 2
) -> bytes:
    """Grayscale frames -> a conformant single-track MJPEG MP4.

    Each frame is encoded with the repo's baseline JPEG encoder and
    stored as one sample; all samples share one chunk (single stco
    entry + an stsc run of len(frames)), so readers must walk sizes
    cumulatively. Deterministic for deterministic input."""
    if not lumas:
        raise Mp4Error("at least one frame required")
    jpegs = [encode_jpeg_gray(width, height, luma) for luma in lumas]
    n = len(jpegs)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isomiso2mp41")
    mdat_payload = b"".join(jpegs)
    # samples live in one chunk that starts right after mdat's header
    chunk_off = len(ftyp) + 8

    stsd_entry = (
        struct.pack(">I", 86)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count per sample
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stbl = _box(
        b"stbl",
        _box(b"stsd", struct.pack(">II", 0, 1), stsd_entry),
        _box(b"stts", struct.pack(">II", 0, 1), struct.pack(">II", n, delta)),
        _box(b"stsc", struct.pack(">II", 0, 1), struct.pack(">III", 1, n, 1)),
        _box(
            b"stsz",
            struct.pack(">III", 0, 0, n),
            struct.pack(f">{n}I", *(len(j) for j in jpegs)),
        ),
        _box(b"stco", struct.pack(">II", 0, 1), struct.pack(">I", chunk_off)),
    )
    minf = _box(
        b"minf",
        _box(b"vmhd", struct.pack(">I", 1), b"\x00" * 8),
        _box(
            b"dinf",
            _box(b"dref", struct.pack(">II", 0, 1), _box(b"url ", struct.pack(">I", 1))),
        ),
        stbl,
    )
    mdia = _box(
        b"mdia",
        _box(
            b"mdhd",
            struct.pack(">III", 0, 0, 0),
            struct.pack(">II", timescale, duration),
            struct.pack(">HH", 0x55C4, 0),  # language 'und'
        ),
        _box(b"hdlr", struct.pack(">I", 0), b"\x00" * 4, b"vide", b"\x00" * 12, b"\x00"),
        minf,
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7),  # version 0, flags: enabled+in-movie+preview
        struct.pack(">III", 0, 0, 1),  # created, modified, track_id
        struct.pack(">I", 0),
        struct.pack(">I", duration),
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),  # layer, group, volume, reserved
        _UNITY_MATRIX,
        struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _box(
        b"mvhd",
        struct.pack(">I", 0),
        struct.pack(">II", 0, 0),
        struct.pack(">II", timescale, duration),
        struct.pack(">I", 0x10000),  # rate 1.0
        struct.pack(">H", 0x100),  # volume
        b"\x00" * 10,
        _UNITY_MATRIX,
        b"\x00" * 24,
        struct.pack(">I", 2),  # next track id
    )
    moov = _box(b"moov", mvhd, _box(b"trak", tkhd, mdia))
    return ftyp + _box(b"mdat", mdat_payload) + moov


def encode_avc1_mp4(
    width: int, height: int, lumas: list[bytes], fps: int = 2, n_slices: int = 1
) -> bytes:
    """Grayscale frames -> a conformant single-track avc1 (H.264) MP4.

    Every frame is an IDR picture of I_PCM macroblocks (lossless, raw
    samples inside the NAL — mandatory-support coding in every H.264
    profile), length-prefixed per ISO 14496-15, SPS/PPS carried in the
    avcC sample-entry box, all samples listed sync in stss. With
    ``n_slices`` > 1 each picture is split into several first_mb slice
    NALs inside one sample (the shape real encoders emit). Frames
    round-trip byte-exactly through mp4_frames/decode_ipcm_picture.
    Deterministic for deterministic input."""
    from ocr_service_spark.extraction.h264_codec import (
        build_avcc,
        write_ipcm_idr,
        write_pps,
        write_sps,
    )

    if not lumas:
        raise Mp4Error("at least one frame required")
    sps_nal = write_sps(width, height)
    pps_nal = write_pps()
    samples = []
    for i, luma in enumerate(lumas):
        nals = write_ipcm_idr(width, height, luma, idr_pic_id=i % 16, n_slices=n_slices)
        if isinstance(nals, bytes):
            nals = [nals]
        samples.append(
            b"".join(struct.pack(">I", len(nal)) + nal for nal in nals)
        )
    n = len(samples)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isomiso2avc1mp41")
    mdat_payload = b"".join(samples)
    chunk_off = len(ftyp) + 8

    avcc_box = _box(b"avcC", build_avcc(sps_nal, pps_nal))
    entry_body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + avcc_box
    )
    stsd_entry = struct.pack(">I", 8 + len(entry_body)) + b"avc1" + entry_body
    stbl = _box(
        b"stbl",
        _box(b"stsd", struct.pack(">II", 0, 1), stsd_entry),
        _box(b"stts", struct.pack(">II", 0, 1), struct.pack(">II", n, delta)),
        _box(b"stss", struct.pack(">II", 0, n), struct.pack(f">{n}I", *range(1, n + 1))),
        _box(b"stsc", struct.pack(">II", 0, 1), struct.pack(">III", 1, n, 1)),
        _box(
            b"stsz",
            struct.pack(">III", 0, 0, n),
            struct.pack(f">{n}I", *(len(s) for s in samples)),
        ),
        _box(b"stco", struct.pack(">II", 0, 1), struct.pack(">I", chunk_off)),
    )
    minf = _box(
        b"minf",
        _box(b"vmhd", struct.pack(">I", 1), b"\x00" * 8),
        _box(
            b"dinf",
            _box(b"dref", struct.pack(">II", 0, 1), _box(b"url ", struct.pack(">I", 1))),
        ),
        stbl,
    )
    mdia = _box(
        b"mdia",
        _box(
            b"mdhd",
            struct.pack(">III", 0, 0, 0),
            struct.pack(">II", timescale, duration),
            struct.pack(">HH", 0x55C4, 0),
        ),
        _box(b"hdlr", struct.pack(">I", 0), b"\x00" * 4, b"vide", b"\x00" * 12, b"\x00"),
        minf,
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7),
        struct.pack(">III", 0, 0, 1),
        struct.pack(">I", 0),
        struct.pack(">I", duration),
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),
        _UNITY_MATRIX,
        struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _box(
        b"mvhd",
        struct.pack(">I", 0),
        struct.pack(">II", 0, 0),
        struct.pack(">II", timescale, duration),
        struct.pack(">I", 0x10000),
        struct.pack(">H", 0x100),
        b"\x00" * 10,
        _UNITY_MATRIX,
        b"\x00" * 24,
        struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd, _box(b"trak", tkhd, mdia))
    return ftyp + _box(b"mdat", mdat_payload) + moov
