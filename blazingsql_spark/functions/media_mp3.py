"""Zero-dependency MPEG audio (MP3) frame parsing + a testing encoder.

Same superset rationale as media_mp4: audio corpus payloads arrive as
opaque binary and the metadata stage needs duration / sample-rate /
bitrate WITHOUT an external codec. The frame layer is simple enough to do
for real: an MP3 file is a sequence of self-describing frames (sync word +
4-byte header each), optionally preceded by an ID3v2 tag; duration is the
frame count times samples-per-frame over the sample rate, and VBR files
carry the authoritative frame count in a Xing/Info header inside the
first frame.

Real here: ID3v2 skip (syncsafe size), per-frame header decode
(version/layer/bitrate/sample-rate/padding/channel-mode tables from
ISO 11172-3), frame-length arithmetic, whole-file frame walk, Xing/Info
VBR detection, duration computation. The honest boundary: PCM decode
(Huffman + requantization + IMDCT + synthesis filterbank) needs a real
codec and raises NotImplementedError.
"""

from __future__ import annotations

import struct

# bitrate tables [kbps], index 1-14 (0=free, 15=bad) — ISO 11172-3 / 13818-3
_BITRATES = {
    # (version_group, layer): MPEG1 vs MPEG2/2.5 share tables per layer
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}


def is_mp3(payload: bytes) -> bool:
    if payload[:3] == b"ID3":
        return True
    # full header validity, not just the sync word: random binary prefixes
    # pass a sync-only check ~0.1% of the time and would crash the
    # metadata pass downstream
    return len(payload) >= 4 and _frame_header(payload, 0) is not None


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]  # syncsafe
    return 10 + size


def _frame_header(payload: bytes, pos: int) -> dict | None:
    """Decode the 4-byte header at pos; None when it is not a valid frame."""
    if pos + 4 > len(payload):
        return None
    h = struct.unpack_from(">I", payload, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((h >> 17) & 3)
    if version is None or layer is None:
        return None
    bitrate_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if bitrate_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    vgroup = 1 if version == "1" else 2
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx] * 1000
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    padding = (h >> 9) & 1
    protection = (h >> 16) & 1  # 0 = a 16-bit CRC follows the header
    channel_mode = ["stereo", "joint_stereo", "dual_channel", "mono"][(h >> 6) & 3]
    if layer == 1:
        spf = 384
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    elif layer == 2:
        spf = 1152
        frame_len = 144 * bitrate // sample_rate + padding
    else:  # layer 3: 1152 samples MPEG1, 576 MPEG2/2.5
        spf = 1152 if version == "1" else 576
        coef = 144 if version == "1" else 72
        frame_len = coef * bitrate // sample_rate + padding
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "padding": padding,
        "protection": protection,
        "channel_mode": channel_mode,
        "samples_per_frame": spf,
        "frame_len": frame_len,
    }


def _xing_offset(version: str, channel_mode: str, protection: int = 1) -> int:
    """Side-info length after the header, where a Xing/Info tag would sit;
    CRC-protected frames (protection bit 0) carry a 16-bit CRC first."""
    crc = 0 if protection else 2
    if version == "1":
        return 4 + crc + (17 if channel_mode == "mono" else 32)
    return 4 + crc + (9 if channel_mode == "mono" else 17)


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame; returns {n_frames, sample_rate, bitrate_kbps,
    duration_ms, channel_mode, version, layer, is_vbr, has_id3, n_bytes}.

    bitrate_kbps is the constant bitrate, or the average for VBR files.
    A Xing/Info header in the first frame supplies the authoritative frame
    count (its own frame is metadata, not audio)."""
    pos = _id3v2_size(payload)
    has_id3 = pos > 0
    first = _frame_header(payload, pos)
    if first is None:
        raise ValueError("mp3: no valid frame sync after header")
    xo = pos + _xing_offset(first["version"], first["channel_mode"], first["protection"])
    xing_frames = None
    is_vbr = False
    if payload[xo : xo + 4] in (b"Xing", b"Info") and len(payload) >= xo + 12:
        is_vbr = payload[xo : xo + 4] == b"Xing"
        flags = struct.unpack_from(">I", payload, xo + 4)[0]
        if flags & 1:
            xing_frames = struct.unpack_from(">I", payload, xo + 8)[0]
    n_frames = 0
    bitrate_sum = 0
    sr = first["sample_rate"]
    spf = first["samples_per_frame"]
    while True:
        h = _frame_header(payload, pos)
        if h is None or pos + h["frame_len"] > len(payload):
            break
        n_frames += 1
        bitrate_sum += h["bitrate"]
        if h["bitrate"] != first["bitrate"]:
            is_vbr = True
        pos += h["frame_len"]
    if xing_frames is not None:
        audio_frames = xing_frames  # walker counted the Xing frame too
    else:
        audio_frames = n_frames
    duration_ms = int(audio_frames * spf * 1000 // sr) if sr else 0
    avg_kbps = bitrate_sum // n_frames // 1000 if n_frames else 0
    return {
        "n_frames": audio_frames,
        "sample_rate": sr,
        "bitrate_kbps": avg_kbps,
        "duration_ms": duration_ms,
        "channel_mode": first["channel_mode"],
        "version": first["version"],
        "layer": first["layer"],
        "is_vbr": is_vbr,
        "has_id3": has_id3,
        "n_bytes": len(payload),
    }


def decode_pcm(payload: bytes) -> None:
    """PCM decode — NOT implementable here: Layer III needs the Huffman
    tables, requantizer, stereo processing, alias reduction, IMDCT and the
    polyphase synthesis filterbank of a real codec library; the frame/
    metadata layer above is real."""
    raise NotImplementedError(
        "mp3 PCM decode needs an external codec library (e.g. ffmpeg/"
        "miniaudio); frame walk + duration/bitrate metadata are real "
        "(media_mp3.parse_mp3)"
    )


# ------------------------------------------------------------- encoder ----


def _header_word(
    version: str, layer: int, bitrate_kbps: int, sample_rate: int, padding: int,
    channel_mode: str,
) -> int:
    ver_bits = {"2.5": 0, "2": 2, "1": 3}[version]
    layer_bits = {3: 1, 2: 2, 1: 3}[layer]
    vgroup = 1 if version == "1" else 2
    bidx = _BITRATES[(vgroup, layer)].index(bitrate_kbps)
    sidx = _SAMPLE_RATES[version].index(sample_rate)
    cidx = ["stereo", "joint_stereo", "dual_channel", "mono"].index(channel_mode)
    return (
        (0x7FF << 21)
        | (ver_bits << 19)
        | (layer_bits << 17)
        | (1 << 16)  # no CRC
        | (bidx << 12)
        | (sidx << 10)
        | (padding << 9)
        | (cidx << 6)
    )


def encode_mp3_cbr(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    version: str = "1",
    layer: int = 3,
    channel_mode: str = "stereo",
    with_id3: bool = False,
    with_xing: bool = False,
) -> bytes:
    """Testing encoder: valid CBR frame headers over silent (zeroed) main
    data — parseable by any MP3 demuxer; obviously not meaningful audio.
    with_xing prepends a Xing metadata frame carrying the frame count (so
    the VBR-header path is testable); with_id3 prepends a minimal ID3v2
    tag."""
    h = _frame_header(
        struct.pack(
            ">I", _header_word(version, layer, bitrate_kbps, sample_rate, 0, channel_mode)
        )
        + b"\x00" * 4,
        0,
    )
    assert h is not None
    header = struct.pack(
        ">I", _header_word(version, layer, bitrate_kbps, sample_rate, 0, channel_mode)
    )
    frame = header + b"\x00" * (h["frame_len"] - 4)
    parts = []
    if with_id3:
        tag_body = b"\x00" * 32
        parts.append(b"ID3\x04\x00\x00" + bytes([0, 0, len(tag_body) >> 7, len(tag_body) & 0x7F]) + tag_body)
    if with_xing:
        # the encoder always sets protection=1 (no CRC) — match the parser
        xo = _xing_offset(version, channel_mode, protection=1)
        body = bytearray(frame)
        body[xo : xo + 4] = b"Info"  # CBR-style metadata frame
        struct.pack_into(">I", body, xo + 4, 1)  # flags: FRAMES
        struct.pack_into(">I", body, xo + 8, n_frames)  # excludes the tag frame
        parts.append(bytes(body))
    parts.extend([frame] * n_frames)
    return b"".join(parts)


def mp3_meta(payload: bytes) -> dict:
    """media_meta-shaped summary for audio payloads."""
    info = parse_mp3(payload)
    return {"media_type": "audio", "duration_ms": info["duration_ms"]}
