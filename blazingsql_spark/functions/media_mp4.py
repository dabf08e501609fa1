"""Zero-dependency ISO-BMFF (MP4/MOV) container parsing + a testing muxer.

The reference engine has no media path at all (BlazingDB operates on
tabular cuDF frames only) — this module belongs to the training-data
pipeline superset: video payloads arrive as opaque ``binary`` columns and
the frame-sampling stage needs to (a) read typed metadata (duration,
dimensions, codec) and (b) pull individual encoded samples out of the
container so each downstream Python task holds ONE frame, not one video.

Scope — the container layer decodes for REAL:
- box walk with 32-bit, 64-bit (size==1) and to-end (size==0) sizes;
- ftyp brand, mvhd movie timescale/duration, per-track tkhd dimensions,
  mdhd media timescale, hdlr kind (vide/soun), stsd codec fourcc;
- the full sample-table stack resolved to absolute (offset, size) per
  sample: stts (decode timestamps), stsc (chunk runs), stsz (sizes —
  the compact stz2 variant is rejected by name), stco / co64 (chunk
  offsets), stss (sync samples);
- sample extraction by index, and uniform sync-sample selection for
  frame sampling.

What stays OUT, with the same honest boundary JPEG had before its real
decoder landed: codec *bitstream* decode (H.264/HEVC/AAC entropy decode)
needs an external codec library and raises NotImplementedError naming it.
The extracted bytes are the real encoded access units.

Everything here runs inside executor Python workers on one payload at a
time — no Spark imports, no driver state.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            if body + 8 > end:
                raise ValueError("mp4: truncated 64-bit box size")
            size = struct.unpack_from(">Q", data, body)[0]
            body += 8
            box_end = pos + size
        elif size == 0:  # box extends to end of enclosing scope
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError(
                f"mp4: box {fourcc!r} at {pos} overruns enclosing scope "
                f"({box_end} > {end})"
            )
        yield fourcc, body, box_end
        if box_end == pos:  # defensive: zero-progress guard
            raise ValueError("mp4: zero-size box loop")
        pos = box_end


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """Read a FullBox version/flags word; returns (version, payload_pos)."""
    version = data[pos]
    return version, pos + 4


def _parse_stts(data: bytes, b: int, e: int) -> list[tuple[int, int]]:
    _v, p = _fullbox(data, b)
    (n,) = struct.unpack_from(">I", data, p)
    p += 4
    out = []
    for _ in range(n):
        cnt, dur = struct.unpack_from(">II", data, p)
        out.append((cnt, dur))
        p += 8
    return out


def _parse_stsc(data: bytes, b: int, e: int) -> list[tuple[int, int]]:
    _v, p = _fullbox(data, b)
    (n,) = struct.unpack_from(">I", data, p)
    p += 4
    out = []
    for _ in range(n):
        first_chunk, spc, _desc = struct.unpack_from(">III", data, p)
        out.append((first_chunk, spc))
        p += 12
    return out


def _parse_stsz(data: bytes, b: int, e: int) -> tuple[int, list[int]]:
    _v, p = _fullbox(data, b)
    uniform, n = struct.unpack_from(">II", data, p)
    p += 8
    if uniform:
        return n, [uniform] * n
    return n, list(struct.unpack_from(f">{n}I", data, p))


def _parse_stco(data: bytes, b: int, e: int, wide: bool) -> list[int]:
    _v, p = _fullbox(data, b)
    (n,) = struct.unpack_from(">I", data, p)
    p += 4
    fmt = ">%d%s" % (n, "Q" if wide else "I")
    return list(struct.unpack_from(fmt, data, p))


def _parse_stss(data: bytes, b: int, e: int) -> list[int]:
    _v, p = _fullbox(data, b)
    (n,) = struct.unpack_from(">I", data, p)
    p += 4
    return list(struct.unpack_from(f">{n}I", data, p))


def _resolve_samples(
    stsc: list[tuple[int, int]], sizes: list[int], chunk_offsets: list[int]
) -> list[tuple[int, int]]:
    """Flatten the chunk-run table into one absolute (offset, size) per sample.

    stsc entries are (first_chunk, samples_per_chunk) runs: each run applies
    from its first_chunk (1-based) until the next entry's first_chunk - 1."""
    n_chunks = len(chunk_offsets)
    spc_by_chunk: list[int] = []
    for i, (first, spc) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else n_chunks
        spc_by_chunk.extend([spc] * (last - first + 1))
    if len(spc_by_chunk) != n_chunks:
        raise ValueError(
            f"mp4: stsc covers {len(spc_by_chunk)} chunks, stco has {n_chunks}"
        )
    out: list[tuple[int, int]] = []
    si = 0
    for chunk_idx, base in enumerate(chunk_offsets):
        off = base
        for _ in range(spc_by_chunk[chunk_idx]):
            if si >= len(sizes):
                raise ValueError("mp4: stsc/stsz sample count mismatch")
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError(f"mp4: resolved {si} samples, stsz has {len(sizes)}")
    return out


def parse_mp4(payload: bytes) -> dict:
    """Parse the container into typed metadata + resolved sample tables.

    Returns {brand, timescale, duration_ms, n_tracks, tracks: [...]} where
    each track dict carries kind ('video'/'audio'/'other'), codec fourcc,
    width/height (video only), media timescale, duration_ms, n_samples,
    samples: [(offset, size)], sync_samples: 0-based indices (all samples
    when no stss box is present, per ISO 14496-12 §8.6.2)."""
    if not is_mp4(payload):
        raise ValueError("mp4: missing ftyp header")
    try:
        return _parse_mp4_inner(payload)
    except (struct.error, IndexError) as e:
        # malformed tables (a lying stsz count -> struct.error; a FullBox
        # ending exactly at EOF -> IndexError from the version byte read)
        # must surface as the typed decode error skip-mode callers catch
        raise ValueError(f"mp4: truncated or malformed structure ({e})") from e


def _parse_mp4_inner(payload: bytes) -> dict:
    data = payload
    end = len(data)
    ftyp = _find(data, 0, end, b"ftyp")
    brand = data[ftyp[0] : ftyp[0] + 4].decode("ascii", "replace")
    moov = _find(data, 0, end, b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    mb, me = moov
    mvhd = _find(data, mb, me, b"mvhd")
    if mvhd is None:
        raise ValueError("mp4: no mvhd box")
    v, p = _fullbox(data, mvhd[0])
    if v == 1:
        _ctime, _mtime, timescale, duration = struct.unpack_from(">QQIQ", data, p)
    else:
        _ctime, _mtime, timescale, duration = struct.unpack_from(">IIII", data, p)
    info = {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": int(duration * 1000 // timescale) if timescale else 0,
        "tracks": [],
    }
    for fc, tb, te in _iter_boxes(data, mb, me):
        if fc != b"trak":
            continue
        info["tracks"].append(_parse_trak(data, tb, te))
    info["n_tracks"] = len(info["tracks"])
    return info


def _parse_trak(data: bytes, tb: int, te: int) -> dict:
    track: dict = {
        "kind": "other",
        "codec": None,
        "width": None,
        "height": None,
        "timescale": None,
        "duration_ms": None,
        "n_samples": 0,
        "samples": [],
        "sync_samples": [],
        "sample_durations": [],
    }
    tkhd = _find(data, tb, te, b"tkhd")
    if tkhd is not None:
        v, p = _fullbox(data, tkhd[0])
        # width/height are the last two 16.16 fixed-point words of the box
        w_fix, h_fix = struct.unpack_from(">II", data, tkhd[1] - 8)
        track["width"] = w_fix >> 16 or None
        track["height"] = h_fix >> 16 or None
    mdia = _find(data, tb, te, b"mdia")
    if mdia is None:
        return track
    db, de = mdia
    mdhd = _find(data, db, de, b"mdhd")
    if mdhd is not None:
        v, p = _fullbox(data, mdhd[0])
        if v == 1:
            _c, _m, ts, dur = struct.unpack_from(">QQIQ", data, p)
        else:
            _c, _m, ts, dur = struct.unpack_from(">IIII", data, p)
        track["timescale"] = ts
        track["duration_ms"] = int(dur * 1000 // ts) if ts else 0
    hdlr = _find(data, db, de, b"hdlr")
    if hdlr is not None:
        handler = data[hdlr[0] + 8 : hdlr[0] + 12]
        track["kind"] = {b"vide": "video", b"soun": "audio"}.get(handler, "other")
    minf = _find(data, db, de, b"minf")
    if minf is None:
        return track
    stbl = _find(data, minf[0], minf[1], b"stbl")
    if stbl is None:
        return track
    sb, se = stbl
    stsd = _find(data, sb, se, b"stsd")
    if stsd is not None:
        _v, p = _fullbox(data, stsd[0])
        (n_entries,) = struct.unpack_from(">I", data, p)
        if n_entries >= 1:
            track["codec"] = data[p + 8 : p + 12].decode("ascii", "replace")
    stts = _find(data, sb, se, b"stts")
    stsc = _find(data, sb, se, b"stsc")
    stsz = _find(data, sb, se, b"stsz")
    stco = _find(data, sb, se, b"stco")
    co64 = _find(data, sb, se, b"co64")
    if stsz is None and _find(data, sb, se, b"stz2") is not None:
        raise NotImplementedError(
            "mp4: compact stz2 sample sizes not supported (plain stsz only)"
        )
    if stsz is None or stsc is None or (stco is None and co64 is None):
        return track  # metadata-only track (no sample data in this file)
    n, sizes = _parse_stsz(data, *stsz)
    offsets = (
        _parse_stco(data, *co64, wide=True)
        if co64 is not None
        else _parse_stco(data, *stco, wide=False)
    )
    track["samples"] = _resolve_samples(_parse_stsc(data, *stsc), sizes, offsets)
    track["n_samples"] = n
    if stts is not None:
        durs: list[int] = []
        for cnt, dur in _parse_stts(data, *stts):
            durs.extend([dur] * cnt)
        track["sample_durations"] = durs
    stss = _find(data, sb, se, b"stss")
    if stss is not None:
        track["sync_samples"] = [i - 1 for i in _parse_stss(data, *stss)]
    else:
        track["sync_samples"] = list(range(n))
    return track


def _pick_track(info: dict, kind: str | None) -> dict:
    tracks = info["tracks"]
    if kind is not None:
        tracks = [t for t in tracks if t["kind"] == kind]
    tracks = [t for t in tracks if t["n_samples"]]
    if not tracks:
        raise ValueError(f"mp4: no {kind or 'sampled'} track")
    return tracks[0]


def extract_samples(
    payload: bytes, indices: list[int], kind: str | None = "video"
) -> list[bytes]:
    """Pull raw encoded samples (access units) out of the container by
    0-based sample index. This is real byte extraction from mdat via the
    resolved sample table — decoding the codec bitstream inside them is
    the documented external-library boundary."""
    info = parse_mp4(payload)
    track = _pick_track(info, kind)
    out = []
    for i in indices:
        if not 0 <= i < track["n_samples"]:
            raise ValueError(f"mp4: sample index {i} out of range 0..{track['n_samples'] - 1}")
        off, size = track["samples"][i]
        if off + size > len(payload):
            raise ValueError("mp4: sample extends past end of file")
        out.append(payload[off : off + size])
    return out


def sample_frame_indices(payload: bytes, n_frames: int, kind: str | None = "video") -> list[int]:
    """Uniformly spaced SYNC-sample indices (seek targets) for frame
    sampling: decoding a non-sync sample would need all frames since the
    previous keyframe, so sampling plans snap to stss entries."""
    info = parse_mp4(payload)
    track = _pick_track(info, kind)
    sync = track["sync_samples"]
    if not sync:
        return []
    n = min(n_frames, len(sync))
    return sorted({sync[(i * len(sync)) // n] for i in range(n)})


def decode_frame(payload: bytes, index: int) -> None:
    """Pixel decode of one extracted sample — NOT implementable without an
    external codec library (H.264/HEVC entropy decode + DPB management);
    the container layer above is real."""
    raise NotImplementedError(
        "mp4 codec bitstream decode needs an external library (e.g. PyAV/"
        "ffmpeg); container parse + encoded-sample extraction are real "
        "(media_mp4.extract_samples)"
    )


# ---------------------------------------------------------------- muxer ----
# Testing encoder: builds a minimal VALID single-track file the parser (or
# any demuxer) can read back — same pattern as the PNG/WAV/JPEG/GIF testing
# encoders. Layout: ftyp | mdat | moov, so chunk offsets are known before
# moov is assembled.


def _box(fourcc: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, *parts: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags), *parts)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4(
    samples: list[bytes],
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    sample_duration: int = 40,
    codec: bytes = b"mp4v",
    kind: str = "video",
    samples_per_chunk: int = 0,
    sync_every: int = 1,
    force_co64: bool = False,
) -> bytes:
    """Mux encoded samples into a minimal ISO-BMFF file.

    samples_per_chunk=0 puts every sample in one chunk; >0 exercises
    multi-chunk stsc runs (with a remainder entry when it doesn't divide).
    sync_every=k marks every k-th sample as a keyframe via stss (k=1 omits
    stss → all samples sync, the spec default). force_co64 writes 64-bit
    chunk offsets regardless of file size."""
    n = len(samples)
    duration = n * sample_duration
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isom", b"mp42")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    data_start = len(ftyp) + 8  # first sample byte (mdat header is 8 bytes)

    spc = samples_per_chunk if samples_per_chunk > 0 else max(n, 1)
    sizes = [len(s) for s in samples]
    chunk_offsets: list[int] = []
    stsc_entries: list[tuple[int, int, int]] = []
    pos, i, chunk_no = data_start, 0, 1
    while i < n:
        take = min(spc, n - i)
        chunk_offsets.append(pos)
        if not stsc_entries or stsc_entries[-1][1] != take:
            stsc_entries.append((chunk_no, take, 1))
        pos += sum(sizes[i : i + take])
        i += take
        chunk_no += 1

    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_duration))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_entries)),
        *(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n), struct.pack(f">{n}I", *sizes))
    if force_co64:
        stco = _full(
            b"co64",
            0,
            0,
            struct.pack(">I", len(chunk_offsets)),
            struct.pack(f">{len(chunk_offsets)}Q", *chunk_offsets),
        )
    else:
        stco = _full(
            b"stco",
            0,
            0,
            struct.pack(">I", len(chunk_offsets)),
            struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
        )
    boxes = [stts, stsc, stsz, stco]
    if sync_every > 1:
        sync = list(range(1, n + 1, sync_every))
        boxes.append(
            _full(
                b"stss",
                0,
                0,
                struct.pack(">I", len(sync)),
                struct.pack(f">{len(sync)}I", *sync),
            )
        )

    if kind == "video":
        handler, entry = b"vide", _visual_sample_entry(codec, width, height)
        header = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    else:
        handler, entry = b"soun", _audio_sample_entry(codec, timescale)
        header = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), entry)
    stbl = _box(b"stbl", stsd, *boxes)
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1)))
    minf = _box(b"minf", header, dinf, stbl)
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0), handler, struct.pack(">III", 0, 0, 0), b"h\x00"
    )
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration),
        struct.pack(">IIHHHH", 0, 0, 0, 0, 0, 0),
        _MATRIX,
        struct.pack(">II", (width if kind == "video" else 0) << 16,
                    (height if kind == "video" else 0) << 16),
    )
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">IHH", 0x10000, 0x100, 0),
        struct.pack(">II", 0, 0),
        _MATRIX,
        struct.pack(">6I", 0, 0, 0, 0, 0, 0),
        struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov


def _visual_sample_entry(codec: bytes, width: int, height: int) -> bytes:
    return _box(
        codec,
        b"\x00" * 6,
        struct.pack(">H", 1),  # data_reference_index
        struct.pack(">HH", 0, 0),
        struct.pack(">III", 0, 0, 0),
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x480000, 0x480000),  # 72 dpi
        struct.pack(">I", 0),
        struct.pack(">H", 1),  # frame_count
        b"\x00" * 32,  # compressorname
        struct.pack(">Hh", 24, -1),
    )


def _audio_sample_entry(codec: bytes, sample_rate: int) -> bytes:
    return _box(
        codec,
        b"\x00" * 6,
        struct.pack(">H", 1),
        struct.pack(">II", 0, 0),
        struct.pack(">HH", 2, 16),  # channels, sample size
        struct.pack(">HH", 0, 0),
        struct.pack(">I", sample_rate << 16),
    )


def mp4_meta(payload: bytes) -> dict:
    """media_meta-shaped summary: first video track's dimensions + movie
    duration (what with_media_meta surfaces for video payloads)."""
    info = parse_mp4(payload)
    video = next((t for t in info["tracks"] if t["kind"] == "video"), None)
    return {
        "media_type": "video",
        "width": video["width"] if video else None,
        "height": video["height"] if video else None,
        "duration_ms": info["duration_ms"],
    }
