"""Real media decoding with ZERO third-party dependencies.

The multimodal pipeline (functions.multimodal) needs decode → feature /
resize inside Arrow-batched ``mapInPandas`` workers. This container ships
no PIL/cv2/librosa — but PNG is zlib (stdlib) over filtered scanlines and
WAV is a RIFF header over PCM frames (stdlib ``wave``), so both formats
decode for REAL with numpy + the standard library. That turns the
previously-stubbed ``fake=False`` path of ``decode_features`` /
``resize_images`` into an honest end-to-end pipeline for the two most
common open formats. Baseline JPEG (media_jpeg), GIF (media_gif), the
MP4 container layer (media_mp4: box walk, sample tables, encoded-frame
extraction) and the MP3 frame layer (media_mp3: frame walk, duration/
bitrate) are real too; the remaining NotImplementedError boundary is
codec *bitstream* decode (H.264/HEVC pixels, MP3 PCM), which needs an
external codec library.

Decoder scope (the PNG baseline that covers encoder output from virtually
every tool): 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced, all five scanline filters (None/Sub/Up/Average/
Paeth). Palette and 16-bit images are rejected with a clear message.

Everything here runs inside executor Python workers on one payload at a
time — no Spark imports, no driver state; numpy vectorizes the per-row
unfiltering (Sub via mod-256 cumsum; Average/Paeth walk pixels within a
row but rows stream sequentially regardless, and feature extraction
targets thumbnails/tiles, not 100-megapixel scans).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def sniff_format(payload: bytes) -> str:
    if is_png(payload):
        return "png"
    if is_wav(payload):
        return "wav"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if is_bmp(payload):
        return "bmp"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:3] == b"ID3" or (len(payload) >= 4 and payload[0] == 0xFF):
        # full header validation (bitrate/sample-rate indices too) — a
        # sync-word-only sniff misroutes ~0.1% of random binary prefixes
        from blazingsql_spark.functions.media_mp3 import is_mp3

        if is_mp3(payload):
            return "mp3"
    return "unknown"


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array of shape (height, width, channels).

    Truncated/corrupt payloads raise ValueError (the typed decode error
    multimodal ``on_error='skip'`` catches), never a bare
    struct.error/zlib.error from wherever the byte stream ran out —
    same contract as media_jpeg.decode_jpeg."""
    try:
        return _decode_png(payload)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"PNG: truncated or corrupt payload ({e})") from e


def _decode_png(payload: bytes) -> np.ndarray:
    if not is_png(payload):
        raise ValueError("not a PNG payload (bad signature)")
    pos, width, height, bit_depth, color_type, interlace = 8, None, None, None, None, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported by the stdlib decoder (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); 8-bit gray/RGB/RGBA "
            "non-interlaced only — plug in PIL for the rest"
        )
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            recon = row
        elif ft == 1:  # Sub: recon[i] = row[i] + recon[i-ch] — mod-256 cumsum
            recon = (
                np.cumsum(row.reshape(width, ch).astype(np.uint64), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            recon = row + prev  # uint8 wraps mod 256
        elif ft == 3:  # Average: needs the already-reconstructed left pixel
            recon = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(recon[i - ch]) if i >= ch else 0
                recon[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            recon = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(recon[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG bad filter type {ft}")
        out[y] = recon
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w, ch) → PNG bytes. ``filter_type`` applies one scanline
    filter to every row (0/1/2 — enough to exercise the decoder and write
    valid files; real encoders pick per-row)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.uint8)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.zeros_like(row)
            left[ch:] = row[:-ch]
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prev
        else:
            raise ValueError("encoder supports filter types 0/1/2")
        lines.append(filter_type)
        lines.extend(filt.tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV → (sample_rate, n_channels, float32 samples in [-1, 1] of shape
    (n_frames, n_channels)). 8/16/32-bit PCM via the stdlib wave module.
    Truncated/corrupt payloads raise ValueError (see decode_png)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            sr = wf.getframerate()
            n_ch = wf.getnchannels()
            sw = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"WAV: truncated or corrupt payload ({e})") from e
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    return sr, n_ch, x.reshape(-1, n_ch)


def image_features(pixels: np.ndarray, dim: int) -> list[float]:
    """Real image feature vector: g x g box-pooled grayscale thumbnail
    (g = isqrt(dim)), luminance-weighted for color images, padded with
    global stats (mean, std, aspect) up to ``dim``. Deterministic, scale-
    and layout-independent — the standard cheap visual fingerprint."""
    px = pixels.astype(np.float32)
    if px.shape[2] >= 3:
        gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    else:
        gray = px[:, :, 0]
    g = max(int(np.sqrt(dim)), 1)
    pooled = _box_resize_2d(gray, g, g) / 255.0
    feats = pooled.reshape(-1).tolist()
    h, w = gray.shape
    extras = [float(gray.mean() / 255.0), float(gray.std() / 255.0), float(w / max(h, 1))]
    feats = (feats + extras)[:dim]
    feats += [0.0] * (dim - len(feats))
    return [float(v) for v in feats]


def audio_features(sr: int, samples: np.ndarray, dim: int) -> list[float]:
    """Real audio feature vector: energy envelope resampled to dim-3
    buckets + [rms, zero-crossing rate, log duration]. Mono-mixed."""
    mono = samples.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    dur = n / sr if sr else 0.0
    nb = max(dim - 3, 1)
    if n:
        edges = np.linspace(0, n, nb + 1).astype(int)
        env = [
            float(np.sqrt(np.mean(mono[a:b] ** 2))) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    else:
        env = [0.0] * nb
    feats = (env + [rms, zcr, float(np.log1p(dur))])[:dim]
    feats += [0.0] * (dim - len(feats))
    return [float(v) for v in feats]


def _box_resize_2d(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box-average (area) resample of a 2-D float array — exact mean over
    each cell's source window, the aliasing-safe choice for downscaling."""
    h, w = a.shape
    ye = np.linspace(0, h, out_h + 1).astype(int)
    xe = np.linspace(0, w, out_w + 1).astype(int)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        y0, y1 = ye[i], max(ye[i + 1], ye[i] + 1)
        strip = a[y0:y1]
        for j in range(out_w):
            x0, x1 = xe[j], max(xe[j + 1], xe[j] + 1)
            out[i, j] = strip[:, x0:x1].mean()
    return out


def resize_image(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-average resize per channel → uint8 (out_h, out_w, ch)."""
    ch = pixels.shape[2]
    out = np.zeros((out_h, out_w, ch), dtype=np.uint8)
    for c in range(ch):
        out[:, :, c] = np.clip(
            np.rint(_box_resize_2d(pixels[:, :, c].astype(np.float64), out_h, out_w)),
            0,
            255,
        ).astype(np.uint8)
    return out


def media_meta(payload: bytes) -> dict:
    """Typed metadata from a real header parse (media_type, format, width,
    height, duration_ms, n_bytes) — None fields where the format has no
    such notion."""
    fmt = sniff_format(payload)
    meta = {
        "media_type": None,
        "format": fmt,
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_bytes": len(payload),
    }
    if fmt == "png":
        px = decode_png(payload)
        meta.update(media_type="image", height=px.shape[0], width=px.shape[1])
    elif fmt == "gif":
        from blazingsql_spark.functions.media_gif import gif_dimensions

        w, h = gif_dimensions(payload)  # header parse only
        meta.update(media_type="image", height=h, width=w)
    elif fmt == "jpeg":
        from blazingsql_spark.functions.media_jpeg import jpeg_dimensions

        w, h, _nc = jpeg_dimensions(payload)  # header parse, no entropy decode
        meta.update(media_type="image", height=h, width=w)
    elif fmt == "bmp":
        w, h = struct.unpack_from("<ii", payload, 18)  # header parse only
        meta.update(media_type="image", width=w, height=abs(h))
    elif fmt == "wav":
        sr, _n_ch, x = decode_wav(payload)
        meta.update(media_type="audio", duration_ms=int(1000 * len(x) / sr) if sr else 0)
    elif fmt == "mp4":
        from blazingsql_spark.functions.media_mp4 import mp4_meta

        try:  # container parse only, no codec decode
            meta.update(mp4_meta(payload))
        except (ValueError, NotImplementedError):
            # sniffed-but-unparseable (truncated file, ftyp-lookalike):
            # metadata extraction must degrade to NULL fields, not kill
            # a corpus-wide derive_media_meta pass
            pass
    elif fmt == "mp3":
        from blazingsql_spark.functions.media_mp3 import mp3_meta

        try:  # frame-header walk, no PCM decode
            meta.update(mp3_meta(payload))
        except (ValueError, NotImplementedError):
            pass
    return meta


# --------------------------------------------------------------- BMP ----
# Uncompressed 24-bit BI_RGB — no entropy coding, so unlike JPEG/GIF the
# whole format decodes with pure slicing: pixel rows are bottom-up (or
# top-down when height is negative), BGR order, padded to 4 bytes.


def is_bmp(payload: bytes) -> bool:
    """Full header validation, not just the 2-byte signature: random text
    starting 'BM' (or legacy BITMAPCOREHEADER files whose dims live at a
    different offset) must not sniff as bmp and yield garbage metadata."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return False
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size not in (40, 52, 56, 108, 124):  # BITMAPINFOHEADER family
        return False
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    return (
        planes == 1
        and bpp in (1, 4, 8, 16, 24, 32)
        and 0 < w <= 1 << 20
        and 0 < abs(h) <= 1 << 20
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP -> uint8 (height, width, 3) RGB. Scope: the BITMAPINFOHEADER
    24-bit BI_RGB baseline virtually every writer emits; other depths or
    compressions are rejected by name."""
    # raw signature test, not is_bmp(): the sniffer's full validation would
    # turn "legacy header" / "unsupported depth" into a misleading
    # missing-signature error instead of the named NotImplementedError
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("bmp: missing BM signature or truncated header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(f"bmp: legacy BITMAPCOREHEADER ({hdr_size}) unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"bmp: compression {compression} (BI_RGB only)")
    if bpp != 24:
        raise NotImplementedError(f"bmp: {bpp}-bit (24-bit BI_RGB only)")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError(f"bmp: truncated pixel data ({len(payload)} < {need})")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> 24-bit BI_RGB BMP (bottom-up)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w, c = px.shape
    if c != 3:
        raise ValueError(f"bmp: need 3 channels, got {c}")
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def nn_resize_2d(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample with the exact integer index map
    src = (dst * src_size) // dst_size — chosen over box-average for the
    perceptual-hash path because every sampled pixel is a pure integer
    function of the source, so a SQL oracle can re-derive the result
    from first principles."""
    h, w = a.shape
    iy = (np.arange(out_h) * h) // out_h
    ix = (np.arange(out_w) * w) // out_w
    return a[iy][:, ix]


def dhash_image(pixels: np.ndarray, hash_w: int = 8, hash_h: int = 8) -> str:
    """Difference hash (dHash, the classic perceptual image fingerprint):
    grayscale → nearest-neighbor resize to (hash_w+1) x hash_h → one bit
    per cell, '1' where the right neighbor is brighter. Near-identical
    images differ in few bits (hamming dedup, the image-side analogue of
    SimHash). Returned as a '0'/'1' string of hash_w*hash_h bits
    (row-major) — engine-portable, no signed-64-bit packing pitfalls.
    Grayscale for multi-channel input is the exact floor-mean
    (sum // channels), integer end to end."""
    if pixels.ndim == 3:
        g = pixels.astype(np.int64).sum(axis=2) // pixels.shape[2]
    else:
        g = pixels.astype(np.int64)
    small = nn_resize_2d(g, hash_h, hash_w + 1)
    bits = small[:, 1:] > small[:, :-1]
    return "".join("1" if b else "0" for b in bits.ravel())


def encode_wav(sr: int, samples: np.ndarray, n_channels: int = 1) -> bytes:
    """int16 PCM → WAV bytes (stdlib wave) — the test-fixture encoder
    mirroring decode_wav."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(int(sr))
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def audio_envelope_hash(samples_i16: np.ndarray, n_frames: int = 32) -> str:
    """Energy-envelope audio fingerprint (the dHash idea on the time
    axis): split the PCM stream into n_frames equal frames, exact
    integer energy (sum of squared int16 samples) per frame, one bit per
    boundary — '1' where the next frame is louder. Integer end to end,
    so a SQL oracle re-derives every bit; near-identical clips differ in
    few bits (hamming dedup). Returns n_frames-1 '0'/'1' chars; the
    sample count must divide evenly into frames (fixtures choose it so)."""
    s = samples_i16.astype(np.int64).ravel()
    if len(s) % n_frames:
        raise ValueError(f"sample count {len(s)} not divisible by {n_frames} frames")
    e = (s * s).reshape(n_frames, -1).sum(axis=1)
    return "".join("1" if e[f + 1] > e[f] else "0" for f in range(n_frames - 1))
