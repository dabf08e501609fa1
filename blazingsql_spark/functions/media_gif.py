"""Zero-dependency baseline GIF codec (decoder + testing encoder).

Companion to media_codec (PNG/WAV) and media_jpeg: closes the GIF leg of
the multimodal decode matrix without external imaging libraries — the
sandbox has no PIL, and the Spark-side plumbing (mapInPandas batches,
typed ValueError on truncation so ``on_error='skip'`` can capture per-row
errors) must stay real. Scope mirrors the PNG decoder's documented
boundary: GIF87a/GIF89a, global or local color tables, full variable-width
LZW, 8-bit indexed output mapped to RGB; first frame of animations;
interlaced images ARE supported (the 4-pass row shuffle is 10 lines);
what is NOT here raises NotImplementedError naming the plug-in point.

Reference parity note: BlazingSQL has no media decode at all — this is
part of the training-data-pipeline superset (SURVEY.md §2 multimodal).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(payload: bytes) -> bool:
    return payload[:6] in GIF_MAGICS


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytearray:
    """Variable-width GIF-LZW. Deterministic, bounds-checked: running out
    of input before n_expected pixels raises ValueError (typed truncation
    contract shared with decode_png/decode_jpeg)."""
    clear = 1 << min_code_size
    end = clear + 1
    # dictionary as list of bytes; rebuilt on CLEAR
    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_expected:
        raise ValueError("GIF: LZW ended before the frame was complete")
    return out[:n_expected]


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows were stored pass-by-pass; put them back."""
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for row in range(start, h, step):
            out[row] = idx[src]
            src += 1
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF → uint8 RGB array (height, width, 3) of the FIRST frame,
    composited onto the logical screen (frames smaller than the screen
    are placed at their left/top offset over the background color).
    Truncated/corrupt payloads raise ValueError; exotic variants raise
    NotImplementedError naming the boundary."""
    try:
        return _decode_gif(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"GIF: truncated or corrupt payload ({e})") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if not is_gif(payload):
        raise ValueError("not a GIF payload (bad signature)")
    if len(payload) < 13:
        raise ValueError("GIF: truncated header")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("GIF: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, all skippable
            pos += 1  # label
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF: truncated extension")
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
        elif block == 0x2C:  # image descriptor — the first frame wins
            left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
                if ct.size != 3 * n:
                    raise ValueError("GIF: truncated local color table")
                ct = ct.reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF: no color table for the frame")
            if pos >= len(payload):
                raise ValueError("GIF: missing LZW minimum code size")
            mcs = payload[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"GIF: bad LZW minimum code size {mcs}")
            data = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF: truncated image data")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                data.extend(payload[pos : pos + sz])
                pos += sz
            idx = np.frombuffer(
                bytes(_lzw_decode(mcs, bytes(data), w * h)), dtype=np.uint8
            ).reshape(h, w)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            if idx.max(initial=0) >= ct.shape[0]:
                raise ValueError("GIF: pixel index outside the color table")
            frame = ct[idx]  # (h, w, 3)
            if (left, top, w, h) == (0, 0, sw, sh):
                return frame
            screen = np.empty((sh, sw, 3), dtype=np.uint8)
            screen[:] = ct[bg] if bg < ct.shape[0] else 0
            screen[top : top + h, left : left + w] = frame
            return screen
        elif block == 0x3B:  # trailer before any frame
            break
        else:
            raise NotImplementedError(
                f"GIF block 0x{block:02x} not supported by the stdlib decoder"
            )
    raise ValueError("GIF: no image frame found")


def gif_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) of the logical screen — header parse only."""
    if not is_gif(payload) or len(payload) < 13:
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", payload[6:10])
    return w, h


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real variable-width LZW (not the uncompressed-GIF hack), so the
    decoder's dictionary-growth and width-bump paths get exercised by
    round-trip tests."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    s = b""
    for b in indices:
        sb = s + bytes([b])
        if sb in table:
            s = sb
            continue
        emit(table[s])
        table[sb] = next_code
        next_code += 1
        # decoder bumps width when ITS table reaches 2^width; its table
        # trails the encoder's by one entry, so bump after ours passes it
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4097:  # table full — reset, matching decoder CLEAR
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        s = bytes([b])
    if s:
        emit(table[s])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Testing encoder: uint8 RGB (h, w, 3) → single-frame GIF89a with a
    global color table built from the image's distinct colors (≤256 —
    quantization is out of scope for a differential-test encoder)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    # color table size must be a power of two, ≥ 2
    bits = max(1, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    n = 1 << bits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[: colors.shape[0]] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
        stored = idx[rows]
    else:
        stored = idx
    mcs = max(2, bits)
    lzw = _lzw_encode(mcs, stored.tobytes())
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
