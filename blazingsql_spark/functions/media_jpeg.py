"""Baseline JPEG decode/encode with ZERO third-party dependencies.

Completes the real-decode story started by functions.media_codec (PNG/WAV):
JPEG is the dominant image format in web-crawl corpora, so a 100 TB
multimodal pipeline that cannot decode it is a toy. Everything here is the
public baseline process of ITU-T T.81 (sequential DCT, 8-bit, Huffman):

- decoder: marker parse (DQT/SOF0/DHT/DRI/SOS), stuffed-byte bit reader,
  canonical Huffman DC/AC decode with the EXTEND rule, dequantize +
  zigzag + IDCT (8x8 DCT-III as two matrix multiplies — numpy, no scipy),
  chroma upsampling for any (h,v) sampling factors, BT.601 full-range
  YCbCr -> RGB. Progressive/arithmetic/12-bit variants are rejected with
  a clear message.
- encoder (exists chiefly so the decoder is testable without fixtures):
  quality-scaled Annex-K quantization tables, FDCT, standard Annex-K
  Huffman tables, 4:4:4 or 4:2:0 subsampling, restart-marker-free.

Per-payload pure functions; used inside Arrow-batched mapInPandas workers
(functions.multimodal) like the PNG/WAV codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K base quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman table specs: (BITS counts[1..16], HUFFVAL symbols)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis: A[k, n] = c_k * cos((2n+1) k pi / 16); FDCT X = A x A^T,
# IDCT x = A^T X A (orthonormal).
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# ---------------------------------------------------------------- huffman


def _canonical_codes(bits, vals):
    """JPEG canonical code assignment: (code, length) per symbol."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


class _DecTable:
    """Decode-side canonical Huffman table: (length, code) -> symbol."""

    def __init__(self, bits, vals):
        self.lookup = {}
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[idx]
                code += 1
                idx += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at (and records) RST/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        if self.marker is not None:
            # past a marker: feed zero bits (spec: pad) — caller handles
            self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
            self.nbits += 8
            return
        # truncated/corrupt payloads must fail as a typed decode error a
        # caller can catch (multimodal on_error='skip'), not a bare
        # IndexError out of the mapInPandas worker
        if self.pos >= len(self.data):
            raise ValueError("JPEG: truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: truncated entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # start padding
        self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_clear_marker(self):
        """After an RST marker: reset to byte boundary past the marker."""
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None

    def decode(self, table: _DecTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder


def jpeg_dimensions(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF header alone — metadata
    extraction without entropy-decoding the image."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload (bad SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", payload[pos + 3 : pos + 7])
            return w, h, payload[pos + 7]
        pos += seglen
    raise ValueError("JPEG: no frame header found")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 (h, w, 3) RGB (or (h, w, 1) grayscale).

    Truncated/corrupt payloads raise ValueError (a typed decode error the
    multimodal ``on_error='skip'`` mode can catch), never a bare
    IndexError/struct.error from wherever the byte stream ran out."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"JPEG: truncated or corrupt payload ({e})") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload (bad SOI)")
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    restart_interval = 0
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                qt[tq] = tbl
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: only baseline sequential (SOF0) supported, got SOF{marker & 0xF}"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nsym = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _DecTable(bits, vals)
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"cs": cs, "td": td_ta >> 4, "ta": td_ta & 0xF})
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["cs"]]
        c["td"], c["ta"] = s["td"], s["ta"]
        c["planew"] = mcux * c["h"] * 8
        c["planeh"] = mcuy * c["v"] * 8
        c["plane"] = np.zeros((c["planeh"], c["planew"]), dtype=np.float64)
        c["pred"] = 0

    rdr = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # consume the RSTn marker and resync
                if rdr.marker is None:
                    # marker not yet reached: skip to it
                    while rdr.marker is None:
                        rdr._fill()
                        rdr.nbits = 0
                if not (0xD0 <= rdr.marker <= 0xD7):
                    raise ValueError(f"JPEG: expected RST marker, got {rdr.marker:#x}")
                rdr.align_and_clear_marker()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        blk = _decode_block(rdr, c, qt, huff_dc, huff_ac)
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    # upsample to full resolution and color-convert
    planes = []
    for c in comps:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0] + 128.0, 0, 255)
        return np.rint(y).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0] + 128.0, planes[1], planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.rint(np.clip(rgb, 0, 255)).astype(np.uint8)


def _decode_block(rdr, comp, qt, huff_dc, huff_ac):
    zz = np.zeros(64, dtype=np.float64)
    t = rdr.decode(huff_dc[comp["td"]])
    diff = _extend(rdr.bits(t), t) if t else 0
    comp["pred"] += diff
    zz[0] = comp["pred"]
    k = 1
    ac = huff_ac[comp["ta"]]
    while k < 64:
        rs = rdr.decode(ac)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC run past block end")
        zz[k] = _extend(rdr.bits(s), s)
        k += 1
    zz *= qt[comp["tq"]]
    blk = np.zeros(64, dtype=np.float64)
    blk[ZIGZAG] = zz
    return _A.T @ blk.reshape(8, 8) @ _A  # IDCT (level shift added later)


# ---------------------------------------------------------------- encoder


def _quality_tables(quality: int):
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qts = []
    for base in (QT_LUMA, QT_CHROMA):
        q = np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)
        qts.append(q)
    return qts


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _encode_block(bw, blk, q, dc_codes, ac_codes, pred):
    coef = _A @ (blk - 128.0) @ _A.T
    # zigzag-order both the coefficients AND the (natural-order) quant
    # table so they line up; DQT/decoder work in zigzag order throughout
    zz = np.rint(coef.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        s = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w, 1)/(h, w) gray -> baseline JFIF bytes.
    ``subsample=True`` uses 4:2:0 chroma (box-averaged), else 4:4:4."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nch = pixels.shape
    gray = nch == 1
    qluma, qchroma = _quality_tables(quality)
    px = pixels.astype(np.float64)
    if gray:
        planes = [px[:, :, 0]]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    sampling = [(2, 2), (1, 1), (1, 1)] if (subsample and not gray) else [(1, 1)] * len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    prepped = []
    for p, (sh, sv) in zip(planes, sampling):
        if (sh, sv) != (hmax, vmax):
            ry, rx = vmax // sv, hmax // sh
            ph, pw = p.shape
            eh, ew = ((ph + ry - 1) // ry) * ry, ((pw + rx - 1) // rx) * rx
            pp = np.pad(p, ((0, eh - ph), (0, ew - pw)), mode="edge")
            p = pp.reshape(eh // ry, ry, ew // rx, rx).mean(axis=(1, 3))
        tw, th = mcux * sh * 8, mcuy * sv * 8
        ph, pw = p.shape
        p = np.pad(p, ((0, th - ph), (0, tw - pw)), mode="edge")
        prepped.append(p)

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (sh, sv)) in enumerate(zip(prepped, sampling)):
                q = qluma if ci == 0 else qchroma
                dct_codes = dc_l if ci == 0 else dc_c
                act_codes = ac_l if ci == 0 else ac_c
                for vy in range(sv):
                    for vx in range(sh):
                        y0 = (my * sv + vy) * 8
                        x0 = (mx * sh + vx) * 8
                        preds[ci] = _encode_block(
                            bw, p[y0 : y0 + 8, x0 : x0 + 8], q, dct_codes, act_codes, preds[ci]
                        )
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qluma[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qchroma[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i in range(ncomp):
        sh, sv = sampling[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
