"""Real media decode (functions.media_codec): PNG/WAV with zero external
dependencies, and the multimodal fake=False paths built on it."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from blazingsql_spark.functions import media_codec as mc


def _gradient(h, w, ch):
    """Deterministic test image: per-channel affine gradients."""
    y, x = np.mgrid[0:h, 0:w]
    px = np.zeros((h, w, ch), dtype=np.uint8)
    for c in range(ch):
        px[:, :, c] = ((x * (c + 3) + y * (2 * c + 1)) % 256).astype(np.uint8)
    return px


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_png_roundtrip_exact(ch, filter_type):
    """encode -> decode must reproduce every pixel byte-exactly, for all
    supported channel counts and every encoder filter type (None/Sub/Up —
    the decoder additionally handles Average/Paeth below)."""
    px = _gradient(13, 17, ch)
    payload = mc.encode_png(px, filter_type=filter_type)
    assert mc.is_png(payload) and mc.sniff_format(payload) == "png"
    back = mc.decode_png(payload)
    assert back.shape == (13, 17, ch)
    assert np.array_equal(back, px)


def test_png_average_and_paeth_filters():
    """Hand-build scanlines with filter types 3 (Average) and 4 (Paeth)
    and verify the decoder reconstructs the reference pixels (reference
    computed with the spec's per-pixel recurrences)."""
    import struct
    import zlib

    w, h, ch = 5, 3, 3
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = 3 if y % 2 == 0 else 4
        row = flat[y]
        filt = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = int(row[i - ch]) if i >= ch else 0  # left RECON (row is recon)
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (int(row[i]) - pred) & 0xFF
        lines.append(ft)
        lines.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    payload = (
        mc.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mc.decode_png(payload), px)


def test_png_unsupported_variants_rejected():
    px = _gradient(4, 4, 3)
    payload = bytearray(mc.encode_png(px))
    payload[24] = 16  # bit depth byte inside IHDR
    # fix the CRC? decoder ignores CRCs — it must still REJECT on depth
    with pytest.raises(NotImplementedError, match="bit_depth=16"):
        mc.decode_png(bytes(payload))
    with pytest.raises(ValueError, match="signature"):
        mc.decode_png(b"JFIF not a png")


def _wav_bytes(freq=440.0, sr=8000, seconds=0.25, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    sig = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(sig.tobytes())
    return buf.getvalue()


def test_wav_decode_and_features():
    payload = _wav_bytes()
    assert mc.sniff_format(payload) == "wav"
    sr, n_ch, x = mc.decode_wav(payload)
    assert (sr, n_ch) == (8000, 1) and x.shape == (2000, 1)
    # a 0.5-amplitude sine has rms ~ 0.3536
    feats = mc.audio_features(sr, x, 16)
    assert len(feats) == 16
    rms = feats[13]
    assert abs(rms - 0.3536) < 0.01
    meta = mc.media_meta(payload)
    assert meta["media_type"] == "audio" and meta["duration_ms"] == 250


def test_box_resize_exact_means():
    """4x4 image with four constant 2x2 blocks -> 2x2 resize must give
    exactly the block values (box average is exact on aligned grids)."""
    px = np.zeros((4, 4, 1), dtype=np.uint8)
    px[:2, :2, 0], px[:2, 2:, 0], px[2:, :2, 0], px[2:, 2:, 0] = 10, 60, 110, 210
    out = mc.resize_image(px, 2, 2)
    assert out[:, :, 0].tolist() == [[10, 60], [110, 210]]


def test_image_features_deterministic_and_structured():
    px = _gradient(32, 48, 3)
    f1 = mc.image_features(px, 16)
    f2 = mc.image_features(px, 16)
    assert f1 == f2 and len(f1) == 16
    assert all(0.0 <= v <= 2.0 for v in f1)  # grid/stat values; aspect 48/32=1.5
    # png meta parses real dimensions
    meta = mc.media_meta(mc.encode_png(px))
    assert (meta["width"], meta["height"], meta["media_type"]) == (48, 32, "image")


def test_spark_real_decode_and_resize(spark):
    """fake=False end-to-end through mapInPandas: PNG and WAV payloads in
    one binary column decode to REAL features; PNG resize round-trips
    through the codec at the target dimensions."""
    from blazingsql_spark.functions.multimodal import decode_features, resize_images

    png = mc.encode_png(_gradient(16, 16, 3), filter_type=1)
    wav = _wav_bytes()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))], ["doc_id", "payload"]
    )
    out = {r.doc_id: r for r in decode_features(df, feature_dim=16, fake=False).collect()}
    assert len(out[1].features) == 16 and len(out[2].features) == 16
    # image features = pooled grayscale of THIS gradient, not a hash
    expected = mc.image_features(_gradient(16, 16, 3), 16)
    assert np.allclose(out[1].features, expected, atol=1e-6)

    imgs = df.filter("doc_id = 1")
    resized = resize_images(imgs, width=8, height=8, fake=False).collect()[0]
    back = mc.decode_png(bytes(resized.resized))
    assert back.shape == (8, 8, 3)
    # box-average of the aligned gradient is exact per 2x2 cell
    src = _gradient(16, 16, 3).astype(np.float64)
    want = np.rint(src.reshape(8, 2, 8, 2, 3).mean(axis=(1, 3))).astype(np.uint8)
    assert np.array_equal(back, want)

    # unsupported format names the boundary instead of fake-decoding
    # (JPEG and GIF graduated to real decoders — MP4 has not)
    mp4_ish = spark.createDataFrame(
        [(3, bytearray(b"\x00\x00\x00\x18ftypmp42 junk"))], ["doc_id", "payload"]
    )
    with pytest.raises(Exception, match="PNG/JPEG/GIF/WAV|NotImplemented"):
        decode_features(mp4_ish, feature_dim=8, fake=False).collect()


# Property tests: ANY 8-bit image round-trips byte-exactly through
# encode/decode for every supported channel count and encoder filter.
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.sampled_from([0, 1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, filter_type, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(px, filter_type)), px)


@settings(max_examples=15, deadline=None)
@given(
    sr=st.sampled_from([8000, 16000, 44100]),
    n=st.integers(1, 4000),
    n_ch=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(sr, n, n_ch, seed):
    rng = np.random.default_rng(seed)
    sig = rng.integers(-32768, 32768, size=(n, n_ch)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_ch)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(sig.reshape(-1).tobytes())
    got_sr, got_ch, x = mc.decode_wav(buf.getvalue())
    assert (got_sr, got_ch) == (sr, n_ch) and x.shape == (n, n_ch)
    assert np.array_equal((x * 32768.0).astype("<i2"), sig)


def test_derive_media_meta_real_headers(spark):
    """derive_media_meta parses actual payload headers: PNG dimensions,
    WAV duration, unknown formats flagged with NULL fields."""
    from blazingsql_spark.functions.multimodal import derive_media_meta

    df = spark.createDataFrame(
        [
            (1, bytearray(mc.encode_png(_gradient(10, 20, 3)))),
            (2, bytearray(_wav_bytes(seconds=0.5))),
            (3, bytearray(b"plain text bytes")),
        ],
        ["doc_id", "payload"],
    )
    out = {r.doc_id: r.media_meta for r in derive_media_meta(df).collect()}
    assert (out[1]["media_type"], out[1]["width"], out[1]["height"]) == ("image", 20, 10)
    assert (out[2]["media_type"], out[2]["duration_ms"]) == ("audio", 500)
    assert (out[3]["format"], out[3]["media_type"]) == ("unknown", None)
    assert out[3]["n_bytes"] == 16


def test_png_wav_truncation_typed_errors():
    """Truncated PNG/WAV payloads must raise ValueError (the typed error
    on_error='skip' catches), not struct.error/zlib.error/wave.Error —
    same contract as the JPEG decoder."""
    import numpy as np
    import pytest

    from blazingsql_spark.functions import media_codec as mc

    img = np.full((12, 12, 3), 100, dtype=np.uint8)
    png = mc.encode_png(img)
    # cut mid-IHDR (struct.error path) and mid-IDAT-zlib-stream
    # (zlib.error path) — cutting only the IEND tail is NOT an error,
    # the pixel data is complete then
    mid_idat = png.index(b"IDAT") + 6
    for cut in (len(png) // 3, mid_idat):
        with pytest.raises(ValueError):
            mc.decode_png(bytes(png[:cut]))

    wav = _wav_bytes()
    with pytest.raises(ValueError):
        mc.decode_wav(bytes(wav[:20]))


# ------------------------------------------------------------------ BMP ----


def test_bmp_roundtrip_padded_widths():
    import numpy as np

    from blazingsql_spark.functions import media_codec as mc

    rng = np.random.default_rng(11)
    for h, w in [(7, 5), (1, 1), (16, 16), (9, 6), (3, 13)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(px)), px), (h, w)


def test_bmp_top_down_and_errors():
    import struct

    import numpy as np
    import pytest

    from blazingsql_spark.functions import media_codec as mc

    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    b = bytearray(mc.encode_bmp(px))
    # flip to top-down (negative height) and re-order rows to match
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    top_down = mc.decode_bmp(bytes(b))
    assert np.array_equal(top_down, px[::-1])
    with pytest.raises(ValueError, match="BM signature"):
        mc.decode_bmp(b"nope")
    with pytest.raises(ValueError, match="truncated pixel"):
        mc.decode_bmp(bytes(mc.encode_bmp(px))[:-8])
    bad = bytearray(mc.encode_bmp(px))
    struct.pack_into("<H", bad, 28, 8)  # 8-bit palette
    with pytest.raises(NotImplementedError, match="24-bit"):
        mc.decode_bmp(bytes(bad))


def test_bmp_sniff_meta_decode_resize(spark):
    import numpy as np
    import pandas as pd

    from blazingsql_spark.functions import media_codec as mc
    from blazingsql_spark.functions import multimodal

    px = np.random.default_rng(5).integers(0, 256, (32, 20, 3), dtype=np.uint8)
    b = mc.encode_bmp(px)
    assert mc.sniff_format(b) == "bmp"
    m = mc.media_meta(b)
    assert (m["media_type"], m["format"], m["width"], m["height"]) == ("image", "bmp", 20, 32)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [b]}))
    feats = multimodal.decode_features(df, fake=False).collect()[0]
    assert len(feats.features) == 16
    out = multimodal.resize_images(df, width=8, height=8, fake=False).collect()[0]
    rz = mc.decode_bmp(bytes(out.resized))
    assert rz.shape == (8, 8, 3)


def test_dhash_near_dup_discrimination(spark):
    """dHash through the real PNG round trip: a one-pixel variant lands
    at hamming distance <= 1 from its base, while unrelated gradient
    images are far apart — the property that makes dHash a near-dup
    candidate key."""
    import numpy as np

    from blazingsql_spark.functions.media_codec import (
        decode_png,
        dhash_image,
        encode_png,
    )

    def img(base, bump=False):
        pix = np.fromfunction(
            lambda y, x: (base * 7 + 3 * x + 11 * y) % 256, (16, 24)
        ).astype(np.uint8)
        if bump:
            pix[0, 0] = (int(pix[0, 0]) + 128) % 256
        return dhash_image(decode_png(encode_png(pix)))

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert ham(img(40), img(40, bump=True)) <= 1
    # rotated-gradient pattern (different phase) should disagree broadly
    far = np.fromfunction(lambda y, x: (255 - 9 * x + 5 * y) % 256, (16, 24)).astype(
        np.uint8
    )
    assert ham(img(40), dhash_image(decode_png(encode_png(far)))) > 16
    # multi-channel grayscale rule: floor-mean equals the single channel
    rgb = np.repeat(
        np.fromfunction(lambda y, x: (40 * 7 + 3 * x + 11 * y) % 256, (16, 24))[
            :, :, None
        ],
        3,
        axis=2,
    ).astype(np.uint8)
    assert dhash_image(rgb) == img(40)


def test_audio_envelope_fingerprint_properties(spark):
    """Envelope fingerprint through the real WAV round trip: int16
    recovers exactly from the decoder's /32768 normalization, a
    one-sample bump hashes identically (sub-frame robustness), and a
    different clip disagrees broadly."""
    import numpy as np

    from blazingsql_spark.functions.media_codec import (
        audio_envelope_hash,
        decode_wav,
        encode_wav,
    )

    def fp(s):
        _sr, _ch, x = decode_wav(encode_wav(8000, s))
        rec = np.round(x.ravel() * 32768.0).astype(np.int64)
        assert (rec == s).all()  # exact int16 round trip
        return audio_envelope_hash(rec)

    t = np.arange(2048)
    a = ((7 * 13 + 7 * t) % 2003) - 1001
    bumped = a.copy()
    bumped[0] += 500
    assert fp(a) == fp(bumped)
    other = ((7 * 13 + 11 * t) % 1999) - 999
    assert sum(x != y for x, y in zip(fp(a), fp(other))) > 8
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        audio_envelope_hash(np.arange(100))
