"""Baseline JPEG codec (functions.media_jpeg): zero-dependency encode →
decode round trips (lossy — asserted within quantization-error bounds),
header-only metadata, and the Spark multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest

from blazingsql_spark.functions import media_codec as mc
from blazingsql_spark.functions import media_jpeg as mj


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.clip(40 + 2 * x, 0, 255), np.clip(20 + 3 * y, 0, 255),
         np.clip(200 - x - y, 0, 255)],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_roundtrip_within_quant_error(subsample):
    """Lossy round trip at quality 95: every pixel within a few quant
    steps on smooth content, both 4:4:4 and 4:2:0 chroma."""
    img = _smooth(40, 56)
    payload = mj.encode_jpeg(img, quality=95, subsample=subsample)
    assert mj.is_jpeg(payload) and mc.sniff_format(payload) == "jpeg"
    out = mj.decode_jpeg(payload)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= (6 if subsample else 4), err.max()


def test_jpeg_grayscale_and_odd_dimensions():
    """Single-component JPEGs and non-multiple-of-8 (and of 16, for 4:2:0)
    dimensions must round-trip at the declared size."""
    g = _smooth(25, 31)[:, :, :1]
    out = mj.decode_jpeg(mj.encode_jpeg(g, quality=95))
    assert out.shape == (25, 31, 1)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4

    c = _smooth(25, 31)
    out2 = mj.decode_jpeg(mj.encode_jpeg(c, quality=95, subsample=True))
    assert out2.shape == (25, 31, 3)


def test_jpeg_quality_tradeoff_and_determinism():
    img = _smooth(32, 32)
    hi = mj.encode_jpeg(img, quality=95)
    lo = mj.encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)  # coarser quant compresses harder
    err_hi = np.abs(mj.decode_jpeg(hi).astype(int) - img.astype(int)).mean()
    err_lo = np.abs(mj.decode_jpeg(lo).astype(int) - img.astype(int)).mean()
    assert err_hi <= err_lo
    assert mj.encode_jpeg(img, quality=80) == mj.encode_jpeg(img, quality=80)


def test_jpeg_header_metadata_without_full_decode():
    img = _smooth(17, 23)
    payload = mj.encode_jpeg(img)
    assert mj.jpeg_dimensions(payload) == (23, 17, 3)
    meta = mc.media_meta(payload)
    assert (meta["media_type"], meta["width"], meta["height"]) == ("image", 23, 17)


def test_jpeg_rejects_non_baseline_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        mj.decode_jpeg(b"not a jpeg at all")
    # progressive (SOF2) must be rejected, not mis-decoded: patch the
    # SOF0 marker of a valid stream
    payload = bytearray(mj.encode_jpeg(_smooth(16, 16)))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        mj.decode_jpeg(bytes(payload))


def test_spark_jpeg_decode_and_resize(spark):
    """fake=False multimodal path on JPEG payloads: real features from the
    decoded pixels, and resize returns a decodable JPEG at the target
    dimensions whose content matches a direct numpy resize."""
    from blazingsql_spark.functions.multimodal import decode_features, resize_images

    img = _smooth(32, 32)
    payload = mj.encode_jpeg(img, quality=95)
    df = spark.createDataFrame([(1, bytearray(payload))], ["doc_id", "payload"])

    feats = decode_features(df, feature_dim=16, fake=False).collect()[0]
    expected = mc.image_features(mj.decode_jpeg(payload), 16)
    assert np.allclose(feats.features, expected, atol=1e-6)

    resized = resize_images(df, width=16, height=16, fake=False).collect()[0]
    back = mj.decode_jpeg(bytes(resized.resized))
    assert back.shape == (16, 16, 3)
    direct = mc.resize_image(mj.decode_jpeg(payload), 16, 16)
    assert np.abs(back.astype(int) - direct.astype(int)).max() <= 8  # re-encode loss


def test_jpeg_truncated_entropy_stream_is_typed_error():
    """A payload cut mid-entropy-stream must raise ValueError (a typed
    decode error on_error='skip' can catch), never a bare IndexError out
    of the bit reader (ADVICE r4 #4)."""
    payload = mj.encode_jpeg(_smooth(24, 24), quality=95)
    truncated = payload[: len(payload) * 2 // 3]
    with pytest.raises(ValueError, match="truncated"):
        mj.decode_jpeg(bytes(truncated))


def test_decode_on_error_skip_captures_bad_payloads(spark):
    """on_error='skip': one truncated JPEG in a batch must not kill the
    job — the bad row surfaces its error in the added `error` column,
    good rows decode normally; resize_images same contract. Default
    on_error='raise' still fails fast."""
    from blazingsql_spark.functions.multimodal import decode_features, resize_images

    from pyspark.sql import types as T

    good = mj.encode_jpeg(_smooth(24, 24), quality=95)
    bad = good[: len(good) * 2 // 3]
    gif_ish = b"GIF89a" + b"\x00" * 64
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, bytearray(gif_ish)),
         (4, None)],  # NULL payload: a failed fetch — routine at corpus scale
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("payload", T.BinaryType())]),
    )

    out = {r.doc_id: r for r in decode_features(df, feature_dim=8, fake=False, on_error="skip").collect()}
    assert out[1].error is None and len(out[1].features) == 8
    assert out[2].features is None and "truncated" in out[2].error
    assert out[3].features is None and "NotImplementedError" in out[3].error
    assert out[4].features is None and "null payload" in out[4].error
    # ADVICE r5: NULL payload reports n_bytes NULL (not 0) so a failed
    # fetch stays distinguishable from a genuine zero-byte payload
    assert out[4].n_bytes is None
    assert out[1].n_bytes == len(good)

    rz = {r.doc_id: r for r in resize_images(df, width=8, height=8, fake=False, on_error="skip").collect()}
    assert rz[1].error is None and mj.decode_jpeg(bytes(rz[1].resized)).shape == (8, 8, 3)
    assert rz[2].resized is None and rz[3].resized is None
    assert rz[4].resized is None and "null payload" in rz[4].error

    with pytest.raises(Exception):  # default raise: job fails on the bad row
        decode_features(df, feature_dim=8, fake=False).collect()
