"""GIF codec tests: LZW round trips (including width bumps, table reset,
interlace), typed truncation errors, compositing, and the Spark decode /
resize / meta paths over real GIF payloads."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blazingsql_spark.functions.media_gif import (
    decode_gif,
    encode_gif,
    gif_dimensions,
    is_gif,
)


def _random_rgb(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    return palette[idx]


@pytest.mark.parametrize("n_colors", [2, 3, 16, 200])
def test_gif_roundtrip_exact(n_colors):
    px = _random_rgb(13, 17, n_colors, seed=n_colors)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_gif_roundtrip_large_forces_width_bumps_and_reset():
    # 256 colors x 96x96 random pixels -> LZW table passes 512/1024/2048
    # and hits the 4096 reset; any width-bump disagreement corrupts output
    px = _random_rgb(96, 96, 256, seed=7)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_gif_interlaced_roundtrip():
    px = _random_rgb(23, 9, 8, seed=3)
    payload = encode_gif(px, interlace=True)
    assert np.array_equal(decode_gif(payload), px)


def test_gif_solid_and_gradient():
    solid = np.full((5, 6, 3), 200, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(solid)), solid)
    grad = np.stack(
        [np.tile(np.arange(0, 250, 10, dtype=np.uint8), (4, 1))] * 3, axis=2
    )
    assert np.array_equal(decode_gif(encode_gif(grad)), grad)


def test_gif_truncation_raises_typed_valueerror():
    payload = encode_gif(_random_rgb(20, 20, 50, seed=1))
    for cut in (3, 10, 12, len(payload) // 2, len(payload) - 2):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + payload[6:])


def test_gif_dimensions_header_only():
    px = _random_rgb(11, 31, 4, seed=2)
    assert gif_dimensions(encode_gif(px)) == (31, 11)
    assert is_gif(encode_gif(px))


def test_gif_subframe_composited_onto_screen():
    """Hand-built GIF whose frame is smaller than the logical screen:
    the decoder must place it at (left, top) over the background color."""
    import struct

    from blazingsql_spark.functions.media_gif import _lzw_encode

    # screen 4x4, bg color index 1 (green); 2x2 frame of color 0 (red)
    table = bytes([255, 0, 0, 0, 255, 0])  # red, green
    lzw = _lzw_encode(2, bytes([0, 0, 0, 0]))
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 4, 4, 0x80, 1, 0)
        + table
        + b"\x2c"
        + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
        + bytes([2])
        + bytes([len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    px = decode_gif(payload)
    assert px.shape == (4, 4, 3)
    assert tuple(px[0, 0]) == (0, 255, 0)  # background
    assert tuple(px[1, 1]) == (255, 0, 0)  # frame
    assert tuple(px[2, 2]) == (255, 0, 0)
    assert tuple(px[3, 3]) == (0, 255, 0)


def test_gif_animated_first_frame_wins():
    """Two frames appended: decode returns the first."""
    a = np.full((6, 6, 3), 10, dtype=np.uint8)
    b = np.full((6, 6, 3), 99, dtype=np.uint8)
    pa, pb = encode_gif(a), encode_gif(b)
    # splice: header+GCT+frame of a, then frame blocks of b, trailer
    combined = pa[:-1] + pb[13 + 6 :]  # drop a's trailer; skip b's hdr+gct(2)
    assert np.array_equal(decode_gif(combined), a)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(2, 64),
    seed=st.integers(0, 10_000),
    interlace=st.booleans(),
)
def test_gif_roundtrip_property(h, w, n_colors, seed, interlace):
    px = _random_rgb(h, w, n_colors, seed)
    assert np.array_equal(decode_gif(encode_gif(px, interlace=interlace)), px)


def test_spark_gif_decode_resize_meta(spark):
    """GIF payloads through the real (fake=False) Spark paths: features,
    resize (re-encoded as PNG, documented), and typed metadata."""
    from blazingsql_spark.functions import media_codec as mc
    from blazingsql_spark.functions import multimodal as mm

    imgs = [_random_rgb(16, 12, 32, seed=s) for s in range(3)]
    rows = [(i, bytearray(encode_gif(px))) for i, px in enumerate(imgs)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    feats = mm.decode_features(df, fake=False, feature_dim=8).collect()
    assert len(feats) == 3 and all(len(r.features) == 8 for r in feats)
    want0 = mc.image_features(imgs[0], 8)
    got0 = next(r.features for r in feats if r.doc_id == 0)
    assert np.allclose(got0, want0)

    rs = mm.resize_images(df, width=6, height=5, fake=False).collect()
    for r in rs:
        px = mc.decode_png(bytes(r.resized))
        assert px.shape == (5, 6, 3)

    meta = mm.derive_media_meta(df).collect()
    assert all(
        (
            r.media_meta["format"],
            r.media_meta["media_type"],
            r.media_meta["width"],
            r.media_meta["height"],
        )
        == ("gif", "image", 12, 16)
        for r in meta
    )
