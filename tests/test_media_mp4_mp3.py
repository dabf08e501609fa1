"""MP4 container + MP3 frame-layer tests: mux/demux round trips (multi-
chunk stsc, co64, stss sync selection, 64-bit boxes), frame-sampling
index selection, typed errors, the honest codec-decode boundary, and the
Spark extract_frames / media-meta paths over real payloads."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blazingsql_spark.functions import media_mp3 as mp3
from blazingsql_spark.functions import media_mp4 as mp4
from blazingsql_spark.functions.media_codec import media_meta, sniff_format


def _samples(n, seed=0):
    return [bytes([(seed + i) % 256]) * (5 + 11 * i % 37) for i in range(n)]


# ------------------------------------------------------------------ MP4 ----


def test_mp4_roundtrip_single_chunk():
    s = _samples(8)
    b = mp4.encode_mp4(s, width=320, height=240, sample_duration=40)
    info = mp4.parse_mp4(b)
    assert info["brand"] == "isom"
    assert info["duration_ms"] == 8 * 40
    t = info["tracks"][0]
    assert (t["kind"], t["codec"], t["width"], t["height"]) == ("video", "mp4v", 320, 240)
    assert t["n_samples"] == 8
    assert t["sync_samples"] == list(range(8))  # no stss -> all sync
    assert mp4.extract_samples(b, list(range(8))) == s


@pytest.mark.parametrize("spc", [1, 3, 5, 8])
def test_mp4_roundtrip_multi_chunk(spc):
    # 8 % 3 != 0 exercises the remainder stsc entry; spc=8 is one chunk
    s = _samples(8, seed=spc)
    b = mp4.encode_mp4(s, samples_per_chunk=spc)
    assert mp4.extract_samples(b, list(range(8))) == s


def test_mp4_co64_and_empty_samples():
    s = [b"", b"x", b""]
    b = mp4.encode_mp4(s, force_co64=True)
    assert mp4.extract_samples(b, [0, 1, 2]) == s


def test_mp4_sync_sample_selection():
    s = _samples(12)
    b = mp4.encode_mp4(s, sync_every=4)  # keyframes at 0, 4, 8
    t = mp4.parse_mp4(b)["tracks"][0]
    assert t["sync_samples"] == [0, 4, 8]
    # frame sampling snaps to sync samples only
    assert mp4.sample_frame_indices(b, 2) == [0, 4]
    assert mp4.sample_frame_indices(b, 3) == [0, 4, 8]
    # k > number of keyframes: dedup, never out of range
    assert mp4.sample_frame_indices(b, 99) == [0, 4, 8]


def test_mp4_audio_track_kind():
    s = _samples(4)
    b = mp4.encode_mp4(s, kind="audio", codec=b"mp4a", timescale=44100, sample_duration=1024)
    t = mp4.parse_mp4(b)["tracks"][0]
    assert (t["kind"], t["codec"]) == ("audio", "mp4a")
    assert t["width"] is None and t["height"] is None
    assert mp4.extract_samples(b, [1, 3], kind="audio") == [s[1], s[3]]
    with pytest.raises(ValueError, match="no video track"):
        mp4.extract_samples(b, [0], kind="video")


def test_mp4_64bit_box_size():
    # rewrite mdat as a size==1 (64-bit largesize) box; offsets shift by 8
    s = _samples(3)
    b = mp4.encode_mp4(s)
    ftyp_len = struct.unpack_from(">I", b, 0)[0]
    mdat_len = struct.unpack_from(">I", b, ftyp_len)[0]
    mdat_body = b[ftyp_len + 8 : ftyp_len + mdat_len]
    wide_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body
    shifted = b[:ftyp_len] + wide_mdat + b[ftyp_len + mdat_len :]
    # sample offsets in stco are stale by +8 -> patch via re-parse assertion:
    # the box WALK must handle largesize even though offsets moved
    info = mp4.parse_mp4(shifted)
    assert info["tracks"][0]["n_samples"] == 3


def test_mp4_typed_errors():
    with pytest.raises(ValueError, match="ftyp"):
        mp4.parse_mp4(b"\x00" * 32)
    b = mp4.encode_mp4(_samples(3))
    with pytest.raises(ValueError, match="out of range"):
        mp4.extract_samples(b, [7])
    with pytest.raises(ValueError, match="overruns"):
        mp4.parse_mp4(b[: len(b) - 10])  # truncated moov
    with pytest.raises(NotImplementedError, match="codec bitstream"):
        mp4.decode_frame(b, 0)


def test_mp4_meta_and_sniff():
    b = mp4.encode_mp4(_samples(5), width=64, height=48, sample_duration=100)
    assert sniff_format(b) == "mp4"
    m = media_meta(b)
    assert (m["media_type"], m["format"]) == ("video", "mp4")
    assert (m["width"], m["height"], m["duration_ms"]) == (64, 48, 500)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 20),
    spc=st.integers(1, 7),
    sync_every=st.integers(1, 5),
    seed=st.integers(0, 1000),
)
def test_mp4_roundtrip_property(n, spc, sync_every, seed):
    s = _samples(n, seed=seed)
    b = mp4.encode_mp4(s, samples_per_chunk=spc, sync_every=sync_every)
    assert mp4.extract_samples(b, list(range(n))) == s
    idxs = mp4.sample_frame_indices(b, min(n, 4))
    assert idxs == sorted(set(idxs))
    for i in idxs:
        assert 0 <= i < n


# ------------------------------------------------------------------ MP3 ----


def test_mp3_cbr_duration_and_length():
    b = mp3.encode_mp3_cbr(50)  # MPEG1 L3 128kbps 44100
    info = mp3.parse_mp3(b)
    assert info["n_frames"] == 50
    assert info["duration_ms"] == 50 * 1152 * 1000 // 44100
    assert info["bitrate_kbps"] == 128 and not info["is_vbr"]
    assert len(b) == 50 * (144 * 128000 // 44100)


def test_mp3_id3_and_xing():
    b = mp3.encode_mp3_cbr(30, with_id3=True, with_xing=True)
    info = mp3.parse_mp3(b)
    assert info["has_id3"]
    # Xing/Info frame count is authoritative and excludes the tag frame
    assert info["n_frames"] == 30


def test_mp3_mpeg2_mono():
    b = mp3.encode_mp3_cbr(10, bitrate_kbps=64, sample_rate=22050, version="2", channel_mode="mono")
    info = mp3.parse_mp3(b)
    assert info["sample_rate"] == 22050 and info["channel_mode"] == "mono"
    assert info["duration_ms"] == 10 * 576 * 1000 // 22050  # MPEG2 L3: 576 spf


def test_mp3_sniff_does_not_eat_jpeg():
    assert sniff_format(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert not mp3.is_mp3(b"\xff\xd8\xff\xe0")


def test_mp3_meta_and_errors():
    b = mp3.encode_mp3_cbr(5)
    assert sniff_format(b) == "mp3"
    m = media_meta(b)
    assert (m["media_type"], m["format"]) == ("audio", "mp3")
    assert m["duration_ms"] == 5 * 1152 * 1000 // 44100
    with pytest.raises(ValueError, match="frame sync"):
        mp3.parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x04zzzz")
    with pytest.raises(NotImplementedError, match="PCM"):
        mp3.decode_pcm(b)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 60),
    kbps=st.sampled_from([64, 128, 192, 320]),
    sr=st.sampled_from([32000, 44100, 48000]),
)
def test_mp3_cbr_property(n, kbps, sr):
    b = mp3.encode_mp3_cbr(n, bitrate_kbps=kbps, sample_rate=sr)
    info = mp3.parse_mp3(b)
    assert info["n_frames"] == n
    assert info["sample_rate"] == sr and info["bitrate_kbps"] == kbps
    assert info["duration_ms"] == n * 1152 * 1000 // sr


# ---------------------------------------------------------------- Spark ----


def test_extract_frames_spark(spark):
    import pandas as pd

    from blazingsql_spark.functions import multimodal

    rows = []
    vids = {}
    for i in range(6):
        s = _samples(3 + i, seed=i)
        vids[i] = s
        rows.append((i, mp4.encode_mp4(s, sync_every=2)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "payload"]))
    out = multimodal.extract_frames(df, n_frames=2).orderBy("doc_id", "frame_idx")
    got = out.collect()
    for r in got:
        assert bytes(r.frame_bytes) == vids[r.doc_id][r.frame_idx]
        assert r.frame_len == len(vids[r.doc_id][r.frame_idx])
        assert r.frame_idx % 2 == 0  # sync_every=2 -> even keyframes only
    # every doc produced up to 2 frames, all keyframes
    per_doc = {}
    for r in got:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert set(per_doc) == set(range(6))
    assert all(len(v) <= 2 for v in per_doc.values())


def test_extract_frames_skip_mode(spark):
    import pandas as pd

    from blazingsql_spark.functions import multimodal

    good = mp4.encode_mp4(_samples(4))
    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, good), (2, b"not an mp4 at all"), (3, None)],
            columns=["doc_id", "payload"],
        )
    )
    out = multimodal.extract_frames(df, n_frames=2, on_error="skip").toPandas()
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert set(ok["doc_id"]) == {1} and len(ok) == 2
    assert set(bad["doc_id"]) == {2, 3}
    with pytest.raises(Exception):
        multimodal.extract_frames(df, on_error="raise").collect()


def test_derive_media_meta_mp4_mp3(spark):
    import pandas as pd

    from blazingsql_spark.functions import multimodal

    df = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, mp4.encode_mp4(_samples(5), width=128, height=96, sample_duration=200)),
                (2, mp3.encode_mp3_cbr(20)),
            ],
            columns=["doc_id", "payload"],
        )
    )
    got = {
        r.doc_id: r.media_meta.asDict()
        for r in multimodal.derive_media_meta(df).collect()
    }
    assert got[1]["format"] == "mp4" and got[1]["media_type"] == "video"
    assert (got[1]["width"], got[1]["height"], got[1]["duration_ms"]) == (128, 96, 1000)
    assert got[2]["format"] == "mp3" and got[2]["media_type"] == "audio"
    assert got[2]["duration_ms"] == 20 * 1152 * 1000 // 44100


def test_mp4_malformed_tables_raise_valueerror_not_struct_error():
    """Review finding: a lying stsz count leaked struct.error past
    skip-mode handlers — parse_mp4 now wraps it typed."""
    b = bytearray(mp4.encode_mp4(_samples(3)))
    i = bytes(b).find(b"stsz")
    # corrupt the sample_count field (last 4 bytes before the size table)
    struct.pack_into(">I", b, i + 4 + 8, 1 << 30)
    with pytest.raises(ValueError, match="malformed|mismatch|truncated"):
        mp4.parse_mp4(bytes(b))


def test_mp4_stz2_rejected_by_name():
    b = bytearray(mp4.encode_mp4(_samples(3)))
    i = bytes(b).find(b"stsz")
    b[i : i + 4] = b"stz2"  # same length, so the container stays well-formed
    with pytest.raises(NotImplementedError, match="stz2"):
        mp4.parse_mp4(bytes(b))


def test_extract_frames_skip_survives_malformed_tables(spark):
    import pandas as pd

    from blazingsql_spark.functions import multimodal

    good = mp4.encode_mp4(_samples(4))
    bad = bytearray(mp4.encode_mp4(_samples(3)))
    i = bytes(bad).find(b"stsz")
    struct.pack_into(">I", bad, i + 4 + 8, 1 << 30)
    df = spark.createDataFrame(
        pd.DataFrame([(1, good), (2, bytes(bad))], columns=["doc_id", "payload"])
    )
    out = multimodal.extract_frames(df, n_frames=2, on_error="skip").toPandas()
    assert set(out[out["error"].notna()]["doc_id"]) == {2}
    assert len(out[out["error"].isna()]) == 2


def test_sniff_rejects_sync_only_false_positive():
    # valid sync/version/layer bits but bitrate index 15 (invalid):
    # previously sniffed as mp3 and crashed the metadata pass
    fake = b"\xff\xfb\xf0\x00" + b"\x00" * 64
    assert sniff_format(fake) == "unknown"
    m = media_meta(fake)
    assert m["format"] == "unknown" and m["duration_ms"] is None


def test_media_meta_truncated_mp4_degrades_to_nulls():
    b = mp4.encode_mp4(_samples(3))
    m = media_meta(b[: len(b) - 10])  # truncated moov: parse fails
    assert m["format"] == "mp4"
    assert m["width"] is None and m["duration_ms"] is None
    assert m["n_bytes"] == len(b) - 10


def test_mp3_crc_protected_xing_offset():
    """Review finding: CRC-protected frames carry a 16-bit CRC before the
    side info, shifting the Xing tag by 2 bytes."""
    # build a CRC-protected frame by clearing the protection bit
    b = bytearray(mp3.encode_mp3_cbr(5, with_xing=True))
    h = mp3._frame_header(bytes(b), 0)
    assert h["protection"] == 1
    assert mp3._xing_offset("1", "stereo", protection=0) == mp3._xing_offset("1", "stereo", protection=1) + 2
    assert mp3._xing_offset("2", "mono", protection=0) == 4 + 2 + 9


def test_mp4_fullbox_at_eof_is_typed_valueerror():
    """Second review pass: a FullBox whose payload starts exactly at EOF
    raised IndexError past the skip-mode handlers."""
    # hand-build: ftyp + moov containing ONLY an empty mvhd (size 8 -> its
    # FullBox version byte would be read at EOF)
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0x200)
    mvhd = struct.pack(">I", 8) + b"mvhd"  # no body at all
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    with pytest.raises(ValueError, match="malformed|truncated"):
        mp4.parse_mp4(ftyp + moov)


def test_bmp_sniff_rejects_lookalikes():
    from blazingsql_spark.functions.media_codec import is_bmp

    # text starting "BM" must not sniff as bmp
    fake = b"BMW is a car maker" + b"\x00" * 64
    assert sniff_format(fake) == "unknown"
    assert not is_bmp(fake)
    # legacy BITMAPCOREHEADER (hdr_size 12) rejected by the sniffer
    core = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + b"\x00" * 48
    assert not is_bmp(core)
