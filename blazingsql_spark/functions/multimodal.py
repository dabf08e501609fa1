"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas iterators.

The Spark-side contract is real and tested — schema, partitioning, UDF
signatures, batch shapes. Media decoding has TWO real paths:

- ``fake=False`` decodes PNG + baseline JPEG + GIF images and WAV audio
  FOR REAL via the zero-dependency stdlib/numpy codecs
  (``functions.media_codec``, ``functions.media_jpeg``,
  ``functions.media_gif``): header-parsed metadata, box-pooled
  grayscale / energy-envelope feature vectors, and box-average image
  resize (JPEG re-encoded at quality 90; GIF re-encoded as lossless PNG
  since resize averaging breaks the 256-color palette). MP4 parses to the
  container layer (typed metadata + REAL encoded-keyframe extraction via
  ``extract_frames``/``functions.media_mp4``) and MP3 to the frame layer
  (duration/bitrate via ``functions.media_mp3``); only codec *bitstream*
  decode (H.264 pixels, MP3 PCM) raises NotImplementedError naming the
  library to plug in — the boundary is per-layer, not per-operator.
- ``fake=True`` keeps the deterministic sha256-seeded stand-in for
  payloads of ANY format — what the fixture-driven oracle queries use.

At 100 TB: binary payloads stay columnar in parquet; mapInPandas streams
Arrow record batches so one task never holds more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` media blobs in Python.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried next to every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Treat a column's bytes as an opaque media payload (for testing the
    plumbing on text fixtures; real pipelines read binary parquet columns)."""
    return df.withColumn(out_col, F.col(text_col).cast("binary"))


def with_media_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image", fmt: str = "fake"
) -> DataFrame:
    """Derive the typed metadata struct JVM-side (no Python in the loop)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def derive_media_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL typed-metadata extraction: parse each payload's header
    (functions.media_codec — PNG dimensions, WAV duration; unknown
    formats keep NULL fields and format='unknown') via Arrow-batched
    mapInPandas, emitting the standard MEDIA_META_SCHEMA struct. The
    cheap complement to ``with_media_meta`` (which stamps caller-known
    constants JVM-side without touching payload bytes)."""
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [T.StructField(id_col, id_type), T.StructField("media_meta", MEDIA_META_SCHEMA)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from blazingsql_spark.functions import media_codec as mc

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media_meta": pdf[payload_col].map(lambda b: mc.media_meta(bytes(b))),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def _fake_decode(payload: bytes, target: int) -> list[float]:
    """Deterministic fake 'decode → feature vector': sha256-seeded floats.
    Stands in for a real image/audio feature extractor."""
    h = hashlib.sha256(payload).digest()
    return [h[i % 32] / 255.0 for i in range(target)]


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 16,
    fake: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Decode media payloads into feature vectors via mapInPandas.

    ``fake=False`` REALLY decodes PNG/JPEG/GIF/WAV (functions.media_codec:
    box-pooled grayscale grid for images, energy envelope + rms/zcr for
    audio) and raises NotImplementedError for formats that need external
    libraries. The Arrow-batched plumbing is the production shape either
    way.

    ``on_error``: ``'raise'`` (default) fails the job on the first bad
    payload; ``'skip'`` captures per-row decode failures into an added
    ``error`` string column (null on success, ``features`` null on
    failure) — at corpus scale one truncated file must not kill a
    100 TB decode pass."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    # id keeps its incoming type (bigint doc ids, string file paths from the
    # binaryFile source, ...) — the decode contract only touches the payload
    id_type = df.schema[id_col].dataType
    fields = [
        T.StructField(id_col, id_type),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
    if on_error == "skip":
        fields.append(T.StructField("error", T.StringType()))
    out_schema = T.StructType(fields)

    if fake:
        extract = lambda b: _fake_decode(b, feature_dim)  # noqa: E731
    else:
        from blazingsql_spark.functions import media_codec as mc

        def extract(b: bytes) -> list[float]:
            fmt = mc.sniff_format(b)
            if fmt == "png":
                return mc.image_features(mc.decode_png(b), feature_dim)
            if fmt == "jpeg":
                from blazingsql_spark.functions.media_jpeg import decode_jpeg

                return mc.image_features(decode_jpeg(b), feature_dim)
            if fmt == "wav":
                sr, _ch, x = mc.decode_wav(b)
                return mc.audio_features(sr, x, feature_dim)
            if fmt == "gif":
                from blazingsql_spark.functions.media_gif import decode_gif

                return mc.image_features(decode_gif(b), feature_dim)
            if fmt == "bmp":
                return mc.image_features(mc.decode_bmp(b), feature_dim)
            raise NotImplementedError(
                f"payload format {fmt!r}: PNG/JPEG/GIF/WAV decode fully; "
                "MP4/MP3 parse to the container/frame layer (media_mp4 "
                "extract_frames, media_mp3 parse_mp3) but pixel/PCM decode "
                "needs an external codec — plug in PIL/ffmpeg or use "
                "fake=True"
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            cols = {
                id_col: pdf[id_col],
                # NULL payloads (failed fetches) are routine at corpus
                # scale — they must flow to the error path, not TypeError
                # out of len()/bytes() before the catch. Nullable Int64 so
                # a failed fetch (n_bytes NULL) stays distinguishable from
                # a genuine zero-byte payload (n_bytes 0).
                "n_bytes": pd.array(
                    [len(b) if b is not None else None for b in payloads],
                    dtype="Int64",
                ),
            }
            if on_error == "skip":
                feats, errs = [], []
                for b in payloads:
                    try:
                        if b is None:
                            raise ValueError("null payload")
                        feats.append(extract(bytes(b)))
                        errs.append(None)
                    except (ValueError, NotImplementedError) as e:
                        feats.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                cols["features"] = feats
                cols["error"] = errs
            else:
                cols["features"] = payloads.map(
                    lambda b: extract(bytes(b)) if b is not None else _null_payload()
                )
            yield pd.DataFrame(cols)

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def _null_payload():
    raise ValueError("null payload (use on_error='skip' to capture per-row)")


def frame_sample_plan(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 4, duration_col: str | None = None
) -> DataFrame:
    """Frame-sampling plan for video payloads: emit (id, frame_idx, offset_pct)
    rows JVM-side; a decoder joins by id and seeks per row. Exploding the
    plan *before* decode keeps each Python task's working set to one frame,
    not one video. ``extract_frames`` below is the real MP4 companion."""
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).withColumn("offset_pct", F.col("frame_idx") / F.lit(n_frames))


def extract_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
    on_error: str = "raise",
) -> DataFrame:
    """REAL video frame sampling over MP4 payloads: parse the ISO-BMFF
    container (functions.media_mp4 — zero dependencies), pick n uniformly
    spaced SYNC samples (keyframes, so each extracted unit is independently
    decodable), and emit one row per frame with the raw encoded bytes.

    Output: (id, frame_idx = 0-based sample index in the video track,
    frame_bytes, frame_len) [+ error when on_error='skip']. Decoding the
    H.264/HEVC bitstream inside frame_bytes is the documented external-
    library boundary (media_mp4.decode_frame); everything up to it — box
    walk, stts/stsc/stsz/stco/stss resolution, mdat byte extraction — is
    real parsing.

    At 100 TB: one video in, <= n_frames small rows out, all inside one
    Arrow-batched mapInPandas pass — the explode happens in Python per
    payload so the JVM never materializes a (video x frame) join, and
    downstream stages shuffle frames, not videos."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    id_type = df.schema[id_col].dataType
    fields = [
        T.StructField(id_col, id_type),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_len", T.LongType()),
    ]
    if on_error == "skip":
        fields.append(T.StructField("error", T.StringType()))
    out_schema = T.StructType(fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from blazingsql_spark.functions import media_mp4 as m4

        for pdf in it:
            rows: list[tuple] = []
            for rid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if b is None:
                        raise ValueError("null payload")
                    b = bytes(b)
                    idxs = m4.sample_frame_indices(b, n_frames)
                    frames = m4.extract_samples(b, idxs)
                    for i, fb in zip(idxs, frames):
                        row = (rid, i, fb, len(fb))
                        rows.append(row + ((None,) if on_error == "skip" else ()))
                # struct.error belt-and-braces: parse_mp4 wraps it into
                # ValueError, but a corrupt payload must never kill a
                # skip-mode corpus pass even if a path is missed
                except (ValueError, NotImplementedError, struct.error) as e:
                    if on_error == "raise":
                        raise
                    rows.append((rid, None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
    fake: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Resize media payloads via Arrow-batched mapInPandas.

    ``fake=False`` REALLY resizes PNG payloads (box-average resample via
    functions.media_codec, re-encoded as PNG); non-PNG formats raise
    NotImplementedError naming the library to plug in. ``fake=True``
    emits a deterministic payload of len width*height derived from the
    input bytes — same pipeline shape (binary in → binary out + updated
    metadata) without requiring decodable fixtures.

    ``on_error='skip'`` captures per-row failures into an added ``error``
    column instead of failing the job (see ``decode_features``).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
    if on_error == "skip":
        fields.append(T.StructField("error", T.StringType()))
    out_schema = T.StructType(fields)

    if fake:
        target = width * height
        transform = lambda b: (b * (target // max(len(b), 1) + 1))[:target]  # noqa: E731
    else:
        from blazingsql_spark.functions import media_codec as mc

        def transform(b: bytes) -> bytes:
            fmt = mc.sniff_format(b)
            if fmt == "png":
                return mc.encode_png(mc.resize_image(mc.decode_png(b), width, height))
            if fmt == "jpeg":
                from blazingsql_spark.functions import media_jpeg as mj

                resized = mc.resize_image(mj.decode_jpeg(b), width, height)
                return mj.encode_jpeg(resized, quality=90)
            if fmt == "gif":
                # box-resize averaging breaks the ≤256-color palette, and a
                # quantizer is out of scope — re-encode losslessly as PNG
                # (output format recorded in the bytes' own magic)
                from blazingsql_spark.functions.media_gif import decode_gif

                return mc.encode_png(mc.resize_image(decode_gif(b), width, height))
            if fmt == "bmp":
                return mc.encode_bmp(mc.resize_image(mc.decode_bmp(b), width, height))
            raise NotImplementedError(
                "only PNG/JPEG/GIF/BMP resize with the zero-dependency codec; "
                "plug in PIL/cv2 for other formats or use fake=True"
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            cols = {id_col: pdf[id_col].astype("int64")}
            if on_error == "skip":
                out, errs = [], []
                for b in payloads:
                    try:
                        if b is None:
                            raise ValueError("null payload")
                        out.append(transform(bytes(b)))
                        errs.append(None)
                    except (ValueError, NotImplementedError) as e:
                        out.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                cols["resized"] = out
            else:
                cols["resized"] = payloads.map(
                    lambda b: transform(bytes(b)) if b is not None else _null_payload()
                )
            cols["width"] = width
            cols["height"] = height
            if on_error == "skip":
                cols["error"] = errs
            yield pd.DataFrame(cols)

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def dhash_images(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "dhash",
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """Perceptual dHash per image payload (REAL PNG decode via
    media_codec, Arrow-batched) — the candidate-generation step of image
    near-dup dedup: group or band on the hash, verify with hamming
    distance, exactly the SimHash discipline on the text side. One map
    pass, no shuffle."""
    from blazingsql_spark.functions.media_codec import decode_png, dhash_image

    @F.pandas_udf("string")
    def hasher(payloads):
        import pandas as pd

        return pd.Series(
            [dhash_image(decode_png(bytes(p)), hash_w, hash_h) for p in payloads]
        )

    return df.withColumn(out_col, hasher(F.col(payload_col)))


def audio_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "afp",
    n_frames: int = 32,
) -> DataFrame:
    """Energy-envelope fingerprint per audio payload (REAL WAV decode via
    media_codec, Arrow-batched) — the audio analogue of dhash_images:
    group or band on the fingerprint for near-dup candidates. One map
    pass, no shuffle. int16 PCM recovers exactly from the decoder's
    /32768 normalization (power-of-two divisor), so the fingerprint is
    integer-exact end to end."""
    import numpy as np

    from blazingsql_spark.functions.media_codec import (
        audio_envelope_hash,
        decode_wav,
    )

    @F.pandas_udf("string")
    def hasher(payloads):
        import pandas as pd

        out = []
        for p in payloads:
            _sr, _ch, x = decode_wav(bytes(p))
            rec = np.round(x.ravel() * 32768.0).astype(np.int64)
            out.append(audio_envelope_hash(rec, n_frames))
        return pd.Series(out)

    return df.withColumn(out_col, hasher(F.col(payload_col)))
