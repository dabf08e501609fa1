"""WebDataset tar/zip shard ingestion tests: member enumeration, sample
regrouping by key, the write->read round trip, and JVM-side modality
extraction from the parallel-array layout."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest
from pyspark.sql import functions as F

from blazingsql_spark.sources import archives as ar


def _make_tar(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _shard(i: int, n_samples: int = 4) -> dict[str, bytes]:
    out = {}
    for s in range(n_samples):
        key = f"{i:03d}{s:03d}"
        out[f"{key}.txt"] = f"caption {i}-{s}".encode()
        out[f"{key}.img"] = bytes([i, s]) * 10
        out[f"{key}.meta.json"] = b'{"ok": true}'
    return out


def test_split_member_key():
    assert ar.split_member_key("000123.jpg") == ("000123", "jpg")
    assert ar.split_member_key("a/b/000123.seg.png") == ("a/b/000123", "seg.png")
    assert ar.split_member_key("noext") == ("noext", "")


def test_tar_members_and_webdataset(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"shard-{i}.tar").write_bytes(_make_tar(_shard(i)))
    members = ar.read_tar_members(spark, str(tmp_path))
    assert members.count() == 3 * 4 * 3  # 3 shards x 4 samples x 3 members
    wds = ar.read_webdataset(spark, str(tmp_path))
    rows = wds.collect()
    assert len(rows) == 12
    for r in rows:
        assert r.exts == ["img", "meta.json", "txt"]  # sorted
        got_txt = bytes(r.payloads[r.exts.index("txt")]).decode()
        assert got_txt.startswith("caption ")
    # JVM-side modality pull: element_at + array_position, no Python
    txts = wds.select(
        "key",
        F.element_at("payloads", F.array_position("exts", "txt").cast("int"))
        .cast("string")
        .alias("txt"),
    ).collect()
    assert all(t.txt.startswith("caption ") for t in txts)


def test_zip_members(spark, tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", "alpha")
        zf.writestr("dir/b.bin", b"\x00\x01")
        zf.writestr("dir/", "")  # directory entry must be skipped
    (tmp_path / "x.zip").write_bytes(buf.getvalue())
    got = {r.member: bytes(r.payload) for r in ar.read_zip_members(spark, str(tmp_path)).collect()}
    assert got == {"a.txt": b"alpha", "dir/b.bin": b"\x00\x01"}


def test_write_read_roundtrip(spark, tmp_path):
    import pandas as pd

    rows = []
    for k in range(10):
        rows.append((f"{k:05d}", "txt", f"doc {k}".encode()))
        rows.append((f"{k:05d}", "img", bytes([k]) * 5))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "ext", "payload"]))
    out = str(tmp_path / "export")
    n = ar.write_tar_shards(df, out, num_shards=3)
    assert n == 3
    back = ar.read_webdataset(spark, out)
    # a sample's members are co-located by the writer's key repartition,
    # so the sample-grouped read sees each key exactly once
    assert back.count() == 10
    got = {r.key: dict(zip(r.exts, [bytes(p) for p in r.payloads])) for r in back.collect()}
    for k in range(10):
        assert got[f"{k:05d}"] == {"txt": f"doc {k}".encode(), "img": bytes([k]) * 5}


def test_write_tar_shards_posix_only(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"key": ["a"], "ext": ["txt"], "payload": [b"x"]}))
    with pytest.raises(NotImplementedError, match="POSIX"):
        ar.write_tar_shards(df, "s3a://bucket/shards")


def test_stream_webdataset_exactly_once_per_shard(spark, tmp_path):
    """New shards flow through as sample rows; Spark's file-source log
    makes each shard process exactly once across triggers."""
    import time

    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    (src / "shard-0.tar").write_bytes(_make_tar(_shard(0, n_samples=3)))

    def run_trigger():
        # parquet sink: the memory sink cannot recover from a checkpoint,
        # and checkpoint recovery IS what this test pins down
        q = (
            ar.stream_webdataset(spark, str(src))
            .selectExpr("shard", "key", "size(exts) AS n_members")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_trigger()
    first = spark.read.parquet(sink).collect()
    assert len(first) == 3 and all(r.n_members == 3 for r in first)

    # drop a second shard; only ITS samples arrive on the next trigger
    (src / "shard-1.tar").write_bytes(_make_tar(_shard(1, n_samples=2)))
    time.sleep(1.1)  # file-source mtime granularity
    run_trigger()
    allrows = spark.read.parquet(sink).collect()
    assert len(allrows) == 5  # 3 + 2, shard-0 NOT reprocessed
    assert sorted({r.shard for r in allrows}) == ["shard-0.tar", "shard-1.tar"]
