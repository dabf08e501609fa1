"""Zero-dependency Avro Object Container File (OCF) source + sink.

Spark ships Avro support only as the external ``spark-avro`` module; this
container has no such jar, so the format would otherwise stay env-capped
(the reference's parser set — CSVParser/OrcParser/JSONParser, see
``engine/src/io/data_parser/`` — has no Avro either; this is superset
surface). The OCF format itself (Avro spec §Object Container Files) is
small enough to implement for real on the stdlib: a header with a JSON
schema + codec and a 16-byte sync marker, then blocks of
zigzag-varint-encoded records, each block independently decodable.

Distributed shape — the part that matters at 100 TB:

- **read**: one small driver-side header read resolves the schema; the
  data path is Spark's ``binaryFile`` source (one task per file) feeding
  an Arrow-batched ``mapInPandas`` that decodes each file's blocks into
  rows. Per-task memory is one file's decompressed block, not the
  dataset.
- **write**: each input partition encodes its rows to one
  ``part-*.avro`` file directly from the executor (deflate codec),
  mirroring how Spark's own file sinks parallelize minus the commit
  protocol — callers needing atomic publication layer
  ``sources.manifest`` on top, same as the streaming index maintainers.

Type coverage matches the fixture surface: null unions over
long/int/double/float/boolean/string/bytes, arrays of those scalars, and
µs timestamps (logicalType timestamp-micros). Unsupported Avro features
(maps, nested records, enums, fixed) raise NotImplementedError by name.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- varint ----


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: bytearray, n: int) -> None:
    n = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def long(self) -> int:
        shift = acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _zigzag_decode(acc)
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint too long")

    def raw(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("avro: truncated data")
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())


# ---------------------------------------------------------------- schema ----

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def _avro_field_schema(dt: T.DataType) -> object:
    for spark_t, avro_t in _SPARK_TO_AVRO.items():
        if isinstance(dt, spark_t):
            return avro_t
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.ArrayType):
        inner = _avro_field_schema(dt.elementType)
        if not isinstance(inner, str):
            raise NotImplementedError("avro: only arrays of plain scalars")
        # Spark arrays default to containsNull=True — mirror it with the
        # standard per-element null union (a bare items type silently
        # corrupted null elements: stringified "None" / TypeError)
        return {"type": "array", "items": ["null", inner] if dt.containsNull else inner}
    raise NotImplementedError(f"avro: unsupported Spark type {dt.simpleString()}")


def schema_to_avro(schema: T.StructType, name: str = "row") -> dict:
    """Spark StructType -> Avro record schema; every field nullable via
    the standard ["null", T] union (Spark columns are nullable)."""
    fields = []
    for f in schema.fields:
        fields.append({"name": f.name, "type": ["null", _avro_field_schema(f.dataType)]})
    return {"type": "record", "name": name, "fields": fields}


def avro_to_spark(avro_schema: dict) -> T.StructType:
    back = {
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }

    def one(t: object) -> T.DataType:
        if isinstance(t, list):  # union — strip the null branch
            branches = [x for x in t if x != "null"]
            if len(branches) != 1:
                raise NotImplementedError(f"avro: non-nullable-union {t}")
            return one(branches[0])
        if isinstance(t, dict):
            if t.get("logicalType") == "timestamp-micros":
                return T.TimestampType()
            if t.get("logicalType") == "local-timestamp-micros":
                return T.TimestampNTZType()
            if t.get("logicalType") == "date":
                return T.DateType()
            if t.get("type") == "array":
                items = t["items"]
                contains_null = isinstance(items, list) and "null" in items
                return T.ArrayType(one(items), containsNull=contains_null)
            if t.get("type") in back:
                return back[t["type"]]
            raise NotImplementedError(f"avro: unsupported schema node {t}")
        if t in back:
            return back[t]
        raise NotImplementedError(f"avro: unsupported type {t!r}")

    if avro_schema.get("type") != "record":
        raise NotImplementedError("avro: top-level schema must be a record")
    return T.StructType(
        [T.StructField(f["name"], one(f["type"])) for f in avro_schema["fields"]]
    )


# ---------------------------------------------------------------- encode ----


def _encode_value(buf: bytearray, t: object, v: object, nan_as_null: bool = True) -> None:
    """nan_as_null: the pandas write path CANNOT distinguish SQL NULL from
    NaN (Arrow hands both back as NaN in float columns/arrays — probed),
    so it coerces NaN to the null branch; the Row-based path (pyds) CAN
    distinguish (None vs nan) and passes nan_as_null=False to round-trip
    real NaN payloads."""
    if isinstance(t, list):  # ["null", T]
        if v is None or (nan_as_null and isinstance(v, float) and np.isnan(v)):
            _write_long(buf, 0)
            return
        _write_long(buf, 1)
        _encode_value(buf, [x for x in t if x != "null"][0], v, nan_as_null)
        return
    if isinstance(t, dict):
        if t.get("logicalType") in ("timestamp-micros", "local-timestamp-micros"):
            import datetime as _dt

            if isinstance(v, _dt.datetime):
                # Row-based writers (pyds) hand datetimes; the pandas path
                # pre-converts to µs ints. Integer timedelta fields keep
                # this exact (total_seconds() would round through float);
                # tz-aware values subtract the UTC epoch so the stored
                # instant is absolute (an epoch carrying v.tzinfo would
                # store local wall-clock micros)
                if v.tzinfo is not None:
                    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                else:
                    epoch = _dt.datetime(1970, 1, 1)
                td = v - epoch
                v = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
            _write_long(buf, int(v))
            return
        if t.get("logicalType") == "date":
            import datetime as _dt

            if isinstance(v, _dt.date):
                v = (v - _dt.date(1970, 1, 1)).days
            _write_long(buf, int(v))
            return
        if t.get("type") == "array":
            items = t["items"]
            v = list(v)
            if v:
                _write_long(buf, len(v))
                for item in v:
                    _encode_value(buf, items, item, nan_as_null)
            _write_long(buf, 0)
            return
        t = t["type"]
    if t in ("long", "int"):
        _write_long(buf, int(v))
    elif t == "double":
        buf += struct.pack("<d", float(v))
    elif t == "float":
        buf += struct.pack("<f", float(v))
    elif t == "boolean":
        buf.append(1 if v else 0)
    elif t == "string":
        raw = str(v).encode("utf-8")
        _write_long(buf, len(raw))
        buf += raw
    elif t == "bytes":
        raw = bytes(v)
        _write_long(buf, len(raw))
        buf += raw
    else:
        raise NotImplementedError(f"avro: cannot encode type {t!r}")


def _decode_value(r: _Reader, t: object) -> object:
    if isinstance(t, list):
        branch = r.long()
        types = t  # ["null", T] — branch indexes the union
        bt = types[branch]
        if bt == "null":
            return None
        return _decode_value(r, bt)
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros":
            return r.long()
        if t.get("type") == "array":
            items = t["items"]
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec allows)
                    r.long()
                    n = -n
                for _ in range(n):
                    out.append(_decode_value(r, items))
        t = t["type"]
    if t in ("long", "int"):
        return r.long()
    if t == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if t == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if t == "boolean":
        return r.raw(1) != b"\x00"
    if t == "string":
        return r.bytes_().decode("utf-8")
    if t == "bytes":
        return r.bytes_()
    raise NotImplementedError(f"avro: cannot decode type {t!r}")


def encode_ocf(
    rows: list[dict], avro_schema: dict, codec: str = "deflate", sync: bytes | None = None,
    block_rows: int = 4096, nan_as_null: bool = True,
) -> bytes:
    """Rows -> one complete OCF byte string (header + blocks). See
    _encode_value for the nan_as_null contract."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} (null/deflate supported)")
    sync = sync or uuid.uuid4().bytes
    header = bytearray()
    header += MAGIC
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(header, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(header, len(kb))
        header += kb
        _write_long(header, len(v))
        header += v
    _write_long(header, 0)
    header += sync
    fields = avro_schema["fields"]
    out = bytearray(header)
    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        body = bytearray()
        for row in chunk:
            for f in fields:
                _encode_value(body, f["type"], row.get(f["name"]), nan_as_null)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


def decode_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """One OCF byte string -> (avro schema, rows as dicts)."""
    if data[:4] != MAGIC:
        raise ValueError("avro: bad OCF magic")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.bytes_().decode()
            meta[k] = r.bytes_()
    sync = r.raw(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r}")
    fields = schema["fields"]
    rows: list[dict] = []
    while r.pos < len(data):
        count = r.long()
        size = r.long()
        payload = r.raw(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        br = _Reader(payload)
        for _ in range(count):
            rows.append({f["name"]: _decode_value(br, f["type"]) for f in fields})
        if r.raw(16) != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
    return schema, rows


# ----------------------------------------------------------------- Spark ----


def _pdf_from_rows(rows: list[dict], spark_schema: T.StructType) -> pd.DataFrame:
    cols = {}
    for f in spark_schema.fields:
        vals = [row.get(f.name) for row in rows]
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            cols[f.name] = pd.to_datetime(pd.array(vals, dtype="Int64"), unit="us")
        elif isinstance(f.dataType, T.DateType):
            days = pd.to_datetime(pd.array(vals, dtype="Int64"), unit="D")
            cols[f.name] = pd.Series(
                [None if pd.isna(x) else x.date() for x in days], dtype="object"
            )
        else:
            cols[f.name] = pd.Series(vals, dtype="object")
    return pd.DataFrame(cols)


def _check_posix_path(path: str) -> None:
    """This source reads/writes with plain Python file IO: it needs a
    POSIX path on a filesystem ALL executors share (local mode, NFS,
    fuse mounts). URI schemes (hdfs://, s3a://...) would need the Hadoop
    FS API — refuse them loudly instead of writing to a bogus local dir."""
    head = path.split("/", 1)[0]
    if head.endswith(":"):  # "hdfs:", "s3a:", ... before the first slash
        raise NotImplementedError(
            f"avro: the zero-dependency OCF source is shared-POSIX-path only; "
            f"got URI {path!r} (use parquet/orc for object-store interchange)"
        )


def read_header_schema(path: str) -> dict:
    """Header-ONLY parse of one OCF file's Avro schema — O(header), never
    decompresses or materializes blocks (planning must not pay for data)."""
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)
    r = _Reader(head, 4)
    if head[:4] != MAGIC:
        raise ValueError(f"avro: bad OCF magic in {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.bytes_().decode()
            meta[k] = r.bytes_()
    return json.loads(meta["avro.schema"])


def list_avro_files(path: str) -> list[str]:
    import glob as _glob

    _check_posix_path(path)
    files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    if not files:
        if os.path.isdir(path):
            raise ValueError(f"avro: no .avro files in directory {path!r}")
        files = [path]
    return files


def _schema_fields_key(avro_schema: dict) -> str:
    """Canonical (name, type) rendering of a record schema's fields, for
    cross-file schema-equality checks (docs/aliases/defaults ignored —
    they don't change decoding)."""
    return json.dumps(
        [[f["name"], f["type"]] for f in avro_schema.get("fields", [])],
        sort_keys=True,
    )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed OCF read: schema from ONE driver-side header parse of
    the first file, data via binaryFile (one task per file, pushdown-
    pruned to *.avro) -> Arrow-batched per-file block decode. Every
    file's embedded schema is checked against the driver-resolved one at
    decode time: a renamed/added/removed field raises a ValueError naming
    the offending file instead of silently NULL-filling missing columns
    and dropping extras through the by-name remap."""
    files = list_avro_files(path)
    avro_schema = read_header_schema(files[0])
    spark_schema = avro_to_spark(avro_schema)
    expected_fields = _schema_fields_key(avro_schema)
    first_file = files[0]

    def decode_files(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                _schema, rows = decode_ocf(bytes(row["content"]))
                got_fields = _schema_fields_key(_schema)
                if got_fields != expected_fields:
                    raise ValueError(
                        f"avro: schema mismatch in {row['path']}: its fields "
                        f"{got_fields} differ from {first_file}'s "
                        f"{expected_fields} — all OCF files of one read must "
                        f"share the schema (schema evolution across files is "
                        f"not resolved, and a silent by-name remap would "
                        f"NULL-fill renamed fields)"
                    )
                yield _pdf_from_rows(rows, spark_schema)

    binary = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
        if os.path.isdir(path)
        else spark.read.format("binaryFile").load(path)
    )
    return binary.select("path", "content").mapInPandas(decode_files, spark_schema)


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate", mode: str = "overwrite"
) -> int:
    """Distributed OCF write: each partition encodes its rows and writes
    one part-*.avro directly from the executor (shared-filesystem layout,
    like Spark's own file sinks minus the commit protocol — compose with
    sources.manifest for atomic publication). Returns the file count.

    mode mirrors DataFrameWriter: 'overwrite' clears existing part files
    (a re-run must not union with last run's parts), 'append' adds,
    'error' refuses a non-empty target. An empty DataFrame writes one
    zero-block file so the schema (and an empty read) round-trips."""
    _check_posix_path(path)
    os.makedirs(path, exist_ok=True)
    existing = [f for f in os.listdir(path) if f.endswith(".avro")]
    if existing:
        if mode == "error":
            raise ValueError(f"avro: target {path} already has {len(existing)} files")
        if mode == "overwrite":
            for f in existing:
                os.remove(os.path.join(path, f))
    spark_schema = df.schema
    avro_schema = schema_to_avro(spark_schema)
    ts_cols = [
        f.name
        for f in spark_schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    ]
    marker_schema = T.StructType([T.StructField("file", T.StringType())])
    # One job id per write call; final names keyed by partitionId so a
    # retried/speculative attempt renames onto the SAME file (idempotent)
    # instead of leaving a duplicate part later reads union in. Append
    # across write calls stays safe via the per-call job id.
    job_id = uuid.uuid4().hex[:12]

    def write_part(it):
        from pyspark import TaskContext
        rows: list[dict] = []
        for pdf in it:
            for c in ts_cols:
                s = pdf[c]
                ints = pd.array(
                    s.astype("datetime64[us]").astype("int64"), dtype="Int64"
                )
                ints[s.isna().to_numpy()] = pd.NA  # NaT -> null, not INT64_MIN
                pdf = pdf.assign(**{c: ints})
            for row in pdf.to_dict("records"):
                rows.append(
                    {
                        k: (None if (np.isscalar(v) or v is None) and pd.isna(v) else v)
                        for k, v in row.items()
                    }
                )
        if not rows:
            return
        tc = TaskContext.get()
        fname = os.path.join(path, f"part-{job_id}-{tc.partitionId():05d}.avro")
        blob = encode_ocf(rows, avro_schema, codec=codec)
        tmp = f"{fname}.{tc.taskAttemptId()}.tmp"  # per-attempt tmp
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, fname)  # atomic per-file rename, retry-idempotent
        yield pd.DataFrame({"file": [fname]})

    written = df.mapInPandas(write_part, marker_schema).collect()
    if not written:
        # empty input: persist the schema anyway (a zero-block file), so
        # read_avro(path) of an empty result returns 0 rows, not an error
        blob = encode_ocf([], avro_schema, codec=codec)
        fname = os.path.join(path, f"part-{job_id}-empty.avro")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, fname)
        return 1
    return len(written)
