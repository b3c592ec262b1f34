"""Pure-stdlib Apache Avro Object Container File codec.

The reference archives CDC envelopes to the raw zone as Avro
(``infrastructure/apps/kafka/connectors/s3-sink-connector.json``,
``format.class=AvroFormat``). The spark-avro datasource jar is not
bundled in this container, so this module implements the subset of the
Avro 1.11 spec the raw zone needs — binary encoding (zigzag varints,
length-prefixed bytes/strings), null unions for optional fields, and
the Object Container File framing (magic, metadata map with embedded
JSON schema, sync-marker-delimited blocks, ``null`` codec) — from the
public specification, with a reader for verification.

Scale shape: writing happens executor-side via ``foreachPartition``
(one OCF file per partition per micro-batch, like any file sink);
nothing is collected to the driver.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def schema_to_avro(schema: T.StructType, name: str = "record") -> dict:
    """Spark StructType -> Avro record schema (nullable -> null union)."""
    fields = []
    for f in schema.fields:
        for cls, avro_type in _PRIMITIVES.items():
            if isinstance(f.dataType, cls):
                break
        else:
            raise ValueError(f"unsupported Avro field type: {f.dataType}")
        t: object = ["null", avro_type] if f.nullable else avro_type
        fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


# ---- binary encoding (Avro spec: zigzag varint longs) ---------------------

def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_value(buf: io.BytesIO, avro_type, v) -> None:
    if isinstance(avro_type, list):  # ["null", X] union
        if v is None:
            _write_long(buf, 0)
            return
        _write_long(buf, 1)
        avro_type = avro_type[1]
    if isinstance(avro_type, dict) and avro_type.get("type") == "record":
        # nested record (Debezium before/after row images)
        d = v if isinstance(v, dict) else v.asDict()
        for f in avro_type["fields"]:
            _write_value(buf, f["type"], d.get(f["name"]))
        return
    if isinstance(avro_type, dict) and avro_type.get("type") == "array":
        # single-block array encoding (count, items..., 0 terminator) —
        # needed by the Iceberg manifest schemas (equality_ids etc.)
        items = list(v or [])
        if items:
            _write_long(buf, len(items))
            for item in items:
                _write_value(buf, avro_type["items"], item)
        _write_long(buf, 0)
        return
    if avro_type in ("long", "int"):
        _write_long(buf, int(v))
    elif avro_type == "double":
        buf.write(struct.pack("<d", float(v)))
    elif avro_type == "float":
        buf.write(struct.pack("<f", float(v)))
    elif avro_type == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif avro_type == "string":
        raw = str(v).encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
    elif avro_type == "bytes":
        raw = bytes(v)
        _write_long(buf, len(raw))
        buf.write(raw)
    else:  # pragma: no cover - schema_to_avro gates the type set
        raise ValueError(f"unsupported Avro type: {avro_type}")


def _read_value(buf: io.BytesIO, avro_type):
    if isinstance(avro_type, list):
        if _read_long(buf) == 0:
            return None
        avro_type = avro_type[1]
    if isinstance(avro_type, dict) and avro_type.get("type") == "record":
        return {
            f["name"]: _read_value(buf, f["type"]) for f in avro_type["fields"]
        }
    if isinstance(avro_type, dict) and avro_type.get("type") == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # spec: negative count is followed by a byte size
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_read_value(buf, avro_type["items"]))
    if avro_type in ("long", "int"):
        return _read_long(buf)
    if avro_type == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if avro_type == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if avro_type == "boolean":
        return buf.read(1) == b"\x01"
    if avro_type == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if avro_type == "bytes":
        return bytes(buf.read(_read_long(buf)))
    raise ValueError(f"unsupported Avro type: {avro_type}")


# ---- Object Container File framing ----------------------------------------

def write_ocf(
    path: str,
    avro_schema: dict,
    rows,
    sync: bytes | None = None,
    codec: str = "null",
    extra_meta: dict | None = None,
) -> int:
    """Write one OCF file (single block); returns row count. ``rows``
    is an iterable of dicts (or Row-likes with asDict). ``codec`` is
    "null" or "deflate" (spec: raw RFC-1951 deflate, no zlib header).
    ``extra_meta``: additional OCF metadata entries (str -> str) —
    Iceberg manifests carry their table schema / partition spec
    there."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = sync or os.urandom(16)
    field_types = {f["name"]: f["type"] for f in avro_schema["fields"]}
    body = io.BytesIO()
    n = 0
    for row in rows:
        d = row if isinstance(row, dict) else row.asDict()
        for fname, ftype in field_types.items():
            _write_value(body, ftype, d.get(fname))
        n += 1
    header = io.BytesIO()
    header.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_meta or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    _write_long(header, len(meta))
    for k, v in meta.items():
        _write_value(header, "string", k)
        _write_value(header, "bytes", v)
    _write_long(header, 0)  # end of metadata map
    header.write(sync)
    payload = body.getvalue()
    if codec == "deflate":
        import zlib

        co = zlib.compressobj(wbits=-15)  # raw RFC-1951, per the spec
        payload = co.compress(payload) + co.flush()
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as fh:
        fh.write(header.getvalue())
        if n:
            block = io.BytesIO()
            _write_long(block, n)
            _write_long(block, len(payload))
            fh.write(block.getvalue())
            fh.write(payload)
            fh.write(sync)
    os.replace(tmp, path)
    return n


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read an OCF file written by any compliant writer (null codec)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro OCF: {path}")
    meta: dict[str, bytes] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:
            # spec: a negative map-block count is followed by the block's
            # byte size; consume it or the key/value stream misaligns
            _read_long(buf)
            count = -count
        for _ in range(count):
            k = _read_value(buf, "string")
            meta[k] = _read_value(buf, "bytes")
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    field_types = {f["name"]: f["type"] for f in schema["fields"]}
    sync = buf.read(16)
    rows: list[dict] = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        blen = _read_long(buf)  # block byte length
        if codec == b"deflate":
            import zlib

            data = io.BytesIO(zlib.decompress(buf.read(blen), -15))
        else:
            data = buf
        for _ in range(n):
            rows.append(
                {fname: _read_value(data, ftype) for fname, ftype in field_types.items()}
            )
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, rows


def hive_partition_values(rel_path: str) -> dict:
    """``k=v`` partition values from a Hive-layout relative path (the
    one place this parsing lives — the catalog's metadata tables and
    the Avro directory reader both surface these as columns)."""
    return {
        k: v
        for seg in rel_path.split(os.sep)
        if "=" in seg
        for k, _, v in [seg.partition("=")]
    }


_AVRO_TO_SPARK = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
}


def read_ocf_schema(path: str) -> dict:
    """Header-only read: the Avro schema from an OCF file's metadata
    map, without touching the data blocks (the schema-inference step of
    a directory read — one small read on the driver)."""
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise ValueError(f"not an Avro OCF: {path}")
        meta: dict[str, bytes] = {}
        while True:
            count = _read_long(fh)
            if count == 0:
                break
            if count < 0:
                _read_long(fh)
                count = -count
            for _ in range(count):
                k = _read_value(fh, "string")
                meta[k] = _read_value(fh, "bytes")
        return json.loads(meta["avro.schema"])


def avro_to_spark_schema(avro_schema: dict) -> T.StructType:
    """Avro record schema -> Spark StructType (null unions -> nullable).
    Flat primitive columns only — the raw-zone envelope shape."""
    fields = []
    for f in avro_schema["fields"]:
        t, nullable = f["type"], False
        if isinstance(t, list):
            nullable = "null" in t
            t = next(x for x in t if x != "null")
        if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
            raise ValueError(
                f"read_avro supports flat primitive columns; field "
                f"{f['name']!r} has type {t!r}"
            )
        fields.append(T.StructField(f["name"], _AVRO_TO_SPARK[t], nullable))
    return T.StructType(fields)


def write_avro_partitions(df, out_dir: str, name: str = "record") -> None:
    """Distributed Avro write: each partition writes one OCF file under
    ``out_dir`` from its executor (no driver collect)."""
    avro_schema = schema_to_avro(df.schema, name)
    os.makedirs(out_dir, exist_ok=True)

    def _write(it):
        rows = list(it)
        if rows:
            fname = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")
            write_ocf(fname, avro_schema, rows)

    df.foreachPartition(_write)


# ---- Confluent Schema-Registry wire format ---------------------------------
#
# Debezium with AvroConverter (the reference's connector config:
# ``debezium-postgres-connector.json`` key/value converters) frames every
# Kafka record as: magic byte 0x00, 4-byte big-endian schema id, then the
# Avro binary body encoded with the registered writer schema. This is NOT
# the OCF framing above — no header, no sync markers.

CONFLUENT_MAGIC = 0


def encode_confluent(record: dict, avro_schema: dict, schema_id: int) -> bytes:
    """Encode one record in the Schema-Registry wire format."""
    buf = io.BytesIO()
    buf.write(struct.pack(">bI", CONFLUENT_MAGIC, schema_id))
    for f in avro_schema["fields"]:
        _write_value(buf, f["type"], record.get(f["name"]))
    return buf.getvalue()


def confluent_schema_id(payload: bytes) -> int:
    """Peek the schema id from a wire-format payload (loud on bad magic)."""
    if len(payload) < 5:
        raise ValueError(f"Confluent payload too short: {len(payload)} bytes")
    magic, schema_id = struct.unpack(">bI", payload[:5])
    if magic != CONFLUENT_MAGIC:
        raise ValueError(
            f"bad Confluent magic byte {magic} (expected {CONFLUENT_MAGIC}); "
            "payload is not Schema-Registry framed Avro"
        )
    return schema_id


def decode_confluent(payload: bytes, schema_by_id) -> tuple[int, dict]:
    """Decode one wire-format payload; returns ``(schema_id, record)``.

    ``schema_by_id`` maps registry schema ids to Avro record schemas —
    a dict in-sandbox, or any Mapping-like facade over a real Schema
    Registry's ``GET /schemas/ids/{id}`` lookup in production. Unknown
    ids fail loudly (decoding with a guessed schema corrupts silently).
    """
    schema_id = confluent_schema_id(payload)
    schema = schema_by_id.get(schema_id)
    if schema is None:
        raise ValueError(
            f"schema id {schema_id} not in registry (known: "
            f"{sorted(schema_by_id)[:20]}); refusing to guess a writer schema"
        )
    buf = io.BytesIO(payload[5:])
    rec = {f["name"]: _read_value(buf, f["type"]) for f in schema["fields"]}
    if buf.read(1):
        raise ValueError(
            f"trailing bytes after Avro body (schema id {schema_id}): "
            "writer schema mismatch"
        )
    return schema_id, rec
