"""Avro Object Container File source/sink — the reference's native
format (reference streamAdapter.go:15-42 ReadOCFIntoChannel R1;
filesystemStorageAdapter.go:30-61 OCF sink R9).

No Avro library ships in this environment (no spark-avro jar, no
fastavro), so this is a from-spec implementation of the subset the
reference exercises (fixtures.go:10-32): null, boolean, int, long,
float, double, bytes, string, arrays, maps, records, unions, and
null/deflate codecs. Format per the public Apache Avro 1.11 spec:
magic 'Obj\\x01' + metadata map (avro.schema, avro.codec) + 16-byte
sync marker, then blocks of (row count, byte length, payload, sync).

Distribution: decoding runs in EXECUTORS — file paths are parallelized
and each partition decodes its files with this pure-Python reader, then
rows convert to a DataFrame via the Arrow path. At 100 TB you'd use the
spark-avro jar (scan-level vectorization); the API here is the jar-less
fallback with the same semantics and the same distribution shape (one
task per file, like the reference's goroutine-per-file, R13).

Union handling: a decoded union value is returned BARE (the branch's
value), not as a {type: value} wrapper — i.e. the reference's dead-code
``removeTypeMaps`` flattener (fileStreamAdapter.go:20-39, R2) is the
live, correct behavior here, without its nondeterministic map-iteration
bug (blockManager.go:45-47)."""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag varints, little-endian IEEE)
# ---------------------------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 63:
            # spec caps a long varint at 10 bytes; without this a
            # corrupt stream of continuation bytes builds an unbounded
            # int until EOF instead of failing fast
            raise ValueError("varint longer than 10 bytes (corrupt avro)")
    return (acc >> 1) ^ -(acc & 1)  # zigzag decode


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1) | 1  # zigzag
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


# ---------------------------------------------------------------------------
# schema-driven decode/encode
# ---------------------------------------------------------------------------

def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf)  # bare value (R2 semantics)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    _read_long(buf)
                    n = -n
                out.extend(_decode(schema["items"], buf) for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode()
                    out[k] = _decode(schema["values"], buf)
        return _decode(t, buf)  # {"type": "string"} wrapper form
    if schema == "null":
        return None
    if schema == "boolean":
        b = buf.read(1)
        if not b:
            # a truncated buffer must error, not silently decode False
            raise EOFError("truncated boolean")
        return b == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode()
    raise NotImplementedError(f"avro type not supported: {schema!r}")


def _encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], out)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    _encode(schema["items"], v, out)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_bytes(out, k.encode())
                    _encode(schema["values"], v, out)
            _write_long(out, 0)
            return
        _encode(t, value, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        _write_long(out, value)
        return
    if schema == "float":
        out.write(struct.pack("<f", value))
        return
    if schema == "double":
        out.write(struct.pack("<d", value))
        return
    if schema == "bytes":
        _write_bytes(out, value)
        return
    if schema == "string":
        _write_bytes(out, value.encode())
        return
    raise NotImplementedError(f"avro type not supported: {schema!r}")


def _matches(branch, value) -> bool:
    if branch == "null":
        return value is None
    if value is None:
        return False
    if branch in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if branch in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if branch == "boolean":
        return isinstance(value, bool)
    if branch == "string":
        return isinstance(value, str)
    if branch == "bytes":
        return isinstance(value, bytes)
    return True  # records/arrays/maps: trust the caller


# ---------------------------------------------------------------------------
# OCF container
# ---------------------------------------------------------------------------

def decode_ocf_bytes(data: bytes) -> tuple[dict, list[dict]]:
    """Decode one OCF byte string → (schema, rows)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro OCF (bad magic)")
    meta = _decode({"type": "map", "values": "bytes"}, buf)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        payload = _read_bytes(buf)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise NotImplementedError(
                f"avro codec {codec!r} not supported (null/deflate only)"
            )
        block = io.BytesIO(payload)
        rows.extend(_decode(schema, block) for _ in range(count))
        if buf.read(16) != sync:
            raise ValueError("OCF sync marker mismatch")
    return schema, rows


def write_avro_ocf(path: str, schema: dict, rows: list[dict],
                   codec: str = "deflate") -> None:
    """Write rows as one OCF file (test/fixture sink, R9 shape)."""
    body = io.BytesIO()
    for r in rows:
        _encode(schema, r, body)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"codec {codec!r}")
    out = io.BytesIO()
    out.write(MAGIC)
    _encode(
        {"type": "map", "values": "bytes"},
        {"avro.schema": json.dumps(schema).encode(),
         "avro.codec": codec.encode()},
        out,
    )
    sync = b"\x00" * 16
    out.write(sync)
    _write_long(out, len(rows))
    _write_bytes(out, payload)
    out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


_SPARK_AVRO_AVAILABLE: bool | None = None  # probe result, cached


def _spark_avro_available(spark) -> bool:
    """True iff the spark-avro data source is on the classpath. Probed
    once with a nonexistent path: a present jar fails with
    PATH_NOT_FOUND, a missing jar with FAILED_TO_FIND_DATA_SOURCE."""
    global _SPARK_AVRO_AVAILABLE
    if _SPARK_AVRO_AVAILABLE is None:
        try:
            spark.read.format("avro").load(
                "/nonexistent-avro-probe-" + os.urandom(4).hex())
            _SPARK_AVRO_AVAILABLE = True
        except Exception as e:  # noqa: BLE001 — classify by error class
            msg = str(e)
            _SPARK_AVRO_AVAILABLE = (
                "FAILED_TO_FIND_DATA_SOURCE" not in msg
                and "Failed to find data source" not in msg
            )
    return _SPARK_AVRO_AVAILABLE


def read_avro_ocf(spark, paths: list[str] | str, spark_schema=None):
    """Distributed OCF read: one task per file (reference R13 shape),
    executor-side decode, Arrow-batched conversion to a DataFrame.

    When the spark-avro jar is on the classpath the read routes through
    it instead (scan-level vectorization, pushdown — the 100 TB path);
    the pure-Python decoder is the jar-less fallback with the same
    semantics for the reference's schema subset. Note the fallback maps
    Avro ``int`` to LongType; pass ``spark_schema`` explicitly if exact
    type parity between both paths matters.

    ``spark_schema``: optional StructType; inferred from the first
    file's Avro schema if omitted (nullable unions → nullable fields).
    """
    from pyspark.sql.types import (
        ArrayType, BooleanType, BinaryType, DoubleType, FloatType,
        LongType, MapType, StringType, StructField, StructType,
    )

    if isinstance(paths, str):
        paths = (
            sorted(
                os.path.join(paths, n) for n in os.listdir(paths)
                if n.endswith(".avro") or "." not in os.path.basename(n)
            )
            if os.path.isdir(paths) else [paths]
        )

    if _spark_avro_available(spark):
        r = spark.read.format("avro")
        if spark_schema is not None:
            r = r.schema(spark_schema)
        return r.load(paths)

    def avro_to_spark(s):
        if isinstance(s, list):
            non_null = [b for b in s if b != "null"]
            inner = avro_to_spark(non_null[0]) if non_null else StringType()
            return inner
        if isinstance(s, dict):
            t = s["type"]
            if t == "record":
                return StructType([
                    StructField(f["name"], avro_to_spark(f["type"]),
                                _nullable(f["type"]))
                    for f in s["fields"]
                ])
            if t == "array":
                return ArrayType(avro_to_spark(s["items"]))
            if t == "map":
                return MapType(StringType(), avro_to_spark(s["values"]))
            return avro_to_spark(t)
        return {
            "null": StringType(), "boolean": BooleanType(), "int": LongType(),
            "long": LongType(), "float": FloatType(), "double": DoubleType(),
            "bytes": BinaryType(), "string": StringType(),
        }[s]

    def _nullable(s) -> bool:
        return isinstance(s, list) and "null" in s

    if spark_schema is None:
        with open(paths[0], "rb") as f:
            avro_schema, _ = decode_ocf_bytes(f.read())
        spark_schema = avro_to_spark(avro_schema)
    field_names = [f.name for f in spark_schema.fields]

    def decode_partition(it):
        for p in it:
            with open(p, "rb") as f:
                _schema, rows = decode_ocf_bytes(f.read())
            for r in rows:
                yield tuple(r.get(name) for name in field_names)

    rdd = spark.sparkContext.parallelize(paths, max(1, len(paths)))
    return spark.createDataFrame(rdd.mapPartitions(decode_partition),
                                 spark_schema)


# ---------------------------------------------------------------------------
# registered query: OCF ingest roundtrip (reference R1 — its native source)
# ---------------------------------------------------------------------------

NATION_AVRO_SCHEMA = {
    "type": "record",
    "name": "nation",
    "fields": [
        {"name": "n_nationkey", "type": "long"},
        {"name": "n_name", "type": "string"},
        {"name": "n_regionkey", "type": "long"},
    ],
}


def scan_avro(spark, sf: str):
    """Driver-checkable OCF roundtrip: materialize the nation table as
    one Avro OCF file PER REGION (deflate codec — the reference's
    compressed-container shape, filesystemStorageAdapter.go:50-54), then
    read the directory back with ``read_avro_ocf`` (one decode task per
    file, R13 shape; routes through spark-avro when the jar is present).
    Oracle = the source table: the encode→decode pipeline must be
    content-preserving. Fixture prep collects 25 rows driver-side; the
    measured operator is the distributed read."""
    import tempfile

    from iceberg_core_spark.session import load_table

    work = tempfile.mkdtemp(prefix="ice_scan_avro_")
    rows = [r.asDict() for r in load_table(spark, sf, "nation").collect()]
    by_region: dict[int, list[dict]] = {}
    for r in rows:
        by_region.setdefault(r["n_regionkey"], []).append(r)
    for rk, rws in sorted(by_region.items()):
        write_avro_ocf(
            os.path.join(work, f"nation-r{rk}.avro"),
            NATION_AVRO_SCHEMA,
            sorted(rws, key=lambda r: r["n_nationkey"]),
        )
    return read_avro_ocf(spark, work)


SCAN_AVRO_SQL = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""

QUERIES = {
    "scan_avro": (scan_avro, SCAN_AVRO_SQL),
}
