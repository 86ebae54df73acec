"""FORMAT PROTOBUF for flat messages, without protobuf libraries.

Reference: ProtobufEncoding
(/root/reference/src/storage-types/src/sources/encoding.rs:95-102). Like
sources/avro.py, the sandbox has neither spark-protobuf nor the protobuf
wheel, so this decodes the wire format directly (public spec:
protobuf.dev/programming-guides/encoding) for flat messages of scalar
fields — the shape CDC topics and metric streams overwhelmingly use.

Field descriptors are given as {field_number: (name, type)} with type in
int64 | sint64 | string | double | float | bool | bytes. Unknown field
numbers are skipped by wire type — forward-compatible, per proto semantics.
Missing fields decode as proto3 defaults (0 / "" / false) unless
``missing_as_null=True``.

Decode runs as mapInPandas (Arrow batches, one Python loop per batch) on
batch or streaming frames; encode_message exists for tests and sinks.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, BooleanType, DoubleType, FloatType, LongType, StringType,
    StructField, StructType,
)

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5

_SPARK_TYPES = {
    "int64": LongType(), "sint64": LongType(), "string": StringType(),
    "double": DoubleType(), "float": FloatType(), "bool": BooleanType(),
    "bytes": BinaryType(),
}
_DEFAULTS = {"int64": 0, "sint64": 0, "string": "", "double": 0.0,
             "float": 0.0, "bool": False, "bytes": b""}
_WIRE_OF = {"int64": _WIRE_VARINT, "sint64": _WIRE_VARINT,
            "bool": _WIRE_VARINT, "double": _WIRE_I64, "float": _WIRE_I32,
            "string": _WIRE_LEN, "bytes": _WIRE_LEN}


def _varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _varint_encode(n: int) -> bytes:
    n &= (1 << 64) - 1  # two's-complement for negative int64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def proto_spark_schema(fields: dict[int, tuple[str, str]]) -> StructType:
    return StructType([
        StructField(name, _SPARK_TYPES[typ], True)
        for _num, (name, typ) in sorted(fields.items())
    ])


def encode_message(fields: dict[int, tuple[str, str]], row: dict) -> bytes:
    """Encode one flat message (test/sink helper). Proto3 semantics:
    default-valued fields are omitted from the wire."""
    out = bytearray()
    for num, (name, typ) in sorted(fields.items()):
        v = row.get(name)
        if v is None or v == _DEFAULTS[typ]:
            continue
        out += _varint_encode((num << 3) | _WIRE_OF[typ])
        if typ == "int64":
            out += _varint_encode(int(v))
        elif typ == "sint64":
            out += _varint_encode((int(v) << 1) ^ (int(v) >> 63))
        elif typ == "bool":
            out += _varint_encode(1)
        elif typ == "double":
            out += struct.pack("<d", float(v))
        elif typ == "float":
            out += struct.pack("<f", float(v))
        else:  # string / bytes
            raw = v.encode("utf-8") if typ == "string" else bytes(v)
            out += _varint_encode(len(raw)) + raw
    return bytes(out)


def _decode_message(fields: dict[int, tuple[str, str]], buf: bytes,
                    *, missing_as_null: bool) -> dict:
    rec = ({name: None for _n, (name, _t) in fields.items()}
           if missing_as_null else
           {name: _DEFAULTS[typ] for _n, (name, typ) in fields.items()})
    pos = 0
    while pos < len(buf):
        tag, pos = _varint_decode(buf, pos)
        num, wire = tag >> 3, tag & 0x7
        spec = fields.get(num)
        if wire == _WIRE_VARINT:
            raw, pos = _varint_decode(buf, pos)
            if spec:
                name, typ = spec
                if typ == "sint64":
                    rec[name] = (raw >> 1) ^ -(raw & 1)
                elif typ == "bool":
                    rec[name] = raw == 1
                else:  # int64: two's-complement
                    rec[name] = raw - (1 << 64) if raw >= (1 << 63) else raw
        elif wire == _WIRE_I64:
            if spec:
                rec[spec[0]] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire == _WIRE_I32:
            if spec:
                rec[spec[0]] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif wire == _WIRE_LEN:
            n, pos = _varint_decode(buf, pos)
            if spec:
                name, typ = spec
                raw = buf[pos:pos + n]
                rec[name] = raw.decode("utf-8") if typ == "string" else bytes(raw)
            pos += n
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return rec


def decode_proto_stream(df: DataFrame, value_col: str,
                        fields: dict[int, tuple[str, str]], *,
                        missing_as_null: bool = False) -> DataFrame:
    """Decode a binary protobuf column into typed columns (batch or
    streaming). Prefer spark-protobuf's from_protobuf when available —
    this is the no-dependency fallback."""
    out_schema = proto_spark_schema(fields)
    other = [f for f in df.schema.fields if f.name != value_col]
    full_schema = StructType(other + list(out_schema.fields))
    names = [f.name for f in out_schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        none_row = {n: None for n in names}
        for pdf in batches:
            # NULL payloads (Kafka tombstones) decode to all-NULL rows
            # so the upsert envelope can read them as deletes
            rows = [none_row if raw is None else
                    _decode_message(fields, bytes(raw),
                                    missing_as_null=missing_as_null)
                    for raw in pdf[value_col]]
            decoded = pd.DataFrame(rows, columns=names)
            rest = pdf[[f.name for f in other]].reset_index(drop=True)
            yield pd.concat([rest, decoded], axis=1)

    return df.mapInPandas(decode, schema=full_schema)
