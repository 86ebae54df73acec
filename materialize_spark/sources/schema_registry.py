"""Confluent-style schema registry: schema-id → writer schema resolution.

Reference: the CSR connection on Avro-encoded sources
(/root/reference/src/storage-types/src/sources/encoding.rs:95-102 —
``AvroEncoding { schema, csr_connection }``): each Confluent-framed message
carries the 4-byte id of the *writer* schema; the engine resolves it
against the registry and decodes with that schema, then maps the record
onto the declared (reader) relation, filling fields the writer didn't know
about with NULL/defaults (Avro spec §schema-resolution).

No network in this sandbox, so the registry client is the same shape with
two backends: an in-memory dict and a JSON file (``{"1": "<schema json>",
...}``) — the file stands in for the HTTP subject-version API and is the
natural representation for a registry snapshot shipped with a job. Lookups
memoize; the resolved (fields, offset-decode) closure is built once per
schema id, not per record.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from materialize_spark.sources.avro import (
    _decode_value, _fields, avro_spark_schema,
)


class SchemaRegistry:
    """schema_id → parsed Avro schema, with memoized field plans."""

    def __init__(self, schemas: dict[int, str] | None = None,
                 path: str | None = None):
        self._raw: dict[int, str] = {int(k): v
                                     for k, v in (schemas or {}).items()}
        self._path = path
        self._plans: dict[int, list[tuple[str, object]]] = {}
        if path is not None:
            self._load_file()

    def _load_file(self) -> None:
        with open(self._path) as fh:
            self._raw.update({int(k): v if isinstance(v, str) else json.dumps(v)
                              for k, v in json.load(fh).items()})

    def register(self, schema_id: int, schema_json: str) -> None:
        self._raw[int(schema_id)] = schema_json
        self._plans.pop(int(schema_id), None)

    def schema_json(self, schema_id: int) -> str:
        try:
            return self._raw[int(schema_id)]
        except KeyError:
            # Mirror the reference's behavior shape: unknown ids are a
            # decode error, optionally after a one-shot refresh (the HTTP
            # client would re-fetch; the file backend re-reads).
            if self._path and os.path.exists(self._path):
                self._load_file()
                if int(schema_id) in self._raw:
                    return self._raw[int(schema_id)]
            raise KeyError(f"schema id {schema_id} not in registry")

    def fields(self, schema_id: int) -> list[tuple[str, object]]:
        sid = int(schema_id)
        if sid not in self._plans:
            self._plans[sid] = _fields(json.loads(self.schema_json(sid)))
        return self._plans[sid]

    def latest_id(self) -> int:
        return max(self._raw)


def decode_confluent_stream(df: DataFrame, value_col: str,
                            registry: SchemaRegistry, *,
                            reader_schema_json: str | None = None,
                            errors: str = "raise") -> DataFrame:
    """Decode Confluent-framed Avro where each record names its writer
    schema: magic 0x00 + BE32 schema id + Avro binary.

    Output columns follow the reader schema (default: the registry's
    latest); fields the writer schema lacks come out NULL, fields the
    reader dropped are discarded — Avro schema resolution for the
    flat-record case. Works on batch and streaming frames alike
    (mapInPandas both ways).

    ``errors``: "raise" kills the dataflow on a malformed payload (the
    reference's default); "inline" is ENVELOPE UPSERT (VALUE DECODING
    ERRORS = INLINE) — the row keeps its pass-through (key) columns,
    data fields come out NULL, and a ``decode_error`` string column
    carries the message, so one poison record cannot wedge the source
    (reference UpsertStyle::ValueErrInline, envelope.rs:80,299-308).
    """
    if errors not in ("raise", "inline"):
        raise ValueError("errors must be 'raise' or 'inline'")
    inline = errors == "inline"
    reader_json = reader_schema_json or registry.schema_json(
        registry.latest_id())
    out_cols = [n for n, _ in _fields(json.loads(reader_json))]
    out_schema = avro_spark_schema(reader_json)
    other = [f for f in df.schema.fields if f.name != value_col]
    fields = other + list(out_schema.fields)
    if inline:
        fields = fields + [StructField("decode_error", StringType())]
    full_schema = StructType(fields)

    def decode_one(buf: bytes) -> dict:
        if not buf or buf[0] != 0:
            raise ValueError("not Confluent-framed: bad magic byte")
        sid = struct.unpack_from(">I", buf, 1)[0]
        pos, rec = 5, {}
        for name, typ in registry.fields(sid):
            rec[name], pos = _decode_value(typ, buf, pos)
        return rec

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            errs = []
            for raw in pdf[value_col]:
                if inline:
                    try:
                        rec = decode_one(bytes(raw))
                        errs.append(None)
                    except Exception as e:
                        rec = {}
                        errs.append(str(e))
                else:
                    rec = decode_one(bytes(raw))
                rows.append([rec.get(c) for c in out_cols])
            decoded = pd.DataFrame(rows, columns=out_cols)
            if inline:
                decoded["decode_error"] = errs
            rest = pdf[[f.name for f in other]].reset_index(drop=True)
            yield pd.concat([rest, decoded], axis=1)

    return df.mapInPandas(decode, schema=full_schema)
