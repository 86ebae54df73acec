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
                if raw is None:
                    # Kafka tombstone: a NULL value is not a decode
                    # error — it rides through as an all-NULL row for
                    # the envelope layer (UPSERT reads it as a delete)
                    rows.append([None] * len(out_cols))
                    errs.append(None)
                    continue
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


# ---------------------------------------------------------------------------
# Confluent REST API (the subset sources need) — real HTTP, like the
# other wire peers in this package (kafka_wire.MiniBroker et al.)
# ---------------------------------------------------------------------------

class MiniSchemaRegistryServer:
    """An in-process HTTP peer speaking the Confluent Schema Registry
    REST subset the engine uses (docs.confluent.io/platform/current/
    schema-registry/develop/api.html):

    - ``POST /subjects/{subject}/versions`` body ``{"schema": "...",
      "schemaType": "AVRO"|"PROTOBUF"}`` → ``{"id": N}``
    - ``GET /schemas/ids/{id}`` → ``{"schema": "..."}``
    - ``GET /subjects/{subject}/versions/latest`` →
      ``{"subject", "version", "id", "schema"}``

    Ids are global and monotonically assigned, version numbering is
    per subject — the Confluent model. PROTOBUF subjects store the
    flat field-descriptor JSON this package's decoder consumes
    (sources/protobuf.py) in place of .proto text."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self._by_id: dict[int, dict] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next = 1
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type",
                                 "application/vnd.schemaregistry.v1+json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                if parts[:2] == ["schemas", "ids"] and len(parts) == 3:
                    ent = outer._by_id.get(int(parts[2]))
                    if ent is None:
                        self._reply(404, {"error_code": 40403,
                                          "message": "Schema not found"})
                        return
                    self._reply(200, {"schema": ent["schema"]})
                    return
                if (len(parts) == 4 and parts[0] == "subjects"
                        and parts[2] == "versions"):
                    ids = outer._subjects.get(parts[1])
                    if not ids:
                        self._reply(404, {"error_code": 40401,
                                          "message": "Subject not found"})
                        return
                    ver = (len(ids) if parts[3] == "latest"
                           else int(parts[3]))
                    sid = ids[ver - 1]
                    self._reply(200, {
                        "subject": parts[1], "version": ver, "id": sid,
                        "schema": outer._by_id[sid]["schema"]})
                    return
                if parts == ["subjects"]:
                    body = json.dumps(
                        sorted(outer._subjects)).encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self._reply(404, {"error_code": 404,
                                  "message": "unknown endpoint"})

            def do_POST(self):
                parts = self.path.strip("/").split("/")
                if (len(parts) == 3 and parts[0] == "subjects"
                        and parts[2] == "versions"):
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    sid = outer.register_subject(
                        parts[1], req["schema"],
                        req.get("schemaType", "AVRO"))
                    self._reply(200, {"id": sid})
                    return
                self._reply(404, {"error_code": 404,
                                  "message": "unknown endpoint"})

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._srv.server_address[:2]
        self.url = f"http://{self.host}:{self.port}"
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()

    def register_subject(self, subject: str, schema: str,
                         schema_type: str = "AVRO") -> int:
        with self._lock:
            sid = self._next
            self._next += 1
            self._by_id[sid] = {"schema": schema, "type": schema_type}
            self._subjects.setdefault(subject, []).append(sid)
        return sid

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class HttpSchemaRegistry(SchemaRegistry):
    """Registry client over the Confluent REST API: resolves unknown
    schema ids with ``GET /schemas/ids/{id}`` and the subject's latest
    reader schema with ``GET /subjects/{s}/versions/latest``. Fetches
    memoize, so executors pay one HTTP round-trip per distinct writer
    schema id, not per record — the reference's CSR client caches the
    same way (src/ccsr)."""

    def __init__(self, url: str, subject: str | None = None):
        super().__init__()
        self.url = url.rstrip("/")
        self.subject = subject

    def _get(self, path: str) -> dict:
        import urllib.request
        with urllib.request.urlopen(self.url + path, timeout=10) as r:
            return json.loads(r.read())

    def schema_json(self, schema_id: int) -> str:
        sid = int(schema_id)
        if sid not in self._raw:
            try:
                self._raw[sid] = self._get(f"/schemas/ids/{sid}")["schema"]
            except Exception as ex:
                raise KeyError(
                    f"schema id {sid} not in registry at {self.url}: "
                    f"{ex}") from ex
        return self._raw[sid]

    def latest(self) -> tuple[int, str]:
        """(id, schema) of the subject's latest version."""
        if self.subject is None:
            raise ValueError("no subject configured")
        ent = self._get(f"/subjects/{self.subject}/versions/latest")
        self._raw[int(ent["id"])] = ent["schema"]
        return int(ent["id"]), ent["schema"]

    def latest_id(self) -> int:
        if self._raw and self.subject is None:
            return max(self._raw)
        return self.latest()[0]

    def register_subject(self, subject: str, schema: str,
                         schema_type: str = "AVRO") -> int:
        """POST a new subject version; returns the assigned global id
        (the sink direction: the engine registers its derived value
        schema before producing, like the reference's CSR publisher)."""
        import urllib.request
        body = json.dumps({"schema": schema,
                           "schemaType": schema_type}).encode()
        req = urllib.request.Request(
            f"{self.url}/subjects/{subject}/versions", data=body,
            headers={"Content-Type":
                     "application/vnd.schemaregistry.v1+json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            sid = int(json.loads(r.read())["id"])
        self._raw[sid] = schema
        return sid
